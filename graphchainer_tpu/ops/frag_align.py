"""Banded fragment-to-graph extension kernel (the flagship DP).

TPU re-design of the reference's GraphAlignerBitvectorBanded
(src/GraphAlignerBitvectorBanded.h) + bitvector common kernel
(src/GraphAlignerBitvectorCommon.h:243-263,885-1030):

* The reference discovers the band per 64-row slice with a priority-queue
  flood fill and re-queues nodes whose values improve.  Here the band is a
  FIXED set of B node slots selected around the seed by the host band
  builder (bounded-bp BFS), topologically sorted, and each slice is
  computed in ONE pass over topo LEVELS: on a DAG, in-band dependencies
  only point to earlier levels, so all slots of a level advance together
  in one vectorized step — the sequential depth per 32-row slice is the
  band's topo depth (typically ~B/4), not B.

* Exactness (in-band cells, verified against the scalar DAG oracle in
  tests/test_frag_align.py): every candidate word is a monotone
  overestimate of the true DP, and each true shortest path is carried by
  an exact candidate:
    - the in-edge advance with hin = sign(prev_col0_bottom - boundary(u))
      is exact for the contributing edge (the true boundary delta can
      never exceed +1 because prev_col0_bottom <= boundary(u) + 1 by the
      horizontal recurrence) and an overestimate otherwise,
    - an explicit vertical candidate source_word(prev_col0_bottom) carries
      the own-column insertion path across slices,
    - within-node columns use the exact recorded HP/HN boundary deltas.

* The graph lives HBM-resident: Eq bitplanes and lengths of all split
  nodes (forward table concatenated with the reversed-sequence table for
  backward extension) are uploaded once; per batch only small index
  arrays (band node ids, in-edge slots, levels, seed trims, read planes)
  move host->device.

* Everything is vectorized over (fragments x band slots); the sequential
  dimensions are band topo levels (lax.fori_loop) and the <=32 columns of
  each node (unrolled; the horizontal Myers carry chain is inherent).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from graphchainer_tpu.ops import myers
from graphchainer_tpu.ops.myers import advance_word, merge_words, source_word

BIG = np.int32(1 << 28)
W = 32

# best_in codes (values >= 0 are band slot indices)
IN_NONE = -1      # no incoming candidate won (inactive slot)
IN_SEED = -2      # seed boundary injection (path starts here)
IN_VERT = -3      # vertical continuation from previous slice, same slot


class FragResult(NamedTuple):
    best_score: jax.Array  # (F,) int32 overall best end score
    best_slot: jax.Array   # (F,) int32 argmin slot
    best_col: jax.Array    # (F,) int32 argmin column within the best slot
    best_in: jax.Array     # (F, B, S) int8/int16: winning incoming candidate
    end_score: jax.Array   # (F, B) int32 per-slot end scores (device-side;
                           # not downloaded on the hot path)
    end_col: jax.Array     # (F, B) int32 per-slot argmin columns
    # final boundary state of the LAST slice per slot — feeding these back
    # as carry_in of a follow-up call on the same band continues the DP
    # exactly (windowed whole-read extension with full-band carry,
    # reference GraphAlignerBitvectorBanded.h:253-406 slice chaining)
    out_ssb: jax.Array = None  # (F, B) int32 col0 bottom scores
    out_hp: jax.Array = None   # (F, B) uint32 bottom-row horizontal +1 bits
    out_hn: jax.Array = None   # (F, B) uint32 bottom-row horizontal -1 bits
    # cell-precise X-score tracking (want_xcells=True, GA mode): the best
    # X-score cell over all (slot end-word, row) pairs — the reference's
    # per-cell X endpoint scan (src/GraphAlignerBitvectorCommon.h:321-383
    # + WordSlice.h:313-460 local-minima scans; X = rows_aligned - 5*edits
    # in the vg match/mismatch convention)
    xbest: jax.Array = None    # (F,) int32 max X over cells (window-local
                               # rows, cumulative scores)
    xslot: jax.Array = None    # (F,) int32 slot of the argmax cell
    xrow: jax.Array = None     # (F,) int32 window-local row of the argmax
    # device-fused backwalk (want_walk runs: best_in is NOT materialized
    # on host; see _device_walk_mask)
    walk_ok: jax.Array = None    # (F,) bool walk reached the seed
    walk_mask: jax.Array = None  # (F,) uint32 visited band slots


def _above_mask(r):
    """uint32 mask of bits strictly above row r."""
    return jnp.where(r < W - 1,
                     (jnp.uint32(0xFFFFFFFF) << (r.astype(jnp.uint32) + 1)),
                     jnp.uint32(0))


def _score_at_row(vp, vn, sb, r_mask):
    pc = jax.lax.population_count
    return (sb - pc(vp & r_mask).astype(jnp.int32)
            + pc(vn & r_mask).astype(jnp.int32))


@partial(jax.jit,
         static_argnames=("n_slices", "max_in", "full_start", "n_levels",
                          "want_xcells"))
def align_fragments(node_eq: jax.Array, node_len: jax.Array,
                    band_nodes: jax.Array, band_in: jax.Array,
                    seed_shift: jax.Array, req: jax.Array,
                    frag_len: jax.Array, n_slices: int, max_in: int,
                    seed_base: jax.Array | None = None,
                    full_start: bool = False,
                    band_level: jax.Array | None = None,
                    n_levels: int | None = None,
                    carry_in: tuple | None = None,
                    want_xcells: bool = False) -> FragResult:
    """Run the banded DP.

    node_eq:    (N2, 4) uint32  HBM-resident Eq bitplanes (fwd ++ reversed)
    node_len:   (N2,) int32
    band_nodes: (F, B) int32    per-slot node id into the tables, -1 = pad
                                 (backward jobs use ids offset by +N)
    band_in:    (F, B, max_in) int8/int16  in-edge slot ids (< slot),
                                 -1 = none
    seed_shift: (F,) int32      columns trimmed from slot 0's start
    req:        (F, S, 4) uint32  read-row match planes per slice
    frag_len:   (F,) int32      fragment rows (1..S*32)
    seed_base:  (F,) int32      base score injected at the seed boundary
                                 (0 for fresh extension; the accumulated
                                 score when continuing a windowed
                                 whole-read extension)
    full_start: True injects the boundary word at EVERY active slot
                (free alignment start anywhere — the reference's
                getBacktraceFullStart semantics for --optimal-alignment,
                src/GraphAlignerBitvectorDijkstra.h)
    band_level: (F, B) int32    band topo level per slot (level[b] >
                level[u] for every in-edge u; -1 = pad).  None falls back
                to level == slot index (fully sequential, always valid).
    n_levels:   static level-loop trip count (> max level in band_level)
    carry_in:   (ssb, hp, hn) each (F, B) — the out_ssb/out_hp/out_hn of
                a previous call whose slots map onto this call's slots.
                When given, slice 0 continues the carried DP (vertical
                continuation + exact hin bits; NO seed injection), so
                back-to-back calls on an unchanged band are bit-identical
                to one call with the concatenated read rows.  Slots with
                ssb >= BIG start invalid (freshly entered band region).
    """
    F, B = band_nodes.shape
    S = n_slices
    N2 = node_eq.shape[0]
    if band_level is None:
        band_level = jnp.broadcast_to(
            jnp.arange(B, dtype=jnp.int32)[None, :], (F, B))
        n_levels = B
    assert n_levels is not None
    # backtrace pointers hold slot ids in [0, B) plus the IN_* codes;
    # int8 only covers B <= 127 (optimal mode builds component bands up
    # to B = 4096, which need int16)
    ptr_dtype = jnp.int8 if B <= 127 else jnp.int16

    end_slice = (frag_len - 1) // W          # (F,)
    end_row_mask = _above_mask((frag_len - 1) % W)[:, None]   # (F,1)
    at_end_all = (end_slice[:, None] == jnp.arange(S)[None, :])  # (F,S)

    # --- hoisted per-slot tables (slice-invariant) -----------------------
    ids = band_nodes.astype(jnp.int32)                   # (F,B)
    idc = jnp.clip(ids, 0, N2 - 1)
    slot_eq = jnp.take(node_eq, idc, axis=0)             # (F,B,4)
    slot_len = jnp.where(ids >= 0, jnp.take(node_len, idc, axis=0), 0)
    arangeB = jnp.arange(B, dtype=jnp.int32)[None, :]    # (1,B)
    is_seed = arangeB == 0                               # (1,B)
    # seed_shift: (F,) trims slot 0 only (fresh seed window); (F,B) trims
    # per slot (carried windows keep the original seed node trimmed
    # wherever it lands so carried column indices stay aligned)
    if seed_shift.ndim == 2:
        shift = seed_shift.astype(jnp.int32)             # (F,B)
    else:
        shift = jnp.where(is_seed, seed_shift[:, None], 0)   # (F,B)
    slot_eq = slot_eq >> (shift.astype(jnp.uint32) & 31)[..., None]
    slot_len = slot_len - shift
    slot_active = slot_len > 0                           # (F,B)

    zero32 = jnp.zeros((F, B), jnp.uint32)
    carried = carry_in is not None
    state = dict(
        evp=zero32, evn=zero32, esb=jnp.full((F, B), BIG, jnp.int32),
        ssb=(carry_in[0].astype(jnp.int32) if carried
             else jnp.full((F, B), BIG, jnp.int32)),
        hp=carry_in[1].astype(jnp.uint32) if carried else zero32,
        hn=carry_in[2].astype(jnp.uint32) if carried else zero32,
        end_score=jnp.full((F, B), BIG, jnp.int32),
        end_col=jnp.zeros((F, B), jnp.int32),
        best_in=jnp.full((F, B, S), IN_NONE, ptr_dtype),
        xbest=jnp.full((F,), -BIG, jnp.int32),
        xslot=jnp.zeros((F,), jnp.int32),
        xrow=jnp.zeros((F,), jnp.int32),
    )

    # The seed boundary word B0: score_before_start = seed_base (0 for a
    # fresh extension), all-insertion column.
    if seed_base is None:
        seed_base = jnp.zeros((F,), jnp.int32)
    b0_vp, b0_vn, b0_sb = source_word(seed_base.astype(jnp.int32))
    b0_vp, b0_vn, b0_sb = (b0_vp[:, None], b0_vn[:, None], b0_sb[:, None])

    # merges must not mix garbage: invalid candidates become BIG-score
    # all-insertion words (no-ops under min-merge)
    def sanitize(wvp, wvn, wsb, valid):
        return (jnp.where(valid, wvp, jnp.uint32(0xFFFFFFFF)),
                jnp.where(valid, wvn, jnp.uint32(0)),
                jnp.where(valid, wsb, BIG))

    def eq_of_col(req_s, c):
        """(F,B) match bits of column c of every slot for this slice."""
        col_bits = ((slot_eq >> jnp.uint32(c)) & jnp.uint32(1))  # (F,B,4)
        return (req_s[:, None, 0] * col_bits[..., 0]
                | req_s[:, None, 1] * col_bits[..., 1]
                | req_s[:, None, 2] * col_bits[..., 2]
                | req_s[:, None, 3] * col_bits[..., 3])

    for s in range(S):
        req_s = req[:, s]                     # (F, 4)
        prev_ssb = state["ssb"]
        prev_hp, prev_hn = state["hp"], state["hn"]
        prev_exists = (s > 0) or carried
        at_end = at_end_all[:, s][:, None]    # (F,1)

        def level_body(l, carry, _s=s, _req_s=req_s, _prev_ssb=prev_ssb,
                       _prev_hp=prev_hp, _prev_hn=prev_hn,
                       _prev_exists=prev_exists, _at_end=at_end):
            (evp_all, evn_all, esb_all, new_ssb, new_hp, new_hn,
             new_end_score, new_end_col, best_in_s) = carry
            lvl = band_level == l                      # (F,B)

            eq0 = eq_of_col(_req_s, 0)                 # (F,B)

            # ---- column-0 candidates (all slots; masked commit) ---------
            cvp = jnp.zeros((F, B), jnp.uint32)
            cvn = jnp.zeros((F, B), jnp.uint32)
            csb = jnp.full((F, B), BIG, jnp.int32)
            cbest = jnp.full((F, B), IN_NONE, jnp.int32)

            # seed injection (slice 0 only)
            if not _prev_exists:
                if full_start:
                    seed_valid = slot_active | is_seed
                else:
                    seed_valid = jnp.broadcast_to(is_seed, (F, B))
                avp, avn, asb, _ = advance_word(
                    b0_vp, b0_vn, b0_sb, eq0, jnp.int32(1))
                avp, avn, asb = sanitize(avp, avn, asb, seed_valid)
                better = asb < csb
                cvp, cvn, csb = merge_words(cvp, cvn, csb, avp, avn, asb)
                cbest = jnp.where(seed_valid & better, IN_SEED, cbest)

            # vertical continuation from previous slice
            if _prev_exists:
                vvp, vvn, vsb = source_word(_prev_ssb)
                valid = slot_active & (_prev_ssb < BIG)
                vvp, vvn, vsb = sanitize(vvp, vvn, vsb, valid)
                better = vsb < csb
                cvp, cvn, csb = merge_words(cvp, cvn, csb, vvp, vvn, vsb)
                cbest = jnp.where(valid & better, IN_VERT, cbest)

            # in-edges: gather predecessor end words (earlier levels of
            # THIS slice, already committed into evp/evn/esb)
            for e in range(max_in):
                u = band_in[:, :, e].astype(jnp.int32)      # (F,B)
                valid = (u >= 0) & slot_active
                uc = jnp.clip(u, 0, B - 1)
                uvp = jnp.take_along_axis(evp_all, uc, axis=1)
                uvn = jnp.take_along_axis(evn_all, uc, axis=1)
                usb = jnp.take_along_axis(esb_all, uc, axis=1)
                valid &= usb < BIG
                if _prev_exists:
                    ubs = myers.score_before_start(uvp, uvn, usb)
                    hin = jnp.clip(_prev_ssb - ubs, -1, 1)
                    hin = jnp.where(_prev_ssb >= BIG, jnp.int32(1), hin)
                else:
                    hin = jnp.int32(1)
                avp, avn, asb, _ = advance_word(uvp, uvn, usb, eq0, hin)
                avp, avn, asb = sanitize(avp, avn, asb, valid)
                better = asb < csb
                cvp, cvn, csb = merge_words(cvp, cvn, csb, avp, avn, asb)
                cbest = jnp.where(valid & better, u, cbest)

            # len-0 seed slot: the boundary word itself is the end word.
            if not _prev_exists:
                len0_seed = is_seed & (slot_len == 0)
                cvp = jnp.where(len0_seed, b0_vp, cvp)
                cvn = jnp.where(len0_seed, b0_vn, cvn)
                csb = jnp.where(len0_seed, b0_sb, csb)
                cbest = jnp.where(len0_seed, IN_SEED, cbest)

            col0_sb = csb

            # ---- end-of-fragment tracking for column 0 ------------------
            sr = _score_at_row(cvp, cvn, csb, end_row_mask)
            upd = _at_end & slot_active
            best_sc = jnp.where(upd, sr, BIG)          # level-local minima
            best_cl = jnp.zeros((F, B), jnp.int32)

            # ---- columns 1..31 ------------------------------------------
            wvp, wvn, wsb = cvp, cvn, csb
            hp_acc = jnp.zeros((F, B), jnp.uint32)
            hn_acc = jnp.zeros((F, B), jnp.uint32)
            evp_c = jnp.where(slot_len <= 1, wvp, jnp.uint32(0))
            evn_c = jnp.where(slot_len <= 1, wvn, jnp.uint32(0))
            esb_c = jnp.where(slot_len <= 1, wsb, BIG)

            for c in range(1, W):
                eqc = eq_of_col(_req_s, c)
                if _prev_exists:
                    hin = (((_prev_hp >> jnp.uint32(c)) & 1).astype(jnp.int32)
                           - ((_prev_hn >> jnp.uint32(c)) & 1).astype(
                               jnp.int32))
                else:
                    hin = jnp.int32(1)
                wvp, wvn, wsb, hout = advance_word(wvp, wvn, wsb, eqc, hin)
                hp_acc |= (hout > 0).astype(jnp.uint32) << jnp.uint32(c)
                hn_acc |= (hout < 0).astype(jnp.uint32) << jnp.uint32(c)
                if full_start:
                    # free start directly into THIS column at any row: the
                    # boundary column is logically adjacent to every column
                    bs_vp, bs_vn, bs_sb = source_word(
                        seed_base.astype(jnp.int32) + W * _s)
                    fin = jnp.int32(0 if _s == 0 else 1)
                    fvp, fvn, fsb, _ = advance_word(
                        bs_vp[:, None], bs_vn[:, None], bs_sb[:, None],
                        eqc, fin)
                    fvalid = slot_active & (c < slot_len)
                    fvp, fvn, fsb = sanitize(fvp, fvn, fsb, fvalid)
                    wvp, wvn, wsb = merge_words(wvp, wvn, wsb,
                                                fvp, fvn, fsb)
                in_node = c < slot_len
                sr = _score_at_row(wvp, wvn, wsb, end_row_mask)
                upd = _at_end & in_node & (sr < best_sc)
                best_sc = jnp.where(upd, sr, best_sc)
                best_cl = jnp.where(upd, c, best_cl)
                cap = (c == slot_len - 1)
                evp_c = jnp.where(cap, wvp, evp_c)
                evn_c = jnp.where(cap, wvn, evn_c)
                esb_c = jnp.where(cap, wsb, esb_c)

            esb_c = jnp.where(slot_active | (is_seed & (slot_len == 0)),
                              esb_c, BIG)

            # ---- masked commit of this level's slots --------------------
            evp_all = jnp.where(lvl, evp_c, evp_all)
            evn_all = jnp.where(lvl, evn_c, evn_all)
            esb_all = jnp.where(lvl, esb_c, esb_all)
            new_ssb = jnp.where(lvl, col0_sb, new_ssb)
            new_hp = jnp.where(lvl, hp_acc, new_hp)
            new_hn = jnp.where(lvl, hn_acc, new_hn)
            improved = lvl & (best_sc < new_end_score)
            new_end_score = jnp.where(improved, best_sc, new_end_score)
            new_end_col = jnp.where(improved, best_cl, new_end_col)
            best_in_s = jnp.where(lvl, cbest, best_in_s)

            return (evp_all, evn_all, esb_all, new_ssb, new_hp, new_hn,
                    new_end_score, new_end_col, best_in_s)

        carry = (state["evp"], state["evn"], state["esb"],
                 jnp.full((F, B), BIG, jnp.int32),
                 jnp.zeros((F, B), jnp.uint32),
                 jnp.zeros((F, B), jnp.uint32),
                 state["end_score"], state["end_col"],
                 jnp.full((F, B), IN_NONE, jnp.int32))
        carry = jax.lax.fori_loop(0, n_levels, level_body, carry)
        (evp_all, evn_all, esb_all, new_ssb, new_hp, new_hn,
         new_end_score, new_end_col, best_in_s) = carry
        state["evp"], state["evn"], state["esb"] = evp_all, evn_all, esb_all
        state["ssb"], state["hp"], state["hn"] = new_ssb, new_hp, new_hn
        state["end_score"] = new_end_score
        state["end_col"] = new_end_col
        state["best_in"] = state["best_in"].at[:, :, s].set(
            best_in_s.astype(ptr_dtype))
        if want_xcells:
            # best X-score cell over this slice's end-of-node words:
            # X(row) = rows_aligned - 5*edits = (s*W + row + 1) - 5*S(row)
            # (reference per-cell X endpoint scan,
            # src/GraphAlignerBitvectorCommon.h:321-383).  Rows past the
            # fragment end and pad slots are masked.
            srow = myers.word_scores(evp_all, evn_all, esb_all)  # (F,B,32)
            riota = jnp.arange(W, dtype=jnp.int32)               # (32,)
            grow = s * W + riota                                 # (32,)
            xs = (grow + 1)[None, None, :] - 5 * srow            # (F,B,32)
            ok = (slot_active & (esb_all < BIG))[..., None] \
                & (grow[None, None, :] < frag_len[:, None, None])
            xs = jnp.where(ok, xs, jnp.int32(-BIG))
            xf = xs.reshape(F, -1)                               # (F,B*32)
            arg = jnp.argmax(xf, axis=1).astype(jnp.int32)
            val = jnp.max(xf, axis=1)
            better = val > state["xbest"]
            state["xbest"] = jnp.where(better, val, state["xbest"])
            state["xslot"] = jnp.where(better, arg // W, state["xslot"])
            state["xrow"] = jnp.where(better, s * W + arg % W,
                                      state["xrow"])

    end_score = state["end_score"]
    best_slot = jnp.argmin(end_score, axis=1).astype(jnp.int32)
    best_score = jnp.min(end_score, axis=1)
    best_col = jnp.take_along_axis(state["end_col"], best_slot[:, None],
                                   1)[:, 0]
    return FragResult(best_score=best_score, best_slot=best_slot,
                      best_col=best_col, best_in=state["best_in"],
                      end_score=end_score, end_col=state["end_col"],
                      out_ssb=state["ssb"], out_hp=state["hp"],
                      out_hn=state["hn"],
                      xbest=state["xbest"] if want_xcells else None,
                      xslot=state["xslot"] if want_xcells else None,
                      xrow=state["xrow"] if want_xcells else None)


# ---------------------------------------------------------------------------
# Packed-transfer front-end.  The tunneled TPU is host<->device
# bandwidth-bound, so the hot CLC path ships its per-batch index arrays
# compressed and decodes them on device (fused by XLA):
#   band nodes  -> per-fragment int32 base + int16 deltas
#   in-edges    -> 4 nibbles per slot in one uint16 (sentinel = own slot)
#   read planes -> 2-bit base codes, 16 rows per uint32
# align_fragments_packed(...) == align_fragments(...) bit-for-bit; hosts
# fall back to the unpacked call when a batch doesn't fit the format
# (B > 16, non-ACGT reads, wide node-id spans — see anchors.run_fragments).

BN_PAD = -32768      # int16 delta sentinel for empty band slots


def _even16(x):
    """Gather the even bits of a uint32 into bits 0..15."""
    x = x & jnp.uint32(0x55555555)
    x = (x | (x >> 1)) & jnp.uint32(0x33333333)
    x = (x | (x >> 2)) & jnp.uint32(0x0F0F0F0F)
    x = (x | (x >> 4)) & jnp.uint32(0x00FF00FF)
    return (x | (x >> 8)) & jnp.uint32(0x0000FFFF)


def expand_req2(req2: jax.Array) -> jax.Array:
    """(F, S, 2) uint32 packed 2-bit base codes -> (F, S, 4) uint32 row
    match planes (bit i of plane b = code of row 32s+i equals b)."""
    planes = []
    w0, w1 = req2[..., 0], req2[..., 1]
    for b in range(4):
        rep = jnp.uint32(b * 0x55555555)

        def eqbits(w, rep=rep):
            eq = ~(w ^ rep)
            return _even16(eq & (eq >> 1) & jnp.uint32(0x55555555))
        planes.append(eqbits(w0) | (eqbits(w1) << 16))
    return jnp.stack(planes, axis=-1)


@partial(jax.jit, static_argnames=("n_slices", "max_in", "n_levels",
                                   "want_xcells"))
def align_fragments_packed(node_eq: jax.Array, node_len: jax.Array,
                           bn_base: jax.Array, bn_d16: jax.Array,
                           bi_p16: jax.Array, seed_shift: jax.Array,
                           req2: jax.Array, frag_len: jax.Array,
                           n_slices: int, max_in: int,
                           band_level: jax.Array, n_levels: int,
                           seed_base: jax.Array | None = None,
                           carry_in: tuple | None = None,
                           want_xcells: bool = False) -> FragResult:
    """align_fragments on wire-packed inputs.

    bn_base: (F,) int32 slot-0 node id; bn_d16: (F, B) int16 deltas
    (BN_PAD = empty slot); bi_p16: (F, B) uint16, 4 in-edge nibbles per
    slot with `own slot index` as the none-sentinel (requires B <= 16,
    max_in <= 4); req2: (F, S, 2) uint32 2-bit read codes."""
    F, B = bn_d16.shape
    band_nodes = jnp.where(bn_d16 == BN_PAD, jnp.int32(-1),
                           bn_base[:, None] + bn_d16.astype(jnp.int32))
    arangeB = jnp.arange(B, dtype=jnp.int32)[None, :]
    ins = []
    for e in range(max_in):
        u = ((bi_p16.astype(jnp.int32) >> (4 * e)) & 0xF)
        ins.append(jnp.where(u == arangeB, jnp.int32(-1), u))
    band_in = jnp.stack(ins, axis=-1)
    req = expand_req2(req2)
    return align_fragments(node_eq, node_len, band_nodes, band_in,
                           seed_shift.astype(jnp.int32), req,
                           frag_len.astype(jnp.int32), n_slices, max_in,
                           seed_base=seed_base, band_level=band_level,
                           n_levels=n_levels, carry_in=carry_in,
                           want_xcells=want_xcells)


def _bytes_to_words(b: jax.Array) -> jax.Array:
    """(..., 4k) uint8 -> (..., k) int32 little-endian words."""
    x = b.astype(jnp.uint32).reshape(*b.shape[:-1], -1, 4)
    w = (x[..., 0] | (x[..., 1] << 8) | (x[..., 2] << 16)
         | (x[..., 3] << 24))
    return jax.lax.bitcast_convert_type(w, jnp.int32)


@partial(jax.jit,
         static_argnames=("n_slices", "max_in", "n_levels", "want_state",
                          "want_xcells"))
def align_fragments_packed_out(node_eq: jax.Array, node_len: jax.Array,
                               bn_base: jax.Array, bn_d16: jax.Array,
                               bi_p16: jax.Array, seed_shift: jax.Array,
                               req2: jax.Array, frag_len: jax.Array,
                               n_slices: int, max_in: int,
                               band_level: jax.Array, n_levels: int,
                               seed_base: jax.Array | None = None,
                               carry_in: tuple | None = None,
                               want_state: bool = False,
                               want_xcells: bool = False) -> jax.Array:
    """align_fragments_packed with the results packed into ONE int32
    array (one download round trip): per fragment
      word 0:            best_score
      word 1:            best_slot | best_col << 8
      words 2..2+BS/4:   best_in bytes (B*S int8, 4 per word)
      then, if want_state, B words each of out_ssb / out_hp / out_hn,
      then, if want_xcells, xbest, xslot | xrow << 8.
    Requires B*S % 4 == 0 (bands are bucketed to multiples of 8)."""
    res = align_fragments_packed(node_eq, node_len, bn_base, bn_d16,
                                 bi_p16, seed_shift, req2, frag_len,
                                 n_slices, max_in, band_level, n_levels,
                                 seed_base=seed_base, carry_in=carry_in,
                                 want_xcells=want_xcells)
    F, B = bn_d16.shape
    S = n_slices
    assert (B * S) % 4 == 0
    slotcol = res.best_slot | (res.best_col << 8)
    parts = [res.best_score[:, None], slotcol[:, None],
             _bytes_to_words(jax.lax.bitcast_convert_type(
                 res.best_in, jnp.uint8).reshape(F, B * S))]
    if want_state:
        parts += [res.out_ssb,
                  jax.lax.bitcast_convert_type(res.out_hp, jnp.int32),
                  jax.lax.bitcast_convert_type(res.out_hn, jnp.int32)]
    if want_xcells:
        parts += [res.xbest[:, None],
                  (res.xslot | (res.xrow << 8))[:, None]]
    return jnp.concatenate(parts, axis=1)


# ---------------------------------------------------------------------------
# Lane-major core (fragments on the 128 VPU lanes, band slots on
# sublanes).  The (F, B) layout above leaves B = 8..16 of 128 lanes
# active; this core is the transposed re-design (same math, verified
# bit-identical in tests/test_frag_align.py) used by the packed CLC
# path, and is structured to lower under Pallas/Mosaic: 2-D
# (sublane, lane) arrays only, select-loops instead of gathers, and
# merges via progressive row-expansion + one repack.

_ROWS32 = np.arange(W, dtype=np.uint32)
_ABOVE32 = np.where(_ROWS32 < W - 1,
                    np.uint32(0xFFFFFFFF) << (_ROWS32 + 1),
                    np.uint32(0)).astype(np.uint32)


class _MergeAcc:
    """Progressive elementwise-min of candidate Myers words, kept as 33
    expanded row-score planes (boundary + 32 rows) of shape (B, F);
    repacked to (vp, vn, sb) once after the last candidate."""

    def __init__(self, shape):
        self.before = jnp.full(shape, BIG, jnp.int32)
        self.rows = [jnp.full(shape, BIG, jnp.int32) for _ in range(W)]

    def add(self, vp, vn, sb):
        pc = jax.lax.population_count
        self.before = jnp.minimum(
            self.before, sb - pc(vp).astype(jnp.int32)
            + pc(vn).astype(jnp.int32))
        for r in range(W):
            m = jnp.uint32(_ABOVE32[r])
            s = (sb - pc(vp & m).astype(jnp.int32)
                 + pc(vn & m).astype(jnp.int32))
            self.rows[r] = jnp.minimum(self.rows[r], s)

    def add_vertical(self, prev_ssb, valid):
        """source_word(prev_ssb) expands in closed form:
        S(r) = prev_ssb + r + 1."""
        s0 = jnp.where(valid, prev_ssb, BIG)
        self.before = jnp.minimum(self.before, s0)
        for r in range(W):
            self.rows[r] = jnp.minimum(self.rows[r], s0 + (r + 1))

    def bottom(self):
        return self.rows[W - 1]

    def pack(self):
        vp = jnp.zeros(self.before.shape, jnp.uint32)
        vn = jnp.zeros(self.before.shape, jnp.uint32)
        prev = self.before
        for r in range(W):
            d = self.rows[r] - prev
            vp = vp | ((d == 1).astype(jnp.uint32) << np.uint32(r))
            vn = vn | ((d == -1).astype(jnp.uint32) << np.uint32(r))
            prev = self.rows[r]
        return vp, vn, prev


def _frag_core_t(slot_eq_t, slot_len_t, band_in_t, band_level_t, req_t,
                 frag_len, seed_base, *, S: int, max_in: int,
                 n_levels: int, carried: bool,
                 carry=None, want_state: bool,
                 want_xcells: bool = False):
    """Lane-major fragment DP.  All arrays are (…, F) with F on lanes:

    slot_eq_t:   (4, B, F) uint32 seed-shifted Eq bitplanes per slot
    slot_len_t:  (B, F) int32 effective slot lengths (post seed trim)
    band_in_t:   (max_in, B, F) int32 in-edge slot ids (-1 none)
    band_level_t:(B, F) int32 topo level per slot (-1 pad)
    req_t:       (S, 4, F) uint32 read row planes per slice
    frag_len:    (1, F) int32;  seed_base: (1, F) int32
    carry:       optional (ssb, hp, hn) each (B, F)

    Returns (best_score (1,F), best_slot (1,F), best_col (1,F),
    best_in (S, B, F) int32, [ssb, hp, hn (B, F) when want_state],
    [xbest, xslot, xrow (1, F) when want_xcells — the same cell-precise
    X-score tracking as align_fragments' want_xcells, bit-identical
    including the (slice, slot, row) lexicographic tie-break]).
    """
    _, B, F = slot_eq_t.shape
    pc = jax.lax.population_count
    slot_active = slot_len_t > 0
    is_seed = np.arange(B)[:, None] == 0          # (B,1) static
    end_slice = (frag_len - 1) // W               # (1,F)
    er = ((frag_len - 1) % W).astype(jnp.uint32)
    end_row_mask = jnp.where(er < W - 1,
                             jnp.uint32(0xFFFFFFFF) << (er + 1),
                             jnp.uint32(0))       # (1,F)

    b0_vp, b0_vn, b0_sb = source_word(seed_base.astype(jnp.int32))

    evp = jnp.zeros((B, F), jnp.uint32)
    evn = jnp.zeros((B, F), jnp.uint32)
    esb = jnp.full((B, F), BIG, jnp.int32)
    ssb = (carry[0].astype(jnp.int32) if carried
           else jnp.full((B, F), BIG, jnp.int32))
    hp = carry[1].astype(jnp.uint32) if carried \
        else jnp.zeros((B, F), jnp.uint32)
    hn = carry[2].astype(jnp.uint32) if carried \
        else jnp.zeros((B, F), jnp.uint32)
    end_score = jnp.full((B, F), BIG, jnp.int32)
    end_col = jnp.zeros((B, F), jnp.int32)
    best_in_slices = []
    xbest = jnp.full((1, F), -BIG, jnp.int32)
    xslot = jnp.zeros((1, F), jnp.int32)
    xrow = jnp.zeros((1, F), jnp.int32)

    def eq_col(req_s, c):
        bits = (slot_eq_t >> jnp.uint32(c)) & jnp.uint32(1)   # (4,B,F)
        return (req_s[0][None] * bits[0] | req_s[1][None] * bits[1]
                | req_s[2][None] * bits[2] | req_s[3][None] * bits[3])

    for s in range(S):
        req_s = [req_t[s, b] for b in range(4)]   # 4 x (F,)
        prev_ssb, prev_hp, prev_hn = ssb, hp, hn
        prev_exists = (s > 0) or carried
        at_end = end_slice == s                   # (1,F)

        def level_body(l, cy, _req_s=req_s, _prev=(prev_ssb, prev_hp,
                                                   prev_hn),
                       _prev_exists=prev_exists, _at_end=at_end):
            (evp_a, evn_a, esb_a, n_ssb, n_hp, n_hn, n_esc, n_ecl,
             bin_s) = cy
            _prev_ssb, _prev_hp, _prev_hn = _prev
            lvl = band_level_t == l               # (B,F)
            eq0 = eq_col(_req_s, 0)               # (B,F)

            acc = _MergeAcc((B, F))
            cbest = jnp.full((B, F), IN_NONE, jnp.int32)
            csb_run = jnp.full((B, F), BIG, jnp.int32)

            if not _prev_exists:
                seed_valid = jnp.broadcast_to(is_seed, (B, F))
                avp, avn, asb, _ = advance_word(
                    jnp.broadcast_to(b0_vp, (B, F)),
                    jnp.broadcast_to(b0_vn, (B, F)),
                    jnp.broadcast_to(b0_sb, (B, F)), eq0, jnp.int32(1))
                avp = jnp.where(seed_valid, avp, jnp.uint32(0xFFFFFFFF))
                avn = jnp.where(seed_valid, avn, jnp.uint32(0))
                asb = jnp.where(seed_valid, asb, BIG)
                acc.add(avp, avn, asb)
                better = asb < csb_run
                csb_run = jnp.minimum(csb_run, asb)
                cbest = jnp.where(seed_valid & better, IN_SEED, cbest)

            if _prev_exists:
                valid = slot_active & (_prev_ssb < BIG)
                acc.add_vertical(_prev_ssb, valid)
                vsb = jnp.where(valid, _prev_ssb + W, BIG)
                better = vsb < csb_run
                csb_run = jnp.minimum(csb_run, vsb)
                cbest = jnp.where(valid & better, IN_VERT, cbest)

            for e in range(max_in):
                u = band_in_t[e]                  # (B,F)
                valid = (u >= 0) & slot_active
                uvp = jnp.zeros((B, F), jnp.uint32)
                uvn = jnp.zeros((B, F), jnp.uint32)
                usb = jnp.full((B, F), BIG, jnp.int32)
                for k in range(B):
                    m = u == k
                    uvp = jnp.where(m, evp_a[k][None], uvp)
                    uvn = jnp.where(m, evn_a[k][None], uvn)
                    usb = jnp.where(m, esb_a[k][None], usb)
                valid &= usb < BIG
                if _prev_exists:
                    ubs = (usb - pc(uvp).astype(jnp.int32)
                           + pc(uvn).astype(jnp.int32))
                    hin = jnp.clip(_prev_ssb - ubs, -1, 1)
                    hin = jnp.where(_prev_ssb >= BIG, jnp.int32(1), hin)
                else:
                    hin = jnp.int32(1)
                avp, avn, asb, _ = advance_word(uvp, uvn, usb, eq0, hin)
                avp = jnp.where(valid, avp, jnp.uint32(0xFFFFFFFF))
                avn = jnp.where(valid, avn, jnp.uint32(0))
                asb = jnp.where(valid, asb, BIG)
                acc.add(avp, avn, asb)
                better = asb < csb_run
                csb_run = jnp.minimum(csb_run, asb)
                cbest = jnp.where(valid & better, u, cbest)

            cvp, cvn, csb = acc.pack()

            if not _prev_exists:
                len0 = is_seed & (slot_len_t == 0)
                cvp = jnp.where(len0, jnp.broadcast_to(b0_vp, (B, F)),
                                cvp)
                cvn = jnp.where(len0, jnp.broadcast_to(b0_vn, (B, F)),
                                cvn)
                csb = jnp.where(len0, jnp.broadcast_to(b0_sb, (B, F)),
                                csb)
                cbest = jnp.where(len0, IN_SEED, cbest)

            col0_sb = csb

            sr = (csb - pc(cvp & end_row_mask).astype(jnp.int32)
                  + pc(cvn & end_row_mask).astype(jnp.int32))
            upd = _at_end & slot_active
            best_sc = jnp.where(upd, sr, BIG)
            best_cl = jnp.zeros((B, F), jnp.int32)

            wvp, wvn, wsb = cvp, cvn, csb
            hp_acc = jnp.zeros((B, F), jnp.uint32)
            hn_acc = jnp.zeros((B, F), jnp.uint32)
            evp_c = jnp.where(slot_len_t <= 1, wvp, jnp.uint32(0))
            evn_c = jnp.where(slot_len_t <= 1, wvn, jnp.uint32(0))
            esb_c = jnp.where(slot_len_t <= 1, wsb, BIG)

            for c in range(1, W):
                eqc = eq_col(_req_s, c)
                if _prev_exists:
                    hin = (((_prev_hp >> jnp.uint32(c)) & 1)
                           .astype(jnp.int32)
                           - ((_prev_hn >> jnp.uint32(c)) & 1)
                           .astype(jnp.int32))
                else:
                    hin = jnp.int32(1)
                wvp, wvn, wsb, hout = advance_word(wvp, wvn, wsb, eqc,
                                                   hin)
                hp_acc |= (hout > 0).astype(jnp.uint32) << jnp.uint32(c)
                hn_acc |= (hout < 0).astype(jnp.uint32) << jnp.uint32(c)
                in_node = c < slot_len_t
                sr = (wsb - pc(wvp & end_row_mask).astype(jnp.int32)
                      + pc(wvn & end_row_mask).astype(jnp.int32))
                upd = _at_end & in_node & (sr < best_sc)
                best_sc = jnp.where(upd, sr, best_sc)
                best_cl = jnp.where(upd, c, best_cl)
                cap = c == slot_len_t - 1
                evp_c = jnp.where(cap, wvp, evp_c)
                evn_c = jnp.where(cap, wvn, evn_c)
                esb_c = jnp.where(cap, wsb, esb_c)

            esb_c = jnp.where(slot_active | (is_seed & (slot_len_t == 0)),
                              esb_c, BIG)

            evp_a = jnp.where(lvl, evp_c, evp_a)
            evn_a = jnp.where(lvl, evn_c, evn_a)
            esb_a = jnp.where(lvl, esb_c, esb_a)
            n_ssb = jnp.where(lvl, col0_sb, n_ssb)
            n_hp = jnp.where(lvl, hp_acc, n_hp)
            n_hn = jnp.where(lvl, hn_acc, n_hn)
            improved = lvl & (best_sc < n_esc)
            n_esc = jnp.where(improved, best_sc, n_esc)
            n_ecl = jnp.where(improved, best_cl, n_ecl)
            bin_s = jnp.where(lvl, cbest, bin_s)
            return (evp_a, evn_a, esb_a, n_ssb, n_hp, n_hn, n_esc,
                    n_ecl, bin_s)

        cy = (evp, evn, esb,
              jnp.full((B, F), BIG, jnp.int32),
              jnp.zeros((B, F), jnp.uint32),
              jnp.zeros((B, F), jnp.uint32),
              end_score, end_col,
              jnp.full((B, F), IN_NONE, jnp.int32))
        cy = jax.lax.fori_loop(0, n_levels, level_body, cy)
        (evp, evn, esb, ssb, hp, hn, end_score, end_col, bin_s) = cy
        best_in_slices.append(bin_s)

        if want_xcells:
            # best X-score cell over this slice's end-of-node words:
            # X(row) = (s*W + row + 1) - 5*S(row) — same scan as the
            # F-major core (which see); the row loop then the slot
            # reduction preserve its (slice, slot, row) lexicographic
            # strict-greater tie-break exactly.
            ok0 = slot_active & (esb < BIG)       # (B,F)
            xv = jnp.full((B, F), -BIG, jnp.int32)
            xr = jnp.zeros((B, F), jnp.int32)
            for r in range(W):
                m = jnp.uint32(_ABOVE32[r])
                srow = (esb - pc(evp & m).astype(jnp.int32)
                        + pc(evn & m).astype(jnp.int32))
                grow = s * W + r
                x = jnp.where(ok0 & (grow < frag_len),
                              jnp.int32(grow + 1) - 5 * srow,
                              jnp.int32(-BIG))
                hit = x > xv
                xv = jnp.where(hit, x, xv)
                xr = jnp.where(hit, grow, xr)
            sv, sr_ = xv[0][None], xr[0][None]
            sb_slot = jnp.zeros((1, F), jnp.int32)
            for b in range(1, B):
                hit = xv[b][None] > sv
                sv = jnp.where(hit, xv[b][None], sv)
                sb_slot = jnp.where(hit, b, sb_slot)
                sr_ = jnp.where(hit, xr[b][None], sr_)
            hit = sv > xbest
            xbest = jnp.where(hit, sv, xbest)
            xslot = jnp.where(hit, sb_slot, xslot)
            xrow = jnp.where(hit, sr_, xrow)

    # reductions over B (sublanes)
    best_score = end_score[0][None]
    best_slot = jnp.zeros((1, F), jnp.int32)
    best_col = end_col[0][None]
    for b in range(1, B):
        better = end_score[b][None] < best_score
        best_score = jnp.where(better, end_score[b][None], best_score)
        best_slot = jnp.where(better, b, best_slot)
        best_col = jnp.where(better, end_col[b][None], best_col)
    best_in = jnp.stack(best_in_slices, axis=0)   # (S, B, F)
    out = [best_score, best_slot, best_col, best_in]
    if want_state:
        out += [ssb, hp, hn]
    if want_xcells:
        out += [xbest, xslot, xrow]
    return tuple(out)


_PALLAS_FRAG_OK = None


def pallas_frag_active() -> Optional[bool]:
    """Whether the Pallas fragment core Mosaic-compiled on this backend
    (None: probe never ran — no kernel call reached the gate)."""
    return _PALLAS_FRAG_OK


def _pallas_frag_ok() -> bool:
    """Probe once whether the Pallas fragment core (pallas_frag)
    Mosaic-compiles on the current default backend.  Disable with
    GRAPHCHAINER_NO_PALLAS=1."""
    global _PALLAS_FRAG_OK
    if _PALLAS_FRAG_OK is None:
        import os
        if os.environ.get("GRAPHCHAINER_NO_PALLAS"):
            _PALLAS_FRAG_OK = False
            return False
        try:
            import jax as _jax
            if _jax.default_backend() not in ("tpu",):
                _PALLAS_FRAG_OK = False
                return False
            from graphchainer_tpu.ops.pallas_frag import frag_core_pallas
            r = frag_core_pallas(
                jnp.zeros((4, 8, 128), jnp.uint32),
                jnp.ones((8, 128), jnp.int32),
                jnp.full((2, 8, 128), -1, jnp.int32),
                jnp.zeros((8, 128), jnp.int32),
                jnp.zeros((2, 4, 128), jnp.uint32),
                jnp.ones((1, 128), jnp.int32),
                jnp.zeros((1, 128), jnp.int32), S=2, max_in=2,
                n_levels=4)
            _jax.block_until_ready(r[0])
            _PALLAS_FRAG_OK = True
        except Exception as e:           # pragma: no cover - backend dep
            import sys
            print(f"pallas fragment core unavailable "
                  f"({type(e).__name__}); using the XLA core",
                  file=sys.stderr)
            _PALLAS_FRAG_OK = False
    return _PALLAS_FRAG_OK


@partial(jax.jit, static_argnames=("n_slices", "max_in", "n_levels",
                                   "want_state", "want_xcells"))
def align_fragments_tl(node_eq, node_len, band_nodes, band_in,
                       seed_shift, req, frag_len, n_slices: int,
                       max_in: int, seed_base=None, band_level=None,
                       n_levels: int = None, carry_in=None,
                       want_state: bool = False,
                       want_xcells: bool = False) -> FragResult:
    """align_fragments on the lane-major core: same (F-major) inputs and
    FragResult contract (minus end_score/end_col internals), for direct
    comparison and as the XLA fallback of the Pallas fragment kernel.
    Fresh full-size windows route to the Pallas VMEM kernel
    (ops/pallas_frag.py) when the backend's Mosaic lowering supports it
    (probe: _pallas_frag_ok)."""
    F, B = band_nodes.shape
    N2 = node_eq.shape[0]
    ids = band_nodes.astype(jnp.int32)
    idc = jnp.clip(ids, 0, N2 - 1)
    slot_eq = jnp.take(node_eq, idc, axis=0)             # (F,B,4)
    slot_len = jnp.where(ids >= 0, jnp.take(node_len, idc, axis=0), 0)
    if seed_shift.ndim == 2:
        shift = seed_shift.astype(jnp.int32)
    else:
        shift = jnp.where(jnp.arange(B)[None, :] == 0,
                          seed_shift[:, None], 0)
    slot_eq = slot_eq >> (shift.astype(jnp.uint32) & 31)[..., None]
    slot_len = slot_len - shift
    if seed_base is None:
        seed_base = jnp.zeros((F,), jnp.int32)
    if band_level is None:
        band_level = jnp.broadcast_to(
            jnp.arange(B, dtype=jnp.int32)[None, :], (F, B))
        n_levels = B
    carry_t = None
    if carry_in is not None:
        carry_t = tuple(jnp.transpose(c, (1, 0)) for c in carry_in)
    use_pallas = (carry_in is None and not want_state
                  and not want_xcells
                  and F % 128 == 0 and B % 8 == 0
                  and _pallas_frag_ok())
    if use_pallas:
        from graphchainer_tpu.ops.pallas_frag import frag_core_pallas
        out = frag_core_pallas(
            jnp.transpose(slot_eq, (2, 1, 0)).astype(jnp.uint32),
            jnp.transpose(slot_len, (1, 0)).astype(jnp.int32),
            jnp.transpose(band_in.astype(jnp.int32), (2, 1, 0)),
            jnp.transpose(band_level.astype(jnp.int32), (1, 0)),
            jnp.transpose(req, (1, 2, 0)).astype(jnp.uint32),
            frag_len.astype(jnp.int32)[None, :],
            seed_base.astype(jnp.int32)[None, :],
            S=n_slices, max_in=max_in, n_levels=n_levels)
    else:
        out = _frag_core_t(
            jnp.transpose(slot_eq, (2, 1, 0)).astype(jnp.uint32),
            jnp.transpose(slot_len, (1, 0)),
            jnp.transpose(band_in.astype(jnp.int32), (2, 1, 0)),
            jnp.transpose(band_level.astype(jnp.int32), (1, 0)),
            jnp.transpose(req, (1, 2, 0)).astype(jnp.uint32),
            frag_len.astype(jnp.int32)[None, :],
            seed_base.astype(jnp.int32)[None, :],
            S=n_slices, max_in=max_in, n_levels=n_levels,
            carried=carry_in is not None, carry=carry_t,
            want_state=want_state, want_xcells=want_xcells)
    best_score, best_slot, best_col, best_in = out[:4]
    res = dict(best_score=best_score[0], best_slot=best_slot[0],
               best_col=best_col[0],
               best_in=jnp.transpose(best_in, (2, 1, 0)).astype(
                   jnp.int8 if B <= 127 else jnp.int16),
               end_score=None, end_col=None)
    k = 4
    if want_state:
        res.update(out_ssb=jnp.transpose(out[k], (1, 0)),
                   out_hp=jnp.transpose(out[k + 1], (1, 0)),
                   out_hn=jnp.transpose(out[k + 2], (1, 0)))
        k += 3
    if want_xcells:
        res.update(xbest=out[k][0], xslot=out[k + 1][0],
                   xrow=out[k + 2][0])
    return FragResult(**res)


def _device_walk_mask(best_in, best_slot, frag_len):
    """On-device backwalk: follow best_in pointers from the best cell to
    the seed, returning (ok bool, visited-slot bitmask uint32) per
    fragment.  Every in-band move goes to a strictly earlier slot, so the
    visited SET reconstructs the walk ORDER (descending slot index) —
    the host only downloads one mask word instead of the (B, S) pointer
    matrix (native join_anchors_masked expands it)."""
    F, B, S = best_in.shape
    assert B <= 32, "walk masks are uint32 slot sets"
    arF = jnp.arange(F)
    s0 = jnp.maximum(frag_len.astype(jnp.int32) - 1, 0) // 32

    def body(_, st):
        slot, s, mask, ok, done = st
        e = best_in[arF, slot, jnp.maximum(s, 0)].astype(jnp.int32)
        is_seed = e == IN_SEED
        is_vert = e == IN_VERT
        fail = ((~is_seed) & (~is_vert) & (e < 0)) | (is_vert & (s <= 0))
        ok = ok | (is_seed & ~done)
        move = (~done) & (~is_seed) & (~is_vert) & (e >= 0)
        slot = jnp.where(move, e, slot)
        mask = mask | jnp.where(
            move, jnp.uint32(1) << slot.astype(jnp.uint32), jnp.uint32(0))
        s = jnp.where((~done) & is_vert, s - 1, s)
        done = done | is_seed | fail
        return slot, s, mask, ok, done

    init = (best_slot.astype(jnp.int32), s0,
            (jnp.uint32(1) << best_slot.astype(jnp.uint32)),
            jnp.zeros(F, bool), jnp.zeros(F, bool))
    _, _, mask, ok, _ = jax.lax.fori_loop(0, B + S + 4, body, init)
    return ok, mask


def _rev2(x):
    """Reverse a uint32 word at 2-bit granularity (16 codes)."""
    x = (x >> 16) | (x << 16)
    x = ((x & jnp.uint32(0xFF00FF00)) >> 8) | ((x & jnp.uint32(0x00FF00FF)) << 8)
    x = ((x & jnp.uint32(0xF0F0F0F0)) >> 4) | ((x & jnp.uint32(0x0F0F0F0F)) << 4)
    return ((x & jnp.uint32(0xCCCCCCCC)) >> 2) | ((x & jnp.uint32(0x33333333)) << 2)


def req2_from_table(read_tbl: jax.Array, rdc: jax.Array,
                    frag_len: jax.Array, n_slices: int) -> jax.Array:
    """Build the (F, S, 2) uint32 req2 wire words ON DEVICE from a
    per-batch read-code table instead of uploading them per fragment.

    read_tbl: (R, W16) uint32 — 16 2-bit base codes per word, LSB-first
              (polish.pack_codes2 layout == the req2 word layout)
    rdc:      (F,) int32 packed read coords: rid << 18 | start << 1 | rev
              (row r of fragment f reads read[rid][start ± r])
    frag_len: (F,) int32 — codes at rows >= frag_len are zeroed (matching
              the host packer's don't-care padding)

    Each 16-code output word is a funnel shift of two adjacent table
    words; backward fragments additionally reverse the word at 2-bit
    granularity.  Saves 8*S bytes/fragment of upload on the
    bandwidth-bound host<->device link (the host packer _try_pack_frag
    computes the identical words: align/anchors.py)."""
    rdc = rdc.astype(jnp.int32)
    rid = rdc >> 18
    start = (rdc >> 1) & 0x1FFFF
    rev = (rdc & 1) == 1
    F = rdc.shape[0]
    W16 = read_tbl.shape[1]
    g = jnp.arange(2 * n_slices, dtype=jnp.int32)[None, :]   # (1, 2S)
    # forward-space position of the LOWEST-address code in group g
    # (fwd: rows 16g..16g+15 at start+16g..; bwd: at start-16g..-16g-15)
    p0 = jnp.where(rev[:, None], start[:, None] - 16 * g - 15,
                   start[:, None] + 16 * g)                   # (F, 2S)
    wi = p0 >> 4                      # arithmetic shift floors negatives
    sh = ((p0 & 15) << 1).astype(jnp.uint32)
    flat = read_tbl.reshape(-1)
    base_i = rid[:, None] * W16
    lo_w = jnp.take(flat, base_i + jnp.clip(wi, 0, W16 - 1), axis=0)
    hi_w = jnp.take(flat, base_i + jnp.clip(wi + 1, 0, W16 - 1), axis=0)
    val = (lo_w >> sh) | jnp.where(sh == 0, jnp.uint32(0),
                                   hi_w << (jnp.uint32(32) - sh))
    val = jnp.where(rev[:, None], _rev2(val), val)
    # zero codes at rows >= frag_len (bit-identical to the host packer)
    nv = jnp.clip(frag_len.astype(jnp.int32)[:, None] - 16 * g, 0, 16)
    mask = jnp.where(nv >= 16, jnp.uint32(0xFFFFFFFF),
                     (jnp.uint32(1) << (2 * nv).astype(jnp.uint32))
                     - jnp.uint32(1))
    return (val & mask).reshape(F, n_slices, 2)


@partial(jax.jit,
         static_argnames=("n_slices", "max_in", "n_levels", "want_state"))
def align_fragments_packed_out_tl_walk(node_eq, node_len, bn_base, bn_d16,
                                       bi_p16, seed_shift, req2, frag_len,
                                       n_slices: int, max_in: int,
                                       band_level, n_levels: int,
                                       seed_base=None, carry_in=None,
                                       want_state: bool = False,
                                       band_idx=None) -> jax.Array:
    """align_fragments_packed_out_tl with the backwalk fused on device:
    the wire result per fragment is [score, slot | col<<8 | ok<<16,
    walk mask] (3 words) instead of [score, slotcol, (B*S)/4 pointer
    words].

    band_idx: optional (F,) int32 — bn_base/bn_d16/bi_p16/band_level are
    then DEDUPLICATED band tables gathered per fragment on device (the
    host uploads each distinct band once per batch).

    req2 may be a (read_tbl, rdc) tuple: the wire words are then built
    on device from the per-batch read-code table (req2_from_table)."""
    if band_idx is not None:
        bn_base = bn_base[band_idx]
        bn_d16 = bn_d16[band_idx]
        bi_p16 = bi_p16[band_idx]
        band_level = band_level[band_idx]
    if isinstance(req2, tuple):
        read_tbl, rdc = req2
        req2 = req2_from_table(read_tbl, rdc, frag_len, n_slices)
    F, B = bn_d16.shape
    band_nodes = jnp.where(bn_d16 == BN_PAD, jnp.int32(-1),
                           bn_base[:, None] + bn_d16.astype(jnp.int32))
    arangeB = jnp.arange(B, dtype=jnp.int32)[None, :]
    ins = []
    for e in range(max_in):
        u = ((bi_p16.astype(jnp.int32) >> (4 * e)) & 0xF)
        ins.append(jnp.where(u == arangeB, jnp.int32(-1), u))
    band_in = jnp.stack(ins, axis=-1)
    req = expand_req2(req2)
    res = align_fragments_tl(node_eq, node_len, band_nodes, band_in,
                             seed_shift.astype(jnp.int32), req,
                             frag_len.astype(jnp.int32), n_slices,
                             max_in, seed_base=seed_base,
                             band_level=band_level, n_levels=n_levels,
                             carry_in=carry_in, want_state=want_state)
    ok, mask = _device_walk_mask(res.best_in, res.best_slot,
                                 frag_len.astype(jnp.int32))
    slotcol = (res.best_slot | (res.best_col << 8)
               | (ok.astype(jnp.int32) << 16))
    parts = [res.best_score[:, None], slotcol[:, None],
             jax.lax.bitcast_convert_type(mask, jnp.int32)[:, None]]
    if want_state:
        parts += [res.out_ssb,
                  jax.lax.bitcast_convert_type(res.out_hp, jnp.int32),
                  jax.lax.bitcast_convert_type(res.out_hn, jnp.int32)]
    return jnp.concatenate(parts, axis=1)


@partial(jax.jit,
         static_argnames=("n_slices", "max_in", "n_levels", "want_state",
                          "want_xcells"))
def align_fragments_packed_out_tl(node_eq, node_len, bn_base, bn_d16,
                                  bi_p16, seed_shift, req2, frag_len,
                                  n_slices: int, max_in: int,
                                  band_level, n_levels: int,
                                  seed_base=None, carry_in=None,
                                  want_state: bool = False,
                                  want_xcells: bool = False) -> jax.Array:
    """align_fragments_packed_out on the lane-major core (same wire
    formats in and out; ~4x the device throughput of the F-major
    kernel)."""
    F, B = bn_d16.shape
    band_nodes = jnp.where(bn_d16 == BN_PAD, jnp.int32(-1),
                           bn_base[:, None] + bn_d16.astype(jnp.int32))
    arangeB = jnp.arange(B, dtype=jnp.int32)[None, :]
    ins = []
    for e in range(max_in):
        u = ((bi_p16.astype(jnp.int32) >> (4 * e)) & 0xF)
        ins.append(jnp.where(u == arangeB, jnp.int32(-1), u))
    band_in = jnp.stack(ins, axis=-1)
    req = expand_req2(req2)
    res = align_fragments_tl(node_eq, node_len, band_nodes, band_in,
                             seed_shift.astype(jnp.int32), req,
                             frag_len.astype(jnp.int32), n_slices,
                             max_in, seed_base=seed_base,
                             band_level=band_level, n_levels=n_levels,
                             carry_in=carry_in, want_state=want_state,
                             want_xcells=want_xcells)
    S = n_slices
    assert (B * S) % 4 == 0
    slotcol = res.best_slot | (res.best_col << 8)
    parts = [res.best_score[:, None], slotcol[:, None],
             _bytes_to_words(jax.lax.bitcast_convert_type(
                 res.best_in, jnp.uint8).reshape(F, B * S))]
    if want_state:
        parts += [res.out_ssb,
                  jax.lax.bitcast_convert_type(res.out_hp, jnp.int32),
                  jax.lax.bitcast_convert_type(res.out_hn, jnp.int32)]
    if want_xcells:
        parts += [res.xbest[:, None],
                  (res.xslot | (res.xrow << 8))[:, None]]
    return jnp.concatenate(parts, axis=1)
