"""Pallas TPU kernel for the banded fragment graph DP (lane-major).

Same math as frag_align._frag_core_t (which see): fragments ride the 128
VPU lanes, band slots ride sublanes, topo levels advance in a fori_loop
and the 32 read rows of each slice unroll as columns of the 32-bit Myers
word recurrence.  One grid step owns one 128-fragment block; every
intermediate — the per-slot end words, the level merge accumulator's 33
expanded row planes, the vertical carry — stays in VMEM for the whole
slice loop instead of round-tripping through HBM between XLA fusions.

Mosaic constraints honored (the same playbook as pallas_polish2):
  * no vector gathers — in-edge candidate words come from `u == k`
    masked selects over statically-indexed slot rows;
  * (sublane, lane) = (band slot, fragment) 2-D tiles only; per-fragment
    scalars are (1, 128) lane vectors;
  * static unrolls over slices, in-edges and word rows; topo levels are
    the only lax loop.

Production use is gated by frag_align._pallas_frag_ok (Mosaic compile
probe); the XLA core stays as the fallback.  Verified bit-identical to
the XLA core in tests/test_pallas_frag.py (interpret mode on CPU).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graphchainer_tpu.ops.myers import advance_word, source_word

W = 32
LANES = 128
BIG = np.int32(1 << 28)
IN_NONE = -1
IN_SEED = -2
IN_VERT = -3

_ROWS32 = np.arange(W, dtype=np.uint32)
_ABOVE32 = np.where(_ROWS32 < W - 1,
                    np.uint32(0xFFFFFFFF) << (_ROWS32 + 1),
                    np.uint32(0)).astype(np.uint32)


def _kernel(slot_eq_ref, slot_len_ref, band_in_ref, band_level_ref,
            req_ref, frag_len_ref, seed_base_ref,
            bs_ref, bslot_ref, bcol_ref, bin_ref,
            *, B: int, S: int, max_in: int, n_levels: int):
    pc = jax.lax.population_count
    F = LANES
    slot_len_t = slot_len_ref[...]                     # (B,F)
    slot_active = slot_len_t > 0
    is_seed = jax.lax.broadcasted_iota(jnp.int32, (B, F), 0) == 0
    frag_len = frag_len_ref[...]                       # (1,F)
    seed_base = seed_base_ref[...]
    end_slice = (frag_len - 1) // W
    er = ((frag_len - 1) % W).astype(jnp.uint32)
    end_row_mask = jnp.where(er < W - 1,
                             jnp.uint32(0xFFFFFFFF) << (er + 1),
                             jnp.uint32(0))

    b0_vp, b0_vn, b0_sb = source_word(seed_base.astype(jnp.int32))

    evp = jnp.zeros((B, F), jnp.uint32)
    evn = jnp.zeros((B, F), jnp.uint32)
    esb = jnp.full((B, F), BIG, jnp.int32)
    ssb = jnp.full((B, F), BIG, jnp.int32)
    hp = jnp.zeros((B, F), jnp.uint32)
    hn = jnp.zeros((B, F), jnp.uint32)
    end_score = jnp.full((B, F), BIG, jnp.int32)
    end_col = jnp.zeros((B, F), jnp.int32)

    band_level_t = band_level_ref[...]                 # (B,F)

    def eq_col(req_s, c):
        out = jnp.zeros((B, F), jnp.uint32)
        for b in range(4):
            bits = ((slot_eq_ref[b] >> jnp.uint32(c))
                    & jnp.uint32(1))                   # (B,F)
            out = out | (req_s[b] * bits)
        return out

    for s in range(S):
        req_s = [req_ref[s, b][None, :] for b in range(4)]   # (1,F) each
        prev_ssb, prev_hp, prev_hn = ssb, hp, hn
        prev_exists = s > 0
        at_end = end_slice == s

        def level_body(l, cy, _req_s=req_s,
                       _prev=(prev_ssb, prev_hp, prev_hn),
                       _prev_exists=prev_exists, _at_end=at_end):
            (evp_a, evn_a, esb_a, n_ssb, n_hp, n_hn, n_esc, n_ecl,
             bin_s) = cy
            _prev_ssb, _prev_hp, _prev_hn = _prev
            lvl = band_level_t == l
            eq0 = eq_col(_req_s, 0)

            # progressive merge accumulator (33 expanded row planes)
            acc_before = jnp.full((B, F), BIG, jnp.int32)
            acc_rows = [jnp.full((B, F), BIG, jnp.int32)
                        for _ in range(W)]

            def acc_add(vp, vn, sb):
                nonlocal acc_before, acc_rows
                acc_before = jnp.minimum(
                    acc_before, sb - pc(vp).astype(jnp.int32)
                    + pc(vn).astype(jnp.int32))
                for r in range(W):
                    m = jnp.uint32(_ABOVE32[r])
                    sc = (sb - pc(vp & m).astype(jnp.int32)
                          + pc(vn & m).astype(jnp.int32))
                    acc_rows[r] = jnp.minimum(acc_rows[r], sc)

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
                acc_add(avp, avn, asb)
                better = asb < csb_run
                csb_run = jnp.minimum(csb_run, asb)
                cbest = jnp.where(seed_valid & better, IN_SEED, cbest)

            if _prev_exists:
                valid = slot_active & (_prev_ssb < BIG)
                s0 = jnp.where(valid, _prev_ssb, BIG)
                acc_before_v = s0
                acc_before = jnp.minimum(acc_before, acc_before_v)
                for r in range(W):
                    acc_rows[r] = jnp.minimum(acc_rows[r], s0 + (r + 1))
                vsb = jnp.where(valid, _prev_ssb + W, BIG)
                better = vsb < csb_run
                csb_run = jnp.minimum(csb_run, vsb)
                cbest = jnp.where(valid & better, IN_VERT, cbest)

            for e in range(max_in):
                u = band_in_ref[e]                     # (B,F)
                valid = (u >= 0) & slot_active
                uvp = jnp.zeros((B, F), jnp.uint32)
                uvn = jnp.zeros((B, F), jnp.uint32)
                usb = jnp.full((B, F), BIG, jnp.int32)
                for k in range(B):
                    m = u == k
                    uvp = jnp.where(m, evp_a[k:k + 1], uvp)
                    uvn = jnp.where(m, evn_a[k:k + 1], uvn)
                    usb = jnp.where(m, esb_a[k:k + 1], usb)
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
                acc_add(avp, avn, asb)
                better = asb < csb_run
                csb_run = jnp.minimum(csb_run, asb)
                cbest = jnp.where(valid & better, u, cbest)

            # pack the accumulator back to a Myers word
            cvp = jnp.zeros((B, F), jnp.uint32)
            cvn = jnp.zeros((B, F), jnp.uint32)
            prev = acc_before
            for r in range(W):
                d = acc_rows[r] - prev
                cvp = cvp | ((d == 1).astype(jnp.uint32)
                             << np.uint32(r))
                cvn = cvn | ((d == -1).astype(jnp.uint32)
                             << np.uint32(r))
                prev = acc_rows[r]
            csb = acc_rows[W - 1]

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
        bin_ref[s] = bin_s

    # reductions over B (sublanes): best end cell
    best_score = end_score[0:1]
    best_slot = jnp.zeros((1, F), jnp.int32)
    best_col = end_col[0:1]
    for b in range(1, B):
        better = end_score[b:b + 1] < best_score
        best_score = jnp.where(better, end_score[b:b + 1], best_score)
        best_slot = jnp.where(better, b, best_slot)
        best_col = jnp.where(better, end_col[b:b + 1], best_col)
    bs_ref[...] = best_score
    bslot_ref[...] = best_slot
    bcol_ref[...] = best_col


@partial(jax.jit,
         static_argnames=("S", "max_in", "n_levels", "interpret"))
def frag_core_pallas(slot_eq_t, slot_len_t, band_in_t, band_level_t,
                     req_t, frag_len, seed_base, S: int, max_in: int,
                     n_levels: int, interpret: bool = False):
    """Pallas version of frag_align._frag_core_t (fresh windows only:
    no carry, no want_state).  Same transposed input/output contract:
    returns (best_score (1,F), best_slot (1,F), best_col (1,F),
    best_in (S, B, F) int32).  F must be a multiple of 128."""
    _, B, F = slot_eq_t.shape
    assert F % LANES == 0, F
    grid = (F // LANES,)
    out_shapes = (
        jax.ShapeDtypeStruct((1, F), jnp.int32),
        jax.ShapeDtypeStruct((1, F), jnp.int32),
        jax.ShapeDtypeStruct((1, F), jnp.int32),
        jax.ShapeDtypeStruct((S, B, F), jnp.int32),
    )
    in_specs = [
        pl.BlockSpec((4, B, LANES), lambda r: (0, 0, r),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((B, LANES), lambda r: (0, r),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((max_in, B, LANES), lambda r: (0, 0, r),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((B, LANES), lambda r: (0, r),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((S, 4, LANES), lambda r: (0, 0, r),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, LANES), lambda r: (0, r),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, LANES), lambda r: (0, r),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = (
        pl.BlockSpec((1, LANES), lambda r: (0, r),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, LANES), lambda r: (0, r),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, LANES), lambda r: (0, r),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((S, B, LANES), lambda r: (0, 0, r),
                     memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        partial(_kernel, B=B, S=S, max_in=max_in, n_levels=n_levels),
        out_shape=out_shapes,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(slot_eq_t, slot_len_t.astype(jnp.int32),
      band_in_t.astype(jnp.int32), band_level_t.astype(jnp.int32),
      req_t.astype(jnp.uint32), frag_len.astype(jnp.int32),
      seed_base.astype(jnp.int32))
