"""Banded linear Myers alignment: read vs chain-path sequence (polish).

Replaces the reference's edlib NW call (src/Aligner.cpp:845-877) with a
TPU kernel pair:

  polish_align      — vertical 32-row Myers words over the read, scanned
                      across the path columns with a diagonal band of BW
                      words that slides down as columns advance.  The band
                      top per column is computed on device from
                      (read_len, path_len) (end-anchored linear ramp), so
                      per-batch host->device traffic is only the read
                      planes and path char masks.  Cells outside the band
                      are admissible overestimates (all-insertion boundary
                      words): scores are exact whenever the optimal
                      alignment stays inside the band.

  backtrace_device  — walks the DP backward over the dumped band words
                      entirely on device (the dump never leaves HBM),
                      emitting edit ops (0=match, 3=mismatch, 1=path
                      consumed/deletion, 2=read consumed/insertion).

Total host<->device traffic per batch: O(read bytes + path bytes).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from graphchainer_tpu.ops.myers import advance_word

W = 32
BIGS = np.int32(1 << 28)

OP_MATCH, OP_DEL, OP_INS, OP_MISMATCH, OP_NONE = 0, 1, 2, 3, 255


class PolishResult(NamedTuple):
    score: jax.Array     # (R,) int32 global NW edit distance
    dump_vp: jax.Array   # (R, P, BW) uint32 (device-resident)
    dump_vn: jax.Array   # (R, P, BW) uint32
    dump_sb: jax.Array   # (R, P) int32  bottom score of the lowest word
    dump_base: jax.Array  # (R, P) int32 band top word index per column


def _band_base(col, read_len, path_len, rw_cap, bw):
    """Band top word index at column `col` (end-anchored linear ramp)."""
    pl = jnp.maximum(path_len, 1)
    cc = jnp.minimum(col, pl - 1)
    target = (cc + 1).astype(jnp.float32) * (
        read_len.astype(jnp.float32) / pl.astype(jnp.float32))
    base = (target / W).astype(jnp.int32) - bw // 2
    ub = jnp.maximum(rw_cap - bw, 0)
    return jnp.clip(base, 0, ub)


@partial(jax.jit, static_argnames=("bw",))
def polish_align(read_planes, path_mm, read_len, path_len, bw: int):
    """Banded NW of read vs path for a batch.

    read_planes: (R, RW, 4) uint32  read row match planes per 32-row word
    path_mm:     (R, P) uint8       path char 4-bit match masks (0 pad)
    read_len:    (R,) int32
    path_len:    (R,) int32
    """
    R, RW, _ = read_planes.shape
    P = path_mm.shape[1]
    rw_cap = (read_len + W - 1) // W                     # words per read

    base0 = _band_base(jnp.zeros((R,), jnp.int32), read_len, path_len,
                       rw_cap, bw)
    vps = jnp.full((R, bw), jnp.uint32(0xFFFFFFFF))
    vns = jnp.zeros((R, bw), jnp.uint32)
    sbs = (base0[:, None] * W
           + (jnp.arange(1, bw + 1) * W)[None, :]).astype(jnp.int32)

    def col_step(carry, col):
        vps, vns, sbs, prev_base = carry
        pmm = jax.lax.dynamic_index_in_dim(path_mm, col, 1,
                                           keepdims=False)   # (R,)
        cur_base = jnp.maximum(
            _band_base(jnp.full((R,), col), read_len, path_len, rw_cap, bw),
            prev_base)
        shift = jnp.clip(cur_base - prev_base, 0, bw)        # (R,)

        idx = jnp.arange(bw)[None, :] + shift[:, None]       # (R, bw)
        in_range = idx < bw
        idxc = jnp.clip(idx, 0, bw - 1)
        bot_sb = sbs[:, -1]
        g_vp = jnp.take_along_axis(vps, idxc, 1)
        g_vn = jnp.take_along_axis(vns, idxc, 1)
        g_sb = jnp.take_along_axis(sbs, idxc, 1)
        ext = (idx - bw + 1).astype(jnp.int32) * W
        vps = jnp.where(in_range, g_vp, jnp.uint32(0xFFFFFFFF))
        vns = jnp.where(in_range, g_vn, jnp.uint32(0))
        sbs = jnp.where(in_range, g_sb, bot_sb[:, None] + ext)

        widx = jnp.clip(cur_base[:, None] + jnp.arange(bw)[None, :],
                        0, RW - 1)
        eq = jnp.zeros((R, bw), jnp.uint32)
        for b in range(4):
            plane = jnp.take_along_axis(read_planes[:, :, b], widx, 1)
            eq = eq | (plane * ((pmm.astype(jnp.uint32) >> b) & 1)[:, None])

        hin = jnp.ones((R,), jnp.int32)
        new_vps, new_vns, new_sbs = [], [], []
        for w in range(bw):
            nvp, nvn, nsb, hout = advance_word(
                vps[:, w], vns[:, w], sbs[:, w], eq[:, w], hin)
            new_vps.append(nvp)
            new_vns.append(nvn)
            new_sbs.append(nsb)
            hin = hout
        vps = jnp.stack(new_vps, 1)
        vns = jnp.stack(new_vns, 1)
        sbs = jnp.stack(new_sbs, 1)

        out = (vps, vns, sbs[:, -1].astype(jnp.int32), cur_base)
        return (vps, vns, sbs, cur_base), out

    cols = jnp.arange(P, dtype=jnp.int32)
    (_, _, _, _), (dump_vp, dump_vn, dump_sb, dump_base) = jax.lax.scan(
        col_step, (vps, vns, sbs, base0), cols, unroll=8)
    dump_vp = jnp.moveaxis(dump_vp, 0, 1)   # (R, P, bw)
    dump_vn = jnp.moveaxis(dump_vn, 0, 1)
    dump_sb = jnp.moveaxis(dump_sb, 0, 1)   # (R, P)
    dump_base = jnp.moveaxis(dump_base, 0, 1)

    # final score: row read_len-1 at column path_len-1
    last_col = jnp.clip(path_len - 1, 0, P - 1)
    lvp = jnp.take_along_axis(dump_vp, last_col[:, None, None], 1)[:, 0]
    lvn = jnp.take_along_axis(dump_vn, last_col[:, None, None], 1)[:, 0]
    lsb = jnp.take_along_axis(dump_sb, last_col[:, None], 1)[:, 0]
    lbase = jnp.take_along_axis(dump_base, last_col[:, None], 1)[:, 0]
    pc = jax.lax.population_count
    r = read_len - 1
    wofs = jnp.clip(r // W - lbase, 0, bw - 1)

    def body(k, acc):
        below = bw - 1 - k
        delta = (pc(lvp[:, below]).astype(jnp.int32)
                 - pc(lvn[:, below]).astype(jnp.int32))
        return acc - jnp.where(below > wofs, delta, 0)
    bot = jax.lax.fori_loop(0, bw, body, lsb)
    rr = (r % W).astype(jnp.uint32)
    above = jnp.where(rr < W - 1,
                      jnp.uint32(0xFFFFFFFF) << (rr + 1), jnp.uint32(0))
    sel_vp = jnp.take_along_axis(lvp, wofs[:, None], 1)[:, 0]
    sel_vn = jnp.take_along_axis(lvn, wofs[:, None], 1)[:, 0]
    score = (bot - pc(sel_vp & above).astype(jnp.int32)
             + pc(sel_vn & above).astype(jnp.int32))
    return PolishResult(score=score, dump_vp=dump_vp, dump_vn=dump_vn,
                        dump_sb=dump_sb, dump_base=dump_base)


# ---------------------------------------------------------------------------
# Transposed (lane-major) core.  The original polish_align keeps reads on
# the MAJOR axis, so every (R, bw) vector op occupies only bw = 8 of the
# VPU's 128 lanes (~6% lane utilisation; measured 0.17 s per 64x3000bp
# batch).  The core below keeps READS ON LANES: all state is (bw, R) with
# R padded to the 128-lane tile, every op fills the (8, 128) VPU tile, and
# the read-plane words needed per column come from a rolling prefetch
# window instead of per-step gathers.  The dump is emitted in (P, bw, R)
# layout with the FULL per-word bottom scores so the backtrace scores any
# cell in O(1) (no per-step word accumulation loop).

WIN_EXTRA = 8     # prefetch words below the band in the rolling window


def _gather_rows(tbl: jax.Array, idx: jax.Array) -> jax.Array:
    """tbl (N, R), idx (R,) per-lane row index -> (R,) tbl[idx[r], r].
    Expressed as a masked sublane reduction (VPU-friendly; no gather)."""
    n = tbl.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)[:, None]
    return jnp.sum(jnp.where(iota == idx[None, :], tbl, 0), axis=0,
                   dtype=tbl.dtype)


@partial(jax.jit, static_argnames=("bw",))
def _polish_core_t(planes_t, path_t, read_len, path_len, bw: int):
    """Banded NW, lane-major.

    planes_t:  (4, RW, R) uint32 read plane words, transposed
    path_t:    (P, R) uint32 path char masks, transposed
    Returns (dump_vp, dump_vn, dump_sb, dump_base):
      dump_vp/vn: (P, bw, R) uint32;  dump_sb: (P, bw, R) int32 per-WORD
      bottom scores;  dump_base: (P, R) int32.
    """
    _, RW, R = planes_t.shape
    P = path_t.shape[0]
    bwe = bw + WIN_EXTRA
    rw_cap = (read_len + W - 1) // W                     # (R,)
    ub = jnp.maximum(rw_cap - bw, 0)
    scale = (read_len.astype(jnp.float32)
             / jnp.maximum(path_len, 1).astype(jnp.float32))

    def band_base(col):
        cc = jnp.minimum(col, jnp.maximum(path_len, 1) - 1)
        target = (cc + 1).astype(jnp.float32) * scale
        return jnp.clip((target * (1.0 / W)).astype(jnp.int32) - bw // 2,
                        0, ub)

    def refill(base):
        """(4, bwe, R) plane window: word w = planes[b, base+w, lane]."""
        iota = jnp.arange(RW, dtype=jnp.int32)[None, :, None]    # (1,RW,1)
        idx = base[None, None, :] + jnp.arange(
            bwe, dtype=jnp.int32)[:, None, None]                 # (bwe,RW,R)
        # one masked reduction per window word, all 4 planes together
        m = iota == idx                                          # (bwe,RW,R)
        return jnp.sum(jnp.where(m[None], planes_t[:, None], 0),
                       axis=2, dtype=jnp.uint32)                 # (4,bwe,R)

    base0 = band_base(jnp.int32(0))
    iota_bw1 = jnp.arange(1, bw + 1, dtype=jnp.int32)[:, None]   # (bw,1)
    vps0 = jnp.full((bw, R), jnp.uint32(0xFFFFFFFF))
    vns0 = jnp.zeros((bw, R), jnp.uint32)
    sbs0 = base0[None, :] * W + iota_bw1 * W
    win0 = refill(base0)
    valid0 = jnp.full((R,), bwe, jnp.int32)

    ones_row = jnp.full((1, R), jnp.uint32(0xFFFFFFFF))
    zero_row = jnp.zeros((1, R), jnp.uint32)

    def col_step(carry, col):
        vps, vns, sbs, base, win, valid = carry
        pmm = jax.lax.dynamic_index_in_dim(path_t, col, 0,
                                           keepdims=False)       # (R,)
        nb = jnp.maximum(band_base(col), base)
        shift = jnp.clip(nb - base, 0, bw)                       # (R,)
        valid = valid - shift

        def roll1(a, fill_row):
            return jnp.concatenate([a[1:], fill_row], axis=0)

        bot_sb = sbs[-1]                                         # (R,)

        def fast(args):
            vps, vns, sbs, win, _ = args
            s1 = shift == 1
            vps = jnp.where(s1, roll1(vps, ones_row), vps)
            vns = jnp.where(s1, roll1(vns, zero_row), vns)
            sbs = jnp.where(s1, roll1(sbs, (bot_sb + W)[None]), sbs)
            win = jnp.where(s1, jnp.concatenate([win[:, 1:],
                                                 win[:, :1]], axis=1), win)
            return vps, vns, sbs, win, jnp.minimum(valid, bwe)

        def slow(args):
            vps, vns, sbs, win, _ = args
            for k in range(1, bw + 1):
                sel = shift == k
                if k < bw:
                    sh_vp = jnp.concatenate(
                        [vps[k:], jnp.broadcast_to(ones_row, (k, R))])
                    sh_vn = jnp.concatenate(
                        [vns[k:], jnp.broadcast_to(zero_row, (k, R))])
                    sh_sb = jnp.concatenate(
                        [sbs[k:], bot_sb[None] + iota_bw1[:k] * W])
                else:
                    sh_vp = jnp.broadcast_to(ones_row, (bw, R))
                    sh_vn = jnp.broadcast_to(zero_row, (bw, R))
                    sh_sb = bot_sb[None] + iota_bw1 * W
                vps = jnp.where(sel, sh_vp, vps)
                vns = jnp.where(sel, sh_vn, vns)
                sbs = jnp.where(sel, sh_sb, sbs)
            return (vps, vns, sbs, refill(nb),
                    jnp.full((R,), bwe, jnp.int32))

        need_slow = jnp.any(shift > 1) | jnp.any(valid < bw)
        vps, vns, sbs, win, valid = jax.lax.cond(
            need_slow, slow, fast, (vps, vns, sbs, win, valid))

        # Eq words from the window + this column's char mask
        b0 = (pmm & 1).astype(jnp.uint32)[None, :]
        b1 = ((pmm >> 1) & 1).astype(jnp.uint32)[None, :]
        b2 = ((pmm >> 2) & 1).astype(jnp.uint32)[None, :]
        b3 = ((pmm >> 3) & 1).astype(jnp.uint32)[None, :]
        eq = (win[0, :bw] * b0 | win[1, :bw] * b1
              | win[2, :bw] * b2 | win[3, :bw] * b3)             # (bw,R)

        hin = jnp.ones((R,), jnp.int32)
        nvps, nvns, nsbs = [], [], []
        for w in range(bw):
            nvp, nvn, nsb, hin = advance_word(vps[w], vns[w], sbs[w],
                                              eq[w], hin)
            nvps.append(nvp)
            nvns.append(nvn)
            nsbs.append(nsb)
        vps = jnp.stack(nvps)
        vns = jnp.stack(nvns)
        sbs = jnp.stack(nsbs)

        return ((vps, vns, sbs, nb, win, valid),
                (vps, vns, sbs.astype(jnp.int32), nb))

    cols = jnp.arange(P, dtype=jnp.int32)
    _, (dump_vp, dump_vn, dump_sb, dump_base) = jax.lax.scan(
        col_step, (vps0, vns0, sbs0, base0, win0, valid0), cols)
    return dump_vp, dump_vn, dump_sb, dump_base


def _score_from_dump_t(dump_vp, dump_vn, dump_sb, dump_base, read_len,
                       path_len, bw: int):
    """Final NW score per lane from the transposed dump."""
    P = dump_vp.shape[0]
    R = dump_vp.shape[2]
    pc = jax.lax.population_count
    last = jnp.clip(path_len - 1, 0, P - 1)                      # (R,)
    r = read_len - 1
    lbase = _gather_rows(dump_base, last)
    wofs = jnp.clip(r // W - lbase, 0, bw - 1)
    rr = (r % W).astype(jnp.uint32)
    above = jnp.where(rr < W - 1,
                      jnp.uint32(0xFFFFFFFF) << (rr + 1), jnp.uint32(0))
    score = jnp.full((R,), BIGS)
    for w in range(bw):
        svp = _gather_rows(dump_vp[:, w], last)
        svn = _gather_rows(dump_vn[:, w], last)
        ssb = _gather_rows(dump_sb[:, w], last)
        s = (ssb - pc(svp & above).astype(jnp.int32)
             + pc(svn & above).astype(jnp.int32))
        score = jnp.where(wofs == w, s, score)
    return score


class BacktraceResult(NamedTuple):
    ops_rev: jax.Array   # (R, max_steps) uint8, walk order (end->start)
    n_ops: jax.Array     # (R,) int32, -1 when the walk left the band
    touched: jax.Array   # (R,) bool: walk touched a band edge beyond which
                         # real DP rows exist — the banded score may
                         # overestimate; callers should retry wider
                         # (align/polish.py band doubling)


@partial(jax.jit, static_argnames=("bw", "max_steps"))
def backtrace_device(dump_vp, dump_vn, dump_sb, dump_base, read_planes,
                     path_mm, read_len, path_len, bw: int, max_steps: int):
    """Walk the banded DP backward on device, emitting edit ops in reverse
    (end -> start) order."""
    R, P, _ = dump_vp.shape
    RW = read_planes.shape[1]
    pc = jax.lax.population_count
    BIG = jnp.int32(1 << 26)
    rw_cap = (read_len + W - 1) // W                     # words per read

    def score(rr, cc):
        """(R,) DP score at row rr, col cc (with boundary semantics)."""
        cq = jnp.clip(cc, 0, P - 1)
        vpw = jnp.take_along_axis(dump_vp, cq[:, None, None], 1)[:, 0]
        vnw = jnp.take_along_axis(dump_vn, cq[:, None, None], 1)[:, 0]
        sbw = jnp.take_along_axis(dump_sb, cq[:, None], 1)[:, 0]
        bsw = jnp.take_along_axis(dump_base, cq[:, None], 1)[:, 0]
        w = rr // W - bsw
        wc = jnp.clip(w, 0, bw - 1)

        def body(k, acc):
            below = bw - 1 - k
            delta = (pc(vpw[:, below]).astype(jnp.int32)
                     - pc(vnw[:, below]).astype(jnp.int32))
            return acc - jnp.where(below > wc, delta, 0)
        bot = jax.lax.fori_loop(0, bw, body, sbw)
        rm = (rr % W).astype(jnp.uint32)
        above = jnp.where(rm < W - 1,
                          jnp.uint32(0xFFFFFFFF) << (rm + 1), jnp.uint32(0))
        svp = jnp.take_along_axis(vpw, wc[:, None], 1)[:, 0]
        svn = jnp.take_along_axis(vnw, wc[:, None], 1)[:, 0]
        s = (bot - pc(svp & above).astype(jnp.int32)
             + pc(svn & above).astype(jnp.int32))
        s = jnp.where((w < 0) | (w >= bw), BIG, s)
        s = jnp.where(rr < 0, cc + 1, s)
        s = jnp.where(cc < 0, rr + 1, s)
        s = jnp.where((rr < 0) & (cc < 0), 0, s)
        return s

    def matches(rr, cc):
        rq = jnp.clip(rr, 0, RW * W - 1)
        cq = jnp.clip(cc, 0, P - 1)
        pm = jnp.take_along_axis(path_mm, cq[:, None], 1)[:, 0]
        m = jnp.zeros((R,), jnp.uint32)
        for b in range(4):
            plane = jnp.take_along_axis(read_planes[:, :, b],
                                        (rq // W)[:, None], 1)[:, 0]
            bit = (plane >> (rq % W).astype(jnp.uint32)) & 1
            m = m | (bit & ((pm.astype(jnp.uint32) >> b) & 1))
        return m == 1

    def step(carry, i):
        r, c, fail, done, touch = carry
        s = score(r, c)
        d = score(r - 1, c - 1)
        l = score(r, c - 1)
        u = score(r - 1, c)
        sub = jnp.where(matches(r, c), 0, 1)
        can_diag = (r >= 0) & (c >= 0) & (s == d + sub)
        can_left = (c >= 0) & (s == l + 1)
        can_up = (r >= 0) & (s == u + 1)
        # tie order INS > diag > DEL: the reference's backtrace prefers
        # the vertical move, then diagonal, then horizontal
        # (src/GraphAlignerBitvectorCommon.h:556-597 pickBacktraceInside)
        # — byte-parity of emitted CIGARs/GAM depends on matching it
        op = jnp.where(can_up, OP_INS,
                       jnp.where(can_diag,
                                 jnp.where(sub == 1, OP_MISMATCH,
                                           OP_MATCH),
                                 jnp.where(can_left, OP_DEL, OP_NONE)))
        stuck = ~done & (op == OP_NONE)
        fail = fail | stuck
        emit = ~done & ~fail
        # band-edge witness: the walk visits the lowest/highest band word
        # while real DP rows exist beyond it — the banded optimum may be
        # pinned by the band, so the score can overestimate full NW
        cq = jnp.clip(c, 0, P - 1)
        base_c = jnp.take_along_axis(dump_base, cq[:, None], 1)[:, 0]
        w = jnp.clip(r, 0, RW * W - 1) // W - base_c
        edge = (((w <= 0) & (base_c > 0))
                | ((w >= bw - 1) & (base_c + bw < rw_cap)))
        touch = touch | (emit & (r >= 0) & (c >= 0) & edge)
        go_diag = ~can_up & can_diag
        go_left = ~can_up & ~can_diag & can_left
        r_new = jnp.where(emit & (can_up | go_diag), r - 1, r)
        c_new = jnp.where(emit & (go_diag | go_left), c - 1, c)
        done_new = done | ((r_new < 0) & (c_new < 0)) | fail
        out_op = jnp.where(emit, op, jnp.uint8(OP_NONE)).astype(jnp.uint8)
        return (r_new, c_new, fail, done_new, touch), out_op

    r0 = read_len - 1
    c0 = path_len - 1
    fail0 = (read_len <= 0) | (path_len <= 0)
    done0 = fail0
    touch0 = jnp.zeros((R,), bool)
    (rf, cf, fail, done, touch), ops = jax.lax.scan(
        step, (r0, c0, fail0, done0, touch0),
        jnp.arange(max_steps, dtype=jnp.int32), unroll=8)
    ops = jnp.moveaxis(ops, 0, 1)            # (R, max_steps)
    complete = done & ~fail & (rf < 0) & (cf < 0)
    n = jnp.sum((ops != OP_NONE).astype(jnp.int32), axis=1)
    n = jnp.where(complete, n, -1)
    return BacktraceResult(ops_rev=ops, n_ops=n, touched=touch)


@partial(jax.jit, static_argnames=("bw", "max_steps", "ops_cap"))
def _backtrace_t(dump_vp, dump_vn, dump_sb, dump_base, planes_t, path_t,
                 read_len, path_len, bw: int, max_steps: int,
                 ops_cap: int = 0):
    """Banded-DP backtrace on the transposed dump.  Same walk semantics as
    backtrace_device, but every cell score is O(1): the dump carries the
    full per-word bottom scores, so no per-step word accumulation loop,
    and the running cell score is carried between steps instead of being
    recomputed.

    ops_cap (0 = max_steps) bounds the EMITTED ops buffer: realistic
    walks are ~max(read, path) + O(band) steps, far below the
    read+path worst case, and the ops array dominates the download
    bytes on the bandwidth-bound tunnel.  A walk longer than ops_cap
    fails (n_ops == -1), which callers already treat as a band escape
    and retry wider (align/polish.py doubles bw; the widest retry
    passes a full-size cap, so the ramp stays lossless)."""
    P, _, R = dump_vp.shape
    RW = planes_t.shape[1]
    pc = jax.lax.population_count
    BIG = jnp.int32(1 << 26)
    rw_cap = (read_len + W - 1) // W
    if not ops_cap or ops_cap > max_steps:
        ops_cap = max_steps

    vp_flat = dump_vp.reshape(P * bw, R)
    vn_flat = dump_vn.reshape(P * bw, R)
    sb_flat = dump_sb.reshape(P * bw, R)

    def gat(tbl, idx):
        return jnp.take_along_axis(tbl, idx[None, :], axis=0)[0]

    def score(rr, cc):
        cq = jnp.clip(cc, 0, P - 1)
        base_c = gat(dump_base, cq)
        w = rr // W - base_c
        wc = jnp.clip(w, 0, bw - 1)
        idx = cq * bw + wc
        svp = gat(vp_flat, idx)
        svn = gat(vn_flat, idx)
        ssb = gat(sb_flat, idx)
        rm = (rr % W).astype(jnp.uint32)
        above = jnp.where(rm < W - 1,
                          jnp.uint32(0xFFFFFFFF) << (rm + 1), jnp.uint32(0))
        s = (ssb - pc(svp & above).astype(jnp.int32)
             + pc(svn & above).astype(jnp.int32))
        s = jnp.where((w < 0) | (w >= bw), BIG, s)
        s = jnp.where(rr < 0, cc + 1, s)
        s = jnp.where(cc < 0, rr + 1, s)
        s = jnp.where((rr < 0) & (cc < 0), 0, s)
        return s

    def matches(rr, cc):
        rq = jnp.clip(rr, 0, RW * W - 1)
        cq = jnp.clip(cc, 0, P - 1)
        pm = gat(path_t, cq).astype(jnp.uint32)
        wq = rq // W
        bitpos = (rq % W).astype(jnp.uint32)
        m = jnp.zeros((R,), jnp.uint32)
        for b in range(4):
            plane = gat(planes_t[b], wq)
            m = m | (((plane >> bitpos) & 1) & ((pm >> b) & 1))
        return m == 1

    def body(carry):
        i, r, c, s, fail, done, touch, buf = carry
        d = score(r - 1, c - 1)
        l = score(r, c - 1)
        u = score(r - 1, c)
        sub = jnp.where(matches(r, c), 0, 1)
        can_diag = (r >= 0) & (c >= 0) & (s == d + sub)
        can_left = (c >= 0) & (s == l + 1)
        can_up = (r >= 0) & (s == u + 1)
        # tie order INS > diag > DEL (reference pickBacktraceInside,
        # src/GraphAlignerBitvectorCommon.h:556-597 — GAM byte-parity)
        op = jnp.where(can_up, OP_INS,
                       jnp.where(can_diag,
                                 jnp.where(sub == 1, OP_MISMATCH,
                                           OP_MATCH),
                                 jnp.where(can_left, OP_DEL, OP_NONE)))
        stuck = ~done & (op == OP_NONE)
        fail = fail | stuck
        # ops-buffer overflow: still walking at the emit cap -> band
        # escape (the wider retry raises the cap)
        fail = fail | (~done & (i >= ops_cap))
        emit = ~done & ~fail
        cq = jnp.clip(c, 0, P - 1)
        base_c = gat(dump_base, cq)
        w = jnp.clip(r, 0, RW * W - 1) // W - base_c
        edge = (((w <= 0) & (base_c > 0))
                | ((w >= bw - 1) & (base_c + bw < rw_cap)))
        touch = touch | (emit & (r >= 0) & (c >= 0) & edge)
        go_up = can_up
        go_diag = ~can_up & can_diag
        go_left = ~can_up & ~can_diag & can_left
        r_new = jnp.where(emit & (go_up | go_diag), r - 1, r)
        c_new = jnp.where(emit & (go_diag | go_left), c - 1, c)
        s_new = jnp.where(emit, jnp.where(go_up, u,
                                          jnp.where(go_diag, d, l)), s)
        done_new = done | ((r_new < 0) & (c_new < 0)) | fail
        # clamped write: once i >= ops_cap every lane is done or failed
        # (emit False), so merging with the old row preserves the last
        # real op of lanes that finished exactly at the cap
        iw = jnp.minimum(i, ops_cap - 1)
        old_row = jax.lax.dynamic_index_in_dim(buf, iw, 0, keepdims=False)
        out_op = jnp.where(emit, op, old_row).astype(jnp.uint8)
        buf = jax.lax.dynamic_update_index_in_dim(buf, out_op, iw, 0)
        return (i + 1, r_new, c_new, s_new, fail, done_new, touch, buf)

    def cond(carry):
        i, _, _, _, _, done, _, _ = carry
        # early exit once every lane's walk has finished (walks run
        # ~read+path/2 steps; the padded bound is read+path)
        return (i < max_steps) & ~jnp.all(done)

    r0 = read_len - 1
    c0 = path_len - 1
    s0 = score(r0, c0)
    fail0 = (read_len <= 0) | (path_len <= 0)
    done0 = fail0
    touch0 = jnp.zeros((R,), bool)
    buf0 = jnp.full((ops_cap, R), jnp.uint8(OP_NONE))
    (_, rf, cf, _, fail, done, touch, buf) = jax.lax.while_loop(
        cond, body, (jnp.int32(0), r0, c0, s0, fail0, done0, touch0, buf0))
    ops = jnp.moveaxis(buf, 0, 1)            # (R, ops_cap)
    complete = done & ~fail & (rf < 0) & (cf < 0)
    n = jnp.sum((ops != OP_NONE).astype(jnp.int32), axis=1)
    n = jnp.where(complete, n, -1)
    return BacktraceResult(ops_rev=ops, n_ops=n, touched=touch)


# ---------------------------------------------------------------------------
# Packed transfer front-ends.  The axon tunnel is bandwidth-bound
# (~4-6 MB/s), so the hot pipeline ships sequences as 4-bit match-mask
# nibbles (8 chars / uint32; IUPAC masks survive intact) and downloads
# edit ops as 2-bit codes (16 ops / uint32).  Decoding happens on device
# inside the jit, where it is fused and effectively free.

def expand_nibbles(p4: jax.Array) -> jax.Array:
    """(R, PW) uint32 of packed 4-bit codes -> (R, PW*8) uint8."""
    shifts = (jnp.arange(8, dtype=jnp.uint32) * 4)[None, None, :]
    out = (p4[:, :, None] >> shifts) & jnp.uint32(0xF)
    return out.astype(jnp.uint8).reshape(p4.shape[0], -1)


def _compact4(x: jax.Array) -> jax.Array:
    """Gather bits at positions {4j} of each uint32 into bits 0..7."""
    x = (x | (x >> 3)) & jnp.uint32(0x03030303)
    x = (x | (x >> 6)) & jnp.uint32(0x000F000F)
    return (x | (x >> 12)) & jnp.uint32(0xFF)


def expand_planes(p4: jax.Array) -> jax.Array:
    """(R, rw*4) uint32 packed 4-bit codes -> (R, rw, 4) uint32 row
    planes (bit i of plane b at word w = mask bit b of char 32w+i)."""
    R, RW4 = p4.shape
    rw = RW4 // 4
    planes = []
    for b in range(4):
        c = _compact4((p4 >> jnp.uint32(b)) & jnp.uint32(0x11111111))
        cr = c.reshape(R, rw, 4)
        planes.append(cr[:, :, 0] | (cr[:, :, 1] << 8)
                      | (cr[:, :, 2] << 16) | (cr[:, :, 3] << 24))
    return jnp.stack(planes, axis=-1)        # (R, rw, 4)


def _compact2(x: jax.Array) -> jax.Array:
    """Gather bits at even positions {2j} of each uint32 into bits 0..15."""
    x = x & jnp.uint32(0x55555555)
    x = (x | (x >> 1)) & jnp.uint32(0x33333333)
    x = (x | (x >> 2)) & jnp.uint32(0x0F0F0F0F)
    x = (x | (x >> 4)) & jnp.uint32(0x00FF00FF)
    return (x | (x >> 8)) & jnp.uint32(0x0000FFFF)


def expand_planes2(c2: jax.Array) -> jax.Array:
    """(R, rw*2) uint32 of 16 packed 2-bit base codes per word ->
    (R, rw, 4) uint32 row planes (bit i of plane b = code 32w+i == b).
    The pure-ACGT wire format: half the bytes of the 4-bit nibble
    planes."""
    R, RW2 = c2.shape
    rw = RW2 // 2
    lo = c2 & jnp.uint32(0x55555555)
    hi = (c2 >> 1) & jnp.uint32(0x55555555)
    planes = []
    for b in range(4):
        m = (lo if b & 1 else ~lo) & (hi if b & 2 else ~hi) \
            & jnp.uint32(0x55555555)
        c = _compact2(m).reshape(R, rw, 2)
        planes.append(c[:, :, 0] | (c[:, :, 1] << 16))
    return jnp.stack(planes, axis=-1)        # (R, rw, 4)


def expand_codes2(c2: jax.Array) -> jax.Array:
    """(R, PW) uint32 of 16 packed 2-bit codes -> (R, PW*16) uint8
    match nibbles (1 << code)."""
    shifts = (jnp.arange(16, dtype=jnp.uint32) * 2)[None, None, :]
    codes = (c2[:, :, None] >> shifts) & jnp.uint32(3)
    return (jnp.uint8(1) << codes.astype(jnp.uint8)).reshape(
        c2.shape[0], -1)


def pack_ops2(ops: jax.Array) -> jax.Array:
    """(R, M) uint8 edit ops -> (R, M//16) uint32, 2 bits per op.  Only
    the low 2 bits survive (OP_NONE padding beyond n_ops is discarded by
    the host anyway)."""
    R, M = ops.shape
    o = (ops.astype(jnp.uint32) & 3).reshape(R, M // 16, 16)
    shifts = (jnp.arange(16, dtype=jnp.uint32) * 2)[None, None, :]
    return jnp.sum(o << shifts, axis=2, dtype=jnp.uint32)


class PackedBacktrace(NamedTuple):
    ops2: jax.Array      # (R, max_steps//16) uint32, 2-bit ops, walk order
    n_ops: jax.Array     # (R,) int32
    touched: jax.Array   # (R,) bool


@partial(jax.jit, static_argnames=("bw",))
def polish_align_packed(read_p4, path_p4, read_len, path_len,
                        bw: int) -> PolishResult:
    """polish_align on 4-bit-packed inputs (read_p4: (R, rmax//8) uint32,
    path_p4: (R, pmax//8) uint32); decode is fused on device."""
    read_planes = expand_planes(read_p4)
    path_mm = expand_nibbles(path_p4)
    return polish_align(read_planes, path_mm, read_len, path_len, bw)


@partial(jax.jit, static_argnames=("bw", "max_steps"))
def backtrace_device_packed(dump_vp, dump_vn, dump_sb, dump_base, read_p4,
                            path_p4, read_len, path_len, bw: int,
                            max_steps: int) -> PackedBacktrace:
    read_planes = expand_planes(read_p4)
    path_mm = expand_nibbles(path_p4)
    bt = backtrace_device(dump_vp, dump_vn, dump_sb, dump_base,
                          read_planes, path_mm, read_len, path_len, bw,
                          max_steps)
    return PackedBacktrace(ops2=pack_ops2(bt.ops_rev), n_ops=bt.n_ops,
                           touched=bt.touched)


_PALLAS_OK = None


def _pallas_core_ok() -> bool:
    """Probe once whether the Pallas polish core (pallas_polish2)
    compiles on the current default backend (Mosaic TPU lowering; the
    CPU interpret path is exercised by tests instead).  Disable with
    GRAPHCHAINER_NO_PALLAS=1."""
    global _PALLAS_OK
    if _PALLAS_OK is None:
        import os
        if os.environ.get("GRAPHCHAINER_NO_PALLAS"):
            _PALLAS_OK = False
            return False
        try:
            import jax as _jax
            if _jax.default_backend() not in ("tpu",):
                _PALLAS_OK = False
                return False
            from graphchainer_tpu.ops.pallas_polish2 import \
                polish_core_pallas
            r = polish_core_pallas(
                jnp.zeros((4, 4, 128), jnp.uint32),
                jnp.zeros((128, 128), jnp.uint32),
                jnp.full((128,), 64, jnp.int32),
                jnp.full((128,), 64, jnp.int32), 2)
            _jax.block_until_ready(r[3])
            _PALLAS_OK = True
        except Exception as e:           # pragma: no cover - backend dep
            import sys
            print(f"pallas polish core unavailable ({type(e).__name__}); "
                  "using the XLA core", file=sys.stderr)
            _PALLAS_OK = False
    return _PALLAS_OK


@partial(jax.jit, static_argnames=("bw", "max_steps", "use_pallas",
                                   "ops_cap"))
def _polish_full_packed_impl(read_p4, path_p4, read_len, path_len,
                             bw: int, max_steps: int,
                             use_pallas: bool,
                             ops_cap: int = 0) -> jax.Array:
    planes_t = jnp.transpose(expand_planes(read_p4), (2, 1, 0))
    path_t = jnp.transpose(expand_nibbles(path_p4), (1, 0)) \
        .astype(jnp.uint32)
    if use_pallas:
        from graphchainer_tpu.ops.pallas_polish2 import polish_core_pallas
        R = planes_t.shape[2]
        pad = (-R) % 128
        if pad:
            planes_t = jnp.pad(planes_t, ((0, 0), (0, 0), (0, pad)))
            path_t = jnp.pad(path_t, ((0, 0), (0, pad)))
            read_len = jnp.pad(read_len, (0, pad))
            path_len = jnp.pad(path_len, (0, pad))
        dvp, dvn, dsb, dbase = polish_core_pallas(
            planes_t, path_t, read_len, path_len, bw)
    else:
        dvp, dvn, dsb, dbase = _polish_core_t(planes_t, path_t, read_len,
                                              path_len, bw)
    score = _score_from_dump_t(dvp, dvn, dsb, dbase, read_len, path_len,
                               bw)
    bt = _backtrace_t(dvp, dvn, dsb, dbase, planes_t, path_t, read_len,
                      path_len, bw, max_steps, ops_cap)
    ops2 = jax.lax.bitcast_convert_type(pack_ops2(bt.ops_rev), jnp.int32)
    out = jnp.concatenate(
        [score[:, None], bt.n_ops[:, None],
         bt.touched.astype(jnp.int32)[:, None], ops2], axis=1)
    return out[:read_p4.shape[0]]


@partial(jax.jit, static_argnames=("bw", "max_steps", "use_pallas",
                                   "ops_cap"))
def _polish_full_packed2_impl(read_c2, path_c2, read_len, path_len,
                              bw: int, max_steps: int,
                              use_pallas: bool,
                              ops_cap: int = 0) -> jax.Array:
    """_polish_full_packed_impl on the 2-bit pure-ACGT wire format
    (HALF the upload bytes of the 4-bit nibble format)."""
    planes_t = jnp.transpose(expand_planes2(read_c2), (2, 1, 0))
    path_t = jnp.transpose(expand_codes2(path_c2), (1, 0)) \
        .astype(jnp.uint32)
    if use_pallas:
        from graphchainer_tpu.ops.pallas_polish2 import polish_core_pallas
        R = planes_t.shape[2]
        pad = (-R) % 128
        if pad:
            planes_t = jnp.pad(planes_t, ((0, 0), (0, 0), (0, pad)))
            path_t = jnp.pad(path_t, ((0, 0), (0, pad)))
            read_len = jnp.pad(read_len, (0, pad))
            path_len = jnp.pad(path_len, (0, pad))
        dvp, dvn, dsb, dbase = polish_core_pallas(
            planes_t, path_t, read_len, path_len, bw)
    else:
        dvp, dvn, dsb, dbase = _polish_core_t(planes_t, path_t, read_len,
                                              path_len, bw)
    score = _score_from_dump_t(dvp, dvn, dsb, dbase, read_len, path_len,
                               bw)
    bt = _backtrace_t(dvp, dvn, dsb, dbase, planes_t, path_t, read_len,
                      path_len, bw, max_steps, ops_cap)
    ops2 = jax.lax.bitcast_convert_type(pack_ops2(bt.ops_rev), jnp.int32)
    out = jnp.concatenate(
        [score[:, None], bt.n_ops[:, None],
         bt.touched.astype(jnp.int32)[:, None], ops2], axis=1)
    return out[:read_c2.shape[0]]


def polish_full_packed2(read_c2, path_c2, read_len, path_len, bw: int,
                        max_steps: int, ops_cap: int = 0) -> jax.Array:
    """polish_full_packed over 2-bit base codes (pure-ACGT batches)."""
    return _polish_full_packed2_impl(read_c2, path_c2, read_len,
                                     path_len, bw, max_steps,
                                     use_pallas=_pallas_core_ok(),
                                     ops_cap=ops_cap)


def polish_full_packed(read_p4, path_p4, read_len, path_len, bw: int,
                       max_steps: int, ops_cap: int = 0) -> jax.Array:
    """Score + backtrace in ONE device call with ONE packed result array
    (the tunnel charges a fixed round trip per call/download): per read
      word 0: score, word 1: n_ops, word 2: touched,
      words 3..: 2-bit edit ops (16 per word), walk order.
    Runs on the lane-major transposed core (reads on the 128 VPU lanes);
    the banded-DP fill uses the Pallas kernel (ops/pallas_polish2.py)
    when the backend's Mosaic lowering supports it."""
    return _polish_full_packed_impl(read_p4, path_p4, read_len, path_len,
                                    bw, max_steps,
                                    use_pallas=_pallas_core_ok(),
                                    ops_cap=ops_cap)
