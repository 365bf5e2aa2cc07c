"""Banded linear Myers alignment: read vs chain-path sequence (polish).

Replaces the reference's edlib NW call (src/Aligner.cpp:845-877) with a
TPU kernel: vertical 32-row Myers words over the read, scanned across the
path columns with a diagonal band of BW words that slides down the read as
the column index advances.  Cells outside the band are admissible
overestimates (all-insertion boundary words), so scores are exact whenever
the optimal alignment stays inside the band.

The per-column band words (VP, VN) are dumped to HBM; the CIGAR backtrace
runs in the C++ host runtime (native polish_backtrace) over the dump.
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


class PolishResult(NamedTuple):
    score: jax.Array     # (R,) int32 global NW edit distance
    dump_vp: jax.Array   # (R, P, BW) uint32
    dump_vn: jax.Array   # (R, P, BW) uint32
    dump_sb: jax.Array   # (R, P) int32  bottom score of the LOWEST band word


@partial(jax.jit, static_argnames=("bw",))
def polish_align(read_planes, path_mm, base, read_len, path_len, bw: int):
    """Banded NW of read vs path for a batch.

    read_planes: (R, RW, 4) uint32  read row match planes per 32-row word
    path_mm:     (R, P) uint8       path char 4-bit match masks (0 pad)
    base:        (R, P) int32       band top word index per column
                                     (nondecreasing, band covers row
                                     read_len-1 at column path_len-1)
    read_len:    (R,) int32
    path_len:    (R,) int32
    """
    R, RW, _ = read_planes.shape
    P = path_mm.shape[1]

    # initial column (j=0): global boundary, words cover rows
    # [base0*32, ...): score of row i is i+1.  With base0 = 0 the top word
    # starts at boundary score 0.
    def init_words():
        vps = jnp.full((R, bw), jnp.uint32(0xFFFFFFFF))
        vns = jnp.zeros((R, bw), jnp.uint32)
        b0 = base[:, 0][:, None] * W                      # (R,1) rows above
        sbs = (b0 + (jnp.arange(1, bw + 1) * W)[None, :]).astype(jnp.int32)
        return vps, vns, sbs

    vps, vns, sbs = init_words()

    def col_step(carry, inputs):
        vps, vns, sbs, prev_base = carry
        pmm, cur_base, col = inputs                      # (R,), (R,), ()
        shift = jnp.clip(cur_base - prev_base, 0, bw)    # (R,)

        # slide band down by `shift` words: drop top words, append
        # all-insertion continuation words at the bottom.
        idx = jnp.arange(bw)[None, :] + shift[:, None]   # (R, bw)
        in_range = idx < bw
        idxc = jnp.clip(idx, 0, bw - 1)
        bot_sb = sbs[:, -1]                              # (R,)
        g_vp = jnp.take_along_axis(vps, idxc, 1)
        g_vn = jnp.take_along_axis(vns, idxc, 1)
        g_sb = jnp.take_along_axis(sbs, idxc, 1)
        ext = (idx - bw + 1).astype(jnp.int32) * W       # words below old bot
        vps = jnp.where(in_range, g_vp, jnp.uint32(0xFFFFFFFF))
        vns = jnp.where(in_range, g_vn, jnp.uint32(0))
        sbs = jnp.where(in_range, g_sb, bot_sb[:, None] + ext)

        # eq words for this column: per band word w, rows of word
        # (cur_base + w)
        widx = jnp.clip(cur_base[:, None] + jnp.arange(bw)[None, :],
                        0, RW - 1)                       # (R, bw)
        eq = jnp.zeros((R, bw), jnp.uint32)
        for b in range(4):
            plane = jnp.take_along_axis(read_planes[:, :, b], widx, 1)
            eq = eq | (plane * ((pmm.astype(jnp.uint32) >> b) & 1)[:, None])

        # advance words top -> bottom with vertical carry.  Top word:
        # boundary above the band — when the band still touches row -1
        # (cur_base == 0) the true global boundary delta is +1; deeper
        # bands use +1 as an admissible overestimate too.
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

        # columns beyond path_len are padding; the caller reads results
        # from the dump at column path_len-1, so advancing further is
        # harmless (host pads `base` with its last value).
        out = (vps, vns, sbs[:, -1].astype(jnp.int32))
        return (vps, vns, sbs, cur_base), out

    cols = jnp.arange(P, dtype=jnp.int32)
    (vps, vns, sbs, _), (dump_vp, dump_vn, dump_sb) = jax.lax.scan(
        col_step, (vps, vns, sbs, base[:, 0]),
        (path_mm.T, base.T, cols))
    dump_vp = jnp.moveaxis(dump_vp, 0, 1)   # (R, P, bw)
    dump_vn = jnp.moveaxis(dump_vn, 0, 1)
    dump_sb = jnp.moveaxis(dump_sb, 0, 1)   # (R, P)

    # final score: row read_len-1 at column path_len-1
    last_col = jnp.clip(path_len - 1, 0, P - 1)
    lvp = jnp.take_along_axis(dump_vp, last_col[:, None, None], 1)[:, 0]
    lvn = jnp.take_along_axis(dump_vn, last_col[:, None, None], 1)[:, 0]
    lsb = jnp.take_along_axis(dump_sb, last_col[:, None], 1)[:, 0]
    lbase = jnp.take_along_axis(base, last_col[:, None], 1)[:, 0]
    # score at row r: expand from the bottom word chain
    r = read_len - 1
    wofs = jnp.clip(r // W - lbase, 0, bw - 1)           # word holding r
    # bottom score of word w = lsb - sum of words below it... recompute:
    # word w bottom score = lsb - (deltas of words below w).  Walk from
    # the bottom: easier to recompute via per-word popcounts.
    pc = jax.lax.population_count

    def word_bot(wi):
        # bottom score of band word wi given bottom of word bw-1 == lsb
        def body(k, acc):
            below = bw - 1 - k
            take = below > wi
            delta = (pc(lvp[:, below]).astype(jnp.int32)
                     - pc(lvn[:, below]).astype(jnp.int32))
            return acc - jnp.where(take, delta, 0)
        return jax.lax.fori_loop(0, bw, body, lsb)

    bot = word_bot(wofs)
    rr = (r % W).astype(jnp.uint32)
    above = jnp.where(rr < W - 1,
                      jnp.uint32(0xFFFFFFFF) << (rr + 1), jnp.uint32(0))
    sel_vp = jnp.take_along_axis(lvp, wofs[:, None], 1)[:, 0]
    sel_vn = jnp.take_along_axis(lvn, wofs[:, None], 1)[:, 0]
    score = (bot - pc(sel_vp & above).astype(jnp.int32)
             + pc(sel_vn & above).astype(jnp.int32))
    return PolishResult(score=score, dump_vp=dump_vp, dump_vn=dump_vn,
                        dump_sb=dump_sb)


def make_band_base(read_len: int, path_len: int, bw: int,
                   n_read_words: int) -> np.ndarray:
    """Host helper: nondecreasing band top word index per column, centered
    on the scaled diagonal, clamped so the last column covers the last
    read row."""
    p = max(path_len, 1)
    cols = np.arange(p)
    center = cols * (read_len / p)
    top = np.floor(center / W).astype(np.int64) - bw // 2
    top = np.clip(top, 0, max(0, n_read_words - bw))
    top = np.maximum.accumulate(top)
    # ensure the final column's band covers the last read row
    need = max(0, (read_len - 1) // W - bw + 1)
    if p > 0:
        top[-1] = max(top[-1], need)
        top = np.maximum.accumulate(top)  # keep nondecreasing
    return top.astype(np.int32)
