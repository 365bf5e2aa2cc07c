"""Pallas TPU kernel for the banded linear polish DP (lane-major).

Same math as linear_align._polish_core_t (which see): reads ride the 128
VPU lanes, band words ride sublanes, the read-plane words needed per
column come from a rolling prefetch window refreshed by masked sublane
reductions (no gathers), and per-column state advances with the 32-bit
Myers word recurrence.  This is the production Pallas variant of the
round-1 prototype (pallas_polish.py), restructured for the Mosaic
lowering rules that blocked it:

  * no vector gathers / dynamic vector indexing — the plane window is
    rebuilt with `iota == idx` masked reductions and rolled with static
    slices;
  * no scalar VMEM loads — everything is (sublane, lane) vector work on
    (bw, 128) tiles;
  * the path-column axis is the SECOND GRID DIMENSION: pallas_call
    streams (TILE_C, 128) path blocks in and (TILE_C, bw, 128) dump
    blocks out per grid step (double-buffered by the pipeline), while
    the DP state persists across steps in VMEM scratch;
  * per-read scalars (lengths, band ramp) are (1, 128) lane vectors.

Wired as the production core by linear_align.polish_full_packed when it
compiles on the local backend (see linear_align._pallas_core_ok);
verified bit-identical to the XLA core in tests/test_pallas_polish.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graphchainer_tpu.ops.myers import advance_word

W = 32
WIN_EXTRA = 8
LANES = 128
TILE_C = 128         # path columns per grid step


def _kernel(planes_ref, path_ref, rlen_ref, plen_ref,
            dvp_ref, dvn_ref, dsb_ref, dbase_ref,
            svp, svn, ssb, sbase, swin, svalid,
            *, bw: int, P: int, RW: int):
    bwe = bw + WIN_EXTRA
    R = LANES
    ct = pl.program_id(1)
    rlen = rlen_ref[0:1, :]                                  # (1,R)
    plen = plen_ref[0:1, :]
    rw_cap = (rlen + W - 1) // W
    ub = jnp.maximum(rw_cap - bw, 0)
    scale = (rlen.astype(jnp.float32)
             / jnp.maximum(plen, 1).astype(jnp.float32))

    def band_base(col):
        cc = jnp.minimum(col, jnp.maximum(plen, 1) - 1)
        target = (cc + 1).astype(jnp.float32) * scale
        return jnp.clip((target * (1.0 / W)).astype(jnp.int32) - bw // 2,
                        0, ub)                               # (1,R)

    iota_rw = jax.lax.broadcasted_iota(jnp.int32, (RW, R), 0)

    def refill(base):
        """(4*bwe, R) plane window: row b*bwe+w = plane b word (base+w)
        per lane, via masked sublane reductions (no gather).  Mosaic has
        no unsigned reductions, so the sum runs on the int32 bit
        pattern (exactly one row is selected per lane, so the int32 sum
        IS that row's bits)."""
        rows = []
        for b in range(4):
            plane = planes_ref[b].astype(jnp.int32)          # (RW, R)
            for w in range(bwe):
                m = iota_rw == (base + w)
                rows.append(jnp.sum(jnp.where(m, plane, 0),
                                    axis=0, keepdims=True,
                                    dtype=jnp.int32).astype(jnp.uint32))
        return jnp.concatenate(rows, axis=0)                 # (4*bwe, R)

    iota_bw1 = jax.lax.broadcasted_iota(jnp.int32, (bw, R), 0) + 1
    ones_row = jnp.full((1, R), jnp.uint32(0xFFFFFFFF))
    zero_row = jnp.zeros((1, R), jnp.uint32)

    @pl.when(ct == 0)
    def _():
        base0 = band_base(jnp.int32(0))
        svp[...] = jnp.broadcast_to(ones_row, (bw, R))
        svn[...] = jnp.broadcast_to(zero_row, (bw, R))
        ssb[...] = base0 * W + iota_bw1 * W
        sbase[...] = base0
        swin[...] = refill(base0)
        svalid[...] = jnp.full((1, R), bwe, jnp.int32)

    def roll1(a, fill_row):
        return jnp.concatenate([a[1:], fill_row], axis=0)

    def col_body(c_local, carry):
        vps, vns, sbs, base, win, valid = carry
        col = ct * TILE_C + c_local
        pmm = path_ref[pl.ds(c_local, 1), :].astype(jnp.uint32)  # (1,R)
        nb = jnp.maximum(band_base(col), base)
        shift = jnp.clip(nb - base, 0, bw)                   # (1,R)
        valid = valid - shift
        bot_sb = sbs[bw - 1:bw]                              # (1,R)

        def fast(args):
            vps, vns, sbs, win, valid = args
            s1 = shift == 1
            vps = jnp.where(s1, roll1(vps, ones_row), vps)
            vns = jnp.where(s1, roll1(vns, zero_row), vns)
            sbs = jnp.where(s1, roll1(sbs, bot_sb + W), sbs)
            parts = []
            for b in range(4):
                seg = win[b * bwe:(b + 1) * bwe]
                parts.append(jnp.where(s1, roll1(seg, seg[:1]), seg))
            return vps, vns, sbs, jnp.concatenate(parts, axis=0), valid

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
                        [sbs[k:], bot_sb + iota_bw1[:k] * W])
                else:
                    sh_vp = jnp.broadcast_to(ones_row, (bw, R))
                    sh_vn = jnp.broadcast_to(zero_row, (bw, R))
                    sh_sb = bot_sb + iota_bw1 * W
                vps = jnp.where(sel, sh_vp, vps)
                vns = jnp.where(sel, sh_vn, vns)
                sbs = jnp.where(sel, sh_sb, sbs)
            return (vps, vns, sbs, refill(nb),
                    jnp.full((1, R), bwe, jnp.int32))

        need_slow = jnp.any(shift > 1) | jnp.any(valid < bw)
        vps, vns, sbs, win, valid = jax.lax.cond(
            need_slow, slow, fast, (vps, vns, sbs, win, valid))

        eq = (win[0 * bwe:0 * bwe + bw] * (pmm & 1)
              | win[1 * bwe:1 * bwe + bw] * ((pmm >> 1) & 1)
              | win[2 * bwe:2 * bwe + bw] * ((pmm >> 2) & 1)
              | win[3 * bwe:3 * bwe + bw] * ((pmm >> 3) & 1))  # (bw,R)

        hin = jnp.ones((1, R), jnp.int32)
        nvps, nvns, nsbs = [], [], []
        for w in range(bw):
            nvp, nvn, nsb, hin = advance_word(
                vps[w:w + 1], vns[w:w + 1], sbs[w:w + 1], eq[w:w + 1],
                hin)
            nvps.append(nvp)
            nvns.append(nvn)
            nsbs.append(nsb)
        vps = jnp.concatenate(nvps, axis=0)
        vns = jnp.concatenate(nvns, axis=0)
        sbs = jnp.concatenate(nsbs, axis=0)

        dvp_ref[pl.ds(c_local, 1), :, :] = vps[None]
        dvn_ref[pl.ds(c_local, 1), :, :] = vns[None]
        dsb_ref[pl.ds(c_local, 1), :, :] = sbs[None].astype(jnp.int32)
        dbase_ref[pl.ds(c_local, 1), :] = nb

        return vps, vns, sbs, nb, win, valid

    carry = (svp[...], svn[...], ssb[...], sbase[...], swin[...],
             svalid[...])
    carry = jax.lax.fori_loop(0, TILE_C, col_body, carry)
    vps, vns, sbs, base, win, valid = carry
    svp[...] = vps
    svn[...] = vns
    ssb[...] = sbs
    sbase[...] = base
    swin[...] = win
    svalid[...] = valid


@partial(jax.jit, static_argnames=("bw", "interpret"))
def polish_core_pallas(planes_t, path_t, read_len, path_len, bw: int,
                       interpret: bool = False):
    """Pallas version of linear_align._polish_core_t: same transposed
    inputs/outputs — planes_t (4, RW, R) uint32, path_t (P, R) uint32;
    returns (dump_vp, dump_vn, dump_sb, dump_base) in (P, bw, R) /
    (P, R) layout.  R must be a multiple of 128, P of TILE_C."""
    _, RW, R = planes_t.shape
    P = path_t.shape[0]
    assert R % LANES == 0, R
    assert P % TILE_C == 0, P
    bwe = bw + WIN_EXTRA
    grid = (R // LANES, P // TILE_C)
    out_shapes = (
        jax.ShapeDtypeStruct((P, bw, R), jnp.uint32),
        jax.ShapeDtypeStruct((P, bw, R), jnp.uint32),
        jax.ShapeDtypeStruct((P, bw, R), jnp.int32),
        jax.ShapeDtypeStruct((P, R), jnp.int32),
    )
    in_specs = [
        pl.BlockSpec((4, RW, LANES), lambda r, c: (0, 0, r),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_C, LANES), lambda r, c: (c, r),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, LANES), lambda r, c: (0, r),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, LANES), lambda r, c: (0, r),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = (
        pl.BlockSpec((TILE_C, bw, LANES), lambda r, c: (c, 0, r),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_C, bw, LANES), lambda r, c: (c, 0, r),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_C, bw, LANES), lambda r, c: (c, 0, r),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_C, LANES), lambda r, c: (c, r),
                     memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        partial(_kernel, bw=bw, P=P, RW=RW),
        out_shape=out_shapes,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((bw, LANES), jnp.uint32),
            pltpu.VMEM((bw, LANES), jnp.uint32),
            pltpu.VMEM((bw, LANES), jnp.int32),
            pltpu.VMEM((1, LANES), jnp.int32),
            pltpu.VMEM((4 * bwe, LANES), jnp.uint32),
            pltpu.VMEM((1, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(planes_t, path_t,
      read_len.astype(jnp.int32)[None, :],
      path_len.astype(jnp.int32)[None, :])
