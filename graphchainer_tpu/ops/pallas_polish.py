"""Pallas TPU implementation of the banded linear polish DP.

Same math as ops/linear_align.polish_align (see its docstring), mapped to
the Mosaic TPU lowering's constraints discovered iteratively:
  * no vectorized gather and no dynamic vector indexing -> one grid
    program per read so band base/shift are scalars;
  * scalar loads come from SMEM (read planes, lengths) or use static
    vector extracts (path chars, loaded as aligned 32-column tiles);
  * dynamic sublane slices must be aligned -> columns are processed in
    32-column tiles accumulated in scratch and written back with aligned
    dynamic slices;
  * no captured numpy array constants (iota built in-kernel); no i8
    scalar extraction (int32 inputs).

Numerically identical to the XLA version (asserted in tests; interpret
mode on CPU).  STATUS: interpret-verified; on this image's Mosaic the
final lowering aborts inside the compiler
(`Check failed: offsets_[0].value_or(0) < tiling_[0]` in layout.h) on the
(TILE, bw) block write — a compiler bug, filed in CLAUDE.md for round 2.
The XLA kernel (ops/linear_align.py) remains the production path; it
batches reads across VPU lanes and is ~1% of end-to-end wall time.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graphchainer_tpu.ops.myers import advance_word

W = 32
TILE = 32


def _kernel(read_planes_ref, path_mm_ref, read_len_ref, path_len_ref,
            dump_vp_ref, dump_vn_ref, dump_sb_ref, dump_base_ref,
            *, bw: int, P: int, RW: int):
    r = pl.program_id(0)
    read_len = read_len_ref[r, 0]
    path_len = path_len_ref[r, 0]
    rw_cap = (read_len + W - 1) // W
    ub = jnp.maximum(rw_cap - bw, 0)
    scale = read_len.astype(jnp.float32) / jnp.maximum(
        path_len, 1).astype(jnp.float32)

    def band_base(col):
        cc = jnp.minimum(col, jnp.maximum(path_len, 1) - 1)
        target = (cc + 1).astype(jnp.float32) * scale
        return jnp.clip((target / W).astype(jnp.int32) - bw // 2, 0, ub)

    base0 = band_base(jnp.int32(0))
    iota1 = jax.lax.broadcasted_iota(jnp.int32, (bw, 1), 0)[:, 0] + 1
    vps0 = jnp.full((bw,), jnp.uint32(0xFFFFFFFF))
    vns0 = jnp.zeros((bw,), jnp.uint32)
    sbs0 = base0 * W + iota1 * W

    def tile_step(t, carry):
        c0 = pl.multiple_of(t * TILE, TILE)
        pcols = path_mm_ref[0, pl.ds(c0, TILE), 0]        # (TILE,) int32

        def one_col(c_local, carry):
            # c_local is a static Python int (unrolled): Mosaic cannot
            # lower dynamic vector indexing
            vps, vns, sbs, prev_base = carry
            col = t * TILE + c_local
            pmm = pcols[c_local].astype(jnp.uint32)
            cur_base = jnp.maximum(band_base(col), prev_base)
            shift = jnp.clip(cur_base - prev_base, 0, bw)

            bot_sb = sbs[bw - 1]
            new_vps, new_vns, new_sbs = vps, vns, sbs
            for k in range(1, bw + 1):
                sel = shift == k
                if k < bw:
                    sh_vp = jnp.concatenate(
                        [vps[k:], jnp.full((k,), jnp.uint32(0xFFFFFFFF))])
                    sh_vn = jnp.concatenate(
                        [vns[k:], jnp.zeros((k,), jnp.uint32)])
                    sh_sb = jnp.concatenate([sbs[k:],
                                             bot_sb + iota1[:k] * W])
                else:
                    sh_vp = jnp.full((bw,), jnp.uint32(0xFFFFFFFF))
                    sh_vn = jnp.zeros((bw,), jnp.uint32)
                    sh_sb = bot_sb + iota1 * W
                new_vps = jnp.where(sel, sh_vp, new_vps)
                new_vns = jnp.where(sel, sh_vn, new_vns)
                new_sbs = jnp.where(sel, sh_sb, new_sbs)
            vps, vns, sbs = new_vps, new_vns, new_sbs

            # per-word Eq from the SMEM-resident read planes
            eqs = []
            for w in range(bw):
                widx = jnp.clip(cur_base + w, 0, RW - 1)
                p0 = read_planes_ref[0, widx, 0].astype(jnp.uint32)
                p1 = read_planes_ref[0, widx, 1].astype(jnp.uint32)
                p2 = read_planes_ref[0, widx, 2].astype(jnp.uint32)
                p3 = read_planes_ref[0, widx, 3].astype(jnp.uint32)
                eqs.append((p0 * ((pmm >> 0) & 1))
                           | (p1 * ((pmm >> 1) & 1))
                           | (p2 * ((pmm >> 2) & 1))
                           | (p3 * ((pmm >> 3) & 1)))

            hin = jnp.int32(1)
            outs = []
            for w in range(bw):
                nvp, nvn, nsb, hout = advance_word(vps[w], vns[w], sbs[w],
                                                   eqs[w], hin)
                outs.append((nvp, nvn, nsb))
                hin = hout
            vps = jnp.stack([o[0] for o in outs])
            vns = jnp.stack([o[1] for o in outs])
            sbs = jnp.stack([o[2] for o in outs])

            return (vps, vns, sbs, cur_base)

        # unrolled tile: collect per-column results in registers and write
        # each dump block once (no scalar stores to VMEM, no SMEM vectors)
        col_vps, col_vns, col_sbs, col_bases = [], [], [], []
        for c_local in range(TILE):
            carry = one_col(c_local, carry)
            vps_c, vns_c, sbs_c, base_c = carry
            col_vps.append(vps_c)
            col_vns.append(vns_c)
            col_sbs.append(sbs_c[bw - 1].astype(jnp.int32))
            col_bases.append(base_c)
        dump_vp_ref[0, pl.ds(c0, TILE), :] = jnp.stack(col_vps)
        dump_vn_ref[0, pl.ds(c0, TILE), :] = jnp.stack(col_vns)
        dump_sb_ref[0, pl.ds(c0, TILE), 0] = jnp.stack(col_sbs)
        dump_base_ref[0, pl.ds(c0, TILE), 0] = jnp.stack(col_bases)
        return carry

    jax.lax.fori_loop(0, P // TILE, tile_step, (vps0, vns0, sbs0, base0))


@partial(jax.jit, static_argnames=("bw", "interpret"))
def polish_align_pallas(read_planes, path_mm, read_len, path_len, bw: int,
                        interpret: bool = False):
    """Pallas variant of linear_align.polish_align; returns
    (dump_vp, dump_vn, dump_sb, dump_base) device arrays."""
    R, RW, _ = read_planes.shape
    P = path_mm.shape[1]
    assert P % TILE == 0
    # (R, P, 1) shapes for the scalar-per-column outputs: Mosaic requires
    # the last two block dims to be (8, 128)-tiled or equal to the array
    # dims, which (1, P) per-row blocks violate
    out_shapes = (
        jax.ShapeDtypeStruct((R, P, bw), jnp.uint32),
        jax.ShapeDtypeStruct((R, P, bw), jnp.uint32),
        jax.ShapeDtypeStruct((R, P, 1), jnp.int32),
        jax.ShapeDtypeStruct((R, P, 1), jnp.int32),
    )
    in_specs = [
        pl.BlockSpec((1, RW, 4), lambda r: (r, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, P, 1), lambda r: (r, 0, 0)),
        # full-array SMEM blocks: per-row (1,1) blocks violate Mosaic's
        # block tiling check even in SMEM
        pl.BlockSpec((R, 1), lambda r: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((R, 1), lambda r: (0, 0), memory_space=pltpu.SMEM),
    ]
    out_specs = (
        pl.BlockSpec((1, P, bw), lambda r: (r, 0, 0)),
        pl.BlockSpec((1, P, bw), lambda r: (r, 0, 0)),
        pl.BlockSpec((1, P, 1), lambda r: (r, 0, 0)),
        pl.BlockSpec((1, P, 1), lambda r: (r, 0, 0)),
    )
    vp, vn, sb, base = pl.pallas_call(
        partial(_kernel, bw=bw, P=P, RW=RW),
        out_shape=out_shapes,
        grid=(R,),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(read_planes.astype(jnp.int32),
      path_mm.astype(jnp.int32)[:, :, None],
      read_len.astype(jnp.int32)[:, None],
      path_len.astype(jnp.int32)[:, None])
    return vp, vn, sb[:, :, 0], base[:, :, 0]
