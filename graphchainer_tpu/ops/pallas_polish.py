"""Pallas TPU implementation of the banded linear polish DP.

Same math as ops/linear_align.polish_align (see its docstring), mapped to
the Mosaic TPU lowering's constraints: one grid program per read, so the
band base/shift are SCALARS and every dynamic access is a scalar `pl.ds`
slice (Mosaic has no vectorized gather).  Band state lives in registers/
VMEM for the whole column scan; dump blocks are written directly to the
program's output blocks.

Numerically identical to the XLA version (asserted in tests, interpret
mode on CPU).  EXPERIMENTAL — not yet lowered by Mosaic on this image:
the per-column scalar access pattern trips a chain of Mosaic TPU lowering
constraints (no vectorized gather; no i8 scalar extraction; no 1-D VMEM
scalar loads; dynamic lane-dimension indices must be 128-aligned).  The
production path stays on the XLA kernel (ops/linear_align.py), which
batches reads across VPU lanes and is ~1% of end-to-end wall time; the
remaining Mosaic-ready restructure (128-column tiles with static inner
unroll + aligned block writes) is a round-2 item (CLAUDE.md).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from graphchainer_tpu.ops.myers import advance_word

W = 32


def _kernel(read_planes_ref, path_mm_ref, read_len_ref, path_len_ref,
            dump_vp_ref, dump_vn_ref, dump_sb_ref, dump_base_ref,
            *, bw: int, P: int, RW: int):
    r = pl.program_id(0)
    # (R, 1) shapes: Mosaic mishandles scalar loads from 1-D VMEM arrays
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
    # iota built in-kernel (captured numpy constants are not allowed)
    iota1 = jax.lax.broadcasted_iota(jnp.int32, (bw, 1), 0)[:, 0] + 1
    vps0 = jnp.full((bw,), jnp.uint32(0xFFFFFFFF))
    vns0 = jnp.zeros((bw,), jnp.uint32)
    sbs0 = base0 * W + iota1 * W

    def col_step(col, carry):
        vps, vns, sbs, prev_base = carry
        pmm = path_mm_ref[r, col].astype(jnp.uint32)  # int32 input: Mosaic cannot extract i8 scalars
        cur_base = jnp.maximum(band_base(col), prev_base)
        shift = jnp.clip(cur_base - prev_base, 0, bw)

        # slide the band down by `shift` words (scalar shift: unrolled
        # select chain instead of a gather)
        bot_sb = sbs[bw - 1]
        new_vps, new_vns, new_sbs = vps, vns, sbs
        for k in range(1, bw + 1):
            sel = shift == k
            if k < bw:
                sh_vp = jnp.concatenate(
                    [vps[k:], jnp.full((k,), jnp.uint32(0xFFFFFFFF))])
                sh_vn = jnp.concatenate([vns[k:], jnp.zeros((k,),
                                                            jnp.uint32)])
                ext = bot_sb + iota1[:k] * W
                sh_sb = jnp.concatenate([sbs[k:], ext])
            else:
                sh_vp = jnp.full((bw,), jnp.uint32(0xFFFFFFFF))
                sh_vn = jnp.zeros((bw,), jnp.uint32)
                sh_sb = bot_sb + iota1 * W
            new_vps = jnp.where(sel, sh_vp, new_vps)
            new_vns = jnp.where(sel, sh_vn, new_vns)
            new_sbs = jnp.where(sel, sh_sb, new_sbs)
        vps, vns, sbs = new_vps, new_vns, new_sbs

        # per-word Eq: scalar dynamic loads of the covered read-plane words
        eqs = []
        for w in range(bw):
            widx = jnp.clip(cur_base + w, 0, RW - 1)
            word = read_planes_ref[r, pl.ds(widx, 1), :][0]   # (4,) uint32
            eq_w = ((word[0] * ((pmm >> 0) & 1))
                    | (word[1] * ((pmm >> 1) & 1))
                    | (word[2] * ((pmm >> 2) & 1))
                    | (word[3] * ((pmm >> 3) & 1)))
            eqs.append(eq_w)

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

        dump_vp_ref[r, pl.ds(col, 1), :] = vps[None, :]
        dump_vn_ref[r, pl.ds(col, 1), :] = vns[None, :]
        dump_sb_ref[r, pl.ds(col, 1)] = sbs[bw - 1][None].astype(jnp.int32)
        dump_base_ref[r, pl.ds(col, 1)] = cur_base[None]
        return (vps, vns, sbs, cur_base)

    jax.lax.fori_loop(0, P, col_step, (vps0, vns0, sbs0, base0))


@partial(jax.jit, static_argnames=("bw", "interpret"))
def polish_align_pallas(read_planes, path_mm, read_len, path_len, bw: int,
                        interpret: bool = False):
    """Pallas variant of linear_align.polish_align; returns
    (dump_vp, dump_vn, dump_sb, dump_base) device arrays."""
    R, RW, _ = read_planes.shape
    P = path_mm.shape[1]
    out_shapes = (
        jax.ShapeDtypeStruct((R, P, bw), jnp.uint32),
        jax.ShapeDtypeStruct((R, P, bw), jnp.uint32),
        jax.ShapeDtypeStruct((R, P), jnp.int32),
        jax.ShapeDtypeStruct((R, P), jnp.int32),
    )
    # full-array blocks (Mosaic requires last-two-dim tiling otherwise);
    # each grid program picks its read row via program_id
    return pl.pallas_call(
        partial(_kernel, bw=bw, P=P, RW=RW),
        out_shape=out_shapes,
        grid=(R,),
        interpret=interpret,
    )(read_planes, path_mm.astype(jnp.int32),
      read_len.astype(jnp.int32)[:, None],
      path_len.astype(jnp.int32)[:, None])
