#!/usr/bin/env python
"""On-TPU check of the Pallas fragment kernel (ops/pallas_frag.py):
1. bit-identical outputs vs the XLA lane-major core on the REAL backend
   (tests cover interpret mode only), compared on device so nothing big
   crosses the tunnel;
2. steady-state timing of both cores at production-like shapes.

Run on a host with the TPU attached: python scripts/tpu_pallas_frag_check.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from graphchainer_tpu.utils.jaxconfig import setup

setup()

import jax
import jax.numpy as jnp

from graphchainer_tpu.ops import frag_align
from graphchainer_tpu.ops.pallas_frag import frag_core_pallas


def make_inputs(rng, F, B, S, max_in, n_levels):
    """Random but structurally valid transposed core inputs: in-edges
    point to earlier slots, levels are monotone in slot index."""
    eq = rng.integers(0, 1 << 32, size=(4, B, F), dtype=np.uint32)
    ln = rng.integers(1, 33, size=(B, F)).astype(np.int32)
    lvl = np.sort(rng.integers(0, n_levels, size=(B, F)), axis=0)
    lvl = lvl.astype(np.int32)
    bi = np.full((max_in, B, F), -1, np.int32)
    for b in range(1, B):
        for e in range(max_in):
            cand = rng.integers(0, b, size=F)
            use = (rng.random(F) < 0.6) & (lvl[cand, np.arange(F)]
                                           < lvl[b, np.arange(F)])
            bi[e, b] = np.where(use, cand, -1)
    rq = rng.integers(0, 1 << 32, size=(S, 4, F), dtype=np.uint32)
    fl = rng.integers(S * 32 - 20, S * 32 + 1, size=(1, F)).astype(np.int32)
    sb = np.zeros((1, F), np.int32)
    return (jnp.asarray(eq), jnp.asarray(ln), jnp.asarray(bi),
            jnp.asarray(lvl), jnp.asarray(rq), jnp.asarray(fl),
            jnp.asarray(sb))


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    F, B, S, max_in, n_levels = 512, 32, 3, 4, 8
    args = make_inputs(rng, F, B, S, max_in, n_levels)

    ref = frag_align._frag_core_t(*args, S=S, max_in=max_in,
                                  n_levels=n_levels, carried=False,
                                  carry=None, want_state=False)
    got = frag_core_pallas(*args, S=S, max_in=max_in, n_levels=n_levels)
    names = ["best_score", "best_slot", "best_col", "best_in"]
    ok = True
    for name, a, b in zip(names, got, ref[:4]):
        eq = bool(jnp.array_equal(a, b))
        print(f"  {name}: {'OK' if eq else 'MISMATCH'}")
        ok &= eq
    if not ok:
        print("EQUALITY FAILED", flush=True)
        sys.exit(1)

    def bench(fn, label, iters=10):
        r = fn()
        jax.block_until_ready(r[0])
        t0 = time.time()
        for _ in range(iters):
            r = fn()
        jax.block_until_ready(r[0])
        dt = (time.time() - t0) / iters
        print(f"  {label}: {dt*1e3:.1f} ms/call "
              f"({F/dt:.0f} frags/s/call)")
        return dt

    print(f"timing F={F} B={B} S={S} max_in={max_in} n_levels={n_levels}")
    xla_jit = jax.jit(lambda *a: frag_align._frag_core_t(
        *a, S=S, max_in=max_in, n_levels=n_levels, carried=False,
        carry=None, want_state=False))
    t_x = bench(lambda: xla_jit(*args), "xla core (jit)")
    t_p = bench(lambda: frag_core_pallas(
        *args, S=S, max_in=max_in, n_levels=n_levels), "pallas core")
    print(f"  speedup: {t_x / t_p:.2f}x")


if __name__ == "__main__":
    main()
