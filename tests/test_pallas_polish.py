"""Pallas polish core (ops/pallas_polish2.py) vs the XLA lane-major core.

Interpret mode runs everywhere (CPU suite); the real Mosaic lowering is
exercised on the TPU by linear_align's capability probe + bench."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from graphchainer_tpu.ops import linear_align as LA
from graphchainer_tpu.ops.pallas_polish2 import polish_core_pallas
from graphchainer_tpu.utils.seq import match_masks


def make_batch(rng, R=128, RMAX=512, PMAX=512, err=0.08):
    reads, paths, rls, pls = [], [], [], []
    for i in range(R):
        L = int(rng.integers(40, PMAX - 10))
        path = "".join(rng.choice(list("ACGT"), L))
        read = list(path)
        for _ in range(int(L * err)):
            p = int(rng.integers(0, len(read)))
            op = int(rng.integers(0, 3))
            if op == 0:
                read[p] = str(rng.choice(list("ACGT")))
            elif op == 1 and len(read) > 2:
                del read[p]
            else:
                read.insert(p, str(rng.choice(list("ACGT"))))
        read = "".join(read)[:RMAX]
        reads.append(read)
        paths.append(path)
        rls.append(len(read))
        pls.append(len(path))
    planes_t = np.zeros((4, RMAX // 32, R), np.uint32)
    path_t = np.zeros((PMAX, R), np.uint32)
    for i, (rd, pt) in enumerate(zip(reads, paths)):
        mm = match_masks(rd)
        for j, v in enumerate(mm):
            for b in range(4):
                if (v >> b) & 1:
                    planes_t[b, j // 32, i] |= np.uint32(1) << (j % 32)
        path_t[:len(pt), i] = match_masks(pt)
    return (jnp.asarray(planes_t), jnp.asarray(path_t),
            jnp.asarray(np.array(rls, np.int32)),
            jnp.asarray(np.array(pls, np.int32)))


@pytest.mark.parametrize("bw", [4, 8])
def test_pallas_core_matches_xla_core(bw):
    rng = np.random.default_rng(5)
    planes_t, path_t, rl, pl_ = make_batch(rng)
    ref = LA._polish_core_t(planes_t, path_t, rl, pl_, bw)
    got = polish_core_pallas(planes_t, path_t, rl, pl_, bw,
                             interpret=True)
    for name, a, b in zip(("vp", "vn", "sb", "base"), ref, got):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name


def test_pallas_core_degenerate_lengths():
    """Short paths force max-rate band shifts through the slow branch."""
    rng = np.random.default_rng(9)
    planes_t, path_t, rl, pl_ = make_batch(rng, RMAX=512, PMAX=256)
    # make some paths much shorter than their reads (band slides >=1/col)
    pl_ = jnp.minimum(pl_, 48)
    bw = 4
    ref = LA._polish_core_t(planes_t, path_t, rl, pl_, bw)
    got = polish_core_pallas(planes_t, path_t, rl, pl_, bw,
                             interpret=True)
    for name, a, b in zip(("vp", "vn", "sb", "base"), ref, got):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name
