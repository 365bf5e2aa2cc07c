"""Pallas polish kernel (interpret mode) vs the XLA kernel — bit-exact."""
import numpy as np

from graphchainer_tpu.align.polish import read_planes_of
from graphchainer_tpu.ops import linear_align
from graphchainer_tpu.ops.pallas_polish import polish_align_pallas
from graphchainer_tpu.utils.seq import match_masks


def test_pallas_polish_matches_xla(rng):
    # small sizes: the unrolled kernel is slow to trace in interpret mode
    R, bw = 2, 2
    reads = ["".join(rng.choice(list("ACGT"), 40)) for _ in range(R)]
    paths = ["".join(rng.choice(list("ACGT"), 50)) for _ in range(R)]
    rmax, pmax = 64, 64
    rw = rmax // 32
    read_planes = np.zeros((R, rw, 4), np.uint32)
    path_mm = np.zeros((R, pmax), np.uint8)
    for i in range(R):
        read_planes[i] = read_planes_of(match_masks(reads[i]), rw)
        pm = match_masks(paths[i])
        path_mm[i, :len(pm)] = pm
    rl = np.array([len(r) for r in reads], np.int32)
    pl_ = np.array([len(p) for p in paths], np.int32)
    ref = linear_align.polish_align(read_planes, path_mm, rl, pl_, bw)
    got = polish_align_pallas(read_planes, path_mm, rl, pl_, bw,
                              interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.dump_vp), np.asarray(got[0]))
    np.testing.assert_array_equal(np.asarray(ref.dump_vn), np.asarray(got[1]))
    np.testing.assert_array_equal(np.asarray(ref.dump_sb), np.asarray(got[2]))
    np.testing.assert_array_equal(np.asarray(ref.dump_base),
                                  np.asarray(got[3]))
