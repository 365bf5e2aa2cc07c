"""Multi-device execution: the production stages shard over the 8-device
virtual CPU mesh (conftest forces it) and must produce results identical
to unsharded single-device execution."""
import numpy as np
import jax

from graphchainer_tpu.parallel.collectives import merge_stats
from graphchainer_tpu.parallel.device import data_mesh, shard_rows


def test_mesh_is_live():
    assert len(jax.devices()) == 8
    assert data_mesh() is not None


def test_chain_scan_sharded_equals_unsharded(rng):
    from graphchainer_tpu.ops.chain_scan import _chain_scan, chain_scan
    R, A, E, KW = 13, 8, 16, 1      # R deliberately not divisible by 8
    x = rng.integers(0, 50, size=(R, A)).astype(np.int32)
    y = (x + rng.integers(1, 20, size=(R, A))).astype(np.int32)
    valid = rng.random((R, A)) < 0.8
    ev_type = rng.integers(-1, 4, size=(R, E)).astype(np.int32)
    ev_anchor = rng.integers(0, A, size=(R, E)).astype(np.int32)
    ev_k = rng.integers(0, KW * 32, size=(R, E)).astype(np.int32)
    ev_kmask = rng.integers(0, 1 << 32, size=(R, E, KW), dtype=np.uint32)
    ev_group = rng.integers(0, 4, size=(R, E)).astype(np.int32)
    sharded = chain_scan(x, y, valid, ev_type, ev_anchor, ev_k, ev_kmask,
                         ev_group)
    direct = _chain_scan(x, y, valid, ev_type, ev_anchor, ev_k, ev_kmask,
                         ev_group)
    np.testing.assert_array_equal(np.asarray(sharded.c_val),
                                  np.asarray(direct.c_val))
    np.testing.assert_array_equal(np.asarray(sharded.c_pred),
                                  np.asarray(direct.c_pred))


def test_polish_sharded_row_extension(rng):
    """polish_batch pads the read axis to the device count and shards;
    results must equal exact NW regardless (R=5 not divisible by 8)."""
    from graphchainer_tpu.align import polish
    from tests.test_polish import nw_edit_distance
    reads, paths = [], []
    for _ in range(5):
        r = "".join(rng.choice(list("ACGT"), int(rng.integers(40, 90))))
        p = list(r)
        for _ in range(4):
            p[int(rng.integers(0, len(p)))] = str(rng.choice(list("ACGT")))
        reads.append(r)
        paths.append("".join(p))
    out = polish.polish_batch(reads, paths, bw=4)
    for r, p, oc in zip(reads, paths, out):
        assert oc.score == nw_edit_distance(r, p)


def test_merge_stats_psum(rng):
    rows = rng.integers(0, 100, size=(13, 7)).astype(np.int64)
    got = merge_stats(rows)
    np.testing.assert_array_equal(got, rows.sum(axis=0))
    # empty batch
    np.testing.assert_array_equal(
        merge_stats(np.zeros((0, 7), np.int64)), np.zeros(7, np.int64))


def test_fragment_batch_actually_sharded():
    """run_fragments places chunk inputs across all 8 devices."""
    arr = np.zeros((16, 4), np.int32)
    sharded = shard_rows(arr)
    assert len(sharded.sharding.device_set) == 8
