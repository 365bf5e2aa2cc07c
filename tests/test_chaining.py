"""Co-linear chaining tests: oracle semantics + device scan equivalence.

Independent oracle: O(A^2) DP with precedence = graph reachability of
end(j') -> start(j) (the MPC/last2reach machinery is exactly a fast
reachability filter, so C values must agree)."""
import numpy as np
import pytest

from graphchainer_tpu.align.anchors import Anchor
from graphchainer_tpu.align.chaining import (batch_arrays, best_chain,
                                             chain_oracle)
from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
from graphchainer_tpu.graph.mpc import build_mpc
from graphchainer_tpu.io.gfa import Bigraph, load_gfa
from graphchainer_tpu.ops.chain_scan import chain_scan

from tests.test_mpc import random_dag_bigraph


def reachability(g):
    n = g.n_nodes
    reach = np.zeros((n, n), dtype=bool)
    np.fill_diagonal(reach, True)
    for v in range(n - 1, -1, -1):
        for w in g.out_neighbors(v):
            reach[v] |= reach[int(w)]
    return reach


def quadratic_oracle(g, anchors):
    """C[j] by direct O(A^2) DP over the reachability partial order."""
    reach = reachability(g)
    A = len(anchors)
    x = np.array([a.x for a in anchors])
    y = np.array([a.y for a in anchors])
    ln = y - x + 1
    C = ln.astype(np.int64).copy()
    # iterate in topo order of start node (ties: by (y, x), matching the
    # reference's same-node sweep order) so predecessors are final
    for j in sorted(range(A),
                    key=lambda j: (anchors[j].path[0], y[j], x[j])):
        for jp in range(A):
            if jp == j:
                continue
            if not reach[anchors[jp].path[-1]][anchors[j].path[0]]:
                continue
            if anchors[jp].path[-1] == anchors[j].path[0] and jp == j:
                continue
            if y[jp] <= x[j] - 1:
                C[j] = max(C[j], C[jp] + ln[j])
            elif x[j] <= y[jp] <= y[j] - 1:
                C[j] = max(C[j], C[jp] - y[jp] + y[j])
    return C


def random_anchors(rng, g, n, read_len=120):
    anchors = []
    for _ in range(n):
        v = int(rng.integers(0, g.n_nodes))
        path = [v]
        for _ in range(int(rng.integers(0, 3))):
            outs = g.out_neighbors(path[-1])
            if len(outs) == 0:
                break
            path.append(int(rng.choice(outs)))
        x = int(rng.integers(0, read_len - 10))
        y = x + int(rng.integers(3, 30))
        anchors.append(Anchor(path=path, x=x, y=min(y, read_len - 1)))
    return anchors


@pytest.mark.parametrize("seed", range(8))
def test_oracle_matches_quadratic(seed):
    rng = np.random.default_rng(seed)
    bg = random_dag_bigraph(rng, n_seg=8, p_edge=0.3, max_len=4)
    g = build_alignment_graph(bg)
    mpc = build_mpc(g)
    anchors = random_anchors(rng, g, 12)
    C, pred = chain_oracle(g, mpc, anchors)
    C2 = quadratic_oracle(g, anchors)
    np.testing.assert_array_equal(C, C2)


@pytest.mark.parametrize("seed", range(6))
def test_device_scan_matches_oracle(seed):
    rng = np.random.default_rng(50 + seed)
    bg = random_dag_bigraph(rng, n_seg=8, p_edge=0.35, max_len=4)
    g = build_alignment_graph(bg)
    mpc = build_mpc(g)
    per_read = [random_anchors(rng, g, int(rng.integers(1, 15)))
                for _ in range(4)]
    arrs = batch_arrays(g, mpc, per_read)
    res = chain_scan(**{k: arrs[k] for k in
                        ("x", "y", "valid", "ev_type", "ev_anchor", "ev_k",
                         "ev_kmask", "ev_group")})
    for r, anchors in enumerate(per_read):
        C, pred = chain_oracle(g, mpc, anchors)
        np.testing.assert_array_equal(
            np.asarray(res.c_val)[r, :len(anchors)], C,
            err_msg=f"read {r} C mismatch")
        np.testing.assert_array_equal(
            np.asarray(res.c_pred)[r, :len(anchors)], pred,
            err_msg=f"read {r} pred mismatch")


def test_colinear_chain_on_linear_graph(rng):
    seq = "".join(rng.choice(list("ACGT"), 300))
    bg = Bigraph()
    bg.add_segment("x", seq)
    g = build_alignment_graph(bg)
    mpc = build_mpc(g)
    # anchors along the forward strand at increasing positions
    anchors = []
    for i in range(5):
        v, _ = g.find_split(0, 40 * i + 5)
        anchors.append(Anchor(path=[v], x=40 * i + 5, y=40 * i + 25))
    # one decoy far away in read coords but early in the graph
    v, _ = g.find_split(0, 10)
    anchors.append(Anchor(path=[v], x=250, y=260))
    C, pred = chain_oracle(g, mpc, anchors)
    ids, score = best_chain(g, anchors, C, pred)
    assert ids == [0, 1, 2, 3, 4] or score >= 5 * 21
    assert score == 5 * 21  # five non-overlapping 21bp anchors chain fully


def test_overlapping_anchors_coverage(rng):
    seq = "".join(rng.choice(list("ACGT"), 200))
    bg = Bigraph()
    bg.add_segment("x", seq)
    g = build_alignment_graph(bg)
    mpc = build_mpc(g)
    v0, _ = g.find_split(0, 5)
    v1, _ = g.find_split(0, 50)
    # two overlapping anchors: coverage counts the union
    anchors = [Anchor(path=[v0], x=10, y=30), Anchor(path=[v1], x=20, y=45)]
    C, pred = chain_oracle(g, mpc, anchors)
    assert int(C[1]) == (30 - 10 + 1) + (45 - 30)  # union of [10,30],[20,45]
    assert int(pred[1]) == 0


@pytest.mark.parametrize("seed", range(4))
def test_batch_arrays_matches_build_events(seed):
    """The vectorized whole-batch packer must reproduce the per-read
    build_events lists bit for bit (type/anchor/k/kmask/group order)."""
    from graphchainer_tpu.align.chaining import build_events
    rng = np.random.default_rng(90 + seed)
    bg = random_dag_bigraph(rng, n_seg=9, p_edge=0.3, max_len=5)
    g = build_alignment_graph(bg)
    mpc = build_mpc(g)
    per_read = [random_anchors(rng, g, int(rng.integers(1, 18)))
                for _ in range(5)]
    arrs = batch_arrays(g, mpc, per_read)
    for r, anchors in enumerate(per_read):
        ev = build_events(g, mpc, anchors)
        ne = len(ev.ev_type)
        np.testing.assert_array_equal(arrs["ev_type"][r, :ne], ev.ev_type)
        np.testing.assert_array_equal(arrs["ev_anchor"][r, :ne],
                                      ev.ev_anchor)
        np.testing.assert_array_equal(arrs["ev_k"][r, :ne], ev.ev_k)
        np.testing.assert_array_equal(arrs["ev_group"][r, :ne],
                                      ev.ev_group)
        kw = ev.ev_kmask.shape[1]
        np.testing.assert_array_equal(
            arrs["ev_kmask"][r, :ne, :kw], ev.ev_kmask)
        assert (arrs["ev_type"][r, ne:] == -1).all()
        n = len(anchors)
        np.testing.assert_array_equal(
            arrs["x"][r, :n], [a.x for a in anchors])
        np.testing.assert_array_equal(
            arrs["y"][r, :n], [a.y for a in anchors])
        assert arrs["valid"][r, :n].all()
        assert not arrs["valid"][r, n:].any()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_anchor_kmask_scan_matches_event_kmask(seed):
    """chain_scan over the per-ANCHOR kmask table (a_kmask, the slim
    wire form) is bit-identical to the per-event kmask path."""
    from graphchainer_tpu.align.chaining import batch_arrays_cols
    from graphchainer_tpu.ops.chain_scan import chain_scan
    rng = np.random.default_rng(700 + seed)
    bg = random_dag_bigraph(rng, n_seg=10, p_edge=0.3, max_len=5)
    g = build_alignment_graph(bg)
    mpc = build_mpc(g)
    per_read = [random_anchors(rng, g, int(rng.integers(1, 18)))
                for _ in range(5)]
    counts = np.array([len(a) for a in per_read], dtype=np.int64)
    s = np.array([a.path[0] for anc in per_read for a in anc])
    e = np.array([a.path[-1] for anc in per_read for a in anc])
    ax = np.array([a.x for anc in per_read for a in anc])
    ay = np.array([a.y for anc in per_read for a in anc])
    ev = batch_arrays_cols(g, mpc, counts, s, e, ax, ay)
    an = batch_arrays_cols(g, mpc, counts, s, e, ax, ay,
                           anchor_kmask=True)
    keys = ("x", "y", "valid", "ev_type", "ev_anchor", "ev_k", "ev_group")
    for k in keys:
        np.testing.assert_array_equal(ev[k], an[k])
    r_ev = chain_scan(**{k: ev[k] for k in keys}, ev_kmask=ev["ev_kmask"])
    r_an = chain_scan(**{k: an[k] for k in keys}, a_kmask=an["a_kmask"])
    np.testing.assert_array_equal(np.asarray(r_ev.c_val),
                                  np.asarray(r_an.c_val))
    np.testing.assert_array_equal(np.asarray(r_ev.c_pred),
                                  np.asarray(r_an.c_pred))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_chain_scan_anchors_matches_host_packer(seed):
    """The fused on-device event builder (anchors + resident last2reach
    tables -> sort -> scan, ops/chain_scan.chain_scan_anchors) is
    bit-identical to the host event packer + chain_scan."""
    from graphchainer_tpu.align.chaining import batch_arrays_cols
    from graphchainer_tpu.ops.chain_scan import (chain_scan,
                                                 chain_scan_anchors)
    rng = np.random.default_rng(4200 + seed)
    bg = random_dag_bigraph(rng, n_seg=11, p_edge=0.3, max_len=5)
    g = build_alignment_graph(bg)
    mpc = build_mpc(g)
    per_read = [random_anchors(rng, g, int(rng.integers(1, 20)))
                for _ in range(6)]
    counts = np.array([len(a) for a in per_read], dtype=np.int64)
    s = np.array([a.path[0] for anc in per_read for a in anc])
    e = np.array([a.path[-1] for anc in per_read for a in anc])
    ax = np.array([a.x for anc in per_read for a in anc])
    ay = np.array([a.y for anc in per_read for a in anc])

    arrs = batch_arrays_cols(g, mpc, counts, s, e, ax, ay,
                             anchor_kmask=True)
    ref = chain_scan(**{k: arrs[k] for k in
                        ("x", "y", "valid", "ev_type", "ev_anchor",
                         "ev_k", "a_kmask", "ev_group")})
    got = chain_scan_anchors(g, mpc, counts, s, e, ax, ay)
    assert got is not None
    R = len(counts)
    A = min(np.asarray(ref.c_val).shape[1], np.asarray(got.c_val).shape[1])
    np.testing.assert_array_equal(np.asarray(got.c_val)[:R, :A],
                                  np.asarray(ref.c_val)[:R, :A])
    np.testing.assert_array_equal(np.asarray(got.c_pred)[:R, :A],
                                  np.asarray(ref.c_pred)[:R, :A])
