"""Optimal alignment mode: the kernel with full-component band and free
start must equal the exact sequence-to-DAG DP (oracle with zero injection
everywhere)."""
import numpy as np
import pytest

from graphchainer_tpu.align import oracle as orc
from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
from graphchainer_tpu.index.minimizer import build_index
from graphchainer_tpu.io.gfa import load_gfa
from graphchainer_tpu.models.optimal import OptimalAlignerModel, OptimalConfig

from tests.conftest import TOY_READ
from tests.test_mpc import random_dag_bigraph


def exact_best_score(g, read, comp=None):
    """min over all end cells of the free-start DAG DP."""
    best = None
    comps = range(g.ncomp) if comp is None else [comp]
    for c in comps:
        nodes = np.nonzero(g.comp == c)[0]
        cg = orc.build_char_graph(g, nodes)
        inject = np.zeros(cg.n, dtype=np.int64)
        D = orc.dag_dp(cg, read, inject)
        sc = int(D[:, len(read)].min())
        if best is None or sc < best:
            best = sc
    return best


@pytest.mark.parametrize("seed", range(5))
def test_optimal_matches_exact_dp(seed):
    rng = np.random.default_rng(300 + seed)
    bg = random_dag_bigraph(rng, n_seg=8, p_edge=0.3, max_len=10)
    g = build_alignment_graph(bg)
    idx = build_index(g, k=5, w=3)
    model = OptimalAlignerModel(g, idx, OptimalConfig(polish_band_words=4))
    read = "".join(rng.choice(list("ACGT"), int(rng.integers(15, 50))))
    aln = model.align_batch([("r", read)])[0]
    want = exact_best_score(g, read)
    assert aln.score == want, (aln.score, want)
    # the CIGAR is consistent with the positions
    if aln.ops is not None and len(aln.positions):
        pathseq = "".join(g.node_seq(int(v))[int(o)]
                          for v, o in aln.positions)
        from tests.test_polish import nw_edit_distance
        # free-end-trimmed alignment: read vs kept path
        ri = pi = cost = 0
        for op in aln.ops:
            if op in (0, 3):
                cost += 0 if op == 0 else 1
                ri += 1
                pi += 1
            elif op == 1:
                pi += 1
                cost += 1
            else:
                ri += 1
                cost += 1
        assert ri == len(read) and pi == len(pathseq)
        assert cost == aln.score


def test_optimal_toy(toy_gfa):
    g = build_alignment_graph(load_gfa(toy_gfa))
    idx = build_index(g, k=11, w=5)
    model = OptimalAlignerModel(g, idx, OptimalConfig(polish_band_words=4))
    aln = model.align_batch([("read", TOY_READ)])[0]
    want = exact_best_score(g, TOY_READ)
    assert aln.score == want


@pytest.mark.fast
@pytest.mark.parametrize("seed", [1, 2])
def test_ckpt_oracle_bit_identical(seed):
    """dag_dp_ckpt / backtrace_ckpt == the full-table oracle, including
    the traceback tie-breaks (the r3 cap-lift machinery)."""
    from graphchainer_tpu.graph.simulate import tangle_bigraph
    from tests.test_e2e import simulate
    rng = np.random.default_rng(seed)
    g = build_alignment_graph(tangle_bigraph(rng, n_knots=4, arms=5,
                                             spacer=30, arm_len=6))
    cg = orc.build_char_graph(g)
    read, _ = simulate(rng, g, err=0.12, min_len=150)
    for inject in (np.zeros(cg.n, dtype=np.int64),
                   np.where(np.arange(cg.n) == cg.n // 3, 0,
                            orc.BIG).astype(np.int64)):
        D = orc.dag_dp(cg, read, inject)
        fin, ckpts, C = orc.dag_dp_ckpt(cg, read, inject)
        assert np.array_equal(D[:, len(read)], fin)
        end = int(np.argmin(D[:, len(read)]))
        p1, o1 = orc.backtrace(cg, D, read, inject, end)
        p2, o2 = orc.backtrace_ckpt(cg, read, inject, ckpts, C, end)
        assert np.array_equal(p1, p2) and np.array_equal(o1, o2)


def long_chain_bigraph(rng, n_seg, seg_len=10):
    from graphchainer_tpu.io.gfa import Bigraph
    bg = Bigraph()
    prev = None
    for i in range(n_seg):
        cur = bg.add_segment(
            f"s{i}", "".join(rng.choice(list("ACGT"), seg_len)))
        if prev is not None:
            bg.links.append((prev, False, cur, False, 0))
        prev = cur
    return bg


@pytest.mark.fast
def test_optimal_component_above_kernel_cap():
    """A component wider than max_component must take the exact host
    checkpointed path and still match the full-table oracle score."""
    rng = np.random.default_rng(11)
    g = build_alignment_graph(long_chain_bigraph(rng, 120, seg_len=8))
    idx = build_index(g, k=11, w=5)
    model = OptimalAlignerModel(
        g, idx, OptimalConfig(max_component=64, polish_band_words=4))
    read, _ = __import__(
        "tests.test_e2e", fromlist=["simulate"]).simulate(
            rng, g, err=0.1, min_len=200)
    aln = model.align_batch([("r", read)])[0]
    assert aln.score == exact_best_score(g, read)


@pytest.mark.slow
def test_optimal_50k_node_component():
    """VERDICT r2 #9 acceptance: exact result on a 50k-split-node
    component (kernel cap 4096 lifted via the checkpointed host DP;
    traceback over >20M cells via stripe recompute)."""
    rng = np.random.default_rng(13)
    g = build_alignment_graph(long_chain_bigraph(rng, 50_000, seg_len=10))
    assert int(np.max(np.bincount(g.comp))) >= 50_000
    idx = build_index(g, k=15, w=10)
    from graphchainer_tpu.graph.simulate import generate_path
    path_seq, _ = generate_path(g, seed=3)
    read = path_seq[100_000:100_400]        # error-free: exact ED == 0
    model = OptimalAlignerModel(g, idx, OptimalConfig(polish_band_words=4))
    aln = model.align_batch([("r", read)])[0]
    assert aln.score == 0
    assert aln.ops is not None and (aln.ops != 0).sum() == 0
    assert len(aln.positions) == len(read)
