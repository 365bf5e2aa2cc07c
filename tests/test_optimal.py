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
