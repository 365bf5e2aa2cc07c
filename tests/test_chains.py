"""Chain decomposition (native find_chains) + chain-grouped seed
clustering (reference findChains/fixChainApproxPos,
src/AlignmentGraph.cpp:309-642; orderSeedsByChaining,
src/GraphAligner.h:233-295)."""
import numpy as np
import pytest

from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
from graphchainer_tpu.index.minimizer import SeedHit, cluster_seeds
from graphchainer_tpu.io.gfa import Bigraph


def linear_graph(rng, n_seg=4, seg_len=50):
    bg = Bigraph()
    prev = None
    for i in range(n_seg):
        s = bg.add_segment(f"s{i}", "".join(rng.choice(list("ACGT"),
                                                       seg_len)))
        if prev is not None:
            bg.links.append((prev, False, s, False, 0))
        prev = s
    return bg


def bubble_graph(rng):
    """head -> (armA | armB) -> tail"""
    bg = Bigraph()
    h = bg.add_segment("h", "".join(rng.choice(list("ACGT"), 60)))
    a = bg.add_segment("a", "".join(rng.choice(list("ACGT"), 40)))
    b = bg.add_segment("b", "".join(rng.choice(list("ACGT"), 40)))
    t = bg.add_segment("t", "".join(rng.choice(list("ACGT"), 60)))
    bg.links += [(h, False, a, False, 0), (h, False, b, False, 0),
                 (a, False, t, False, 0), (b, False, t, False, 0)]
    return bg


def test_linear_chain_single_and_monotone(rng):
    g = build_alignment_graph(linear_graph(rng))
    chain, pos = g.chains()
    # one weakly-connected DAG strand -> one chain per strand orientation
    fwd = [v for v in range(g.n_nodes) if not g.is_reverse(v)]
    assert len({int(chain[v]) for v in fwd}) == 1
    # position increases by node length along the forward path
    for v in fwd:
        for w in g.out_neighbors(v):
            w = int(w)
            if chain[w] != chain[v]:
                continue
            assert pos[w] == pos[v] + g.node_len[w], (v, w)


def test_bubble_arms_share_chain_and_diagonal(rng):
    g = build_alignment_graph(bubble_graph(rng))
    chain, pos = g.chains()
    # all four segments' fwd splits share one chain (tips + bubble)
    va, _ = g.find_split(g.names.index("a") * 2, 0)
    vb, _ = g.find_split(g.names.index("b") * 2, 0)
    vh, _ = g.find_split(g.names.index("h") * 2, 0)
    vt, _ = g.find_split(g.names.index("t") * 2, 0)
    assert chain[va] == chain[vb] == chain[vh] == chain[vt]
    # the arms start at the same in-chain coordinate
    assert pos[va] == pos[vb]


def test_cyclic_graph_chains_run():
    bg = Bigraph()
    a = bg.add_segment("a", "ACGTACGTAC")
    b = bg.add_segment("b", "TTGGCCAATT")
    c = bg.add_segment("c", "GGGTTTAAAC")
    bg.links += [(a, False, b, False, 0), (b, False, a, False, 0),
                 (b, False, c, False, 0)]
    g = build_alignment_graph(bg, allow_cycles=True)
    chain, pos = g.chains()
    assert len(chain) == g.n_nodes
    assert (pos > np.iinfo(np.int64).min).all()


def test_cluster_seeds_groups_across_bubble_arms(rng):
    """Seeds on both arms of a bubble at consistent read offsets land in
    ONE cluster (the exact failure mode of a topo-prefix coordinate)."""
    g = build_alignment_graph(bubble_graph(rng))
    d_h = g.names.index("h") * 2
    d_a = g.names.index("a") * 2
    d_b = g.names.index("b") * 2
    d_t = g.names.index("t") * 2
    seeds = [
        SeedHit(di_node=d_h, node_offset=10, seq_pos=10, match_len=15,
                goodness=1.0),
        SeedHit(di_node=d_a, node_offset=5, seq_pos=65, match_len=15,
                goodness=1.0),
        SeedHit(di_node=d_b, node_offset=5, seq_pos=65, match_len=15,
                goodness=1.0),
        SeedHit(di_node=d_t, node_offset=0, seq_pos=100, match_len=15,
                goodness=1.0),
    ]
    out = cluster_seeds(g, seeds, tolerance=100)
    # all four share a cluster: everyone gets the same cluster-bp bonus
    assert len({s.goodness for s in out}) == 1
    # and a decoy far off-diagonal scores lower
    seeds2 = seeds + [SeedHit(di_node=d_t, node_offset=50, seq_pos=5,
                              match_len=15, goodness=1.0)]
    out2 = cluster_seeds(g, seeds2, tolerance=100)
    assert out2[-1].seq_pos == 5 and out2[-1].goodness < out2[0].goodness
