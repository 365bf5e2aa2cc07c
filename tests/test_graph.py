"""Graph core tests: GFA parse, digraph doubling, split nodes, topo order.

Oracle strategy mirrors SURVEY.md §4: structural invariants (every edge
respects topo order, split nodes tile their digraph node, revcomp pairing)
plus hand-computed expectations on the reference's toy bubble graph.
"""
import numpy as np
import pytest

from graphchainer_tpu.constants import SPLIT_LEN
from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
from graphchainer_tpu.io.gfa import Bigraph, load_gfa
from graphchainer_tpu.utils.seq import revcomp


def test_load_toy_gfa(toy_gfa):
    bg = load_gfa(toy_gfa)
    assert bg.names == ["1", "2", "3", "4"]
    assert bg.seqs[1] == "A" and bg.seqs[2] == "T"
    assert len(bg.links) == 4


def test_build_toy_graph(toy_gfa):
    g = build_alignment_graph(load_gfa(toy_gfa))
    # 8 digraph nodes; node 1 (44bp) -> 2 splits per strand, node 4 (42bp)
    # -> 2 splits per strand, nodes 2,3 -> 1 each: total (2+1+1+2)*2 = 12.
    assert g.n_digraph == 8
    assert g.n_nodes == 12
    st = g.stats()
    assert st["total_bp"] == 2 * (44 + 1 + 1 + 42)
    # both strands form separate components here (no self-revcomp links)
    assert g.ncomp == 2
    # topo validity: every edge goes forward in node numbering
    for v in range(g.n_nodes):
        for w in g.out_neighbors(v):
            assert w > v
    # split nodes tile each digraph node exactly
    for d in range(g.n_digraph):
        splits = g.di_splits[g.di_ptr[d]:g.di_ptr[d + 1]]
        seq = "".join(g.node_seq(int(s)) for s in splits)
        assert seq == g.di_seqs[d]
    # revcomp pairing
    assert g.di_seqs[1] == revcomp(g.di_seqs[0])


def test_path_sequences_through_bubble(toy_gfa):
    g = build_alignment_graph(load_gfa(toy_gfa))
    bg = load_gfa(toy_gfa)
    # forward strand: path 1->2->4 spells seq1 + "A" + seq4
    s1, _ = g.find_split(0, 0)  # digraph node 0 = segment "1" forward
    # walk forward greedily along out-edges staying on forward strand
    # (forward digraph nodes are even)
    paths = []

    def dfs(v, acc):
        acc = acc + [v]
        outs = [w for w in g.out_neighbors(v) if g.orig_node[w] % 2 == 0]
        if not outs:
            paths.append(acc)
        for w in outs:
            dfs(int(w), acc)

    dfs(s1, [])
    spelled = sorted(g.path_seq(p) for p in paths)
    expected = sorted([bg.seqs[0] + "A" + bg.seqs[3],
                       bg.seqs[0] + "T" + bg.seqs[3]])
    assert spelled == expected


def test_overlap_trimming():
    bg = Bigraph()
    bg.add_segment("a", "ACGTACGT")
    bg.add_segment("b", "CGTTTTT")
    # 3M overlap: path spells ACGTACGT + TTTT
    bg.links.append((0, False, 1, False, 3))
    g = build_alignment_graph(bg)
    # find forward path from start of a
    v, _ = g.find_split(0, 0)
    seq = g.node_seq(v)
    while True:
        outs = [w for w in g.out_neighbors(v) if g.orig_node[w] % 2 == 0]
        if not outs:
            break
        v = int(outs[0])
        seq += g.node_seq(v)
    assert seq == "ACGTACGT" + "TTTT"


def test_long_node_split(rng):
    bg = Bigraph()
    seq = "".join(rng.choice(list("ACGT")) for _ in range(200))
    bg.add_segment("long", seq)
    g = build_alignment_graph(bg)
    assert all(1 <= l <= SPLIT_LEN for l in g.node_len)
    d_splits = g.di_splits[g.di_ptr[0]:g.di_ptr[1]]
    assert "".join(g.node_seq(int(s)) for s in d_splits) == seq


def test_eq_bitplanes_match_sequence(toy_gfa):
    g = build_alignment_graph(load_gfa(toy_gfa))
    code = {"A": 0, "C": 1, "G": 2, "T": 3}
    for v in range(g.n_nodes):
        seq = g.node_seq(v)
        for j, ch in enumerate(seq):
            for b in range(4):
                bit = (int(g.node_eq[v, b]) >> j) & 1
                assert bit == (1 if code[ch] == b else 0)
        # bits beyond node length are zero
        for j in range(len(seq), SPLIT_LEN):
            for b in range(4):
                assert ((int(g.node_eq[v, b]) >> j) & 1) == 0


def test_cycle_rejected():
    bg = Bigraph()
    bg.add_segment("a", "ACGT")
    bg.add_segment("b", "GGGG")
    bg.links.append((0, False, 1, False, 0))
    bg.links.append((1, False, 0, False, 0))
    with pytest.raises(ValueError, match="cycle"):
        build_alignment_graph(bg)


def test_reverse_position(toy_gfa):
    g = build_alignment_graph(load_gfa(toy_gfa))
    # base at (segment 1 fwd, offset 5) must map to revcomp strand
    v, off = g.find_split(0, 5)
    rv, roff = g.reverse_position(v, off)
    assert int(g.orig_node[rv]) == 1
    fwd_base = g.node_seq(v)[off]
    rc_base = g.node_seq(rv)[roff]
    assert rc_base == revcomp(fwd_base)


def test_approx_pos_bubble_arms_share_coordinate(rng):
    """Longest-path approx positions (the chainApproxPos analogue,
    reference src/AlignmentGraph.cpp:309-642): both arms of a bubble
    project to the same coordinate, and positions are strictly
    increasing along any edge."""
    from tests.test_e2e import bubble_graph
    g = build_alignment_graph(bubble_graph(rng))
    pos = g.approx_linear_pos()
    by_name = {}
    for v in range(g.n_nodes):
        if not g.is_reverse(v) and g.orig_offset[v] == 0:
            by_name[g.gfa_name(v)] = v
    for i in range(12):
        assert pos[by_name[f"a{i}"]] == pos[by_name[f"b{i}"]]
    for v in range(g.n_nodes):
        for w in g.out_neighbors(v):
            assert pos[w] >= pos[v] + g.node_len[v] or w <= v
