"""Regression tests for round-2 robustness fixes:

* wide-band (B > 127) optimal-mode backtrace pointers must be int16
  (int8 slot ids wrapped at 128, corrupting path recovery),
* chain_scan int32 packing capacity is now guarded at runtime,
* polish retries with a doubled band when the backtrace escapes the
  band (n_ops == -1) instead of silently emitting no CIGAR,
* native band_build reports in-edges dropped by the max_in cap.
"""
import numpy as np
import pytest

from graphchainer_tpu import native
from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
from graphchainer_tpu.index.minimizer import build_index
from graphchainer_tpu.io.gfa import Bigraph
from graphchainer_tpu.models.optimal import OptimalAlignerModel, OptimalConfig


def linear_bigraph(rng, n_seg=150, seg_len=20):
    bg = Bigraph()
    prev = None
    seqs = []
    for i in range(n_seg):
        s = "".join(rng.choice(list("ACGT"), seg_len))
        seqs.append(s)
        cur = bg.add_segment(f"s{i}", s)
        if prev is not None:
            bg.links.append((prev, False, cur, False, 0))
        prev = cur
    return bg, seqs


def test_wide_band_backtrace_pointers():
    """A >127-slot component band must recover a correct path through
    slots >= 128 (best_in is int16 there; int8 wrapped)."""
    rng = np.random.default_rng(42)
    bg, seqs = linear_bigraph(rng)
    g = build_alignment_graph(bg)
    idx = build_index(g, k=11, w=5)
    model = OptimalAlignerModel(g, idx, OptimalConfig(polish_band_words=4))

    # exact substring deep in the chain (slots >= 128): segments 130..135
    # (kept to <= 128 rows so the padded slice count stays small — the
    # B=256 component kernel is expensive to compile on the CPU backend)
    read = "".join(seqs[130:136])
    # the forward strand is one component with >= 150 split nodes
    comps, counts = np.unique(g.comp, return_counts=True)
    c = int(comps[np.argmax(counts)])
    assert counts.max() >= 128, "test graph too small for the regression"
    band_nodes, band_in, band_level, n_real = model._component_band(c)
    assert band_nodes.shape[1] > 127

    score, path, end_col = model._align_component(read, c)
    assert score == 0
    assert path is not None and len(path) >= 2
    # every consecutive pair must be a real graph edge
    for u, v in zip(path, path[1:]):
        outs = g.out_idx[g.out_ptr[u]:g.out_ptr[u + 1]]
        assert v in outs, (u, v)
    # an exact match of 400 bp must span ~400 bp of path
    bp = int(g.node_len[path].sum())
    assert bp >= len(read)


def test_chain_scan_capacity_guard():
    from graphchainer_tpu.ops.chain_scan import chain_scan
    R, A, E, KW = 1, 4096, 4, 1
    x = np.zeros((R, A), np.int32)
    y = np.full((R, A), 600_000, np.int32)   # 600k * 4098 > 2^31
    with pytest.raises(ValueError, match="overflow"):
        chain_scan(x, y, np.ones((R, A), bool),
                   np.full((R, E), -1, np.int32),
                   np.zeros((R, E), np.int32), np.zeros((R, E), np.int32),
                   np.zeros((R, E, KW), np.uint32),
                   np.zeros((R, E), np.int32))


def test_polish_band_retry():
    """A 100-base insertion escapes the 1-word (32-row) band; the retry
    must widen the band and produce a full CIGAR with exact cost."""
    from graphchainer_tpu.align import polish
    from tests.test_polish import nw_edit_distance
    rng = np.random.default_rng(7)
    read = "".join(rng.choice(list("ACGT"), 300))
    path = read[:150] + "".join(rng.choice(list("ACGT"), 100)) + read[150:]
    oc = polish.polish_batch([read], [path], bw=1)[0]
    assert oc.ops is not None, "band retry did not recover a CIGAR"
    want = nw_edit_distance(read, path)
    assert oc.score == want
    # ops must consume both sequences fully and cost == score
    ri = pi = cost = 0
    for op in oc.ops:
        if op == 0:
            ri += 1
            pi += 1
        elif op == 3:
            ri += 1
            pi += 1
            cost += 1
        elif op == 1:
            pi += 1
            cost += 1
        else:
            ri += 1
            cost += 1
    assert (ri, pi, cost) == (len(read), len(path), oc.score)


def test_band_build_truncation_count():
    """A fan-in node with 6 in-band in-edges: max_in=4 must report 2
    dropped edges, max_in=8 none."""
    rng = np.random.default_rng(3)
    bg = Bigraph()
    mid = [bg.add_segment(f"m{i}", "".join(rng.choice(list("ACGT"), 8)))
           for i in range(6)]
    src = bg.add_segment("src", "ACGTACGT")
    sink = bg.add_segment("sink", "TTTTACGT")
    for m in mid:
        bg.links.append((src, False, m, False, 0))
        bg.links.append((m, False, sink, False, 0))
    g = build_alignment_graph(bg)
    # seed at the fwd-strand src split
    from graphchainer_tpu.align.anchors import GraphTensors
    gx = GraphTensors.build(g)
    # find the forward src split: the node whose sequence is ACGTACGT
    seed = next(v for v in range(g.n_nodes)
                if g.node_seq(v) == "ACGTACGT"
                and len(g.out_idx[g.out_ptr[v]:g.out_ptr[v + 1]]) == 6)
    seeds = np.array([seed], dtype=np.int64)
    slens = np.array([8], dtype=np.int64)
    _, _, _, t4 = native.band_build(g.n_nodes, gx.out_ptr, gx.out_idx,
                                 gx.node_len64, seeds, slens, 16, 64, 4,
                                 False)
    _, _, _, t8 = native.band_build(g.n_nodes, gx.out_ptr, gx.out_idx,
                                 gx.node_len64, seeds, slens, 16, 64, 8,
                                 False)
    assert t4 == 2, t4
    assert t8 == 0, t8
