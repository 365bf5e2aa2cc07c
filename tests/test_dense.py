"""Adversarial dense-graph correctness (VERDICT r2 weak #5): tangle-heavy
graphs with join in-degree far above the max_in band cap, nested
superbubbles, and (for GA mode) short cycles.  Pins a head-to-head win
over the reference binary's golden GAM, exact optimal mode, the
truncation counter, and the band-escalation retry."""
import os

import numpy as np
import pytest

from graphchainer_tpu.align import oracle as orc
from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
from graphchainer_tpu.graph.mpc import build_mpc
from graphchainer_tpu.graph.simulate import tangle_bigraph
from graphchainer_tpu.index.minimizer import build_index
from graphchainer_tpu.models.chainer import ChainerConfig, ChainerModel

from tests.test_e2e import simulate
from tests.test_polish import nw_edit_distance

pytestmark = pytest.mark.fast


@pytest.fixture(scope="module")
def dense():
    """Graph + reads EXACTLY as the pinned reference golden was made:
    tangle_bigraph(rng(5), ...) then 8 simulate() draws from the same
    stream (tests/data/dense_ref.gam provenance — refbuild binary,
    default params, harness total ED 281 / mean norm ED 0.1159)."""
    rng = np.random.default_rng(5)
    bg = tangle_bigraph(rng, n_knots=10, arms=8, spacer=40, arm_len=8)
    g = build_alignment_graph(bg)
    mpc = build_mpc(g)
    idx = build_index(g, k=13, w=6)
    reads = []
    for i in range(8):
        read, _ = simulate(rng, g, err=0.1, min_len=300)
        reads.append((f"r{i}", read))
    return rng, g, mpc, idx, reads


def oracle_ed(g, read):
    cg = orc.build_char_graph(g)
    D = orc.dag_dp(cg, read, np.zeros(cg.n, dtype=np.int64))
    return int(D[:, len(read)].min())


def harness_ed(g, read, positions):
    """The reference evaluation oracle's metric (scripts/summary.py,
    ported in scripts/summary_harness.py): edit distance between the
    read and the concatenation of FULL node sequences along the
    alignment's distinct node path (offsets ignored)."""
    path = []
    for v, o in positions:
        if not path or path[-1] != int(v):
            path.append(int(v))
    pathseq = "".join(g.node_seq(v) for v in path)
    return nw_edit_distance(read, pathseq)


def test_dense_graph_structure(dense):
    """The generator actually produces the stress shape."""
    _, g, _, _, _ = dense
    indeg = np.diff(g.in_ptr)
    assert indeg.max() >= 8, indeg.max()
    assert (indeg > 4).sum() >= 10


def test_dense_beats_reference_binary_golden(dense):
    """Head-to-head on the tangle set vs the reference binary's pinned
    GAM under the reference's own evaluation metric.  Our defaults
    (dense graph detected -> always-compare, like the reference) must
    match or beat it."""
    from graphchainer_tpu.io.gam_reader import load_gam_alignments
    _, g, mpc, idx, reads = dense
    golden = os.path.join(os.path.dirname(__file__), "data",
                          "dense_ref.gam")
    ref = {a.name: a for a in load_gam_alignments(golden)}
    name_to_id = {nm: i for i, nm in enumerate(g.names)}
    ref_tot = 0
    for name, read in reads:
        a = ref[name]
        pathseq = ""
        prev = None
        for m in a.mappings:
            if m.node_name == prev:
                continue
            prev = m.node_name
            di = name_to_id[m.node_name] * 2 + (1 if m.is_reverse else 0)
            pathseq += g.di_seqs[di]
        ref_tot += nw_edit_distance(read, pathseq)
    model = ChainerModel(g, mpc, idx, ChainerConfig(polish_band_words=4))
    assert model._dense_graph
    alns = model.align_batch(reads)
    our_tot = 0
    for (name, read), a in zip(reads, alns):
        assert not a.failed, name
        our_tot += harness_ed(g, read, a.positions)
    assert our_tot <= ref_tot, (our_tot, ref_tot)


def test_dense_optimal_mode_matches_oracle(dense):
    """--optimal-alignment is EXACT on the tangle graph (both banded
    heuristics — ours and the reference's — sit well above the oracle
    here; see test_dense_beats_reference_binary_golden)."""
    from graphchainer_tpu.models.optimal import OptimalAlignerModel
    _, g, _, idx, reads = dense
    opt = OptimalAlignerModel(g, idx)
    alns = opt.align_batch(reads[:3])
    for (name, read), a in zip(reads[:3], alns):
        assert a.score == oracle_ed(g, read), name


def test_dense_truncation_surfaces_in_counters(dense):
    rng, g, mpc, idx, reads = dense
    from graphchainer_tpu.utils import timers
    timers.reset()
    model = ChainerModel(g, mpc, idx, ChainerConfig(polish_band_words=4))
    model.align_batch(reads[:1])
    # join in-degree 8+ against max_in=4 must report dropped in-edges
    assert timers.counters().get("band_truncated_in_edges", 0) > 0


def test_escalation_recovers_truncated_reads(dense):
    """Force a tiny band/in-cap so the base pass degrades, then check
    the escalation retry (reference bandwidth ramp,
    src/GraphAlignerBitvectorBanded.h:572-644) recovers it.  Rescue,
    auto-compare AND the corridor re-polish are disabled in all three
    configs to isolate escalation (the corridor otherwise repairs the
    crippled-band damage on its own and erases the contrast); the
    cripple is band_slots=4/max_in=1 on 600bp reads — with the exact-DP
    stitch extension in place, milder cripples on short reads no longer
    measurably degrade quality (their loss sits at read ends, which the
    extension recovers band-free)."""
    _, g, mpc, idx, _ = dense
    rng = np.random.default_rng(1234)      # fresh; fixture rng is shared
    reads = [(f"e{i}", simulate(rng, g, err=0.1, min_len=600)[0])
             for i in range(6)]
    base = ChainerConfig(band_slots=4, max_in=1, band_slack=1,
                         polish_band_words=4, escalate_band=0,
                         rescue_threshold=0.0, auto_compare_dense=False,
                         bubble_repair=False)
    esc = ChainerConfig(band_slots=4, max_in=1, band_slack=1,
                        polish_band_words=4, escalate_band=64,
                        escalate_max_in=12, rescue_threshold=0.0,
                        escalate_threshold=0.05,
                        auto_compare_dense=False, bubble_repair=False)
    dflt = ChainerConfig(polish_band_words=4, escalate_band=0,
                         rescue_threshold=0.0, auto_compare_dense=False,
                         bubble_repair=False)
    a_base = ChainerModel(g, mpc, idx, base).align_batch(reads)
    a_esc = ChainerModel(g, mpc, idx, esc).align_batch(reads)
    a_dflt = ChainerModel(g, mpc, idx, dflt).align_batch(reads)
    worse = sum(a.score for a in a_base)
    better = sum(a.score for a in a_esc)
    dflt_tot = sum(a.score for a in a_dflt)
    # escalation strictly recovers part of the crippled-band loss ...
    assert better < worse, (better, worse)
    # ... and lands within a few edits of the full default-band quality
    # (measured: base 490, esc 455, default 448 on this pinned set)
    assert better <= dflt_tot + 10, (better, dflt_tot)


def test_cyclic_tangle_ga_mode():
    """Short cycles (GA mode): the SCC-ordered extension must still align
    reads through cyclic knots."""
    rng = np.random.default_rng(9)
    bg = tangle_bigraph(rng, n_knots=6, arms=6, spacer=40, arm_len=8,
                        cycle_every=2)
    g = build_alignment_graph(bg, allow_cycles=True)
    assert g.cyclic
    idx = build_index(g, k=13, w=6)
    from graphchainer_tpu.models.aligner import (AlignerConfig,
                                                 GraphAlignerModel)
    model = GraphAlignerModel(g, idx, AlignerConfig(band_slots=24,
                                                    polish_band_words=4))
    read, _ = simulate(rng, g, err=0.05, min_len=250)
    aln = model.align_batch([("r", read)])[0]
    assert not aln.failed
    assert aln.score <= len(read) * 0.25
