"""Output parity vs the reference binary (algbio/GraphChainer).

Golden files in tests/data/ were produced by the reference binary built
offline via scripts/refbuild/build_reference.sh (stub deps; minimizer
path only) on its own smoke inputs /root/reference/test/graph.gfa +
read.fa:

  ref_toy.gam: 1 alignment, path 1>2>4, score 5, identity 0.9167
  ref_toy.gaf: the matching GAF line

These tests pin (a) that our GAM/GAF readers handle the reference's
actual wire output, and (b) that our aligner produces the same chain
path and edit distance on the same inputs — so any drift in either
direction fails here.
"""
import os

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")
TOY_GFA = "/root/reference/test/graph.gfa"
TOY_READ_FA = "/root/reference/test/read.fa"


def test_golden_gam_parses_with_reference_semantics():
    from graphchainer_tpu.io.gam_reader import load_gam_alignments
    alns = load_gam_alignments(os.path.join(DATA, "ref_toy.gam"))
    assert len(alns) == 1
    a = alns[0]
    assert a.name == "read"
    assert a.score == 5
    assert abs(a.identity - 0.916667) < 1e-4
    # the reference writes internal ids in node_id and the original GFA
    # segment name in Position.name (src/Aligner.cpp:152-165)
    assert [m.node_name for m in a.mappings] == ["1", "2", "4"]
    assert a.mappings[0].offset == 3
    assert not any(m.is_reverse for m in a.mappings)
    # edits must reconstruct the full 71bp read
    to_len = sum(e.get("to_length", 0) for m in a.mappings
                 for e in m.edits)
    assert to_len == len(a.sequence) == 71


def test_golden_gaf_fields():
    line = open(os.path.join(DATA, "ref_toy.gaf")).read().strip()
    cols = line.split("\t")
    assert cols[0] == "read"
    assert cols[5] == ">1>2>4"
    assert int(cols[1]) == 71


@pytest.mark.skipif(not os.path.exists(TOY_GFA),
                    reason="reference checkout not present")
def test_same_path_and_score_as_reference():
    """Our CLC pipeline on the reference's smoke inputs must produce the
    same chain path (1>2>4) and the same edit distance (5) the golden
    reference GAM records."""
    from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
    from graphchainer_tpu.graph.mpc import build_mpc
    from graphchainer_tpu.index.minimizer import build_index
    from graphchainer_tpu.io.fastq import stream_reads
    from graphchainer_tpu.io.gfa import load_gfa
    from graphchainer_tpu.models.chainer import ChainerConfig, ChainerModel

    g = build_alignment_graph(load_gfa(TOY_GFA))
    mpc = build_mpc(g)
    idx = build_index(g, k=15, w=20)
    model = ChainerModel(g, mpc, idx, ChainerConfig())
    reads = [(r.name, r.seq) for r in stream_reads(TOY_READ_FA)]
    aln = model.align_batch(reads)[0]
    assert not aln.failed
    assert aln.score == 5

    from graphchainer_tpu.align.emit import to_mappings
    names = []
    for m in to_mappings(g, aln):
        if not names or names[-1] != m.node_name:
            names.append(m.node_name)
    assert names == ["1", "2", "4"]


@pytest.mark.skipif(not os.path.exists(TOY_GFA),
                    reason="reference checkout not present")
def test_summary_harness_on_golden(tmp_path):
    """The summary.py-port oracle must score the golden reference GAM and
    a fresh GAM from our pipeline identically (global ED 21 = 5 span
    edits + 16 extra full-node context bp the summary.py metric
    charges)."""
    import subprocess
    import sys
    out_csv = tmp_path / "summary.csv"
    r = subprocess.run(
        [sys.executable, "scripts/summary_harness.py", TOY_GFA,
         TOY_READ_FA, str(out_csv),
         f"ref={os.path.join(DATA, 'ref_toy.gam')}"],
        capture_output=True, text=True, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr
    lines = open(out_csv).read().strip().split("\n")
    assert len(lines) == 2
    header = lines[0].split(",")
    row = dict(zip(header, lines[1].split(",")))
    assert row["name"] == "read"
    assert row["ref_pathcnt"] == "3"
    assert row["ref_path_bps"] == "87"
    # global ED of the 71bp read vs the 87bp full-node path sequence
    # (verified against an exact scalar NW)
    assert int(row["ref_global_ed"]) == 21
    assert row["ref_ed_capped"] == "0"


REF_BIN = "/tmp/refbuild/bin/GraphChainer"


@pytest.mark.skipif(not os.path.exists(REF_BIN),
                    reason="reference binary not built "
                           "(scripts/refbuild/build_reference.sh)")
def test_live_head_to_head_vs_reference_binary(tmp_path):
    """Run the REAL reference binary and our pipeline on one simulated
    workload and compare per-read outcomes: same aligned set, clean reads
    perfectly aligned on both sides, and per-read edit distance within
    noise of the reference's (the summary.py oracle metric)."""
    import subprocess
    import sys

    from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
    from graphchainer_tpu.graph.mpc import build_mpc
    from graphchainer_tpu.graph.simulate import generate_path, simulate_reads
    from graphchainer_tpu.index.minimizer import build_index
    from graphchainer_tpu.io.gam_reader import load_gam_alignments
    from graphchainer_tpu.io.gfa import load_gfa
    from graphchainer_tpu.models.chainer import ChainerConfig, ChainerModel
    from tests.test_polish import nw_edit_distance

    rng = np.random.default_rng(31)
    # bench-shaped variation graph, written as GFA for both sides
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bm)
    bg = bm.build_bench_graph(rng, 30_000)
    gfa = tmp_path / "g.gfa"
    with open(gfa, "w") as f:
        f.write("H\tVN:Z:1.0\n")
        for name, seq in zip(bg.names, bg.seqs):
            f.write(f"S\t{name}\t{seq}\n")
        for a, ar, b, br, ov in bg.links:
            f.write(f"L\t{bg.names[a]}\t{'-' if ar else '+'}"
                    f"\t{bg.names[b]}\t{'-' if br else '+'}\t{ov}M\n")
    g = build_alignment_graph(load_gfa(str(gfa)))
    path_seq, _ = generate_path(g, seed=3)
    reads = simulate_reads(path_seq, 20, 1500, seed=11, error_rate=0.08,
                           len_std=150)
    # four error-free reads: both aligners must nail these
    for i in range(4):
        a = int(rng.integers(0, len(path_seq) - 1200))
        reads.append((f"clean{i}", path_seq[a:a + 1200]))
    fa = tmp_path / "r.fa"
    with open(fa, "w") as f:
        for name, seq in reads:
            f.write(f">{name}\n{seq}\n")

    ref_gam = tmp_path / "ref.gam"
    r = subprocess.run([REF_BIN, "-g", str(gfa), "-f", str(fa), "-a",
                        str(ref_gam), "-t", "1"], capture_output=True,
                       text=True, timeout=560)
    assert r.returncode == 0, r.stderr[-1500:]

    mpc = build_mpc(g)
    idx = build_index(g, k=15, w=10)
    model = ChainerModel(g, mpc, idx, ChainerConfig())
    ours = model.align_batch(reads)

    # per-read edit distance via the same oracle (read vs path sequence)
    ref_ed = {}
    for a in load_gam_alignments(str(ref_gam)):
        pathseq = []
        name_ids = {n: i for i, n in enumerate(g.names)}
        for m in a.mappings:
            d = name_ids[m.node_name] * 2 + (1 if m.is_reverse else 0)
            s = g.di_seqs[d]
            ln = sum(e.get("from_length", 0) for e in m.edits)
            pathseq.append(s[m.offset:m.offset + ln])
        ref_ed[a.name] = nw_edit_distance(a.sequence, "".join(pathseq))
    assert len(ref_ed) == len(reads), "reference dropped reads"

    n_worse = 0
    for (name, seq), aln in zip(reads, ours):
        assert not aln.failed, f"we failed {name}"
        our_ed = nw_edit_distance(seq, model.gx.positions_seq(
            aln.positions))
        if name.startswith("clean"):
            assert our_ed == 0, f"{name}: our ed {our_ed}"
            assert ref_ed[name] <= 2, f"{name}: ref ed {ref_ed[name]}"
        # parity envelope: within 1% of read length of the reference
        if our_ed > ref_ed[name] + 0.01 * len(seq):
            n_worse += 1
    assert n_worse <= 1, f"{n_worse} reads materially worse than reference"


@pytest.mark.fast
@pytest.mark.skipif(not os.path.exists(TOY_GFA),
                    reason="reference checkout not present")
def test_gam_wire_parity_with_reference():
    """Field-level wire parity with the reference binary's GAM message on
    the toy inputs (VERDICT r2 #6).  Byte-equal except for one documented
    delta: WITHIN equal-cost regions the reference's word-sliced
    backtrace (src/GraphAlignerBitvectorCommon.h:392-544) can split edits
    at different columns than our polish backtrace (both walks follow the
    same INS > diag > DEL tie order now; the residue is the reference's
    per-word corner-crossing rules).  Everything the wire carries besides
    those split points must match byte-for-byte semantics: field
    presence, ids, offsets, ranks, scores, per-mapping from/to totals."""
    import gzip

    from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
    from graphchainer_tpu.graph.mpc import build_mpc
    from graphchainer_tpu.index.minimizer import build_index
    from graphchainer_tpu.io.gam import alignment_message
    from graphchainer_tpu.io.gfa import load_gfa
    from graphchainer_tpu.models.chainer import ChainerConfig, ChainerModel

    def rd_varint(b, i):
        v = s = 0
        while True:
            x = b[i]; i += 1
            v |= (x & 0x7F) << s
            s += 7
            if not x & 0x80:
                return v, i

    def fields(b):
        """[(field, wiretype, value-or-bytes)] of one proto message."""
        i = 0
        out = []
        while i < len(b):
            tag, i = rd_varint(b, i)
            f, wt = tag >> 3, tag & 7
            if wt == 0:
                v, i = rd_varint(b, i)
            elif wt == 2:
                ln, i = rd_varint(b, i)
                v = b[i:i + ln]
                i += ln
            elif wt == 1:
                v = b[i:i + 8]
                i += 8
            else:
                raise AssertionError(f"wiretype {wt}")
            out.append((f, wt, v))
        return out

    raw = gzip.open(os.path.join(DATA, "ref_toy.gam"), "rb").read()
    cnt, i = rd_varint(raw, 0)
    ln, i = rd_varint(raw, i)
    ref_msg = raw[i:i + ln]

    g = build_alignment_graph(load_gfa(TOY_GFA))
    mpc = build_mpc(g)
    idx = build_index(g, k=15, w=20)
    model = ChainerModel(g, mpc, idx, ChainerConfig())
    name, seq = open(TOY_READ_FA).read().strip().split("\n")
    aln = model.align_batch([(name[1:], seq)])[0]
    our_msg = alignment_message(g, aln)

    rf, of = dict_fields(ref_msg, fields), dict_fields(our_msg, fields)
    # top-level: sequence(1), name(3), score(6) byte-equal
    for f in (1, 3, 6):
        assert rf.get(f) == of.get(f), f"alignment field {f}"
    # path: same mapping count; per mapping same Position message
    # (node_id/offset/is_reverse/name), same rank, same edit totals
    ref_maps = [v for fl, wt, v in fields(rf[2][0][2]) if fl == 2]
    our_maps = [v for fl, wt, v in fields(of[2][0][2]) if fl == 2]
    assert len(ref_maps) == len(our_maps)
    for rm, om in zip(ref_maps, our_maps):
        rfs, ofs = fields(rm), fields(om)
        rpos = [v for f, w, v in rfs if f == 1]
        opos = [v for f, w, v in ofs if f == 1]
        assert rpos == opos, "Position submessage"
        rrank = [v for f, w, v in rfs if f == 5]
        orank = [v for f, w, v in ofs if f == 5]
        assert rrank == orank, "rank"
        def totals(fs):
            fr = to = 0
            for f, w, v in fs:
                if f != 2:
                    continue
                for ef, ew, ev in fields(v):
                    if ef == 1:
                        fr += ev
                    elif ef == 2:
                        to += ev
            return fr, to
        assert totals(rfs) == totals(ofs), "edit from/to totals"


def dict_fields(msg, fields):
    d = {}
    for f, wt, v in fields(msg):
        d.setdefault(f, []).append((f, wt, v))
    return d


def test_golden100_per_read_ed_vs_pinned_reference(tmp_path):
    """Pinned 100-read golden set (VERDICT r2 #6): regenerate the exact
    workload scripts/make_golden100.py ran through the reference binary
    (seeds pinned there), align it with our pipeline, and require our
    per-read edit distance to MATCH OR BEAT the pinned reference ED on
    >= 95% of reads, with every read aligned.  Runs without the
    reference binary — its numbers live in tests/data/golden100.json."""
    import importlib.util
    import json as _json

    from graphchainer_tpu.graph.mpc import build_mpc
    from graphchainer_tpu.index.minimizer import build_index
    from graphchainer_tpu.models.chainer import ChainerConfig, ChainerModel
    from tests.test_polish import nw_edit_distance

    golden = _json.load(open(os.path.join(DATA, "golden100.json")))
    spec = importlib.util.spec_from_file_location(
        "make_golden100", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "make_golden100.py"))
    mg = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mg)
    _gfa, g, reads = mg.build_workload(str(tmp_path))
    assert len(reads) == golden["n_reads"] == 100
    # workload must be byte-identical to what the reference binary saw
    for name, seq in reads:
        assert golden["reads"][name]["len"] == len(seq), name

    model = ChainerModel(g, build_mpc(g), build_index(g, k=15, w=10),
                         ChainerConfig())
    ours = model.align_batch(reads)

    n_le = 0
    n_aligned = 0
    deltas = []
    worse = []
    for (name, seq), aln in zip(reads, ours):
        ref_ed = golden["reads"][name]["ref_ed"]
        if aln.failed:
            continue
        n_aligned += 1
        our_ed = nw_edit_distance(seq, model.gx.positions_seq(
            aln.positions))
        if ref_ed is None or our_ed <= ref_ed:
            n_le += 1
        else:
            worse.append((name, our_ed, ref_ed))
        if ref_ed is not None:
            deltas.append(our_ed - ref_ed)
    assert n_aligned == 100, f"only {n_aligned}/100 aligned"
    # Pinned bars (ratchet upward as quality lands; history: r3 baseline
    # was n_le=15 mean +10.3/read; corridor re-polish -> 24 / +2.4;
    # + exact-DP tail extension -> 93 / +0.22; + corridor arms at
    # partial-run boundaries -> 98 / +0.10, median 0).
    mean_delta = float(np.mean(deltas))
    assert mean_delta <= 0.3, (
        f"mean per-read ED delta vs reference regressed: {mean_delta:.2f} "
        f"(pinned <= 0.3); worst {sorted(worse, key=lambda t: t[2]-t[1])[:8]}")
    assert n_le >= 95, (f"beat/matched reference on only {n_le}/100 "
                        "(pinned >= 95): "
                        f"{sorted(worse, key=lambda t: t[2]-t[1])[:8]}")


def test_golden_badread_per_read_ed(tmp_path):
    """Pinned badread-profile golden set (VERDICT r4 missing #4): the
    realistic long-read error regime — per-read identity spread, bursty
    error clusters, homopolymer indels (graph/simulate.
    mutate_read_badread) — regenerated exactly as
    scripts/make_golden_badread.py ran it through the reference binary.
    Requires our per-read ED to match or beat the pinned reference on
    >= 90% of reads with every read aligned."""
    import importlib.util
    import json as _json

    from graphchainer_tpu.graph.mpc import build_mpc
    from graphchainer_tpu.index.minimizer import build_index
    from graphchainer_tpu.models.chainer import ChainerConfig, ChainerModel
    from tests.test_polish import nw_edit_distance

    golden = _json.load(open(os.path.join(DATA, "golden_badread.json")))
    spec = importlib.util.spec_from_file_location(
        "make_golden_badread", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts",
            "make_golden_badread.py"))
    mg = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mg)
    _gfa, g, reads = mg.build_workload(str(tmp_path))
    assert len(reads) == golden["n_reads"] == 80
    for name, seq in reads:
        assert golden["reads"][name]["len"] == len(seq), name

    model = ChainerModel(g, build_mpc(g), build_index(g, k=15, w=10),
                         ChainerConfig())
    ours = model.align_batch(reads)

    n_le = 0
    n_aligned = 0
    deltas = []
    worse = []
    for (name, seq), aln in zip(reads, ours):
        ref_ed = golden["reads"][name]["ref_ed"]
        if aln.failed:
            continue
        n_aligned += 1
        our_ed = nw_edit_distance(seq, model.gx.positions_seq(
            aln.positions))
        if ref_ed is None or our_ed <= ref_ed:
            n_le += 1
        else:
            worse.append((name, our_ed, ref_ed))
        if ref_ed is not None:
            deltas.append(our_ed - ref_ed)
    assert n_aligned == 80, f"only {n_aligned}/80 aligned"
    mean_delta = float(np.mean(deltas))
    assert mean_delta <= 1.0, (
        f"mean per-read ED delta vs reference regressed under the "
        f"badread profile: {mean_delta:.2f} (pinned <= 1.0); worst "
        f"{sorted(worse, key=lambda t: t[2]-t[1])[:8]}")
    assert n_le >= 72, (f"beat/matched reference on only {n_le}/80 "
                        "(pinned >= 72): "
                        f"{sorted(worse, key=lambda t: t[2]-t[1])[:8]}")


@pytest.mark.fast
@pytest.mark.skipif(not os.path.exists(TOY_GFA),
                    reason="reference checkout not present")
def test_ref_edit_rendering_nonminimal():
    """Pins GAM_PARITY.md divergence class 2: the reference's CLC-mode
    edit list is a lossy re-rendering (edlib trace -> clamped
    MatrixPosition conversion, src/Aligner.cpp:845-877 -> pairwise
    re-derivation, src/GraphAlignerVGAlignment.h:37-70) that renders the
    toy read with SIX error bases at score 5, while our edit list is the
    canonical minimal script with exactly five.  If either side's
    rendering drifts, this fails and GAM_PARITY.md needs updating."""
    from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
    from graphchainer_tpu.graph.mpc import build_mpc
    from graphchainer_tpu.index.minimizer import build_index
    from graphchainer_tpu.io.gam import alignment_message
    from graphchainer_tpu.io.gam_reader import (load_gam_alignments,
                                                parse_alignment)
    from graphchainer_tpu.io.gfa import load_gfa
    from graphchainer_tpu.models.chainer import ChainerConfig, ChainerModel

    def err_bases(a):
        return sum(max(e.get("from_length", 0), e.get("to_length", 0))
                   for m in a.mappings for e in m.edits
                   if e.get("sequence") or e.get("from_length", 0)
                   != e.get("to_length", 0))

    ref = load_gam_alignments(os.path.join(DATA, "ref_toy.gam"))[0]
    assert ref.score == 5
    assert err_bases(ref) == 6      # the documented rendering inflation

    g = build_alignment_graph(load_gfa(TOY_GFA))
    model = ChainerModel(g, build_mpc(g), build_index(g, k=15, w=20),
                         ChainerConfig())
    name, seq = open(TOY_READ_FA).read().strip().split("\n")
    aln = model.align_batch([(name[1:], seq)])[0]
    our = parse_alignment(alignment_message(g, aln))
    assert our.score == 5
    assert err_bases(our) == 5      # ours is the minimal script
