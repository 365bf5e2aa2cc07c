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
