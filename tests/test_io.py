"""IO layer tests: FASTA/FASTQ streaming, GAM wire roundtrip, GAF/JSON."""
import gzip
import json

import numpy as np
import pytest

from graphchainer_tpu.io import fastq, gam, gaf, vg_wire


def test_fasta_stream(tmp_path):
    p = tmp_path / "r.fa"
    p.write_text(">a desc\nACGT\nACGT\n>b\nTTTT\n")
    reads = list(fastq.stream_reads(str(p)))
    assert [(r.name, r.seq) for r in reads] == [("a", "ACGTACGT"),
                                               ("b", "TTTT")]


def test_fastq_stream_gz(tmp_path):
    p = tmp_path / "r.fq.gz"
    with gzip.open(p, "wt") as f:
        f.write("@a\nACGT\n+\nIIII\n@b\nGGCC\n+\nIIII\n")
    reads = list(fastq.stream_reads(str(p)))
    assert [(r.name, r.seq, r.qual) for r in reads] == [
        ("a", "ACGT", "IIII"), ("b", "GGCC", "IIII")]


def test_varint_roundtrip():
    for n in [0, 1, 127, 128, 300, 2 ** 31, 2 ** 63 - 1]:
        data = vg_wire.varint(n)
        val, shift, pos = 0, 0, 0
        while True:
            b = data[pos]
            pos += 1
            val |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        assert val == n and pos == len(data)


def _toy_alignment(toy_gfa):
    from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
    from graphchainer_tpu.graph.mpc import build_mpc
    from graphchainer_tpu.index.minimizer import build_index
    from graphchainer_tpu.io.gfa import load_gfa
    from graphchainer_tpu.models.chainer import ChainerConfig, ChainerModel
    from tests.conftest import TOY_READ
    g = build_alignment_graph(load_gfa(toy_gfa))
    model = ChainerModel(g, build_mpc(g), build_index(g, k=11, w=5),
                         ChainerConfig(band_slots=16, polish_band_words=4))
    aln = model.align_batch([("read", TOY_READ)])[0]
    return g, aln


def test_gam_writer_roundtrip(tmp_path, toy_gfa):
    g, aln = _toy_alignment(toy_gfa)
    assert not aln.failed
    msg = gam.alignment_message(g, aln)
    p = str(tmp_path / "out.gam")
    w = gam.GamWriter(p)
    w.write(msg)
    w.close()
    msgs = gam.read_gam(p)
    assert len(msgs) == 1
    assert msgs[0] == msg
    # protobuf parse with a generic decoder: check field 1 (sequence)
    data = msgs[0]
    assert data[0] == (1 << 3) | 2  # field 1, wire type 2
    ln = data[1]
    assert data[2:2 + ln].decode() == aln.seq


def test_empty_gam(tmp_path):
    p = str(tmp_path / "empty.gam")
    w = gam.GamWriter(p)
    w.close()
    assert gam.read_gam(p) == []
    # file contains exactly the varint-0 group
    assert gzip.open(p, "rb").read() == b"\x00"


def test_gaf_line(toy_gfa):
    g, aln = _toy_alignment(toy_gfa)
    line = gaf.gaf_line(g, aln)
    f = line.split("\t")
    assert f[0] == "read"
    assert int(f[1]) == len(aln.seq)
    assert f[4] == "+"
    assert f[5].startswith(">") or f[5].startswith("<")
    assert any(x.startswith("cg:Z:") for x in f)
    # path names are graph segment names
    import re
    names = re.split("[<>]", f[5])[1:]
    assert set(names) <= {"1", "2", "3", "4"}


def test_json_line(toy_gfa):
    g, aln = _toy_alignment(toy_gfa)
    obj = json.loads(gam.alignment_json(g, aln))
    assert obj["name"] == "read"
    assert obj["sequence"] == aln.seq
    assert "path" in obj and len(obj["path"]["mapping"]) >= 1
    m0 = obj["path"]["mapping"][0]
    assert "position" in m0 and "edit" in m0
    # edits consume the whole read
    to_len = sum(e.get("to_length", 0)
                 for m in obj["path"]["mapping"] for e in m["edit"])
    assert to_len == len(aln.seq)


def test_mappings_consume_path_and_read(toy_gfa):
    from graphchainer_tpu.align.emit import to_mappings
    g, aln = _toy_alignment(toy_gfa)
    mappings = to_mappings(g, aln)
    from_len = sum(e.from_length for m in mappings for e in m.edits)
    to_len = sum(e.to_length for m in mappings for e in m.edits)
    assert from_len == len(aln.positions)
    assert to_len == len(aln.seq)
    # mapping offsets are within their nodes
    for m in mappings:
        assert 0 <= m.offset < m.node_len


def test_gfa_paths_and_walks(tmp_path):
    from graphchainer_tpu.io.gfa import load_gfa, path_sequence
    gfa = tmp_path / "p.gfa"
    gfa.write_text(
        "H\tVN:Z:1.1\n"
        "S\ta\tACGTT\n"
        "S\tb\tTTGCA\n"
        "S\tc\tGGG\n"
        "L\ta\t+\tb\t+\t2M\n"
        "L\tb\t+\tc\t+\t0M\n"
        "L\tc\t+\ta\t-\t0M\n"
        "P\tp1\ta+,b+,c+\t*\n"
        "W\tsample\t1\tchr1\t0\t13\t>a>b>c<a\n"
    )
    g = load_gfa(str(gfa))
    assert set(g.paths) == {"p1", "sample#1#chr1:0-13"}
    # overlap 2 between a and b: ACGTT + GCA + GGG
    assert path_sequence(g, "p1") == "ACGTTGCAGGG"
    # walk adds reverse-complement of a: AACGT
    assert path_sequence(g, "sample#1#chr1:0-13") == "ACGTTGCAGGGAACGT"
    import pytest
    with pytest.raises(KeyError):
        path_sequence(g, "nope")


def test_gfa_path_sequence_tool(tmp_path, capsys):
    from graphchainer_tpu import tools
    gfa = tmp_path / "p.gfa"
    gfa.write_text("S\tx\tACGT\nS\ty\tTTTT\nL\tx\t+\ty\t+\t*\nP\tp\tx+,y+\t*\n")
    out = tmp_path / "out.fa"
    assert tools.main(["gfa-path-sequence", "--graph", str(gfa),
                       "-o", str(out)]) == 0
    assert out.read_text() == ">p\nACGTTTTT\n"
