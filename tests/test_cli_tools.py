"""CLI + aux tools end-to-end: align the toy read via the CLI, then run
the GAM-consuming tools on the output; vg graph input roundtrip."""
import gzip
import json
import os

import numpy as np
import pytest

from graphchainer_tpu import tools
from graphchainer_tpu.cli import main as cli_main
from graphchainer_tpu.io import vg_wire
from graphchainer_tpu.io.gam_reader import load_gam_alignments
from graphchainer_tpu.io.vg_graph import load_vg

from tests.conftest import TOY_READ


@pytest.fixture(scope="module")
def cli_outputs(toy_gfa, tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    reads = d / "reads.fa"
    reads.write_text(f">read\n{TOY_READ}\n")
    out_gam = str(d / "out.gam")
    out_gaf = str(d / "out.gaf")
    out_json = str(d / "out.json")
    corrected = str(d / "corrected.fa")
    rc = cli_main(["-g", toy_gfa, "-f", str(reads),
                   "-a", out_gam, "-a", out_gaf, "-a", out_json,
                   "--corrected-out", corrected,
                   "-b", "16", "--polish-band", "4",
                   "--seeds-minimizer-length", "11",
                   "--seeds-minimizer-windowsize", "5"])
    assert rc == 0
    return dict(gam=out_gam, gaf=out_gaf, json=out_json,
                corrected=corrected, dir=d, graph=toy_gfa)


def test_cli_outputs_exist(cli_outputs):
    alns = load_gam_alignments(cli_outputs["gam"])
    assert len(alns) == 1
    assert alns[0].name == "read"
    assert alns[0].sequence == TOY_READ
    assert len(alns[0].mappings) >= 3
    gaf = open(cli_outputs["gaf"]).read().strip()
    assert gaf.startswith("read\t")
    obj = json.loads(open(cli_outputs["json"]).read())
    assert obj["name"] == "read"
    corr = open(cli_outputs["corrected"]).read()
    assert corr.startswith(">read")


def test_extract_path_sequence_tool(cli_outputs, tmp_path):
    out = str(tmp_path / "paths.fa")
    tools.main(["extract-path-sequence", "--gam", cli_outputs["gam"],
                "--graph", cli_outputs["graph"], "-o", out])
    txt = open(out).read()
    assert txt.startswith(">read\n")
    seq = txt.strip().split("\n")[1]
    # path sequence must be close to the read (the toy read has ~12 errors)
    from tests.test_polish import nw_edit_distance
    assert nw_edit_distance(seq, TOY_READ) <= 20


def test_select_longest_and_postprocess(cli_outputs, tmp_path):
    out1 = str(tmp_path / "longest.gam")
    tools.main(["select-longest", "--gam", cli_outputs["gam"], "-o", out1])
    assert len(load_gam_alignments(out1)) == 1
    out2 = str(tmp_path / "post.gam")
    tools.main(["postprocess", "--gam", cli_outputs["gam"], "-o", out2])
    assert len(load_gam_alignments(out2)) == 1


def test_simulate_and_reverse_tools(cli_outputs, tmp_path):
    out = str(tmp_path / "sim.fa")
    tools.main(["simulate-reads", "--graph", cli_outputs["graph"],
                "--count", "3", "--length", "60", "-o", out])
    txt = open(out).read()
    assert txt.count(">") == 3
    rev = str(tmp_path / "rev.fa")
    tools.main(["reverse-reads", "--reads", out, "-o", rev])
    assert open(rev).read().count("_reverse") == 3


def test_node_pos_csv(cli_outputs, tmp_path):
    out = str(tmp_path / "pos.csv")
    tools.main(["node-pos-csv", "--graph", cli_outputs["graph"], "-o", out])
    lines = open(out).read().strip().split("\n")
    assert lines[0] == "node,approx_pos"
    assert len(lines) == 5  # 4 segments + header


def make_vg_file(path, nodes, edges):
    """nodes: [(id, seq)], edges: [(from, to, from_start, to_end, overlap)]"""
    graph_msg = b""
    for nid, seq in nodes:
        node = vg_wire.f_str(1, seq) + vg_wire.f_varint(3, nid)
        graph_msg += vg_wire.f_msg(1, node)
    for f, t, fs, te, ov in edges:
        e = (vg_wire.f_varint(1, f) + vg_wire.f_varint(2, t)
             + vg_wire.f_bool(3, fs) + vg_wire.f_bool(4, te)
             + vg_wire.f_varint(5, ov))
        graph_msg += vg_wire.f_msg(2, e)
    framed = (vg_wire.varint(1) + vg_wire.varint(len(graph_msg))
              + graph_msg)
    with gzip.open(path, "wb") as fh:
        fh.write(framed)


def test_vg_graph_input(tmp_path):
    p = str(tmp_path / "g.vg")
    make_vg_file(p, [(1, "ACGTACGT"), (2, "TTTT"), (3, "GGGG")],
                 [(1, 2, False, False, 0), (1, 3, False, False, 0)])
    bg = load_vg(p)
    assert bg.names == ["1", "2", "3"]
    assert bg.seqs[0] == "ACGTACGT"
    assert (0, False, 1, False, 0) in bg.links
    # and it builds into an alignment graph
    from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
    g = build_alignment_graph(bg)
    assert g.stats()["total_bp"] == 2 * 16


def test_vg_reverse_edge(tmp_path):
    from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
    from graphchainer_tpu.utils.seq import revcomp
    p = str(tmp_path / "g2.vg")
    # edge end(1) -> start(2) with to_end=True: 2 is traversed reversed
    make_vg_file(p, [(1, "ACGT"), (2, "GGCC")],
                 [(1, 2, False, True, 0)])
    bg = load_vg(p)
    g = build_alignment_graph(bg)
    # forward walk from node 1 should spell ACGT + revcomp(GGCC)
    v, _ = g.find_split(0, 0)
    seq = g.node_seq(v)
    while True:
        outs = g.out_neighbors(v)
        if len(outs) == 0:
            break
        v = int(outs[0])
        seq += g.node_seq(v)
    assert seq == "ACGT" + revcomp("GGCC")


def test_file_seeds(cli_outputs, tmp_path):
    """A GAM produced by the aligner can seed a re-alignment run
    (reference external-seed files, src/Aligner.cpp:1169-1190)."""
    from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
    from graphchainer_tpu.graph.mpc import build_mpc
    from graphchainer_tpu.index.minimizer import build_index
    from graphchainer_tpu.io.gam_reader import load_gam_seeds
    from graphchainer_tpu.io.gfa import load_gfa
    from graphchainer_tpu.models.chainer import ChainerConfig, ChainerModel
    g = build_alignment_graph(load_gfa(cli_outputs["graph"]))
    name_ids = {n: i for i, n in enumerate(g.names)}
    seeds = load_gam_seeds(cli_outputs["gam"], name_ids)
    assert "read" in seeds and len(seeds["read"]) >= 1
    model = ChainerModel(g, build_mpc(g),
                         build_index(g, k=11, w=5),
                         ChainerConfig(band_slots=16, polish_band_words=4),
                         file_seeds=seeds)
    aln = model.align_batch([("read", TOY_READ)])[0]
    assert not aln.failed


def test_visualize_and_identity_tools(cli_outputs, tmp_path):
    out = str(tmp_path / "vis.txt")
    tools.main(["visualize", "--gam", cli_outputs["gam"],
                "--graph", cli_outputs["graph"], "-o", out])
    txt = open(out).read()
    assert txt.startswith(">read")
    assert "|" in txt
    truth = tmp_path / "truth.nodes"
    truth.write_text("1 2 3 4\n")  # both alleles in truth
    out2 = str(tmp_path / "ident.csv")
    tools.main(["subsequence-identity", "--gam", cli_outputs["gam"],
                "--truth", str(truth), "-o", out2])
    lines = open(out2).read().strip().split("\n")
    assert lines[0].startswith("read,")
    ident = float(lines[1].split(",")[-1])
    assert ident >= 0.99  # path is a subsequence of the truth


def test_cli_gzip_inputs_and_caches(toy_gfa, tmp_path):
    import gzip as _gz
    # gzip the graph and reads
    gz_graph = str(tmp_path / "g.gfa.gz")
    with open(toy_gfa) as f, _gz.open(gz_graph, "wt") as out:
        out.write(f.read())
    reads = str(tmp_path / "r.fq.gz")
    with _gz.open(reads, "wt") as f:
        f.write(f"@read\n{TOY_READ}\n+\n{'I' * len(TOY_READ)}\n")
    out = str(tmp_path / "o.gaf")
    mpc_cache = str(tmp_path / "mpc.npz")
    mini_cache = str(tmp_path / "mini.npz")
    args = ["-g", gz_graph, "-f", reads, "-a", out,
            "--mpc-index", mpc_cache, "--minimizer-index", mini_cache,
            "--sampling-step", "1.0",
            "-b", "16", "--polish-band", "4",
            "--seeds-minimizer-length", "11",
            "--seeds-minimizer-windowsize", "5"]
    assert cli_main(args) == 0
    assert open(out).read().startswith("read\t")
    assert os.path.exists(mpc_cache) and os.path.exists(mini_cache)
    # second run loads the caches
    assert cli_main(args) == 0


def test_cli_graph_statistics_and_generate_path(toy_gfa, tmp_path, capsys):
    assert cli_main(["-g", toy_gfa, "--graph-statistics"]) == 0
    outp = capsys.readouterr().out
    assert "n_split_nodes" in outp
    prefix = str(tmp_path / "gen")
    assert cli_main(["-g", toy_gfa, "--generate-path", prefix]) == 0
    fa = open(prefix + ".fasta").read()
    assert fa.startswith(">")
    nodes = open(prefix + ".nodes").read().split()
    assert nodes[0] in {"1", "2", "3", "4"}
    # the generated path must spell a real walk: simulate from it
    seq = fa.strip().split("\n")[1]
    assert len(seq) >= 44


def test_vg_embedded_paths(tmp_path):
    from graphchainer_tpu.io.gfa import path_sequence
    p = str(tmp_path / "g3.vg")
    graph_msg = b""
    for nid, seq in [(7, "ACGTT"), (8, "GGCA"), (9, "TTT")]:
        node = vg_wire.f_str(1, seq) + vg_wire.f_varint(3, nid)
        graph_msg += vg_wire.f_msg(1, node)
    for f, t in [(7, 8), (8, 9)]:
        graph_msg += vg_wire.f_msg(2, vg_wire.f_varint(1, f)
                                   + vg_wire.f_varint(2, t))
    # Path "ref": 7+ then 8- (ranks given out of order to test sorting)
    m2 = vg_wire.mapping(vg_wire.position(8, 0, True), [], rank=2)
    m1 = vg_wire.mapping(vg_wire.position(7, 0, False), [], rank=1)
    graph_msg += vg_wire.f_msg(3, vg_wire.f_str(1, "ref")
                               + vg_wire.f_msg(2, m2) + vg_wire.f_msg(2, m1))
    framed = vg_wire.varint(1) + vg_wire.varint(len(graph_msg)) + graph_msg
    with gzip.open(p, "wb") as fh:
        fh.write(framed)
    bg = load_vg(p)
    assert bg.paths == {"ref": [(0, False), (1, True)]}
    # 7 forward then 8 reverse-complemented
    assert path_sequence(bg, "ref") == "ACGTT" + "TGCC"
    # the tool surfaces it too
    out = str(tmp_path / "ref.fa")
    assert tools.main(["gfa-path-sequence", "--graph", p, "-o", out]) == 0
    assert open(out).read() == ">ref\nACGTTTGCC\n"


def test_pipeline_loads_vg(tmp_path):
    """pipeline.load_graph dispatches .vg -> load_vg (reference -g accepts
    both .gfa and .vg)."""
    from graphchainer_tpu.pipeline import load_graph
    p = str(tmp_path / "pipe.vg")
    make_vg_file(p, [(1, "ACGTACGTAC"), (2, "TTTTCCCC")],
                 [(1, 2, False, False, 0)])
    g = load_graph(p)
    assert g.stats()["total_bp"] == 2 * 18


def test_fusion_finder(tmp_path, rng):
    """fusion-finder (reference FusionFinder.cpp): a read whose halves
    come from two genes is called with the right pair; a single-gene
    read is not."""
    import subprocess
    import sys

    geneA = "".join(rng.choice(list("ACGT"), 800))
    geneB = "".join(rng.choice(list("ACGT"), 800))
    gfa = tmp_path / "g.gfa"
    with open(gfa, "w") as f:
        f.write(f"S\tga\t{geneA}\nS\tgb\t{geneB}\n")
    reads = tmp_path / "r.fa"
    with open(reads, "w") as f:
        f.write(f">fused\n{geneA[100:400] + geneB[200:500]}\n")
        f.write(f">normal\n{geneA[150:650]}\n")
    put = tmp_path / "put.txt"
    put.write_text("GENEA GENEB 5\n")
    # transcript alignments: one full-node mapping per gene
    from graphchainer_tpu.io import vg_wire as w
    from graphchainer_tpu.io.gam import GamWriter
    tgam = tmp_path / "t.gam"
    gw = GamWriter(str(tgam))
    gw.write(w.alignment(geneA, w.path([w.mapping(
        w.position(1, 0, False, name="ga"), [w.edit(800, 800)], 1)]),
        "tx1_gene:GENEA_x"))
    gw.write(w.alignment(geneB, w.path([w.mapping(
        w.position(2, 0, False, name="gb"), [w.edit(800, 800)], 1)]),
        "tx2_gene:GENEB_x"))
    gw.close()
    out = tmp_path / "fusions.tsv"
    corr = tmp_path / "corr.fa"
    r = subprocess.run(
        [sys.executable, "-m", "graphchainer_tpu.tools", "fusion-finder",
         "-g", str(gfa), "--putative", str(put), "--transcripts",
         str(tgam), "-f", str(reads), "--fusions-out", str(out),
         "--corrected-out", str(corr), "--min-fusion-len", "100"],
        capture_output=True, text=True, timeout=560,
        env={**os.environ, "JAX_PLATFORMS": "cpu", "XLA_FLAGS": "",
             "PYTHONPATH": "/root/repo"}, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln.split("\t") for ln in open(out).read().splitlines()]
    assert len(lines) == 1, lines
    assert lines[0][0] == "fused"
    assert {lines[0][1], lines[0][2]} == {"GENEA", "GENEB"}
    # corrected read concatenates both gene parts
    rec = open(corr).read().splitlines()
    assert rec[0].startswith(">fused")
    assert len(rec[1]) >= 500
