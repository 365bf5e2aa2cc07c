"""Aux-tool subcommands added for reference parity (SURVEY §2.9:
ExtractExactPathSubgraph, ExtractPathSubgraphNeighbourhood,
SupportedSubgraph, UnitigifyDBG, UntipRelative, EstimateRepeatCount,
PickMummerSeeds, BruteForceExactPrefixSeeds, MafToAlignment)."""
import numpy as np
import pytest

from graphchainer_tpu.io import vg_wire as w
from graphchainer_tpu.io.gam import GamWriter
from graphchainer_tpu.io.gfa import load_gfa
from graphchainer_tpu.tools import main as tools_main


def write_gfa(path, segs, links):
    with open(path, "w") as f:
        for name, seq in segs:
            f.write(f"S\t{name}\t{seq}\n")
        for a, ar, b, br in links:
            f.write(f"L\t{a}\t{'+' if not ar else '-'}"
                    f"\t{b}\t{'+' if not br else '-'}\t0M\n")


def write_gam(path, alns):
    """alns: list of (name, [(node_id, is_reverse, length), ...])."""
    gw = GamWriter(str(path))
    for name, mappings in alns:
        mps = []
        for rank, (nid, rev, ln) in enumerate(mappings):
            mps.append(w.mapping(w.position(nid, 0, rev),
                                 [w.edit(ln, ln)], rank + 1))
        gw.write(w.alignment("", w.path(mps), name))
    gw.close()


@pytest.fixture
def chain_gfa(tmp_path):
    p = tmp_path / "g.gfa"
    write_gfa(p, [("1", "ACGTACGTAA"), ("2", "GGGGCCCCTT"),
                  ("3", "TTTTAAAACC"), ("4", "CCCCGGGGAA")],
              [("1", False, "2", False), ("2", False, "3", False),
               ("2", False, "4", False)])
    return p


def test_extract_exact_path_subgraph(chain_gfa, tmp_path):
    gam = tmp_path / "a.gam"
    write_gam(gam, [("r1", [(1, False, 10), (2, False, 10),
                            (3, False, 10)])])
    out = tmp_path / "sub.gfa"
    tools_main(["extract-exact-path-subgraph", "--graph", str(chain_gfa),
                "--gam", str(gam), "-o", str(out)])
    g = load_gfa(str(out))
    assert sorted(g.names) == ["1", "2", "3"]
    assert len(g.links) == 2


def test_extract_neighbourhood(chain_gfa, tmp_path):
    gam = tmp_path / "a.gam"
    write_gam(gam, [("r1", [(1, False, 10)])])
    out = tmp_path / "nb.gfa"
    tools_main(["extract-neighbourhood", "--graph", str(chain_gfa),
                "--gam", str(gam), "--length", "12", "-o", str(out)])
    g = load_gfa(str(out))
    # node 1 (dist 0) + node 2 (dist 10 <= 12); 3/4 at dist 20 excluded
    assert sorted(g.names) == ["1", "2"]


def test_supported_subgraph(chain_gfa, tmp_path):
    gam = tmp_path / "a.gam"
    write_gam(gam, [("r1", [(1, False, 10), (2, False, 10)]),
                    ("r2", [(1, False, 10), (2, False, 10)]),
                    ("r3", [(2, False, 10), (3, False, 10)])])
    out = tmp_path / "sup.gfa"
    tools_main(["supported-subgraph", "--graph", str(chain_gfa),
                "--gam", str(gam), "--min-support", "2", "-o", str(out)])
    g = load_gfa(str(out))
    # edge 1-2 supported twice survives; 2-3 once and 2-4 never do
    assert len(g.links) == 1
    a, _, b, _, _ = g.links[0]
    assert {g.names[a], g.names[b]} == {"1", "2"}


def test_unitigify(tmp_path):
    p = tmp_path / "g.gfa"
    # 1->2->3 non-branching chain, 3->4 and 3->5 branch
    write_gfa(p, [("1", "AAAA"), ("2", "CCCC"), ("3", "GGGG"),
                  ("4", "TTTT"), ("5", "ACAC")],
              [("1", False, "2", False), ("2", False, "3", False),
               ("3", False, "4", False), ("3", False, "5", False)])
    out = tmp_path / "u.gfa"
    tools_main(["unitigify", "--graph", str(p), "-o", str(out)])
    g = load_gfa(str(out))
    # chain 1-2-3 merges into one 12bp unitig; 4 and 5 stay single
    assert sorted(len(s) for s in g.seqs) == [4, 4, 12]
    assert len(g.links) == 2
    # total sequence is preserved
    assert sum(len(s) for s in g.seqs) == 20


def test_untip(tmp_path):
    p = tmp_path / "g.gfa"
    # long chain 1-2-3 with a 3bp tip hanging off node 1
    write_gfa(p, [("1", "AAAAAAAAAA"), ("2", "CCCCCCCCCC"),
                  ("3", "GGGGGGGGGG"), ("tip", "ACG")],
              [("1", False, "2", False), ("2", False, "3", False),
               ("1", False, "tip", False)])
    out = tmp_path / "t.gfa"
    tools_main(["untip", "--graph", str(p), "--max-len", "5",
                "--fraction", "0.5", "-o", str(out)])
    g = load_gfa(str(out))
    assert "tip" not in g.names
    assert sorted(g.names) == ["1", "2", "3"]


def _tippy_gfa(tmp_path):
    """50bp chain A-B-C with a TWO-segment 3bp tip chain off A."""
    p = tmp_path / "g.gfa"
    write_gfa(p, [("A", "A" * 50), ("B", "C" * 50), ("C", "G" * 50),
                  ("t1", "ACG"), ("t2", "TGA")],
              [("A", False, "B", False), ("B", False, "C", False),
               ("A", False, "t1", False), ("t1", False, "t2", False)])
    return p


def test_untip_multisegment_tip(tmp_path):
    """The reference removes whole tip SUBTREES recursively
    (UntipRelative.cpp:92-126), not just single dangling segments: the
    2-segment tip chain (total depth 6bp <= removable 10bp) goes."""
    p = _tippy_gfa(tmp_path)
    out = tmp_path / "t.gfa"
    tools_main(["untip", "--graph", str(p), "--max-len", "10",
                "--fraction", "0.5", "-o", str(out)])
    g = load_gfa(str(out))
    assert sorted(g.names) == ["A", "B", "C"]
    assert len(g.links) == 2


def test_untip_min_safe_len(tmp_path):
    """No pruning next to branches shorter than --min-safe-len
    (UntipRelative.cpp:114): the longest branch out of A is 100bp
    (B+C), below a 200bp safety floor, so the tip survives."""
    p = _tippy_gfa(tmp_path)
    out = tmp_path / "t.gfa"
    tools_main(["untip", "--graph", str(p), "--max-len", "10",
                "--min-safe-len", "200", "--fraction", "0.5",
                "-o", str(out)])
    g = load_gfa(str(out))
    assert sorted(g.names) == ["A", "B", "C", "t1", "t2"]


def test_untip_fraction_cap(tmp_path):
    """removableLen = min(fraction * longest-sibling, max-len)
    (UntipRelative.cpp:115-116): with fraction 0.04 the cap is
    0.04 * 100 = 4bp < the 6bp tip depth, so the tip survives even
    though max-len alone (10bp) would remove it."""
    p = _tippy_gfa(tmp_path)
    out = tmp_path / "t.gfa"
    tools_main(["untip", "--graph", str(p), "--max-len", "10",
                "--fraction", "0.04", "-o", str(out)])
    g = load_gfa(str(out))
    assert sorted(g.names) == ["A", "B", "C", "t1", "t2"]


def test_estimate_repeat_count(chain_gfa, tmp_path):
    """Reference EstimateRepeatCount.cpp fixpoint on the 1->2->{3,4}
    fork: node 2 starts at its branch degree (2); node 1 feeds node 2
    through a unique edge so the fixpoint raises it to 2 (node 2 is
    node 1's only left-entry in-neighbor); 3 and 4 get no inflow (node
    2's '+' side is not unique) and stay 1."""
    gam = tmp_path / "a.gam"
    write_gam(gam, [("r1", [(2, False, 10)]), ("r2", [(2, False, 10)]),
                    ("r3", [(1, False, 10)])])
    out = tmp_path / "c.csv"
    tools_main(["estimate-repeat-count", "--graph", str(chain_gfa),
                "--gam", str(gam), "-o", str(out)])
    lines = out.read_text().strip().split("\n")
    assert lines[0] == "node,_minalntoporepeatcount"
    rows = dict(ln.split(",") for ln in lines[1:])
    assert rows == {"1": "2", "2": "2", "3": "1", "4": "1"}


def test_estimate_repeat_count_read_multiplicity(chain_gfa, tmp_path):
    """A single read visiting a node twice lifts its count to 2 even
    with degree 1 (EstimateRepeatCount.cpp:67-83)."""
    gam = tmp_path / "a.gam"
    write_gam(gam, [("r1", [(3, False, 10), (3, False, 10)])])
    out = tmp_path / "c.csv"
    tools_main(["estimate-repeat-count", "--graph", str(chain_gfa),
                "--gam", str(gam), "-o", str(out)])
    rows = dict(ln.split(",") for ln in
                out.read_text().strip().split("\n")[1:])
    assert rows["3"] == "2"


def test_pick_mummer_seeds(tmp_path):
    mums = tmp_path / "m.mums"
    mums.write_text("> readA\n"
                    "  7    5   11   20\n"
                    "  7   40   61    9\n"
                    "> readA Reverse\n"
                    "  9    2    3   15\n")
    out = tmp_path / "s.gam"
    tools_main(["pick-mummer-seeds", "--mums", str(mums),
                "--max-seeds", "2", "-o", str(out)])
    from graphchainer_tpu.io.gam_reader import load_gam_alignments
    alns = load_gam_alignments(str(out))
    assert len(alns) == 2                 # top 2 by length: 20 and 15
    assert all(a.name == "readA" for a in alns)
    nodes = sorted(a.mappings[0].node_id for a in alns)
    assert nodes == [7, 9]
    revs = {a.mappings[0].node_id: a.mappings[0].is_reverse for a in alns}
    assert revs[9] and not revs[7]


def test_brute_force_prefix_seeds(tmp_path):
    p = tmp_path / "g.gfa"
    write_gfa(p, [("1", "ACGTAC"), ("2", "GTTTGG")],
              [("1", False, "2", False)])
    reads = tmp_path / "r.fa"
    # prefix TACGTT spans the node 1 -> 2 junction from offset 3
    reads.write_text(">q\nTACGTTTGGAAA\n")
    out = tmp_path / "s.gam"
    tools_main(["brute-force-prefix-seeds", "--graph", str(p),
                "--reads", str(reads), "--k", "6", "-o", str(out)])
    from graphchainer_tpu.io.gam_reader import load_gam_alignments
    alns = load_gam_alignments(str(out))
    hits = {(a.mappings[0].node_id, a.mappings[0].offset,
             a.mappings[0].is_reverse) for a in alns}
    assert (1, 3, False) in hits


def test_maf_to_alignment(tmp_path):
    p = tmp_path / "g.gfa"
    with open(p, "w") as f:
        f.write("S\t1\tACGTACGTAA\nS\t2\tGGGGCCCCTT\n")
        f.write("L\t1\t+\t2\t+\t0M\n")
        f.write("P\tref\t1+,2+\t*\n")
    maf = tmp_path / "r.maf"
    maf.write_text("a score=0\n"
                   "s ref 8 6 + 20 GTAAGG\n"
                   "s read0 0 6 + 6 GTAAGG\n\n")
    gam = tmp_path / "o.gam"
    fa = tmp_path / "reads.fa"
    tools_main(["maf-to-alignment", "--graph", str(p), "--path-name",
                "ref", "--maf", str(maf), "-o", str(gam),
                "--reads-out", str(fa)])
    from graphchainer_tpu.io.gam_reader import load_gam_alignments
    alns = load_gam_alignments(str(gam))
    assert len(alns) == 1
    assert [m.node_id for m in alns[0].mappings] == [1, 2]
    assert fa.read_text() == ">read0\nGTAAGG\n"
