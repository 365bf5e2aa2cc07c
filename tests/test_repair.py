"""Polish-guided bubble repair (align/repair.py): wrong variant arms
picked at word-granular walk ties are swapped for the read's arm."""
import numpy as np
import pytest

from graphchainer_tpu.align.repair import OP_DEL, OP_INS, OP_MATCH, \
    OP_MISMATCH, repair_read
from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
from graphchainer_tpu.io.gfa import Bigraph


def snp_graph(rng):
    bg = Bigraph()
    h = bg.add_segment("h", "".join(rng.choice(list("ACGT"), 20)))
    a = bg.add_segment("a", "T")
    b = bg.add_segment("b", "G")
    t = bg.add_segment("t", "".join(rng.choice(list("ACGT"), 20)))
    bg.links += [(h, False, a, False, 0), (h, False, b, False, 0),
                 (a, False, t, False, 0), (b, False, t, False, 0)]
    return build_alignment_graph(bg), bg


def path_positions(g, names_seq, bg):
    rows = []
    for nm in names_seq:
        d = bg.names.index(nm) * 2
        for off in range(len(bg.seqs[bg.names.index(nm)])):
            v, o = g.find_split(d, off)
            rows.append((v, o))
    return np.asarray(rows, dtype=np.int64)


def test_snp_arm_swap(rng):
    g, bg = snp_graph(rng)
    read = bg.seqs[0] + "G" + bg.seqs[3]      # read goes through arm b
    positions = path_positions(g, ["h", "a", "t"], bg)   # path took arm a
    ops = np.zeros(len(read), dtype=np.uint8)
    ops[20] = OP_MISMATCH
    fixed = repair_read(g, None, read, positions, ops)
    assert fixed is not None
    seq = "".join(g.node_seq(v)[o] for v, o in fixed)
    assert seq == read


def test_deletion_arm(rng):
    """Path went through a 3bp indel-arm node the read skipped (the
    variant is a direct edge)."""
    bg = Bigraph()
    h = bg.add_segment("h", "".join(rng.choice(list("ACGT"), 20)))
    a = bg.add_segment("a", "TTT")
    t = bg.add_segment("t", "".join(rng.choice(list("ACGT"), 20)))
    bg.links += [(h, False, a, False, 0), (a, False, t, False, 0),
                 (h, False, t, False, 0)]
    g = build_alignment_graph(bg)
    read = bg.seqs[0] + bg.seqs[2]
    positions = path_positions(g, ["h", "a", "t"], bg)
    ops = np.concatenate([np.zeros(20, np.uint8),
                          np.full(3, OP_DEL, np.uint8),
                          np.zeros(20, np.uint8)])
    fixed = repair_read(g, None, read, positions, ops)
    assert fixed is not None
    seq = "".join(g.node_seq(v)[o] for v, o in fixed)
    assert seq == read


def test_missing_arm_insertion(rng):
    """Read goes through a 2bp arm the path skipped."""
    bg = Bigraph()
    h = bg.add_segment("h", "".join(rng.choice(list("ACGT"), 20)))
    a = bg.add_segment("a", "CA")
    t = bg.add_segment("t", "".join(rng.choice(list("ACGT"), 20)))
    bg.links += [(h, False, a, False, 0), (a, False, t, False, 0),
                 (h, False, t, False, 0)]
    g = build_alignment_graph(bg)
    read = bg.seqs[0] + "CA" + bg.seqs[2]
    positions = path_positions(g, ["h", "t"], bg)
    ops = np.concatenate([np.zeros(20, np.uint8),
                          np.full(2, OP_INS, np.uint8),
                          np.zeros(20, np.uint8)])
    fixed = repair_read(g, None, read, positions, ops)
    assert fixed is not None
    seq = "".join(g.node_seq(v)[o] for v, o in fixed)
    assert seq == read


def test_real_error_not_repaired(rng):
    """A genuine sequencing error on a node with no sibling arms stays."""
    bg = Bigraph()
    h = bg.add_segment("h", "".join(rng.choice(list("ACGT"), 40)))
    t = bg.add_segment("t", "".join(rng.choice(list("ACGT"), 40)))
    bg.links += [(h, False, t, False, 0)]
    g = build_alignment_graph(bg)
    read = list(bg.seqs[0] + bg.seqs[1])
    read[40] = "A" if read[40] != "A" else "C"
    positions = path_positions(g, ["h", "t"], bg)
    ops = np.zeros(len(read), dtype=np.uint8)
    ops[40] = OP_MISMATCH
    assert repair_read(g, None, "".join(read), positions, ops) is None
