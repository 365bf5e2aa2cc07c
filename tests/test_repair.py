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


def test_native_repair_matches_python(rng):
    """The C++ whole-batch repair (native.repair_batch) is splice-for-
    splice identical to the Python oracle on pipeline-produced
    positions+ops over a bubbly graph."""
    from bench import build_bench_graph
    from graphchainer_tpu import native
    from graphchainer_tpu.align import polish
    from graphchainer_tpu.align.anchors import GraphTensors
    from graphchainer_tpu.graph.mpc import build_mpc
    from graphchainer_tpu.graph.simulate import generate_path, \
        simulate_reads
    from graphchainer_tpu.index.minimizer import build_index
    from graphchainer_tpu.models.chainer import ChainerConfig, ChainerModel

    g = build_alignment_graph(build_bench_graph(rng, 4000))
    mpc = build_mpc(g)
    idx = build_index(g, k=11, w=6)
    # bubble_repair off: align_batch yields the pre-repair positions+ops
    model = ChainerModel(g, mpc, idx, ChainerConfig(bubble_repair=False,
                                                    rescue_threshold=0))
    path_seq, _ = generate_path(g, seed=5)
    reads = simulate_reads(path_seq, 24, min(len(path_seq), 600), seed=9,
                           error_rate=0.12)
    out = model.align_batch(reads)
    cases = [(reads[i][1], out[i].positions, out[i].ops)
             for i in range(len(reads))
             if out[i].ops is not None and len(out[i].positions)]
    assert len(cases) >= 8          # the workload actually exercises it
    got = native.repair_batch(model.gx, [p for _, p, _ in cases],
                              [o for _, _, o in cases],
                              [r for r, _, _ in cases])
    n_changed = 0
    for (read, positions, ops), fixed_n in zip(cases, got):
        fixed_py = repair_read(g, None, read, positions, ops)
        if fixed_py is None:
            assert fixed_n is None
        else:
            n_changed += 1
            assert fixed_n is not None
            np.testing.assert_array_equal(fixed_n, fixed_py)
    assert n_changed >= 1           # at least one repair actually fired


def test_native_repair_synthetic_cases(rng):
    """Native repair reproduces the oracle on the handcrafted cases
    above (arm swap / deletion arm / insertion arm)."""
    from graphchainer_tpu import native
    from graphchainer_tpu.align.anchors import GraphTensors
    g, bg = snp_graph(rng)
    gx = GraphTensors.build(g)
    read = bg.seqs[0] + "G" + bg.seqs[3]
    positions = path_positions(g, ["h", "a", "t"], bg)
    ops = np.zeros(len(read), dtype=np.uint8)
    ops[20] = OP_MISMATCH
    fixed_py = repair_read(g, None, read, positions, ops)
    [fixed_n] = native.repair_batch(gx, [positions], [ops], [read])
    np.testing.assert_array_equal(fixed_n, fixed_py)
    # no-edit read: both sides decline
    ops0 = np.zeros(len(read), dtype=np.uint8)
    assert repair_read(g, None, read, positions, ops0) is None
    [none_n] = native.repair_batch(gx, [positions], [ops0], [read])
    assert none_n is None


def test_rewrite_ops_matches_repolish(rng):
    """The host X->= ops rewrite after a same-length arm swap equals a
    full re-polish in score, and the rewritten CIGAR stays a valid
    read-vs-new-path alignment (cost == score, exact consumption)."""
    from bench import build_bench_graph
    from graphchainer_tpu import native
    from graphchainer_tpu.align import polish
    from graphchainer_tpu.align.repair import (OP_DEL, OP_INS,
                                               OP_MISMATCH, rewrite_ops)
    from graphchainer_tpu.graph.mpc import build_mpc
    from graphchainer_tpu.graph.simulate import generate_path, \
        simulate_reads
    from graphchainer_tpu.index.minimizer import build_index
    from graphchainer_tpu.models.chainer import ChainerConfig, ChainerModel

    g = build_alignment_graph(build_bench_graph(rng, 4000))
    mpc = build_mpc(g)
    idx = build_index(g, k=11, w=6)
    model = ChainerModel(g, mpc, idx, ChainerConfig(bubble_repair=False,
                                                    rescue_threshold=0))
    path_seq, _ = generate_path(g, seed=5)
    reads = simulate_reads(path_seq, 24, min(len(path_seq), 600), seed=9,
                           error_rate=0.12)
    out = model.align_batch(reads)
    cases = [(reads[i][1], out[i].positions, out[i].ops, out[i].score)
             for i in range(len(reads))
             if out[i].ops is not None and len(out[i].positions)]
    fixed_l = native.repair_batch(model.gx, [p for _, p, _, _ in cases],
                                  [o for _, _, o, _ in cases],
                                  [r for r, _, _, _ in cases])
    n_rewritten = 0
    for (read, positions, ops, score), fixed in zip(cases, fixed_l):
        if fixed is None:
            continue
        rw = rewrite_ops(model.gx, read, score, ops, positions, fixed)
        if rw is None:
            continue
        n_rewritten += 1
        new_score, new_ops = rw
        # exactness: equals the full re-polish score
        oc = polish.polish_batch([read], [model.gx.positions_seq(fixed)],
                                 bw=8)[0]
        assert new_score == oc.score, (new_score, oc.score)
        # validity: consumption + cost == score
        assert (new_ops != OP_INS).sum() == len(fixed)
        assert (new_ops != OP_DEL).sum() == len(read)
        assert (new_ops == OP_MISMATCH).sum() + (new_ops == OP_DEL).sum() \
            + (new_ops == OP_INS).sum() == new_score
    assert n_rewritten >= 1
