"""Banded fragment extension kernel vs the scalar DAG DP oracle.

The kernel's claim: for every band slot, end_score equals the exact
sequence-to-DAG edit DP (restricted to the band subgraph) at the fragment's
last row, minimized over the slot's columns.
"""
import numpy as np
import pytest

from graphchainer_tpu.align import oracle as orc
from graphchainer_tpu.align.anchors import (FragJob, GraphTensors,
                                            assemble_batch, backwalk)
from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
from graphchainer_tpu.io.gfa import Bigraph
from graphchainer_tpu.ops import frag_align
from graphchainer_tpu.utils.seq import match_masks

from tests.test_mpc import random_dag_bigraph


def kernel_vs_oracle(g, read, seed_node, seed_offset, B=24, max_in=8):
    gx = GraphTensors.build(g)
    mm = match_masks(read)
    trim = int(g.node_len[seed_node]) - seed_offset
    job = FragJob(rmm=mm, seed_node=seed_node, seed_trim_len=trim,
                  reverse=False)
    (band_nodes, band_nodes_cat, band_in, seed_shift, req, rows, S,
     band_level) = assemble_batch(gx, [job], B=B, max_in=max_in, slack=8)
    dev_eq, dev_len = gx.device_tables()
    from graphchainer_tpu.align.anchors import level_bucket
    res = frag_align.align_fragments(dev_eq, dev_len, band_nodes_cat,
                                     band_in, seed_shift, req, rows,
                                     n_slices=S, max_in=max_in,
                                     band_level=band_level,
                                     n_levels=level_bucket(band_level, B))
    # oracle over the same band subgraph
    valid = band_nodes[0] >= 0
    nodes = np.sort(band_nodes[0][valid])
    cg, D = orc.extend_from_seed(g, read, seed_node, seed_offset,
                                 nodes=nodes)
    R = len(read)
    for slot in range(band_nodes.shape[1]):
        v = int(band_nodes[0][slot])
        if v < 0:
            continue
        mask = cg.node_of == v
        if slot == 0:
            # seed slot is trimmed: only columns >= seed_offset
            mask &= cg.offset_of >= seed_offset
        want = int(D[mask, R].min())
        got = int(res.end_score[0][slot])
        assert got == min(want, int(frag_align.BIG)), (
            f"slot {slot} node {v}: kernel {got} oracle {want}")
    return res, band_nodes


def linear_bigraph(seq, chunk=40):
    bg = Bigraph()
    parts = [seq[i:i + chunk] for i in range(0, len(seq), chunk)]
    for i, p in enumerate(parts):
        bg.add_segment(str(i), p)
    for i in range(len(parts) - 1):
        bg.links.append((i, False, i + 1, False, 0))
    return bg


@pytest.mark.parametrize("seed", range(4))
def test_linear_graph_exact_match(seed):
    rng = np.random.default_rng(seed)
    seq = "".join(rng.choice(list("ACGT"), 120))
    g = build_alignment_graph(linear_bigraph(seq))
    # read = exact substring, seed at its start
    start = int(rng.integers(0, 30))
    L = int(rng.integers(20, 60))
    read = seq[start:start + L]
    v, o = g.find_split(0, start) if start < 40 else (None, None)
    d = 2 * (start // 40)
    v, o = g.find_split(d, start % 40)
    res, band_nodes = kernel_vs_oracle(g, read, v, o)
    assert int(res.best_score[0]) == 0  # exact match exists


@pytest.mark.parametrize("seed", range(8))
def test_random_dag_with_errors(seed):
    rng = np.random.default_rng(100 + seed)
    bg = random_dag_bigraph(rng, n_seg=10, p_edge=0.3, max_len=12)
    g = build_alignment_graph(bg)
    # random walk read with errors
    v = int(rng.integers(0, g.n_nodes))
    path = [v]
    while len(path) < 8:
        outs = g.out_neighbors(path[-1])
        if len(outs) == 0:
            break
        path.append(int(rng.choice(outs)))
    true_seq = "".join(g.node_seq(p) for p in path)
    read = []
    for ch in true_seq:
        r = rng.random()
        if r < 0.08:
            continue  # deletion
        if r < 0.16:
            read.append(rng.choice(list("ACGT")))  # substitution
        else:
            read.append(ch)
        if rng.random() < 0.05:
            read.append(rng.choice(list("ACGT")))  # insertion
    read = "".join(read)
    if len(read) < 4:
        pytest.skip("degenerate read")
    read = read[:60]
    kernel_vs_oracle(g, read, v, 0)


def test_multislice_consistency():
    """Fragments spanning >32 rows exercise the HP/HN slice chaining."""
    rng = np.random.default_rng(7)
    seq = "".join(rng.choice(list("ACGT"), 200))
    g = build_alignment_graph(linear_bigraph(seq, chunk=50))
    read = seq[10:10 + 90]  # 3 slices
    v, o = g.find_split(0, 10)
    res, _ = kernel_vs_oracle(g, read, v, o, B=16)
    assert int(res.best_score[0]) == 0


def test_carry_chaining_matches_single_call():
    """Two carried calls on an unchanged band must equal one call with
    the concatenated read rows (the windowed-extension contract)."""
    rng = np.random.default_rng(21)
    seq = "".join(rng.choice(list("ACGT"), 300))
    g = build_alignment_graph(linear_bigraph(seq, chunk=50))
    gx = GraphTensors.build(g)
    # noisy read spanning 4 slices
    read = list(seq[5:5 + 120])
    for _ in range(12):
        p = int(rng.integers(0, len(read)))
        read[p] = str(rng.choice(list("ACGT")))
    read = "".join(read)
    v, o = g.find_split(0, 5)
    mm = match_masks(read)
    job = FragJob(rmm=mm, seed_node=v,
                  seed_trim_len=int(g.node_len[v]) - o, reverse=False)
    (band_nodes, band_nodes_cat, band_in, seed_shift, req, rows, S,
     band_level) = assemble_batch(gx, [job], B=24, max_in=8, slack=8)
    assert S == 4
    dev_eq, dev_len = gx.device_tables()
    from graphchainer_tpu.align.anchors import level_bucket
    nl = level_bucket(band_level, 24)
    kw = dict(max_in=8, band_level=band_level, n_levels=nl)

    full = frag_align.align_fragments(dev_eq, dev_len, band_nodes_cat,
                                      band_in, seed_shift, req, rows,
                                      n_slices=4, **kw)
    first = frag_align.align_fragments(
        dev_eq, dev_len, band_nodes_cat, band_in, seed_shift,
        req[:, :2], np.array([64], np.int32), n_slices=2, **kw)
    second = frag_align.align_fragments(
        dev_eq, dev_len, band_nodes_cat, band_in,
        seed_shift, req[:, 2:], rows - 64, n_slices=2,
        carry_in=(first.out_ssb, first.out_hp, first.out_hn), **kw)
    assert int(second.best_score[0]) == int(full.best_score[0])
    np.testing.assert_array_equal(np.asarray(second.end_score),
                                  np.asarray(full.end_score))
    np.testing.assert_array_equal(np.asarray(second.out_ssb),
                                  np.asarray(full.out_ssb))
    np.testing.assert_array_equal(np.asarray(second.out_hp),
                                  np.asarray(full.out_hp))
    # best_in of the continued slices must match the full call's tail
    np.testing.assert_array_equal(np.asarray(second.best_in),
                                  np.asarray(full.best_in)[:, :, 2:])


def test_backwalk_path_valid(toy_gfa):
    from graphchainer_tpu.io.gfa import load_gfa
    g = build_alignment_graph(load_gfa(toy_gfa))
    gx = GraphTensors.build(g)
    # read through the bubble: prefix of segment 1 + A + segment 4
    read = g.di_seqs[0][20:] + "A" + g.di_seqs[6][:10]
    v, o = g.find_split(0, 20)
    mm = match_masks(read)
    job = FragJob(rmm=mm, seed_node=v,
                  seed_trim_len=int(g.node_len[v]) - o, reverse=False)
    (band_nodes, band_nodes_cat, band_in, seed_shift, req, rows, S,
     band_level) = assemble_batch(gx, [job], B=16, max_in=8)
    dev_eq, dev_len = gx.device_tables()
    from graphchainer_tpu.align.anchors import level_bucket
    res = frag_align.align_fragments(dev_eq, dev_len, band_nodes_cat,
                                     band_in, seed_shift, req, rows,
                                     n_slices=S, max_in=8,
                                     band_level=band_level,
                                     n_levels=level_bucket(band_level, 16))
    assert int(res.best_score[0]) == 0
    walk = backwalk(np.asarray(res.best_in)[0], band_nodes[0],
                    int(res.best_slot[0]), (len(read) - 1) // 32)
    assert walk is not None
    path = [int(band_nodes[0][s]) for s in reversed(walk)]
    # path must be a valid graph path from the seed node
    assert path[0] == v
    for a, b in zip(path[:-1], path[1:]):
        assert b in set(int(x) for x in g.out_neighbors(a))


def test_packed_wire_format_matches_unpacked(rng):
    """run_fragments' compressed wire path (node-id deltas, in-edge
    nibbles, 2-bit read codes) is bit-identical to the plane format."""
    from graphchainer_tpu.align.anchors import (_try_pack_frag,
                                                level_bucket)
    bg = random_dag_bigraph(rng, n_seg=30, p_edge=0.25, max_len=12)
    g = build_alignment_graph(bg)
    gx = GraphTensors.build(g)
    jobs = []
    for _ in range(6):
        v = int(rng.integers(0, g.n_nodes))
        ln = int(g.node_len[v])
        off = int(rng.integers(0, ln))
        read = "".join(rng.choice(list("ACGT"), int(rng.integers(20, 60))))
        jobs.append(FragJob(rmm=match_masks(read), seed_node=v,
                            seed_trim_len=ln - off, reverse=False))
    (band_nodes, bnc, bi, ss, req, rows, S, bl) = assemble_batch(
        gx, jobs, B=16, max_in=4, slack=8)
    packed = _try_pack_frag(bnc, bi, req, rows, 4)
    assert packed is not None
    base, bn_d16, bi_p16, req2 = packed
    dev_eq, dev_len = gx.device_tables()
    nl = level_bucket(bl, bnc.shape[1])
    ref = frag_align.align_fragments(dev_eq, dev_len, bnc, bi, ss, req,
                                     rows, n_slices=S, max_in=4,
                                     band_level=bl, n_levels=nl)
    got = frag_align.align_fragments_packed(
        dev_eq, dev_len, base, bn_d16, bi_p16, ss.astype(np.int8), req2,
        rows.astype(np.int16), n_slices=S, max_in=4, band_level=bl,
        n_levels=nl)
    np.testing.assert_array_equal(np.asarray(ref.best_score),
                                  np.asarray(got.best_score))
    np.testing.assert_array_equal(np.asarray(ref.best_slot),
                                  np.asarray(got.best_slot))
    np.testing.assert_array_equal(np.asarray(ref.best_in),
                                  np.asarray(got.best_in))
    np.testing.assert_array_equal(np.asarray(ref.end_score),
                                  np.asarray(got.end_score))


def test_packed_rejects_ambiguous_reads(rng):
    from graphchainer_tpu.align.anchors import _try_pack_frag
    bg = random_dag_bigraph(rng, n_seg=10, p_edge=0.3, max_len=12)
    g = build_alignment_graph(bg)
    gx = GraphTensors.build(g)
    v = 0
    read = "ACGTN" * 8      # N matches all 4 bases -> not 2-bit packable
    job = FragJob(rmm=match_masks(read), seed_node=v,
                  seed_trim_len=int(g.node_len[v]), reverse=False)
    (_, bnc, bi, ss, req, rows, S, bl) = assemble_batch(
        gx, [job], B=16, max_in=4, slack=8)
    assert _try_pack_frag(bnc, bi, req, rows, 4) is None


@pytest.mark.parametrize("seed", range(3))
def test_lane_major_core_matches_reference_kernel(seed):
    """align_fragments_tl (fragments on lanes, slots on sublanes) is
    bit-identical to align_fragments on fresh and carried windows."""
    rng = np.random.default_rng(300 + seed)
    bg = random_dag_bigraph(rng, n_seg=12, p_edge=0.3, max_len=14)
    g = build_alignment_graph(bg)
    gx = GraphTensors.build(g)
    jobs = []
    for _ in range(5):
        v = int(rng.integers(0, g.n_nodes))
        read = "".join(rng.choice(list("ACGT"), int(rng.integers(30, 90))))
        jobs.append(FragJob(rmm=match_masks(read), seed_node=v,
                            seed_trim_len=int(g.node_len[v]),
                            reverse=False))
    (band_nodes, bnc, band_in, seed_shift, req, rows, S, bl) = \
        assemble_batch(gx, jobs, B=16, max_in=4, slack=8)
    dev_eq, dev_len = gx.device_tables()
    from graphchainer_tpu.align.anchors import level_bucket
    nl = level_bucket(bl, band_nodes.shape[1])
    kw = dict(n_slices=S, max_in=4, band_level=bl, n_levels=nl)
    a = frag_align.align_fragments(dev_eq, dev_len, bnc, band_in,
                                   seed_shift, req, rows, **kw)
    b = frag_align.align_fragments_tl(dev_eq, dev_len, bnc, band_in,
                                      seed_shift, req, rows,
                                      want_state=True, **kw)
    assert np.array_equal(np.asarray(a.best_score), np.asarray(b.best_score))
    assert np.array_equal(np.asarray(a.best_slot), np.asarray(b.best_slot))
    assert np.array_equal(np.asarray(a.best_col), np.asarray(b.best_col))
    assert np.array_equal(np.asarray(a.best_in), np.asarray(b.best_in))
    assert np.array_equal(np.asarray(a.out_ssb), np.asarray(b.out_ssb))
    assert np.array_equal(np.asarray(a.out_hp), np.asarray(b.out_hp))
    assert np.array_equal(np.asarray(a.out_hn), np.asarray(b.out_hn))
    # carried continuation equality on the same band
    carry = (np.asarray(a.out_ssb), np.asarray(a.out_hp),
             np.asarray(a.out_hn))
    a2 = frag_align.align_fragments(dev_eq, dev_len, bnc, band_in,
                                    seed_shift, req, rows,
                                    carry_in=carry, **kw)
    b2 = frag_align.align_fragments_tl(dev_eq, dev_len, bnc, band_in,
                                       seed_shift, req, rows,
                                       carry_in=carry, **kw)
    assert np.array_equal(np.asarray(a2.best_score),
                          np.asarray(b2.best_score))
    assert np.array_equal(np.asarray(a2.best_in), np.asarray(b2.best_in))


@pytest.mark.parametrize("seed", range(3))
def test_lane_major_xcells_matches_reference_kernel(seed):
    """want_xcells on the lane-major core is bit-identical to the F-major
    core's cell-precise X tracking, including the (slice, slot, row)
    lexicographic tie-break (GA mode's clip endpoints depend on it)."""
    rng = np.random.default_rng(900 + seed)
    bg = random_dag_bigraph(rng, n_seg=12, p_edge=0.3, max_len=14)
    g = build_alignment_graph(bg)
    gx = GraphTensors.build(g)
    jobs = []
    for _ in range(6):
        v = int(rng.integers(0, g.n_nodes))
        read = "".join(rng.choice(list("ACGT"), int(rng.integers(30, 90))))
        jobs.append(FragJob(rmm=match_masks(read), seed_node=v,
                            seed_trim_len=int(g.node_len[v]),
                            reverse=False))
    (band_nodes, bnc, band_in, seed_shift, req, rows, S, bl) = \
        assemble_batch(gx, jobs, B=16, max_in=4, slack=8)
    dev_eq, dev_len = gx.device_tables()
    from graphchainer_tpu.align.anchors import level_bucket
    nl = level_bucket(bl, band_nodes.shape[1])
    kw = dict(n_slices=S, max_in=4, band_level=bl, n_levels=nl)
    a = frag_align.align_fragments(dev_eq, dev_len, bnc, band_in,
                                   seed_shift, req, rows,
                                   want_xcells=True, **kw)
    b = frag_align.align_fragments_tl(dev_eq, dev_len, bnc, band_in,
                                      seed_shift, req, rows,
                                      want_state=True, want_xcells=True,
                                      **kw)
    for f in ("best_score", "best_slot", "best_col", "best_in",
              "xbest", "xslot", "xrow"):
        assert np.array_equal(np.asarray(getattr(a, f)),
                              np.asarray(getattr(b, f))), f
    # carried windows too (GA windows past the first)
    carry = (np.asarray(a.out_ssb) if a.out_ssb is not None
             else np.asarray(b.out_ssb),
             np.asarray(b.out_hp), np.asarray(b.out_hn))
    a2 = frag_align.align_fragments(dev_eq, dev_len, bnc, band_in,
                                    seed_shift, req, rows,
                                    carry_in=carry, want_xcells=True,
                                    **kw)
    b2 = frag_align.align_fragments_tl(dev_eq, dev_len, bnc, band_in,
                                       seed_shift, req, rows,
                                       carry_in=carry, want_xcells=True,
                                       **kw)
    for f in ("best_score", "xbest", "xslot", "xrow"):
        assert np.array_equal(np.asarray(getattr(a2, f)),
                              np.asarray(getattr(b2, f))), f


def test_join_anchors_matches_extract():
    """native.join_anchors (fused backwalk + fwd/bwd join) must agree with
    the per-fragment extract_anchor Python on every field, including
    failures (broken walks, BIG scores)."""
    from graphchainer_tpu import native
    from graphchainer_tpu.align.anchors import (GraphTensors,
                                                batch_backwalks,
                                                extract_anchor,
                                                run_fragments)
    from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
    from graphchainer_tpu.graph.mpc import build_mpc
    from graphchainer_tpu.graph.simulate import generate_path, simulate_reads
    from graphchainer_tpu.index.minimizer import build_index
    from graphchainer_tpu.models.chainer import ChainerConfig, ChainerModel
    from graphchainer_tpu.ops import frag_align

    rng = np.random.default_rng(3)
    from tests.test_mpc import random_dag_bigraph
    bg = random_dag_bigraph(rng, n_seg=30, p_edge=0.25, max_len=60)
    g = build_alignment_graph(bg)
    mpc = build_mpc(g)
    idx = build_index(g, k=11, w=6)
    model = ChainerModel(g, mpc, idx, ChainerConfig(band_slots=16,
                                                    polish_band_words=4))
    path_seq, _ = generate_path(g, seed=5)
    reads = simulate_reads(path_seq, 6, min(len(path_seq), 400), seed=8,
                           error_rate=0.12)
    jobs, frags, _ = model._fragment_jobs(reads)
    assert jobs, "fixture produced no jobs"
    (band_nodes, bnc, bi, ss, req, rows, S, bl) = assemble_batch(
        model.gx, jobs, B=16, max_in=4, slack=8)
    res = run_fragments(model.gx, bnc, bi, ss, req, rows, S, 4,
                        band_level=bl)
    fr = np.asarray(frags, dtype=np.int64).reshape(-1, 7)
    end_slice = (rows.astype(np.int64) - 1) // 32
    (ok, score, fnode, foff, lnode, loff, poff, pdata) = \
        native.join_anchors(
            np.asarray(res.best_in), np.asarray(res.best_slot),
            np.asarray(res.best_score), np.asarray(res.best_col),
            end_slice, band_nodes, g.node_len, fr[:, 3], fr[:, 4],
            fr[:, 5], fr[:, 6], frag_align.BIG)
    walks = batch_backwalks(res, band_nodes, rows)
    n_ok = 0
    for q, (ri, l, r, fi_fwd, fi_bwd, v, off) in enumerate(frags):
        a = extract_anchor(g, jobs, band_nodes, res, fi_fwd, fi_bwd,
                           l, r, v, off, rows, walks=walks)
        if a is None:
            assert ok[q] == 0, f"frag {q}: native ok, python None"
            assert poff[q + 1] == poff[q]
            continue
        n_ok += 1
        assert ok[q] == 1, f"frag {q}: python ok, native fail"
        assert score[q] == a.score
        assert (fnode[q], foff[q]) == (a.first_node, a.first_off)
        assert (lnode[q], loff[q]) == (a.last_node, a.last_off)
        np.testing.assert_array_equal(pdata[poff[q]:poff[q + 1]],
                                      np.asarray(a.path, dtype=np.int64))
    assert n_ok > 0, "fixture produced no successful anchors"


def test_assemble_cols_matches_objects():
    """assemble_batch_cols on the columnar job batch must equal
    assemble_batch on the materialized FragJob objects (same bands, same
    packed read planes), including short/tiny reads and bwd jobs."""
    from graphchainer_tpu.align.anchors import assemble_batch_cols
    from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
    from graphchainer_tpu.graph.mpc import build_mpc
    from graphchainer_tpu.graph.simulate import generate_path, simulate_reads
    from graphchainer_tpu.index.minimizer import build_index
    from graphchainer_tpu.models.chainer import ChainerConfig, ChainerModel
    from graphchainer_tpu.utils.seq import match_masks
    from tests.test_mpc import random_dag_bigraph

    rng = np.random.default_rng(9)
    bg = random_dag_bigraph(rng, n_seg=25, p_edge=0.3, max_len=70)
    g = build_alignment_graph(bg)
    mpc = build_mpc(g)
    idx = build_index(g, k=11, w=6)
    model = ChainerModel(g, mpc, idx, ChainerConfig(band_slots=16))
    path_seq, _ = generate_path(g, seed=5)
    reads = simulate_reads(path_seq, 5, min(len(path_seq), 400), seed=8,
                           error_rate=0.12)
    reads += [("s1", reads[0][1][:30]), ("s2", reads[1][1][:3])]
    jc, frags, _ = model._fragment_jobs_cols(reads)
    jobs, frags2, _ = model._fragment_jobs(reads)
    np.testing.assert_array_equal(np.asarray(frags), np.asarray(frags2))
    assert len(jobs) == len(jc)
    read_mm_cat = match_masks("".join(s for _, s in reads))
    read_base = np.zeros(len(reads) + 1, dtype=np.int64)
    np.cumsum([len(s) for _, s in reads], out=read_base[1:])
    a = assemble_batch_cols(model.gx, jc, read_mm_cat, read_base, B=16,
                            max_in=4, slack=8)
    b = assemble_batch(model.gx, jobs, B=16, max_in=4, slack=8)
    for i, (x, y) in enumerate(zip(a, b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=f"output {i}")


def test_walk_mask_join_matches():
    """run_fragments(want_walk=True) + join_anchors_masked must equal the
    best_in download + join_anchors on the same batch (every field and
    every joined path)."""
    from graphchainer_tpu import native
    from graphchainer_tpu.align.anchors import run_fragments
    from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
    from graphchainer_tpu.graph.mpc import build_mpc
    from graphchainer_tpu.graph.simulate import generate_path, simulate_reads
    from graphchainer_tpu.index.minimizer import build_index
    from graphchainer_tpu.models.chainer import ChainerConfig, ChainerModel
    from graphchainer_tpu.ops import frag_align
    from graphchainer_tpu.utils.seq import match_masks
    from graphchainer_tpu.align.anchors import assemble_batch_cols
    from tests.test_mpc import random_dag_bigraph

    rng = np.random.default_rng(21)
    bg = random_dag_bigraph(rng, n_seg=30, p_edge=0.25, max_len=60)
    g = build_alignment_graph(bg)
    mpc = build_mpc(g)
    idx = build_index(g, k=11, w=6)
    model = ChainerModel(g, mpc, idx, ChainerConfig(band_slots=16))
    path_seq, _ = generate_path(g, seed=6)
    reads = simulate_reads(path_seq, 6, min(len(path_seq), 400), seed=9,
                           error_rate=0.15)
    jc, frags, _ = model._fragment_jobs_cols(reads)
    assert len(jc)
    read_mm_cat = match_masks("".join(s for _, s in reads))
    read_base = np.zeros(len(reads) + 1, dtype=np.int64)
    np.cumsum([len(s) for _, s in reads], out=read_base[1:])
    (band_nodes, bnc, bi, ss, req, rows, S, bl) = assemble_batch_cols(
        model.gx, jc, read_mm_cat, read_base, B=16, max_in=4, slack=8)
    res_w = run_fragments(model.gx, bnc, bi, ss, req, rows, S, 4,
                          band_level=bl, want_walk=True)
    assert res_w.walk_mask is not None, "walk path not taken"
    res_p = run_fragments(model.gx, bnc, bi, ss, req, rows, S, 4,
                          band_level=bl)
    fr = np.asarray(frags, dtype=np.int64).reshape(-1, 7)
    a = native.join_anchors_masked(
        res_w.walk_ok, res_w.walk_mask, res_w.best_slot,
        res_w.best_score, res_w.best_col, band_nodes, g.node_len,
        fr[:, 3], fr[:, 4], fr[:, 5], fr[:, 6], frag_align.BIG)
    end_slice = (rows.astype(np.int64) - 1) // 32
    b = native.join_anchors(
        np.asarray(res_p.best_in), np.asarray(res_p.best_slot),
        np.asarray(res_p.best_score), np.asarray(res_p.best_col),
        end_slice, band_nodes, g.node_len, fr[:, 3], fr[:, 4], fr[:, 5],
        fr[:, 6], frag_align.BIG)
    names = ["ok", "score", "first_node", "first_off", "last_node",
             "last_off", "path_off", "path_nodes"]
    assert a[0].sum() > 0, "no successful anchors in fixture"
    for name, x, y in zip(names, a, b):
        np.testing.assert_array_equal(x, y, err_msg=name)


def test_req2_from_table_matches_host_packing():
    """Device-side wire-word construction from the batch read table is
    bit-identical to the host packer's req2 (incl. backward fragments,
    unaligned starts and frag_len masking)."""
    import jax.numpy as jnp

    from graphchainer_tpu.ops.frag_align import req2_from_table

    rng = np.random.default_rng(0)
    R, rmax = 7, 512
    lens = rng.integers(100, rmax + 1, R)
    codes = [rng.integers(0, 4, l).astype(np.uint32) for l in lens]
    sh16 = 2 * np.arange(16, dtype=np.uint32)
    tbl = np.zeros((R, rmax // 16), np.uint32)
    for i, c in enumerate(codes):
        cp = np.zeros(rmax, np.uint32)
        cp[:len(c)] = c
        tbl[i] = (cp.reshape(-1, 16) << sh16).sum(1, dtype=np.uint32)

    S, F = 3, 200
    rid = rng.integers(0, R, F)
    rev = rng.integers(0, 2, F).astype(bool)
    flen = rng.integers(1, S * 32 + 1, F)
    start = np.empty(F, np.int64)
    for f in range(F):
        L = lens[rid[f]]
        flen[f] = fl = min(flen[f], L)
        start[f] = (rng.integers(fl - 1, L) if rev[f]
                    else rng.integers(0, L - fl + 1))
    rdc = (rid.astype(np.int64) << 18) | (start << 1) | rev

    ref = np.zeros((F, S, 2), np.uint32)
    for f in range(F):
        c = np.zeros(S * 32, np.uint32)
        for r in range(flen[f]):
            c[r] = codes[rid[f]][start[f] - r if rev[f] else start[f] + r]
        ref[f] = (c.reshape(-1, 16) << sh16).sum(
            1, dtype=np.uint32).reshape(S, 2)

    got = np.asarray(req2_from_table(
        jnp.asarray(tbl), jnp.asarray(rdc.astype(np.int32)),
        jnp.asarray(flen.astype(np.int32)), S))
    np.testing.assert_array_equal(got, ref)
