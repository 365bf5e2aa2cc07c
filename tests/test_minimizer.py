"""Minimizer index/seeding tests."""
import numpy as np
import pytest

from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
from graphchainer_tpu.index.minimizer import (MinimizerIndex, _encode,
                                              build_index, get_seeds,
                                              kmer_codes, minimizers)
from graphchainer_tpu.io.gfa import Bigraph


def brute_minimizers(seq, k, w):
    """Oracle mirroring the reference's brute-force cross-check
    (src/MinimizerSeeder.cpp:199-283): argmin of hash per window."""
    from graphchainer_tpu.index.minimizer import _mix64
    codes = _encode(seq)
    kv, valid = kmer_codes(codes, k)
    if len(kv) == 0:
        return set()
    h = np.where(valid, _mix64(kv), np.uint64(0xFFFFFFFFFFFFFFFF))
    out = set()
    if len(h) <= w:
        p = int(np.argmin(h))
        if valid[p]:
            out.add(p)
        return out
    for s in range(len(h) - w + 1):
        p = s + int(np.argmin(h[s:s + w]))
        if valid[p]:
            out.add(p)
    return out


@pytest.mark.parametrize("seed", range(5))
def test_minimizers_match_bruteforce(seed):
    rng = np.random.default_rng(seed)
    seq = "".join(rng.choice(list("ACGTN"), 300, p=[.24, .24, .24, .24, .04]))
    for k, w in [(5, 4), (7, 10), (15, 20)]:
        pos, kv = minimizers(_encode(seq), k, w)
        assert set(pos.tolist()) == brute_minimizers(seq, k, w)


def test_index_and_query_exact_substring(rng):
    seq = "".join(rng.choice(list("ACGT"), 500))
    bg = Bigraph()
    bg.add_segment("x", seq)
    g = build_alignment_graph(bg)
    idx = build_index(g, k=11, w=8)
    read = seq[100:220]
    seeds = get_seeds(idx, read, density=-1)
    assert len(seeds) > 0
    ok = 0
    for s in seeds:
        if s.di_node == 0 and s.node_offset == 100 + s.seq_pos:
            ok += 1
    # the overwhelming majority of hits must be true positions
    assert ok >= len(seeds) * 0.5


def test_revcomp_hits(rng):
    from graphchainer_tpu.utils.seq import revcomp
    seq = "".join(rng.choice(list("ACGT"), 400))
    bg = Bigraph()
    bg.add_segment("x", seq)
    g = build_alignment_graph(bg)
    idx = build_index(g, k=11, w=8)
    read = revcomp(seq[50:170])
    seeds = get_seeds(idx, read, density=-1)
    assert any(s.di_node == 1 for s in seeds)  # reverse strand node


def test_save_load(tmp_path, rng):
    seq = "".join(rng.choice(list("ACGT"), 200))
    bg = Bigraph()
    bg.add_segment("x", seq)
    g = build_alignment_graph(bg)
    idx = build_index(g, k=9, w=6)
    f = str(tmp_path / "minimizer.npz")
    idx.save(f)
    idx2 = MinimizerIndex.load(f)
    np.testing.assert_array_equal(idx.codes, idx2.codes)
    assert idx.count_cap == idx2.count_cap


def test_cluster_seeds(rng):
    from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
    from graphchainer_tpu.index.minimizer import SeedHit, cluster_seeds
    seq = "".join(rng.choice(list("ACGT"), 600))
    bg = Bigraph()
    bg.add_segment("x", seq)
    g = build_alignment_graph(bg)
    # three colinear seeds on one diagonal + one off-diagonal decoy
    seeds = [SeedHit(0, 100, 10, 15, 1.0),
             SeedHit(0, 160, 70, 15, 1.0),
             SeedHit(0, 220, 130, 15, 1.0),
             SeedHit(0, 400, 20, 15, 5.0)]
    out = cluster_seeds(g, seeds)
    # the 3-seed diagonal cluster outranks the decoy; goodness follows the
    # reference formula cluster-matched-bp + raw rarity
    # (src/GraphAligner.h:275-287: each seed contributes matchLen-1
    # non-overlapping bp): 3*(15-1) + 1 = 43 vs decoy (15-1) + 5 = 19
    assert out[0].node_offset in (100, 160, 220)
    assert out[-1].node_offset == 400
    assert out[0].goodness == 43.0
    assert out[-1].goodness == 19.0


def test_minimizers_batch_matches_scalar():
    """minimizers_batch over a mixed batch (long reads, short reads,
    ambiguous chars) must equal per-sequence minimizers() exactly."""
    import numpy as np
    from graphchainer_tpu.index.minimizer import (_encode, minimizers,
                                                  minimizers_batch)
    rng = np.random.default_rng(17)
    seqs = []
    for n in (5, 14, 15, 40, 300, 2000, 31, 64):
        s = "".join(rng.choice(list("ACGT"), n))
        seqs.append(s)
    # sprinkle ambiguity
    s = list(seqs[-1])
    for p in rng.choice(len(s), 5, replace=False):
        s[p] = "N"
    seqs[-1] = "".join(s)
    k, w = 15, 10
    batch = minimizers_batch([_encode(s) for s in seqs], k, w)
    for s, got in zip(seqs, batch):
        pos, kv = minimizers(_encode(s), k, w)
        np.testing.assert_array_equal(got[0], pos, err_msg=f"len {len(s)}")
        np.testing.assert_array_equal(got[1], kv, err_msg=f"len {len(s)}")


def test_get_seed_arrays_batch_matches_scalar():
    import numpy as np
    from graphchainer_tpu.index.minimizer import (get_seed_arrays,
                                                  get_seed_arrays_batch)
    rng = np.random.default_rng(3)
    bg = Bigraph()
    path_seq = "".join(rng.choice(list("ACGT"), 1500))
    bg.add_segment("x", path_seq)
    g = build_alignment_graph(bg)
    idx = build_index(g, k=15, w=10)
    reads = []
    for _ in range(6):
        a = int(rng.integers(0, max(len(path_seq) - 200, 1)))
        reads.append(path_seq[a:a + 200])
    reads.append("ACGT")          # too short: no minimizers
    batch = get_seed_arrays_batch(idx, reads, 10.0)
    for r, got in zip(reads, batch):
        ref = get_seed_arrays(idx, r, 10.0)
        if ref is None:
            assert got is None
            continue
        for a, b in zip(got, ref):
            np.testing.assert_array_equal(a, b)


def test_native_seed_window_matches_python(monkeypatch):
    """The native seed_window_batch must be BIT-identical to the Python
    _fragment_jobs_cols path (JobCols, frags, seed_counts) on a bubbly
    graph with noisy reads, N bases, short reads and empty reads."""
    from graphchainer_tpu import native
    from graphchainer_tpu.graph.mpc import build_mpc
    from graphchainer_tpu.graph.simulate import generate_path, simulate_reads
    from graphchainer_tpu.models.chainer import ChainerConfig, ChainerModel

    rng = np.random.default_rng(5)
    bg = Bigraph()
    prev = None
    for i in range(40):
        sp = bg.add_segment(f"s{i}", "".join(rng.choice(list("ACGT"),
                                                        int(rng.integers(30, 80)))))
        if prev is not None:
            for pn in prev:
                bg.links.append((pn, False, sp, False, 0))
        a = bg.add_segment(f"a{i}", str(rng.choice(list("ACGT"))))
        b = bg.add_segment(f"b{i}", str(rng.choice(list("ACGT"))))
        bg.links.append((sp, False, a, False, 0))
        bg.links.append((sp, False, b, False, 0))
        prev = [a, b]
    g = build_alignment_graph(bg)
    mpc = build_mpc(g)
    idx = build_index(g, k=15, w=10)
    model = ChainerModel(g, mpc, idx, ChainerConfig())
    path_seq, _ = generate_path(g, seed=3)
    reads = simulate_reads(path_seq, 24, 400, seed=11, error_rate=0.10,
                           len_std=60)
    # edge cases: tiny read, N-containing read, empty-ish read
    reads = list(reads) + [("tiny", "ACG"), ("enn", "ACGTN" * 30),
                           ("one", "A")]

    monkeypatch.setenv("GCTPU_PY_SEEDWINDOW", "1")
    jc_py, frags_py, sc_py = model._fragment_jobs_cols(reads)
    monkeypatch.delenv("GCTPU_PY_SEEDWINDOW")
    jc_nat, frags_nat, sc_nat = native.seed_window_batch(
        idx, model.gx, reads, model.cfg.seed_density,
        model.cfg.colinear_split_len, model.cfg.colinear_split_gap,
        model.cfg.seeds_per_fragment)

    assert list(sc_py) == list(sc_nat)
    assert len(jc_py) == len(jc_nat)
    np.testing.assert_array_equal(jc_py.seed, jc_nat.seed)
    np.testing.assert_array_equal(jc_py.trim, jc_nat.trim)
    np.testing.assert_array_equal(jc_py.rev, jc_nat.rev)
    np.testing.assert_array_equal(jc_py.read_idx, jc_nat.read_idx)
    np.testing.assert_array_equal(jc_py.lo, jc_nat.lo)
    np.testing.assert_array_equal(jc_py.hi, jc_nat.hi)
    np.testing.assert_array_equal(np.asarray(frags_py, dtype=np.int64),
                                  frags_nat)


def test_native_seed_window_density_budget():
    """density budget + count-cap semantics survive the native port:
    density=-1 keeps everything under the cap; a tiny density keeps
    whole equal-frequency groups only."""
    from graphchainer_tpu import native
    from graphchainer_tpu.align.anchors import GraphTensors
    from graphchainer_tpu.index.minimizer import get_seed_arrays_batch

    rng = np.random.default_rng(9)
    seq = "".join(rng.choice(list("ACGT"), 600))
    bg = Bigraph()
    bg.add_segment("x", seq)
    g = build_alignment_graph(bg)
    idx = build_index(g, k=11, w=8)
    gx = GraphTensors.build(g)
    read = seq[50:350]
    for density in (-1.0, 0.05, 10.0):
        arrs = get_seed_arrays_batch(idx, [read], density)[0]
        jc, frags, sc = native.seed_window_batch(
            idx, gx, [("r", read)], density, 35, 35, 2)
        n_py = 0 if arrs is None else len(arrs[0])
        assert sc[0] == n_py


def test_native_index_matches_python(monkeypatch, rng):
    """Native minimizer_build must equal the NumPy build_index path
    bit-for-bit (codes sorted identically, same positions, same cap)."""
    from graphchainer_tpu.index import minimizer as M

    bg = Bigraph()
    for i in range(30):
        n = int(rng.integers(5, 200))
        seq = "".join(rng.choice(list("ACGTN"), n,
                                 p=[.24, .24, .24, .24, .04]))
        bg.add_segment(f"s{i}", seq)
    g = build_alignment_graph(bg)
    for k, w in [(15, 10), (11, 8), (15, 20)]:
        idx_nat = M.build_index(g, k=k, w=w)
        monkeypatch.setenv("GCTPU_PY_INDEX", "1")
        idx_py = M.build_index(g, k=k, w=w)
        monkeypatch.delenv("GCTPU_PY_INDEX")
        np.testing.assert_array_equal(idx_py.codes, idx_nat.codes)
        np.testing.assert_array_equal(idx_py.di_node, idx_nat.di_node)
        np.testing.assert_array_equal(idx_py.offset, idx_nat.offset)
        assert idx_py.count_cap == idx_nat.count_cap
