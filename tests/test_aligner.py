"""Whole-read seed-and-extend (GraphAligner-style) model tests."""
import numpy as np
import pytest

from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
from graphchainer_tpu.index.minimizer import build_index
from graphchainer_tpu.io.gfa import Bigraph, load_gfa
from graphchainer_tpu.models.aligner import AlignerConfig, GraphAlignerModel

from tests.conftest import TOY_READ
from tests.test_e2e import bubble_graph, simulate
from tests.test_polish import nw_edit_distance


def check(g, read, aln, max_ed):
    assert not aln.failed
    path = []
    for v, o in aln.positions:
        if not path or path[-1] != v:
            path.append(v)
    for a, b in zip(path[:-1], path[1:]):
        assert b in set(int(x) for x in g.out_neighbors(a))
    pathseq = "".join(g.node_seq(v)[o] for v, o in aln.positions)
    ed = nw_edit_distance(read, pathseq)
    assert aln.score == ed
    assert ed <= max_ed, (ed, max_ed)


def test_ga_toy_read(toy_gfa):
    g = build_alignment_graph(load_gfa(toy_gfa))
    idx = build_index(g, k=11, w=5)
    model = GraphAlignerModel(g, idx, AlignerConfig(band_slots=16,
                                                    polish_band_words=4))
    aln = model.align_batch([("read", TOY_READ)])[0]
    check(g, TOY_READ, aln, max_ed=20)


@pytest.mark.parametrize("err", [0.0, 0.1])
def test_ga_simulated_reads(err):
    rng = np.random.default_rng(21)
    bg = bubble_graph(rng)
    g = build_alignment_graph(bg)
    idx = build_index(g, k=13, w=10)
    model = GraphAlignerModel(g, idx, AlignerConfig(band_slots=24,
                                                    polish_band_words=4))
    reads = []
    for i in range(4):
        read, _ = simulate(rng, g, err=err, min_len=250)
        reads.append((f"r{i}", read))
    alns = model.align_batch(reads)
    ok = 0
    for (name, read), aln in zip(reads, alns):
        if aln.failed:
            continue
        check(g, read, aln, max_ed=int(len(read) * (err * 1.7 + 0.03)) + 2)
        ok += 1
    assert ok >= 3


def test_ga_long_read_multiwindow(rng):
    """Reads longer than one window exercise the frontier re-seeding."""
    bg = bubble_graph(rng, n_bubbles=20, spacer=50)
    g = build_alignment_graph(bg)
    idx = build_index(g, k=13, w=10)
    model = GraphAlignerModel(g, idx, AlignerConfig(band_slots=24,
                                                    polish_band_words=4))
    read, truth = simulate(rng, g, err=0.0, min_len=600)
    aln = model.align_batch([("long", read)])[0]
    check(g, read, aln, max_ed=4)


def test_compare_with_baseline(toy_gfa):
    from graphchainer_tpu.graph.mpc import build_mpc
    from graphchainer_tpu.models.chainer import ChainerConfig, ChainerModel
    g = build_alignment_graph(load_gfa(toy_gfa))
    idx = build_index(g, k=11, w=5)
    model = ChainerModel(g, build_mpc(g), idx,
                         ChainerConfig(band_slots=16, polish_band_words=4,
                                       compare_with_baseline=True))
    aln = model.align_batch([("read", TOY_READ)])[0]
    check(g, TOY_READ, aln, max_ed=20)


def test_ga_mode_cli(toy_gfa, tmp_path):
    from graphchainer_tpu.cli import main as cli_main
    reads = tmp_path / "r.fa"
    reads.write_text(f">read\n{TOY_READ}\n")
    out = str(tmp_path / "out.gaf")
    rc = cli_main(["-g", toy_gfa, "-f", str(reads), "-a", out,
                   "--mode", "ga", "-b", "16", "--polish-band", "4",
                   "--seeds-minimizer-length", "11",
                   "--seeds-minimizer-windowsize", "5"])
    assert rc == 0
    assert open(out).read().startswith("read\t")


def test_ga_clipped_alignment_span():
    """A read with a garbage tail must come back clipped, with the polish
    score covering only the aligned span."""
    rng = np.random.default_rng(33)
    from tests.test_e2e import bubble_graph, simulate
    bg = bubble_graph(rng)
    g = build_alignment_graph(bg)
    idx = build_index(g, k=13, w=10)
    model = GraphAlignerModel(g, idx, AlignerConfig(band_slots=24,
                                                    polish_band_words=4))
    read, _ = simulate(rng, g, err=0.0, min_len=300)
    garbage = "".join(rng.choice(list("ACGT"), 150))
    full = read + garbage
    aln = model.align_batch([("clip", full)])[0]
    assert not aln.failed
    # aligned span stops near the real read; score is small
    assert aln.seq_end <= len(read) + 70
    assert aln.score <= 40  # at most one partial garbage window before the clip
    # emitted mappings consume exactly the span
    from graphchainer_tpu.align.emit import to_mappings
    mappings = to_mappings(g, aln)
    to_len = sum(e.to_length for m in mappings for e in m.edits)
    assert to_len == aln.seq_end - aln.seq_start


def test_ga_x_drop_and_precise_clipping():
    """--X-drop / --precise-clipping map onto the GA window cutoffs
    (reference src/AlignerMain.cpp:68-69,300-319)."""
    import pytest
    # precise-clipping sets the window error cutoff to 1 - identity
    cfg = AlignerConfig(precise_clipping=0.8)
    assert abs(cfg.window_error_cutoff - 0.2) < 1e-9
    with pytest.raises(ValueError):
        AlignerConfig(precise_clipping=1.5)
    with pytest.raises(ValueError):
        AlignerConfig(x_drop=1)

    # a tight X-drop still aligns a clean read fully and clips garbage
    rng = np.random.default_rng(41)
    from tests.test_e2e import bubble_graph, simulate
    g = build_alignment_graph(bubble_graph(rng))
    idx = build_index(g, k=13, w=10)
    model = GraphAlignerModel(
        g, idx, AlignerConfig(band_slots=24, polish_band_words=4,
                              x_drop=30, precise_clipping=0.66))
    read, _ = simulate(rng, g, err=0.0, min_len=300)
    aln = model.align_batch([("clean", read)])[0]
    assert not aln.failed
    assert aln.seq_end - aln.seq_start >= 0.9 * len(read)
    garbage = "".join(rng.choice(list("ACGT"), 200))
    aln2 = model.align_batch([("chimera", read + garbage)])[0]
    assert not aln2.failed
    assert aln2.seq_end <= len(read) + 70


def test_ga_ramp_bandwidth():
    """-B/--ramp-bandwidth: a window that fails the cutoff retries once
    with the wider band before clipping (reference backtrack-and-retry,
    src/GraphAlignerBitvectorBanded.h:572-644)."""
    import pytest
    with pytest.raises(ValueError):
        AlignerConfig(band_slots=48, ramp_band_slots=32)

    rng = np.random.default_rng(57)
    from tests.test_e2e import bubble_graph, simulate
    g = build_alignment_graph(bubble_graph(rng))
    idx = build_index(g, k=13, w=10)
    # a band of 4 slots cannot hold the true path through the bubbles at
    # 8% error; the ramp retry (48 slots) recovers the full read
    read, _ = simulate(rng, g, err=0.08, min_len=420)
    span = {}
    for ramp in (0, 48):
        model = GraphAlignerModel(
            g, idx, AlignerConfig(band_slots=4, band_slack=2,
                                  polish_band_words=4,
                                  ramp_band_slots=ramp))
        a = model.align_batch([("r", read)])[0]
        span[ramp] = 0 if a.failed else a.seq_end - a.seq_start
    assert span[0] < 0.6 * len(read)       # narrow band clips early
    assert span[48] >= 0.95 * len(read)    # ramp retry recovers it


def test_ga_selection_methods_and_e_cutoff():
    """Selection-method + --E-cutoff wiring (reference
    src/AlignerMain.cpp:62-63,101-106)."""
    rng = np.random.default_rng(71)
    from tests.test_e2e import bubble_graph, simulate
    g = build_alignment_graph(bubble_graph(rng))
    idx = build_index(g, k=13, w=10)
    read, _ = simulate(rng, g, err=0.05, min_len=300)
    for method in ("GreedyLength", "GreedyE", "ScheduleInverseESum",
                   "ScheduleInverseEProduct", "All"):
        m = GraphAlignerModel(g, idx, AlignerConfig(
            band_slots=24, polish_band_words=4, selection_method=method))
        a = m.align_batch([("r", read)])[0]
        assert not a.failed, method
        assert a.seq_end - a.seq_start >= 0.9 * len(read), method
    # E-cutoff filtering (with --precise-clipping, which makes the
    # Karlin-Altschul lambda non-degenerate; at the identity-0.5 default
    # E-values are ~K*m*n like the reference's)
    m = GraphAlignerModel(g, idx, AlignerConfig(
        band_slots=24, polish_band_words=4, precise_clipping=0.66,
        e_cutoff=1e-300))
    a = m.align_batch([("r", read)])[0]
    assert a.failed            # strict cutoff suppresses everything
    m = GraphAlignerModel(g, idx, AlignerConfig(
        band_slots=24, polish_band_words=4, precise_clipping=0.66,
        e_cutoff=1e9))
    a = m.align_batch([("r", read)])[0]
    assert not a.failed        # permissive cutoff keeps it


def test_ga_seed_policy_and_global_alignment():
    """--try-all-seeds / --seeds-extend-density / --seeds-clustersize /
    --global-alignment (reference src/AlignerMain.cpp:64-66,79-80)."""
    rng = np.random.default_rng(83)
    from tests.test_e2e import bubble_graph, simulate
    g = build_alignment_graph(bubble_graph(rng))
    idx = build_index(g, k=13, w=10)
    read, _ = simulate(rng, g, err=0.0, min_len=300)
    garbage = "".join(rng.choice(list("ACGT"), 120))
    chimera = read + garbage

    # X-drop clips the garbage tail; --global-alignment overrides every
    # cutoff and spans end-to-end
    m = GraphAlignerModel(g, idx, AlignerConfig(band_slots=24,
                                                polish_band_words=4,
                                                x_drop=30))
    a = m.align_batch([("c", chimera)])[0]
    assert a.seq_end <= len(read) + 70
    m = GraphAlignerModel(g, idx, AlignerConfig(band_slots=24,
                                                polish_band_words=4,
                                                x_drop=30,
                                                global_alignment=True))
    a = m.align_batch([("c", chimera)])[0]
    assert not a.failed
    assert a.seq_end - a.seq_start == len(chimera)

    # cluster-size filter drops singleton clusters
    from graphchainer_tpu.index.minimizer import cluster_seeds, get_seeds
    seeds = get_seeds(idx, read, 0.5)
    assert len(seeds) > 3
    filtered = cluster_seeds(g, seeds, min_cluster_size=2)
    assert 0 < len(filtered) <= len(seeds)

    # seed policies still align the clean read
    for kw in (dict(try_all_seeds=True),
               dict(seed_extend_density=0.05)):
        m = GraphAlignerModel(g, idx, AlignerConfig(
            band_slots=24, polish_band_words=4, **kw))
        a = m.align_batch([("r", read)])[0]
        assert not a.failed
        assert a.seq_end - a.seq_start >= 0.9 * len(read)


def test_xdrop_clips_at_exact_cell(rng):
    """Cell-precise X-drop endpoints (reference per-cell X endpoint scan,
    src/GraphAlignerBitvectorCommon.h:321-383): a read whose tail turns
    to garbage mid-window is clipped at the last well-matching base, not
    at a 64-row window boundary."""
    backbone = "".join(rng.choice(list("ACGT"), 400))
    bg = Bigraph()
    bg.add_segment("s", backbone)
    g = build_alignment_graph(bg)
    idx = build_index(g, k=13, w=8)
    good = 150
    read = backbone[:good] + "".join(rng.choice(list("ACGT"), 80))
    model = GraphAlignerModel(g, idx, AlignerConfig(band_slots=16,
                                                    polish_band_words=4,
                                                    x_drop=20))
    aln = model.align_batch([("clip", read)])[0]
    assert not aln.failed
    # the aligned span must end within a few bases of the good prefix --
    # window-granular clipping would land on a multiple of 64 (128 or 192)
    assert abs(aln.seq_end - good) <= 8, (aln.seq_start, aln.seq_end)
    assert aln.seq_start <= 5
