"""--seedless-DP: fullstart whole-read alignment with zero seeder hits
(reference src/GraphAligner.h:53-83 AlignOneWay/fullstartOneWay)."""
import numpy as np
import pytest

from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
from graphchainer_tpu.index.minimizer import build_index, get_seeds
from graphchainer_tpu.models.aligner import AlignerConfig, GraphAlignerModel

from tests.test_aligner import check
from tests.test_e2e import bubble_graph, simulate

pytestmark = pytest.mark.fast


def poisoned(read: str, rng, period: int = 8) -> str:
    """Substitute every `period`-th base: no k>=11 minimizer survives."""
    out = list(read)
    for i in range(0, len(out), period):
        out[i] = {"A": "C", "C": "G", "G": "T", "T": "A"}[out[i]]
    return "".join(out)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(77)
    g = build_alignment_graph(bubble_graph(rng))
    idx = build_index(g, k=13, w=10)
    return rng, g, idx


def test_seedless_aligns_zero_seed_read(setup):
    rng, g, idx = setup
    read, _ = simulate(rng, g, err=0.0, min_len=400)
    bad = poisoned(read, rng)
    assert get_seeds(idx, bad, -1) == [], "read still has minimizer hits"

    model = GraphAlignerModel(g, idx, AlignerConfig(
        band_slots=24, polish_band_words=4, seedless_dp=True))
    aln = model.align_batch([("r", bad)])[0]
    assert not aln.failed
    # every 8th base substituted = 12.5% error; the alignment must still
    # cover most of the read and be structurally valid
    cov = (aln.seq_end - aln.seq_start) / len(bad)
    assert cov > 0.8, cov
    check(g, bad[aln.seq_start:aln.seq_end], aln,
          max_ed=int(len(bad) * 0.25))


def test_seedless_matches_seeded_on_clean_read(setup):
    rng, g, idx = setup
    read, _ = simulate(rng, g, err=0.0, min_len=300)
    seeded = GraphAlignerModel(g, idx, AlignerConfig(
        band_slots=24, polish_band_words=4))
    seedless = GraphAlignerModel(g, idx, AlignerConfig(
        band_slots=24, polish_band_words=4, seedless_dp=True))
    a = seeded.align_batch([("r", read)])[0]
    b = seedless.align_batch([("r", read)])[0]
    assert not a.failed and not b.failed
    assert b.score <= a.score + 2, (a.score, b.score)
    cov = (b.seq_end - b.seq_start) / len(read)
    assert cov > 0.95


def test_restart_stride_recovers_tail(setup):
    """A read whose middle is unalignable garbage: the stride re-scan must
    still place a seed past the break (reference DPRestartStride,
    src/GraphAligner.h:60-80)."""
    rng, g, idx = setup
    head, _ = simulate(rng, g, err=0.0, min_len=260)
    tail, _ = simulate(rng, g, err=0.0, min_len=260)
    junk = "".join(rng.choice(list("ACGT"), 120))
    read = poisoned(head, rng) + junk + poisoned(tail, rng)
    assert get_seeds(idx, read, -1) == []
    model = GraphAlignerModel(g, idx, AlignerConfig(
        band_slots=24, polish_band_words=4, seedless_dp=True,
        dp_restart_stride=150, max_alignments=4,
        window_error_cutoff=0.4))
    aln = model.align_batch([("r", read)])[0]
    assert not aln.failed
    spans = [(aln.seq_start, aln.seq_end)] + [
        (s.seq_start, s.seq_end) for s in aln.secondary]
    # some alignment must land in the head region and some in the tail
    assert any(s < len(head) for s, e in spans), spans
    assert any(e > len(head) + len(junk) + 60 for s, e in spans), spans


def test_cli_seedless_flag_forces_ga():
    from graphchainer_tpu.cli import build_parser, params_from_args
    args = build_parser().parse_args(
        ["-g", "x.gfa", "-f", "r.fq", "-a", "o.gam", "--seedless-DP",
         "--DP-restart-stride", "200"])
    assert args.seedless_dp and args.dp_restart_stride == 200
    p = params_from_args(args)
    assert p.seedless_dp and p.dp_restart_stride == 200
