"""Myers word primitive tests vs a scalar edit-distance DP oracle."""
import numpy as np
import pytest

import jax.numpy as jnp

from graphchainer_tpu.ops import myers


def classic_dp(read, text, top_row):
    """D[i][j]: i read chars vs j text chars; D[0][j] = top_row[j],
    D[i][0] derives from D[0][0] by insertions."""
    R, T = len(read), len(text)
    D = np.zeros((R + 1, T + 1), dtype=np.int64)
    D[0, :] = top_row
    for i in range(1, R + 1):
        D[i, 0] = D[0, 0] + i
    for i in range(1, R + 1):
        for j in range(1, T + 1):
            sub = 0 if read[i - 1] == text[j - 1] else 1
            D[i, j] = min(D[i - 1, j - 1] + sub, D[i - 1, j] + 1,
                          D[i, j - 1] + 1)
    return D


def eq_mask(read, ch):
    m = np.uint32(0)
    for i, r in enumerate(read):
        if r == ch:
            m |= np.uint32(1) << np.uint32(i)
    return m


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("mode", ["global", "semiglobal"])
def test_advance_matches_classic_dp(seed, mode):
    rng = np.random.default_rng(seed)
    read = "".join(rng.choice(list("ACGT"), 32))
    text = "".join(rng.choice(list("ACGT"), 40))
    top = np.arange(41) if mode == "global" else np.zeros(41, dtype=np.int64)
    D = classic_dp(read, text, top)

    vp, vn, sb = myers.source_word(jnp.int32(0))
    for j, ch in enumerate(text):
        hin = jnp.int32(top[j + 1] - top[j])
        eq = jnp.uint32(eq_mask(read, ch))
        vp, vn, sb, hout = myers.advance_word(vp, vn, sb, eq, hin)
        scores = np.asarray(myers.word_scores(vp, vn, sb))
        np.testing.assert_array_equal(scores, D[1:, j + 1])
        assert int(myers.score_before_start(vp, vn, sb)) == D[0, j + 1]
        assert int(sb) == D[32, j + 1]


def test_pack_expand_roundtrip(rng):
    for _ in range(20):
        b = np.int64(rng.integers(0, 50))
        deltas = rng.integers(-1, 2, size=32)
        scores = b + np.cumsum(deltas)
        vp, vn, sb = myers.pack_scores(jnp.asarray(scores, jnp.int32),
                                       jnp.asarray(b, jnp.int32))
        back = np.asarray(myers.word_scores(vp, vn, sb))
        np.testing.assert_array_equal(back, scores)
        assert int(myers.score_before_start(vp, vn, sb)) == b


def test_merge_words(rng):
    for _ in range(20):
        b1 = np.int64(rng.integers(0, 20))
        b2 = np.int64(rng.integers(0, 20))
        s1 = b1 + np.cumsum(rng.integers(-1, 2, size=32))
        s2 = b2 + np.cumsum(rng.integers(-1, 2, size=32))
        w1 = myers.pack_scores(jnp.asarray(s1, jnp.int32), jnp.asarray(b1, jnp.int32))
        w2 = myers.pack_scores(jnp.asarray(s2, jnp.int32), jnp.asarray(b2, jnp.int32))
        mv, mn, ms = myers.merge_words(*w1, *w2)
        got = np.asarray(myers.word_scores(mv, mn, ms))
        np.testing.assert_array_equal(got, np.minimum(s1, s2))


def test_batched_shapes():
    vp, vn, sb = myers.source_word(jnp.zeros((4, 7), jnp.int32))
    eq = jnp.zeros((4, 7), jnp.uint32)
    hin = jnp.ones((4, 7), jnp.int32)
    vp, vn, sb, hout = myers.advance_word(vp, vn, sb, eq, hin)
    assert vp.shape == (4, 7)
    assert myers.word_scores(vp, vn, sb).shape == (4, 7, 32)
    mn, am = myers.word_min(vp, vn, sb)
    assert mn.shape == (4, 7)
