"""32-bit Myers bit-parallel edit-distance word primitives (pure jnp).

The TPU re-design of the reference's 64-bit WordSlice algebra
(src/WordSlice.h, src/GraphAlignerBitvectorCommon.h:243-263): TPU VPU lanes
are 32-bit, so a DP "word" covers 32 read rows.  A word is the triple
(vp, vn, sb):

  vp/vn : uint32 vertical delta bits; bit i set means
          S[i] - S[i-1] == +1 / -1 (S[-1] is the score at the boundary row
          above the word, `score_before_start`),
  sb    : int32 score at the bottom row, S[31].

All functions are elementwise over arbitrary leading batch dims and are
used both from plain XLA code and inside Pallas kernel bodies.

The column advance is the classic Myers(1999)/Hyyrö block recurrence with
horizontal carry in/out, the same recurrence the reference uses
(getNextSlice) and edlib uses (calculateBlock); it is public-domain
textbook material, re-derived here for 32-bit words.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

W = 32
import numpy as np

ONES = np.uint32(0xFFFFFFFF)
HIGH = np.uint32(0x80000000)


def advance_word(vp: jax.Array, vn: jax.Array, sb: jax.Array, eq: jax.Array,
                 hin: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array,
                                          jax.Array]:
    """One DP column step: from column word (vp, vn, sb) to the next column
    given its match bits `eq` and the horizontal delta `hin` in {-1, 0, +1}
    at the boundary row.  Returns (vp', vn', sb', hout)."""
    hin_neg = (hin < 0).astype(jnp.uint32)
    hin_pos = (hin > 0).astype(jnp.uint32)
    eq = eq | hin_neg
    xv = eq | vn
    xh = (((eq & vp) + vp) ^ vp) | eq
    ph = vn | ~(xh | vp)
    mh = vp & xh
    hout = ((ph & HIGH) != 0).astype(jnp.int32) \
        - ((mh & HIGH) != 0).astype(jnp.int32)
    ph = (ph << 1) | hin_pos
    mh = (mh << 1) | hin_neg
    vp_new = mh | ~(xv | ph)
    vn_new = ph & xv
    return vp_new, vn_new, sb + hout, hout


def score_before_start(vp: jax.Array, vn: jax.Array, sb: jax.Array):
    """S[-1]: the implied score at the boundary row above the word."""
    pc = jax.lax.population_count
    return sb - pc(vp).astype(jnp.int32) + pc(vn).astype(jnp.int32)


import numpy as _np

_ROWS_NP = _np.arange(W, dtype=_np.uint32)
# above_mask[i]: bits strictly above row i (i+1..31)
_ABOVE = _np.where(_ROWS_NP < W - 1,
                   _np.uint32(0xFFFFFFFF) << (_ROWS_NP + 1),
                   _np.uint32(0)).astype(_np.uint32)


def word_scores(vp: jax.Array, vn: jax.Array, sb: jax.Array) -> jax.Array:
    """Expand a word to its 32 row scores, appended as a trailing axis."""
    pc = jax.lax.population_count
    vp_ = vp[..., None] & _ABOVE
    vn_ = vn[..., None] & _ABOVE
    return (sb[..., None]
            - pc(vp_).astype(jnp.int32) + pc(vn_).astype(jnp.int32))


_BITVAL = (_np.uint32(1) << _ROWS_NP).astype(_np.uint32)


def pack_scores(scores: jax.Array, b: jax.Array):
    """Inverse of word_scores: scores (..., 32) with consecutive deltas in
    {-1, 0, +1} (relative to boundary score b) -> (vp, vn, sb)."""
    prev = jnp.concatenate([b[..., None], scores[..., :-1]], axis=-1)
    d = scores - prev
    vp = ((d == 1).astype(jnp.uint32) * _BITVAL).sum(axis=-1, dtype=jnp.uint32)
    vn = ((d == -1).astype(jnp.uint32) * _BITVAL).sum(axis=-1,
                                                      dtype=jnp.uint32)
    return vp, vn, scores[..., -1]


def merge_words(vp1, vn1, sb1, vp2, vn2, sb2):
    """Elementwise-min of two words (the reference's mergeTwoSlices,
    src/WordSlice.h:491-545, done there with a Morton-interleave trick; here
    via expand -> min -> repack, which the VPU handles well and which keeps
    the math obviously correct).  The merged boundary score is
    min(b1, b2); deltas stay in {-1, 0, +1} (see proof in ops docs)."""
    s1 = word_scores(vp1, vn1, sb1)
    s2 = word_scores(vp2, vn2, sb2)
    b1 = score_before_start(vp1, vn1, sb1)
    b2 = score_before_start(vp2, vn2, sb2)
    return pack_scores(jnp.minimum(s1, s2), jnp.minimum(b1, b2))


def word_min(vp: jax.Array, vn: jax.Array, sb: jax.Array):
    """Minimum score within the word and its row index (first minimum)."""
    s = word_scores(vp, vn, sb)
    return s.min(axis=-1), s.argmin(axis=-1).astype(jnp.int32)


def source_word(before_score: jax.Array):
    """A fresh boundary column: S[-1] = before_score, S[i] = before + i + 1
    (all-insertions), i.e. the reference's getSourceSliceFromScore
    (src/GraphAlignerBitvectorCommon.h:806-810)."""
    shape = jnp.shape(before_score)
    vp = jnp.full(shape, ONES, dtype=jnp.uint32)
    vn = jnp.zeros(shape, dtype=jnp.uint32)
    sb = before_score + W
    return vp, vn, sb
