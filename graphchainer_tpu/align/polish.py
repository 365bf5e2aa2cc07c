"""Host glue for the final polish alignment (read vs chain-path sequence).

Prepares batched inputs for ops/linear_align.polish_align, runs the device
kernel, and backtraces CIGARs in the C++ runtime.  This is the TPU
replacement for the reference's edlib NW + trace conversion
(src/Aligner.cpp:845-877).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from graphchainer_tpu import native
from graphchainer_tpu.ops import linear_align
from graphchainer_tpu.utils.seq import match_masks

W = 32


@dataclass
class PolishOutcome:
    score: int
    ops: Optional[np.ndarray]   # uint8 edit ops (None if band overflowed)


def polish_batch(reads: Sequence[str], paths: Sequence[str],
                 bw: int = 8) -> List[PolishOutcome]:
    """Global NW of each read vs its path sequence; batched on device."""
    R = len(reads)
    assert R == len(paths)
    read_len = np.array([len(r) for r in reads], dtype=np.int64)
    path_len = np.array([len(p) for p in paths], dtype=np.int64)
    rmax = int(read_len.max()) if R else 1
    pmax = int(path_len.max()) if R else 1
    rw = max(1, -(-rmax // W))

    read_planes = np.zeros((R, rw, 4), dtype=np.uint32)
    read_mm = np.zeros((R, rmax), dtype=np.uint8)
    path_mm = np.zeros((R, pmax), dtype=np.uint8)
    base = np.zeros((R, pmax), dtype=np.int32)
    for i, (rd, pt) in enumerate(zip(reads, paths)):
        mm = match_masks(rd)
        read_mm[i, :len(mm)] = mm
        for w in range(rw):
            chunk = mm[w * W:(w + 1) * W]
            if len(chunk) == 0:
                continue
            bits = np.arange(len(chunk), dtype=np.uint32)
            for b in range(4):
                read_planes[i, w, b] = np.bitwise_or.reduce(
                    (((chunk.astype(np.uint32) >> b) & 1)) << bits)
        pm = match_masks(pt)
        path_mm[i, :len(pm)] = pm
        bb = linear_align.make_band_base(len(rd), len(pt), bw, rw)
        base[i, :len(bb)] = bb
        if len(bb) < pmax:
            base[i, len(bb):] = bb[-1] if len(bb) else 0

    res = linear_align.polish_align(read_planes, path_mm, base,
                                    read_len.astype(np.int32),
                                    path_len.astype(np.int32), bw)
    scores = np.asarray(res.score)
    ops_list = native.polish_backtrace(
        np.asarray(res.dump_vp), np.asarray(res.dump_vn),
        np.asarray(res.dump_sb), base, read_mm, path_mm, read_len, path_len)
    return [PolishOutcome(score=int(scores[i]), ops=ops_list[i])
            for i in range(R)]
