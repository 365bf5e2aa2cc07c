"""Host glue for the final polish alignment (read vs chain-path sequence).

Prepares batched inputs for the banded linear Myers kernels
(ops/linear_align.py) and decodes the device-side backtrace.  This is the
TPU replacement for the reference's edlib NW + trace conversion
(src/Aligner.cpp:845-877).  The DP dump never leaves the device; only the
compact op strings are downloaded.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

from graphchainer_tpu.ops import linear_align
from graphchainer_tpu.parallel.device import asarray_chunked
from graphchainer_tpu.utils.seq import match_masks

W = 32


def _round_up(x: int, m: int) -> int:
    """Geometric shape bucket: next power of two >= max(m, x), so repeated
    batches of varying read/path lengths land on a handful of compiled
    shapes."""
    out = m
    while out < x:
        out *= 2
    return out


@dataclass
class PolishOutcome:
    score: int
    ops: Optional[np.ndarray]   # uint8 edit ops (None if band overflowed)
    touched: bool = False       # backtrace touched a band edge (score may
                                # overestimate full NW; retried wider)


def read_planes_of(mm: np.ndarray, rw: int) -> np.ndarray:
    """Pack read match masks into (rw, 4) uint32 row planes."""
    planes = np.zeros((rw, 4), dtype=np.uint32)
    for w in range(rw):
        chunk = mm[w * W:(w + 1) * W]
        if len(chunk) == 0:
            break
        bits = np.arange(len(chunk), dtype=np.uint32)
        for b in range(4):
            planes[w, b] = np.bitwise_or.reduce(
                (((chunk.astype(np.uint32) >> b) & 1)) << bits)
    return planes


MAX_BAND_WORDS = 32      # widest retry band: 32 words = 1024 rows


def polish_batch(reads: Sequence[str], paths: Sequence[str],
                 bw: int = 8, table=None) -> List[PolishOutcome]:
    """Global NW of each read vs its path sequence; batched on device.

    Reads whose optimal path escapes the bw-word band (backtrace returns
    n_ops == -1) or whose backtraced path is pinned against a band edge
    (`touched` — the classic band-doubling witness that the banded score
    may overestimate full NW) are retried with a doubled band up to
    MAX_BAND_WORDS — the TPU analogue of the reference's ramp-bandwidth
    retry (src/GraphAlignerBitvectorBanded.h:572-644 applies the same
    idea to the extension band; edlib, which the reference calls for this
    exact step, doubles k the same way).

    table: optional (dev_tbl, row_idx) — a per-batch DEVICE-RESIDENT
    read-code table ((R, W16) uint32, polish.pack_codes2 layout) plus
    the table row of each read.  The kernel then gathers the read words
    on device instead of re-uploading them (the reads themselves are
    only used for their lengths).  Caller guarantees rows row_idx[i]
    hold exactly reads[i]'s codes (pure ACGT)."""
    out = _polish_once(reads, paths, bw, table)
    while bw < MAX_BAND_WORDS:
        bad = [i for i, oc in enumerate(out)
               if (oc.ops is None or oc.touched)
               and len(reads[i]) and len(paths[i])]
        if not bad:
            break
        bw *= 2
        redo = _polish_once([reads[i] for i in bad],
                            [paths[i] for i in bad], bw,
                            (table[0], table[1][bad])
                            if table is not None else None)
        for i, oc in zip(bad, redo):
            out[i] = oc
    return out


def polish_batch_host(reads: Sequence[str], paths: Sequence[str],
                      bw: int = 8) -> List[PolishOutcome]:
    """polish_batch computed on the HOST (native banded NW, bit-identical
    to the device kernel incl. the band ramp — native/
    graphchainer_native.cpp polish_host_batch).  For small re-polish
    passes (bubble-repair redo, rescue fallbacks) whose device round
    trip over the bandwidth-bound link costs more than ~1ms/read of
    host compute."""
    from graphchainer_tpu import native
    rmms = [match_masks(r) for r in reads]
    pmms = [match_masks(p) for p in paths]
    sc, no, tc, ops = native.polish_host_batch(rmms, pmms, bw)
    out = [PolishOutcome(score=int(sc[i]), ops=ops[i],
                         touched=bool(tc[i])) for i in range(len(reads))]
    while bw < MAX_BAND_WORDS:
        bad = [i for i, oc in enumerate(out)
               if (oc.ops is None or oc.touched)
               and len(reads[i]) and len(paths[i])]
        if not bad:
            break
        bw *= 2
        sc, no, tc, ops = native.polish_host_batch(
            [rmms[i] for i in bad], [pmms[i] for i in bad], bw)
        for j, i in enumerate(bad):
            out[i] = PolishOutcome(score=int(sc[j]), ops=ops[j],
                                   touched=bool(tc[j]))
    return out


def pack_nibbles(mm: np.ndarray) -> np.ndarray:
    """(..., L) uint8 4-bit match masks -> (..., L//8) uint32 packed 8
    chars per word (the wire format of the polish kernels)."""
    lead = mm.shape[:-1]
    m = mm.reshape(*lead, -1, 8).astype(np.uint32)
    shifts = (np.arange(8, dtype=np.uint32) * 4)
    return (m << shifts).sum(axis=-1, dtype=np.uint32)


# match nibble {1,2,4,8} -> base code 0..3 (other values unmapped)
_NIB_CODE = np.zeros(16, dtype=np.uint32)
for _c in range(4):
    _NIB_CODE[1 << _c] = _c


def pack_codes2(mm: np.ndarray) -> np.ndarray:
    """(..., L) uint8 PURE single-base match masks -> (..., L//16)
    uint32, 16 packed 2-bit base codes per word (half the bytes of
    pack_nibbles; padding maps to code 0, which is harmless — DP cells
    within (read_len, path_len) never read padded chars)."""
    lead = mm.shape[:-1]
    m = _NIB_CODE[mm].reshape(*lead, -1, 16)
    shifts = (np.arange(16, dtype=np.uint32) * 2)
    return (m << shifts).sum(axis=-1, dtype=np.uint32)


from functools import lru_cache


def build_read_table(seqs: Sequence[str]):
    """Per-batch DEVICE-RESIDENT read-code table: (Rp, rmax/16) uint32,
    16 2-bit base codes per word LSB-first (pack_codes2 layout == the
    fragment kernel's req2 word layout, ops/frag_align.py
    req2_from_table).  Uploaded ONCE per batch and shared by the
    fragment kernel, the polish pass and the repair re-polish — each
    then wires only indices.  Returns None when any read has an
    IUPAC-ambiguous base (the consumers fall back to their self-
    contained wire formats).  Row/width buckets are pow2 so repeat
    batches reuse compiled executables."""
    R = len(seqs)
    lens = np.array([len(s) for s in seqs], dtype=np.int64)
    rmax = _round_up(int(lens.max()) if R else 1, 1024)
    Rp = _round_up(R, 16)
    mm = np.zeros((Rp, rmax), dtype=np.uint8)
    for i, s in enumerate(seqs):
        mm[i, :len(s)] = match_masks(s)
    in_range = np.arange(rmax)[None, :] < lens[:, None]
    if (in_range & ((mm[:R] == 0) | ((mm[:R] & (mm[:R] - 1)) != 0))).any():
        return None
    from graphchainer_tpu.parallel.device import device_put_chunked
    return device_put_chunked(pack_codes2(mm))


@lru_cache(maxsize=None)
def _kernel_fn(kernel_name: str, bw: int, max_steps: int, ops_cap: int):
    """Stable callable identity per (kernel, bw, max_steps, ops_cap) so
    the shard_map wrapper cache hits (parallel/device.shard_call)."""
    kern = getattr(linear_align, kernel_name)

    def f(a, b, c, d):
        return kern(a, b, c, d, bw, max_steps=max_steps, ops_cap=ops_cap)
    return f


@lru_cache(maxsize=None)
def _gathered_kernel(kernel_name: str, bw: int, max_steps: int,
                     ops_cap: int):
    """Kernel front-end gathering the read rows from a device-resident
    per-batch code table (upload: row indices only)."""
    import jax
    kern = getattr(linear_align, kernel_name)

    @jax.jit
    def f(tbl, ridx, path_w, read_len, path_len):
        return kern(tbl[ridx], path_w, read_len, path_len, bw,
                    max_steps=max_steps, ops_cap=ops_cap)
    return f


@lru_cache(maxsize=None)
def _kernel_fn_tbl(kernel_name: str, bw: int, max_steps: int,
                   ops_cap: int):
    """_gathered_kernel arranged for parallel/device.shard_call (the
    table rides replicated as the TRAILING arg; row indices sharded)."""
    kern = getattr(linear_align, kernel_name)

    def f(ridx, path_w, read_len, path_len, tbl):
        return kern(tbl[ridx], path_w, read_len, path_len, bw,
                    max_steps=max_steps, ops_cap=ops_cap)
    return f


def _ops_cap(rmax: int, pmax: int, bw: int) -> int:
    """Static size of the downloaded ops buffer: a backtrace walk takes
    ~max(read, path) + O(band) steps in practice, far below the
    read+path worst case that used to size the download (the dominant
    wire bytes on the bandwidth-bound tunnel).  Overflow fails the read
    (n_ops == -1), which the polish_batch band ramp retries wider — and
    the cap grows with bw until it reaches the lossless read+path
    bound."""
    return min(rmax + pmax, -(-(max(rmax, pmax) + 4 * bw * W) // 16) * 16)


def _polish_once(reads: Sequence[str], paths: Sequence[str],
                 bw: int, table=None) -> List[PolishOutcome]:
    R = len(reads)
    assert R == len(paths)
    read_len = np.array([len(r) for r in reads], dtype=np.int32)
    path_len = np.array([len(p) for p in paths], dtype=np.int32)
    # coarse padding buckets so repeated batches reuse compiled shapes
    rmax = _round_up(int(read_len.max()) if R else 1, 1024)
    pmax = _round_up(int(path_len.max()) if R else 1, 1024)
    if table is not None and table[0].shape[1] * 16 < rmax:
        table = None     # read longer than the table rows (shouldn't
        #                  happen: the table is bucketed per batch)

    # the read axis rides the data mesh when >1 device is present
    import jax as _jax
    from graphchainer_tpu.parallel.device import shard_rows
    ndev = len(_jax.devices())
    # bucket the read axis (pow2 from 16): retry subsets and ragged final
    # batches must not each compile a fresh kernel variant (tens of
    # seconds per compile on the dev TPU)
    Rp = 16
    while Rp < R:
        Rp *= 2
    if ndev > 1:
        Rp += (-Rp) % ndev

    # 4-bit packed wire arrays (the tunnel is bandwidth-bound; decode is
    # fused on device — ops/linear_align.py packed front-ends).  One
    # scatter over the concatenated paths (per-path match_masks calls
    # serialized on the GIL under concurrent pipeline workers)
    path_mm = np.zeros((Rp, pmax), dtype=np.uint8)
    if R:
        cat = match_masks("".join(paths))
        rows_idx = np.repeat(np.arange(R), path_len[:R])
        cols_idx = (np.arange(len(cat))
                    - np.repeat(np.cumsum(path_len[:R])
                                - path_len[:R], path_len[:R]))
        path_mm[rows_idx, cols_idx] = cat
    def _pure(mm, lens):
        in_range = np.arange(mm.shape[1])[None, :] < lens[:R, None]
        bad = in_range & ((mm[:R] == 0) | ((mm[:R] & (mm[:R] - 1)) != 0))
        return not bad.any()
    path_pure = _pure(path_mm, path_len)
    read_w = None
    if table is not None and path_pure:
        # device-resident read rows: upload only the table row indices
        dev_tbl, row_idx = table
        read_w = np.pad(np.asarray(row_idx, np.int32), (0, Rp - R))
        path_w = pack_codes2(path_mm)
        kernel = linear_align.polish_full_packed2
        rmax = dev_tbl.shape[1] * 16
    else:
        read_mm = np.zeros((Rp, rmax), dtype=np.uint8)
        if R:
            rcat = match_masks("".join(reads))
            ridx = np.repeat(np.arange(R), read_len[:R])
            cidx = (np.arange(len(rcat))
                    - np.repeat(np.cumsum(read_len[:R])
                                - read_len[:R], read_len[:R]))
            read_mm[ridx, cidx] = rcat
        # pure-ACGT batches ride the 2-bit code format (half the
        # upload); IUPAC-ambiguous chars (multi-bit masks) fall back to
        # 4-bit nibbles
        pure = path_pure and _pure(read_mm, read_len)
        if pure:
            read_w = pack_codes2(read_mm)
            path_w = pack_codes2(path_mm)
            kernel = linear_align.polish_full_packed2
        else:
            read_w = pack_nibbles(read_mm)
            path_w = pack_nibbles(path_mm)
            kernel = linear_align.polish_full_packed
        table = None
    from graphchainer_tpu.utils import timers
    timers.count("cells(polish)", int(path_len.sum()) * bw * W)
    read_len = np.pad(read_len, (0, Rp - R))
    path_len = np.pad(path_len, (0, Rp - R))
    # ONE device call, ONE packed download (score + n_ops + touched +
    # 2-bit ops); the DP dump never leaves HBM.  On >1 local device the
    # read rows run under shard_map (parallel/device.shard_call) — the
    # lane-major core transposes reads onto the vector lanes, which
    # plain SPMD jit would reshard across devices at every op
    cap = _ops_cap(rmax, pmax, bw)
    if table is not None:
        if ndev > 1:
            from graphchainer_tpu.parallel.device import shard_call
            w = asarray_chunked(shard_call(
                _kernel_fn_tbl(kernel.__name__, bw, rmax + pmax, cap),
                (read_w, path_w, read_len, path_len, dev_tbl),
                (True,) * 4 + (False,)))
        else:
            w = asarray_chunked(_gathered_kernel(
                kernel.__name__, bw, rmax + pmax, cap)(
                dev_tbl, read_w, path_w, read_len, path_len))
    elif ndev > 1:
        from graphchainer_tpu.parallel.device import shard_call
        w = asarray_chunked(shard_call(
            _kernel_fn(kernel.__name__, bw, rmax + pmax, cap),
            (read_w, path_w, read_len, path_len), (True,) * 4))
    else:
        w = asarray_chunked(kernel(
            read_w, path_w, read_len, path_len, bw,
            max_steps=rmax + pmax, ops_cap=cap))
    scores, n_ops, touched = w[:, 0], w[:, 1], w[:, 2] != 0
    ops2 = np.ascontiguousarray(w[:, 3:]).view(np.uint32)
    # unpack 2-bit ops (values beyond n_ops are padding)
    shifts = (np.arange(16, dtype=np.uint32) * 2)
    ops_rev = ((ops2[:, :, None] >> shifts) & 3).astype(np.uint8)
    ops_rev = ops_rev.reshape(ops2.shape[0], -1)
    out = []
    for i in range(R):
        ops = (ops_rev[i, :n_ops[i]][::-1].copy()
               if n_ops[i] >= 0 else None)
        out.append(PolishOutcome(score=int(scores[i]), ops=ops,
                                 touched=bool(touched[i])))
    return out
