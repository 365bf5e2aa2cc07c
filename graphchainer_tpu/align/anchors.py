"""Fragment anchoring: host job assembly around seeds + anchor extraction.

Re-design of the reference's fragment loop (src/Aligner.cpp:656-733): each
long read is split into fragments of `colinear_split_len` every
`colinear_split_gap` bases; each fragment is aligned around a seed hit with
the banded bitvector DP, producing an Anchor (split-node path + read
interval [x, y]) for the co-linear chaining stage.

A fragment with a seed at read row r0 and graph position (v, o) becomes two
kernel jobs sharing one batch:
  forward:  rows read[r0 : frag_end)  on the forward graph, band grown from
            node v trimmed to start at offset o;
  backward: rows reversed(read[frag_start : r0)) on the edge-reversed graph
            (node sequences reversed, NOT complemented), band grown from
            node v trimmed to its first o bases (reversed).
The two half-alignments are joined at the seed into one anchor path.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np

from graphchainer_tpu import native
from graphchainer_tpu.constants import MAX_IN_DEGREE
from graphchainer_tpu.graph.alignment_graph import AlignmentGraph
from graphchainer_tpu.ops import frag_align
from graphchainer_tpu.utils.bits import reverse_eq_planes
from graphchainer_tpu.utils.seq import match_masks

W = 32


@dataclass
class Anchor:
    """Co-linear chaining anchor (reference src/AlignmentGraph.h:112-115)
    plus its trace endpoints (the reference keeps them in Apos,
    src/Aligner.cpp:722-728)."""
    path: List[int]          # split-node ids, consecutive along edges
    x: int                   # read interval start (inclusive)
    y: int                   # read interval end (inclusive)
    score: int = 0           # DP edit cost of the fragment alignment
    first_node: int = -1     # graph position where the anchor trace starts
    first_off: int = 0
    last_node: int = -1      # ... and ends
    last_off: int = 0

    def __post_init__(self):
        if self.first_node < 0 and self.path:
            self.first_node = int(self.path[0])
        if self.last_node < 0 and self.path:
            self.last_node = int(self.path[-1])


@dataclass
class GraphTensors:
    """Device/host-side tensors derived from the AlignmentGraph once.

    The Eq/length tables are the HBM-resident graph: the forward table
    concatenated with the reversed-sequence table (backward-extension jobs
    reference reversed nodes as id + N).  They are uploaded to the device
    once (chunked; see parallel/device.py) and reused by every kernel
    call."""
    g: AlignmentGraph
    node_eq_rev: np.ndarray      # uint32 [N,4] reversed-sequence planes
    node_eq_cat: np.ndarray      # uint32 [2N,4] fwd ++ reversed
    node_len_cat: np.ndarray     # int32 [2N]
    out_ptr: np.ndarray
    out_idx: np.ndarray
    in_ptr: np.ndarray
    in_idx: np.ndarray
    node_len64: np.ndarray
    seq_bytes: np.ndarray = None   # uint8 concat of all digraph sequences
    di_base: np.ndarray = None     # int64 [n_di+1] offsets into seq_bytes
    _dev_eq: object = None
    _dev_len: object = None

    @staticmethod
    def build(g: AlignmentGraph) -> "GraphTensors":
        rev = reverse_eq_planes(g.node_eq, g.node_len)
        seq_bytes = np.frombuffer(
            "".join(g.di_seqs).encode("ascii"), dtype=np.uint8)
        di_base = np.zeros(len(g.di_seqs) + 1, dtype=np.int64)
        np.cumsum([len(s) for s in g.di_seqs], out=di_base[1:])
        return GraphTensors(
            g=g,
            node_eq_rev=rev,
            node_eq_cat=np.concatenate([g.node_eq, rev], axis=0),
            node_len_cat=np.concatenate([g.node_len, g.node_len]),
            out_ptr=g.out_ptr.astype(np.int64),
            out_idx=g.out_idx.astype(np.int64),
            in_ptr=g.in_ptr.astype(np.int64),
            in_idx=g.in_idx.astype(np.int64),
            node_len64=g.node_len.astype(np.int64),
            seq_bytes=seq_bytes, di_base=di_base)

    def split_lookup(self):
        """(sorted keys, split ids) for the global (digraph node, offset)
        -> split-node binary search; shared by find_splits and the native
        seed_window_batch."""
        g = self.g
        if not hasattr(self, "_split_keys"):
            # di_splits is grouped by digraph node (ascending) with
            # ascending offsets inside: keys are globally sorted
            splits = g.di_splits.astype(np.int64)
            owner_di = np.repeat(np.arange(g.n_digraph, dtype=np.int64),
                                 np.diff(g.di_ptr))
            self._split_keys = np.ascontiguousarray(
                (owner_di << 33) | g.orig_offset[splits].astype(np.int64))
            self._split_vals = np.ascontiguousarray(splits)
        return self._split_keys, self._split_vals

    @property
    def orig_offset64(self) -> np.ndarray:
        if not hasattr(self, "_orig_offset64"):
            self._orig_offset64 = np.ascontiguousarray(
                self.g.orig_offset, dtype=np.int64)
        return self._orig_offset64

    def find_splits(self, di: np.ndarray, off: np.ndarray):
        """Vectorized find_split for (digraph node, offset) arrays:
        returns (split node ids, offsets within split)."""
        g = self.g
        self.split_lookup()
        keys = (np.asarray(di, dtype=np.int64) << 33) | np.asarray(
            off, dtype=np.int64)
        j = np.searchsorted(self._split_keys, keys, side="right") - 1
        v = self._split_vals[j]
        return v, (np.asarray(off, dtype=np.int64)
                   - g.orig_offset[v].astype(np.int64))

    def positions_seq(self, positions) -> str:
        """Vectorized path-sequence extraction for (node, offset) rows."""
        if len(positions) == 0:
            return ""
        arr = np.asarray(positions, dtype=np.int64)
        g = self.g
        nodes, offs = arr[:, 0], arr[:, 1]
        idx = (self.di_base[g.orig_node[nodes].astype(np.int64)]
               + g.orig_offset[nodes] + offs)
        return self.seq_bytes[idx].tobytes().decode("ascii")

    def device_tables(self):
        """(node_eq, node_len) as device-resident arrays."""
        if self._dev_eq is None:
            from graphchainer_tpu.parallel.device import device_put_chunked
            self._dev_eq = device_put_chunked(self.node_eq_cat)
            self._dev_len = device_put_chunked(self.node_len_cat)
        return self._dev_eq, self._dev_len


@dataclass
class FragJob:
    rmm: np.ndarray      # (rows,) uint8 read-row match masks (bwd: reversed)
    seed_node: int
    seed_trim_len: int   # seed slot length after trimming
    reverse: bool


@dataclass
class JobCols:
    """Columnar fragment-job batch (no per-job Python objects): the
    CLC hot path's replacement for List[FragJob]."""
    seed: np.ndarray      # (F,) int64 split-node id (slot 0 of the band)
    trim: np.ndarray      # (F,) int64 seed_trim_len
    rev: np.ndarray       # (F,) bool backward-extension job
    read_idx: np.ndarray  # (F,) int64 read of the batch
    lo: np.ndarray        # (F,) int64 read row range [lo, hi)
    hi: np.ndarray        # (F,) int64 (rev jobs consume rows hi-1 .. lo)

    def __len__(self):
        return len(self.seed)


def assemble_batch_cols(gx: GraphTensors, jc: JobCols, read_mm_cat:
                        np.ndarray, read_base: np.ndarray, B: int,
                        max_in: int = MAX_IN_DEGREE, slack: int = 8):
    """assemble_batch for a columnar job batch: the read match-mask rows
    are gathered from the concatenated batch masks in one vectorized
    indexing pass.  Output contract identical to assemble_batch
    (pinned by tests/test_frag_align.py test_assemble_cols_matches)."""
    g = gx.g
    if B > 127:
        raise ValueError(
            f"band slots B={B} exceeds 127: the CLC band is int8-indexed "
            "(native backwalks); use -b/-B <= 127 or optimal mode")
    F = len(jc)
    rows = np.maximum(jc.hi - jc.lo, 1).astype(np.int32)
    S = int(max(1, -(-int(rows.max(initial=1)) // W)))

    band_nodes = np.full((F, B), -1, dtype=np.int64)
    band_in = np.full((F, B, max_in), -1, dtype=np.int64)
    band_level = np.full((F, B), -1, dtype=np.int64)
    for rev in (False, True):
        sel = np.nonzero(jc.rev == rev)[0]
        if not len(sel):
            continue
        max_bp = int(rows[sel].max()) + slack
        ptr, idx = (gx.in_ptr, gx.in_idx) if rev else (gx.out_ptr,
                                                      gx.out_idx)
        bn, bi, bl, trunc = native.band_build(
            g.n_nodes, ptr, idx, gx.node_len64,
            np.ascontiguousarray(jc.seed[sel]),
            np.ascontiguousarray(jc.trim[sel]), B, max_bp, max_in, rev,
            by_dist=g.cyclic)
        if trunc:
            _warn_truncated(trunc, max_in)
        band_nodes[sel] = bn
        band_in[sel] = bi
        band_level[sel] = bl

    # adaptive band width (see assemble_batch)
    used = int((band_nodes >= 0).sum(axis=1).max()) if F else 1
    B_eff = min(B, max(8, -(-used // 8) * 8))
    if B_eff < B:
        band_nodes = band_nodes[:, :B_eff]
        band_in = band_in[:, :B_eff]
        band_level = band_level[:, :B_eff]

    band_nodes_cat = np.where(
        band_nodes >= 0,
        band_nodes + np.where(jc.rev, g.n_nodes, 0)[:, None],
        -1).astype(np.int32)

    seed_len = g.node_len[np.clip(band_nodes[:, 0], 0,
                                  g.n_nodes - 1)].astype(np.int64)
    seed_shift = (seed_len - jc.trim).astype(np.int32)

    # read-row match planes: ONE gather over the concatenated batch masks
    ar = np.arange(S * W, dtype=np.int64)[None, :]
    base = read_base[jc.read_idx][:, None]
    idx_f = base + jc.lo[:, None] + ar
    idx_b = base + jc.hi[:, None] - 1 - ar
    idx = np.where(jc.rev[:, None], idx_b, idx_f)
    in_range = ar < rows[:, None]
    mm_pad = np.where(in_range,
                      read_mm_cat[np.clip(idx, 0, len(read_mm_cat) - 1)],
                      0).astype(np.uint8)
    req = pack_row_planes(mm_pad).reshape(F, S, 4)

    return (band_nodes, band_nodes_cat, band_in.astype(np.int8),
            seed_shift, req, rows, S, band_level.astype(np.int8))


_trunc_warned = False


def _warn_truncated(n: int, max_in: int):
    """One-shot warning when band in-edge lists hit the max_in cap (the
    kernel then overestimates scores on those slots; raise --max-in or
    accept the approximation on dense graphs).  Every call also feeds the
    `band_truncated_in_edges` counter so bench/stats surface how much a
    dense graph actually loses (VERDICT r2 weak #5)."""
    global _trunc_warned
    from graphchainer_tpu.utils import timers
    timers.count("band_truncated_in_edges", int(n))
    if not _trunc_warned:
        import sys
        print(f"WARNING: {n} in-band in-edges dropped by the "
              f"max_in={max_in} cap; DP scores may overestimate on "
              "dense-graph slots (further warnings suppressed)",
              file=sys.stderr)
        _trunc_warned = True


def assemble_batch(gx: GraphTensors, jobs: Sequence[FragJob], B: int,
                   max_in: int = MAX_IN_DEGREE, slack: int = 8):
    """Build kernel index tensors for a batch of jobs.

    Returns (band_nodes [F,B] int64 ORIGINAL node ids (host use),
    band_nodes_cat [F,B] int32 ids into the concatenated fwd++rev device
    tables, band_in [F,B,max_in] int8, seed_shift [F] int32, req,
    frag_len, n_slices, band_level [F,B] int32)."""
    g = gx.g
    if B > 127:
        raise ValueError(
            f"band slots B={B} exceeds 127: the CLC band is int8-indexed "
            "(native backwalks); use -b/-B <= 127 or optimal mode")
    F = len(jobs)
    rows = np.array([max(1, len(j.rmm)) for j in jobs], dtype=np.int32)
    S = int(max(1, -(-int(rows.max()) // W)))

    # band selection, forward and backward seeds in separate native calls
    band_nodes = np.full((F, B), -1, dtype=np.int64)
    band_in = np.full((F, B, max_in), -1, dtype=np.int64)
    band_level = np.full((F, B), -1, dtype=np.int64)
    for rev in (False, True):
        sel = [i for i, j in enumerate(jobs) if j.reverse == rev]
        if not sel:
            continue
        seeds = np.array([jobs[i].seed_node for i in sel], dtype=np.int64)
        slens = np.array([jobs[i].seed_trim_len for i in sel],
                         dtype=np.int64)
        max_bp = int(rows[sel].max()) + slack
        ptr, idx = (gx.in_ptr, gx.in_idx) if rev else (gx.out_ptr, gx.out_idx)
        bn, bi, bl, trunc = native.band_build(g.n_nodes, ptr, idx,
                                              gx.node_len64, seeds, slens,
                                              B, max_bp, max_in, rev,
                                              by_dist=g.cyclic)
        if trunc:
            _warn_truncated(trunc, max_in)
        band_nodes[sel] = bn
        band_in[sel] = bi
        band_level[sel] = bl

    # adaptive band width: bands rarely fill all B slots (a 35bp fragment
    # spans ~10 split nodes); trimming to the batch max (bucketed to
    # multiples of 8) cuts host->device transfer and kernel work.  Safe:
    # in-band in-edges always reference earlier slots.
    used = int((band_nodes >= 0).sum(axis=1).max()) if F else 1
    B_eff = min(B, max(8, -(-used // 8) * 8))
    if B_eff < B:
        band_nodes = band_nodes[:, :B_eff]
        band_in = band_in[:, :B_eff]
        band_level = band_level[:, :B_eff]

    # ids into the concatenated device tables: reversed nodes offset by +N
    is_rev = np.array([j.reverse for j in jobs], dtype=bool)
    band_nodes_cat = np.where(
        band_nodes >= 0,
        band_nodes + np.where(is_rev, g.n_nodes, 0)[:, None],
        -1).astype(np.int32)

    # seed trimming: drop (len - trim_len) columns from the slot-0 start
    trim_len = np.array([j.seed_trim_len for j in jobs], dtype=np.int64)
    seed_len = g.node_len[np.clip(band_nodes[:, 0], 0,
                                  g.n_nodes - 1)].astype(np.int64)
    seed_shift = (seed_len - trim_len).astype(np.int32)

    # read-row match planes, vectorized across the whole batch
    mm_pad = np.zeros((F, S * W), dtype=np.uint8)
    for i, j in enumerate(jobs):
        mm_pad[i, :len(j.rmm)] = j.rmm[:S * W]
    req = pack_row_planes(mm_pad).reshape(F, S, 4)

    return (band_nodes, band_nodes_cat, band_in.astype(np.int8),
            seed_shift, req, rows, S, band_level.astype(np.int8))


@dataclass
class CarryJob:
    """A continued extension window: the band is re-grown from every
    still-plausible slot of the previous window's band, and the previous
    boundary state carries over (full-band carry — re-design of the
    reference's slice-to-slice band seeding,
    src/GraphAlignerBitvectorBanded.h:253-406)."""
    rmm: np.ndarray          # window read rows (bwd: reversed)
    reverse: bool
    old_nodes: np.ndarray    # (B,) previous band node ids (-1 pad)
    old_ssb: np.ndarray      # (B,) carried boundary scores
    old_hp: np.ndarray       # (B,) carried horizontal +1 bits
    old_hn: np.ndarray       # (B,) carried horizontal -1 bits
    src_mask: np.ndarray     # (B,) bool: slots that re-seed the band
    old_shift: np.ndarray = None   # (B,) per-slot seed trims (column
                                   # alignment of carried hp/hn bits)


def assemble_carry_batch(gx: GraphTensors, jobs: Sequence["CarryJob"],
                         B: int, max_in: int = MAX_IN_DEGREE,
                         slack: int = 8):
    """Band + carried-state tensors for a batch of continued windows.

    Returns (band_nodes [F,B] int64, band_nodes_cat [F,B] int32,
    band_in [F,B,max_in] int8, band_level [F,B] int32,
    carry (ssb, hp, hn) each [F,B], slot_map [F,B] int32 new slot -> old
    slot (-1 = fresh), shifts [F,B] int32, req, rows, S)."""
    g = gx.g
    if B > 127:
        raise ValueError("carry bands are int8-indexed; B <= 127")
    F = len(jobs)
    rows = np.array([max(1, len(j.rmm)) for j in jobs], dtype=np.int32)
    S = int(max(1, -(-int(rows.max()) // W)))

    band_nodes = np.full((F, B), -1, dtype=np.int64)
    band_in = np.full((F, B, max_in), -1, dtype=np.int64)
    band_level = np.full((F, B), -1, dtype=np.int64)
    for rev in (False, True):
        sel = [i for i, j in enumerate(jobs) if j.reverse == rev]
        if not sel:
            continue
        src_off = [0]
        src_nodes = []
        for i in sel:
            j = jobs[i]
            srcs = j.old_nodes[j.src_mask & (j.old_nodes >= 0)]
            src_nodes.append(srcs[:B])
            src_off.append(src_off[-1] + len(src_nodes[-1]))
        # distances count from source-node STARTS, but the carried
        # boundary cell can sit at a source node's last column — extend
        # the reach by one full split node so the window's true path
        # cannot run off the band end
        max_bp = int(rows[sel].max()) + slack + W
        ptr, idx = (gx.in_ptr, gx.in_idx) if rev else (gx.out_ptr,
                                                      gx.out_idx)
        bn, bi, bl, trunc = native.band_build_multi(
            g.n_nodes, ptr, idx, gx.node_len64,
            np.array(src_off, dtype=np.int64),
            np.concatenate(src_nodes) if src_nodes else
            np.zeros(0, np.int64), B, max_bp, max_in, rev,
            by_dist=g.cyclic)
        if trunc:
            _warn_truncated(trunc, max_in)
        band_nodes[sel] = bn
        band_in[sel] = bi
        band_level[sel] = bl

    # adaptive band width (see assemble_batch)
    used = int((band_nodes >= 0).sum(axis=1).max()) if F else 1
    B_eff = min(B, max(8, -(-used // 8) * 8))
    if B_eff < B:
        band_nodes = band_nodes[:, :B_eff]
        band_in = band_in[:, :B_eff]
        band_level = band_level[:, :B_eff]
        B = B_eff

    is_rev = np.array([j.reverse for j in jobs], dtype=bool)
    band_nodes_cat = np.where(
        band_nodes >= 0,
        band_nodes + np.where(is_rev, g.n_nodes, 0)[:, None],
        -1).astype(np.int32)

    # map new slots onto old slots by node id (both bands are sorted in
    # traversal-topo order: ascending for fwd, descending for rev)
    from graphchainer_tpu.ops.frag_align import BIG
    slot_map = np.full((F, B), -1, dtype=np.int32)
    ssb = np.full((F, B), BIG, dtype=np.int32)
    hp = np.zeros((F, B), dtype=np.uint32)
    hn = np.zeros((F, B), dtype=np.uint32)
    shifts = np.zeros((F, B), dtype=np.int32)
    for i, j in enumerate(jobs):
        old_valid = j.old_nodes >= 0
        old_nodes = j.old_nodes[old_valid]
        old_idx = np.nonzero(old_valid)[0]
        # sort old nodes by id for the searchsorted match (fwd bands are
        # already ascending on DAGs, but cyclic by_dist bands are not)
        order = np.argsort(old_nodes)
        srt = old_nodes[order]
        new_valid = band_nodes[i] >= 0
        nn = band_nodes[i][new_valid]
        pos = np.searchsorted(srt, nn)
        ok = (pos < len(srt)) & (srt[np.clip(pos, 0, max(len(srt) - 1, 0))]
                                 == nn)
        mapped = np.full(len(nn), -1, dtype=np.int64)
        mapped[ok] = old_idx[order[pos[ok]]]
        slots = np.nonzero(new_valid)[0]
        m_ok = slots[ok]
        slot_map[i, m_ok] = mapped[ok]
        ssb[i, m_ok] = j.old_ssb[mapped[ok]]
        hp[i, m_ok] = j.old_hp[mapped[ok]]
        hn[i, m_ok] = j.old_hn[mapped[ok]]
        if j.old_shift is not None:
            shifts[i, m_ok] = j.old_shift[mapped[ok]]

    mm_pad = np.zeros((F, S * W), dtype=np.uint8)
    for i, j in enumerate(jobs):
        mm_pad[i, :len(j.rmm)] = j.rmm[:S * W]
    req = pack_row_planes(mm_pad).reshape(F, S, 4)

    return (band_nodes, band_nodes_cat, band_in.astype(np.int8),
            band_level.astype(np.int8), (ssb, hp, hn), slot_map, shifts,
            req, rows, S)


def pack_row_planes(mm: np.ndarray) -> np.ndarray:
    """Vectorized bit-packing: (..., S*32) uint8 match masks ->
    (..., S, 4) uint32 planes (bit i of plane b = row 32s+i matches b)."""
    lead = mm.shape[:-1]
    S = mm.shape[-1] // W
    m = mm.reshape(*lead, S, W).astype(np.uint32)
    weights = (np.uint32(1) << np.arange(W, dtype=np.uint32))
    planes = np.zeros((*lead, S, 4), dtype=np.uint32)
    for b in range(4):
        planes[..., b] = (((m >> np.uint32(b)) & 1) * weights).sum(
            axis=-1, dtype=np.uint32)
    return planes


def level_bucket(band_level: np.ndarray, B: int) -> int:
    """Static level-loop trip count: next power of two >= max level + 1
    (coarse buckets keep the number of compiled kernel variants small)."""
    max_l = int(band_level.max(initial=0)) + 1
    n = 4
    while n < max_l:
        n *= 2
    return min(n, B)


def _spread16(x: np.ndarray) -> np.ndarray:
    """Scatter bits 0..15 of each uint32 to the even bit positions."""
    x = x.astype(np.uint32) & np.uint32(0xFFFF)
    x = (x | (x << 8)) & np.uint32(0x00FF00FF)
    x = (x | (x << 4)) & np.uint32(0x0F0F0F0F)
    x = (x | (x << 2)) & np.uint32(0x33333333)
    return (x | (x << 1)) & np.uint32(0x55555555)


def _try_pack_frag(band_nodes_cat: np.ndarray, band_in: np.ndarray,
                   req: np.ndarray, rows: np.ndarray, max_in: int):
    """Wire-pack a fragment batch for align_fragments_packed (node-id
    deltas int16, in-edge nibbles, 2-bit read codes).  Returns
    (bn_base, bn_d16, bi_p16, req2) or None when the batch doesn't fit
    the packed format (B > 16, wide id spans, ambiguous read bases)."""
    F, B = band_nodes_cat.shape
    if B > 16 or band_in.shape[2] > 4 or max_in > 4 or F == 0:
        return None
    pad = band_nodes_cat < 0
    base = np.where(pad[:, 0], 0, band_nodes_cat[:, 0]).astype(np.int32)
    d = band_nodes_cat.astype(np.int64) - base[:, None]
    if ((~pad) & ((d > 32767) | (d < -32767))).any():
        return None
    bn_d16 = np.where(pad, frag_align.BN_PAD, d).astype(np.int16)
    own = np.arange(B, dtype=np.int32)[None, :, None]
    v = np.where(band_in < 0, own, band_in.astype(np.int32))
    if (v >= 16).any():
        return None
    bi_p16 = np.zeros((F, B), np.uint16)
    for e in range(band_in.shape[2]):
        bi_p16 |= (v[:, :, e].astype(np.uint16) << np.uint16(4 * e))
    # read planes -> 2-bit codes: every in-range row must match exactly
    # one base (IUPAC-ambiguous reads fall back to the plane format)
    p = req.astype(np.uint32)
    p0, p1, p2, p3 = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    multi = ((p0 & p1) | (p0 & p2) | (p0 & p3) | (p1 & p2) | (p1 & p3)
             | (p2 & p3))
    cover = p0 | p1 | p2 | p3
    S = p.shape[1]
    ns = np.clip(rows[:, None].astype(np.int64)
                 - W * np.arange(S, dtype=np.int64)[None, :], 0, W)
    need = ((np.uint64(1) << ns.astype(np.uint64)) - 1).astype(np.uint32)
    if (multi != 0).any() or ((cover & need) != need).any():
        return None
    c0, c1 = p1 | p3, p2 | p3
    w0 = _spread16(c0) | (_spread16(c1) << 1)
    w1 = _spread16(c0 >> 16) | (_spread16(c1 >> 16) << 1)
    req2 = np.stack([w0, w1], axis=-1)          # (F, S, 2)
    return base, bn_d16, bi_p16, req2




from functools import lru_cache


@lru_cache(maxsize=None)
def _tl_xcells_shard_fn(S: int, max_in: int, n_levels, want_state: bool,
                        carried: bool, has_bl: bool):
    """Positional closure over the lane-major kernel with cell-precise
    X tracking (GA mode) for parallel/device.shard_call — same rationale
    as _walk_shard_fn.  Returns a flat tuple (shard_map out_specs are
    per-leaf; FragResult's None fields don't shard)."""
    def f(eq, ln, bn, bi, ss, rq, rw, sb, *rest):
        i = 0
        bl = rest[i] if has_bl else None
        i += int(has_bl)
        ci = tuple(rest[i:i + 3]) if carried else None
        r = frag_align.align_fragments_tl(
            eq, ln, bn, bi, ss, rq, rw, n_slices=S, max_in=max_in,
            seed_base=sb, band_level=bl, n_levels=n_levels,
            carry_in=ci, want_state=want_state, want_xcells=True)
        out = (r.best_score, r.best_slot, r.best_col, r.best_in)
        if want_state:
            out += (r.out_ssb, r.out_hp, r.out_hn)
        return out + (r.xbest, r.xslot, r.xrow)
    return f


@lru_cache(maxsize=None)
def _packed_tl_shard_fn(S: int, max_in: int, n_levels, carried: bool,
                        want_state: bool, want_xcells: bool,
                        has_sb: bool):
    """Positional closure over the packed lane-major kernel (GA mode's
    want_xcells/carry/want_state variants) for parallel/device.shard_call
    — same rationale as _walk_shard_fn: plain SPMD jit reshards the lane
    transposes across devices at every op."""
    def f(eq, ln, bb, bd, bp, bl, ss8, rq2, rw16, *rest):
        i = 0
        sb = rest[i] if has_sb else None
        i += int(has_sb)
        ci = tuple(rest[i:i + 3]) if carried else None
        return frag_align.align_fragments_packed_out_tl(
            eq, ln, bb, bd, bp, ss8, rq2, rw16, n_slices=S,
            max_in=max_in, band_level=bl, n_levels=n_levels,
            seed_base=sb, carry_in=ci, want_state=want_state,
            want_xcells=want_xcells)
    return f


@lru_cache(maxsize=None)
def _walk_shard_fn(S: int, max_in: int, n_levels: int, dedup: bool,
                   rt: bool = False):
    """Positional closure over the packed+walk fragment kernel for
    parallel/device.shard_call (stable identity per static config; the
    lane-major core transposes fragments onto the vector lanes, which
    plain SPMD jit would reshard across devices at every op).

    rt: the rq2 slot carries packed read coords (rdc) instead, and a
    trailing REPLICATED read-code table arg supplies the read content
    (frag_align.req2_from_table builds the wire words on device)."""
    if dedup:
        def f(eq, ln, bb, bd, bp, bl, bidx, ss8, rq2, rw16, sb, *tbl):
            return frag_align.align_fragments_packed_out_tl_walk(
                eq, ln, bb, bd, bp, ss8,
                (tbl[0], rq2) if rt else rq2, rw16, n_slices=S,
                max_in=max_in, band_level=bl, n_levels=n_levels,
                seed_base=sb, band_idx=bidx)
    else:
        def f(eq, ln, bb, bd, bp, bl, ss8, rq2, rw16, sb, *tbl):
            return frag_align.align_fragments_packed_out_tl_walk(
                eq, ln, bb, bd, bp, ss8,
                (tbl[0], rq2) if rt else rq2, rw16, n_slices=S,
                max_in=max_in, band_level=bl, n_levels=n_levels,
                seed_base=sb)
    return f


# bi_p16 value meaning "no in-edges" for padded fragments: nibble e = e
BI_P16_PAD = np.uint16(0x3210)


@lru_cache(maxsize=None)
def _walk_shard_tbl_fn(S: int, max_in: int, n_levels: int):
    """Packed+walk kernel whose graph tables are COMPONENT-SHARDED over
    the mesh (parallel/sharded_graph): every arg rides P('dp'), so each
    device receives its (1, rows, 4) table block (squeezed here) plus
    exactly the fragment rows routed to its components — table gathers
    stay device-local, no collectives in the hot loop."""
    def f(eq_blk, ln_blk, bb, bd, bp, bl, ss8, rq2, rw16, sb):
        return frag_align.align_fragments_packed_out_tl_walk(
            eq_blk[0], ln_blk[0], bb, bd, bp, ss8, rq2, rw16,
            n_slices=S, max_in=max_in, band_level=bl, n_levels=n_levels,
            seed_base=sb)
    return f


def _run_fragments_sharded(gx: "GraphTensors", plan, band_nodes_cat,
                           band_in, seed_shift, req, rows, S, max_in,
                           seed_base, band_level):
    """run_fragments over component-sharded tables: route fragments to
    their component's device, remap band ids to shard-local rows, run
    the packed walk kernel under shard_map with the table block-sharded,
    scatter results back to batch order.  Returns a walk-path FragResult
    or None when the batch doesn't fit the packed format (caller falls
    back to the replicated path)."""
    from graphchainer_tpu.parallel.device import shard_call, shard_rows
    from graphchainer_tpu.parallel.sharded_graph import (localize_bands,
                                                         route_fragments)
    F, B = band_nodes_cat.shape
    local = localize_bands(plan, band_nodes_cat)
    packed = _try_pack_frag(local, band_in, req, rows, max_in)
    if packed is None:
        return None
    frag_dev, order, keep, Fd = route_fragments(plan, band_nodes_cat)
    base, bn_d16, bi_p16, req2 = packed
    n_levels = level_bucket(band_level, B)
    bb = shard_rows(base[order].astype(np.int32))
    bd = shard_rows(bn_d16[order])
    bp = shard_rows(bi_p16[order])
    bl = shard_rows(band_level[order].astype(np.int8))
    ss8 = shard_rows(seed_shift[order].astype(np.int8))
    rq2 = shard_rows(req2[order])
    rw16 = shard_rows(rows[order].astype(np.int16))
    sb = shard_rows(seed_base[order].astype(np.int32))
    eq_sh, ln_sh = gx.shard_tables
    res = shard_call(_walk_shard_tbl_fn(S, max_in, n_levels),
                     (eq_sh, ln_sh, bb, bd, bp, bl, ss8, rq2, rw16, sb),
                     (True,) * 10)
    from graphchainer_tpu.parallel.device import asarray_chunked
    w = asarray_chunked(res)
    out = np.zeros((F, w.shape[1]), dtype=np.int32)
    out[order[keep]] = w[keep]
    cc = np.ascontiguousarray
    return frag_align.FragResult(
        best_score=out[:, 0], best_slot=out[:, 1] & 0xFF,
        best_col=(out[:, 1] >> 8) & 0xFF, best_in=None,
        end_score=None, end_col=None,
        walk_ok=((out[:, 1] >> 16) & 1).astype(bool),
        walk_mask=cc(out[:, 2]).view(np.uint32))


class BandCache:
    """Process-lifetime device-resident table of DISTINCT packed bands.

    Seeds are graph positions, so the same band rows recur across
    batches (and across reads within a batch); on the bandwidth-bound
    tunneled TPU re-uploading them every batch dominated the fragment
    stage's wire bytes.  The cache keeps the packed band tables
    (base/bn_d16/bi_p16/band_level) on device and appends only rows
    never seen before, in fixed 256-row chunks through ONE jit call
    (shapes stay stable; the table capacity grows in pow2 steps, each a
    one-time recompile).  Fragments reference rows by stable int32 ids.

    Thread-safe (align_batch runs from concurrent pipeline workers)."""

    GROW_MIN = 1024
    CHUNK = 256
    MAX_ROWS = 1 << 17       # ~5.7MB at B=8; beyond this, reset

    def __init__(self, B: int):
        import threading
        self.B = B
        self.lock = threading.Lock()
        self.map: dict = {}
        self.n = 0
        self.cap = 0
        self.h_bb = np.zeros(0, np.int32)
        self.h_bd = np.zeros((0, B), np.int16)
        self.h_bp = np.zeros((0, B), np.uint16)
        self.h_bl = np.zeros((0, B), np.int8)
        self.d = None            # (u_bb, u_bd, u_bp, u_bl) device tables

    @staticmethod
    @lru_cache(maxsize=None)
    def _append_fn():
        import jax

        @jax.jit
        def _append(bb, bd, bp, bl, nb, nd, np_, nl, off):
            return (jax.lax.dynamic_update_slice(bb, nb, (off,)),
                    jax.lax.dynamic_update_slice(bd, nd, (off, 0)),
                    jax.lax.dynamic_update_slice(bp, np_, (off, 0)),
                    jax.lax.dynamic_update_slice(bl, nl, (off, 0)))
        return _append

    def _ensure_cap(self, need: int) -> bool:
        """Grow the HOST arrays to a pow2 capacity >= need.  Returns True
        when capacity changed (the device tables need a full re-upload
        after the caller fills the fresh rows)."""
        cap = max(self.cap, self.GROW_MIN)
        while cap < need:
            cap *= 2
        if cap == self.cap and self.d is not None:
            return False
        self.cap = cap
        pad = cap - len(self.h_bb)
        self.h_bb = np.pad(self.h_bb, (0, pad))
        self.h_bd = np.pad(self.h_bd, ((0, pad), (0, 0)),
                           constant_values=frag_align.BN_PAD)
        self.h_bp = np.pad(self.h_bp, ((0, pad), (0, 0)),
                           constant_values=BI_P16_PAD)
        self.h_bl = np.pad(self.h_bl, ((0, pad), (0, 0)),
                           constant_values=-1)
        return True

    def _upload_full(self):
        from graphchainer_tpu.parallel.device import device_put_chunked
        self.d = tuple(device_put_chunked(a) for a in
                       (self.h_bb, self.h_bd, self.h_bp, self.h_bl))

    def lookup_add(self, base, bn_d16, bi_p16, blev):
        """ids (F,) int32 + device tables for a batch of packed bands."""
        F = len(base)
        bl8 = np.ascontiguousarray(blev.astype(np.int8))
        key = np.concatenate(
            [base[:, None].view(np.uint8).reshape(F, -1),
             np.ascontiguousarray(bn_d16).view(np.uint8).reshape(F, -1),
             np.ascontiguousarray(bi_p16).view(np.uint8).reshape(F, -1),
             bl8.view(np.uint8).reshape(F, -1)], axis=1)
        _, first, inv = np.unique(key, axis=0, return_index=True,
                                  return_inverse=True)
        with self.lock:
            if self.n + len(first) > self.MAX_ROWS:
                self.map.clear()
                self.n = 0
            uid = np.empty(len(first), np.int32)
            fresh = []
            for u, f in enumerate(first):
                got = self.map.get(key[f].tobytes())
                if got is None:
                    got = self.n
                    self.map[key[f].tobytes()] = got
                    self.n += 1
                    fresh.append((u, f))
                uid[u] = got
            if fresh:
                ff = np.array([f for _, f in fresh])
                lo = self.n - len(fresh)   # fresh ids are contiguous
                grew = self._ensure_cap(self.n)
                self.h_bb[lo:self.n] = base[ff]
                self.h_bd[lo:self.n] = bn_d16[ff]
                self.h_bp[lo:self.n] = bi_p16[ff]
                self.h_bl[lo:self.n] = bl8[ff]
                if grew:
                    self._upload_full()
                else:
                    # append only the fresh rows, in CHUNK-aligned
                    # blocks (cap is a multiple of CHUNK, so aligned
                    # writes never clamp; re-writing the block's
                    # existing prefix rows is a no-op)
                    app = self._append_fn()
                    for c0 in range(lo - lo % self.CHUNK, self.n,
                                    self.CHUNK):
                        sl = slice(c0, c0 + self.CHUNK)
                        self.d = app(*self.d, self.h_bb[sl],
                                     self.h_bd[sl], self.h_bp[sl],
                                     self.h_bl[sl], np.int32(c0))
            d = self.d
        return uid[inv].astype(np.int32), d


def run_fragments(gx: GraphTensors, band_nodes_cat: np.ndarray,
                  band_in: np.ndarray, seed_shift: np.ndarray,
                  req: np.ndarray, rows: np.ndarray, S: int, max_in: int,
                  seed_base: Optional[np.ndarray] = None,
                  band_level: Optional[np.ndarray] = None,
                  carry_in: Optional[tuple] = None,
                  want_state: bool = False,
                  want_xcells: bool = False,
                  want_walk: bool = False,
                  read_src: Optional[tuple] = None
                  ) -> frag_align.FragResult:
    """Run the fragment kernel over the whole job list, chunking the
    fragment axis so every transferred array stays under the device
    transfer cap, padding chunks to a fixed size for compile reuse.
    Returns numpy-backed FragResult.

    carry_in:   (ssb, hp, hn) each (F, B) — continue a previous window's
                DP (see frag_align.align_fragments carry_in)
    want_state: also download out_ssb/out_hp/out_hn (the carry state for
                the NEXT window)
    want_walk:  fuse the backwalk on device and download a per-fragment
                visited-slot mask instead of the (B, S) best_in matrix
                (3 result words per fragment; packed path with B <= 32
                only — other paths fall back to best_in)
    read_src:   (dev_tbl, rid, start, rev) — per-BATCH device-resident
                read-code table (R, W16) uint32 plus per-fragment read
                coords; the walk path then uploads 4 bytes of coords per
                fragment instead of the 8*S-byte req2 wire words, which
                are rebuilt on device (frag_align.req2_from_table)"""
    from graphchainer_tpu.parallel.device import (asarray_chunked,
                                                  device_put_chunked,
                                                  max_batch_rows,
                                                  shard_rows)
    dev_eq, dev_len = gx.device_tables()
    F, B = band_nodes_cat.shape
    if seed_base is None:
        seed_base = np.zeros(F, dtype=np.int32)
    n_levels = level_bucket(band_level, B) if band_level is not None else None
    import jax as _jax
    ndev = len(_jax.devices())
    # component-sharded tables (parallel/sharded_graph): active when the
    # model planned shards and this batch fits the packed walk format —
    # otherwise fall through to the replicated-table paths below
    plan = getattr(gx, "shard_plan", None)
    if (plan is not None and ndev == plan.n_dev and ndev > 1 and want_walk
            and band_level is not None and carry_in is None
            and not want_state and not want_xcells and B <= 32
            and (B * S) % 4 == 0):
        res = _run_fragments_sharded(gx, plan, band_nodes_cat, band_in,
                                     seed_shift, req, rows, S, max_in,
                                     seed_base, band_level)
        if res is not None:
            return res
    packed = (_try_pack_frag(band_nodes_cat, band_in, req, rows, max_in)
              if band_level is not None and (B * S) % 4 == 0 else None)
    walk = want_walk and packed is not None and B <= 32 and not want_xcells
    dedup = None
    if walk and carry_in is None:
        # upload each DISTINCT band once per PROCESS (seeds are graph
        # positions, so bands repeat across batches as well as across
        # nearby windows/reads): the process-lifetime BandCache keeps
        # the tables device-resident and appends only never-seen rows;
        # per-fragment 4-byte indices gather the rows on device
        base, bn_d16, bi_p16, _ = packed
        caches = getattr(gx, "_band_caches", None)
        if caches is None:
            caches = {}
            gx._band_caches = caches
        cache = caches.get(B)
        if cache is None:
            cache = caches[B] = BandCache(B)
        ids, (u_bb, u_bd, u_bp, u_bl) = cache.lookup_add(
            base, bn_d16, bi_p16, band_level)
        dedup = (u_bb, u_bd, u_bp, u_bl, ids)
    # per-fragment packed read coords (replaces the req2 upload): only
    # the walk path consumes them, and the packing needs rid < 4096,
    # start < 2^17
    rdc = tbl_dev = None
    if walk and read_src is not None and F:
        tbl_dev, rr, st, rv = read_src
        if (len(rr) == F and int(rr.max(initial=0)) < 4096
                and int(st.max(initial=0)) < (1 << 17)
                and int(st.min(initial=0)) >= 0):
            rdc = ((rr.astype(np.int64) << 18) | (st.astype(np.int64) << 1)
                   | rv.astype(np.int64)).astype(np.int32)
    if packed is not None:
        # packed wire rows are ~4x slimmer; whole batches usually fit one
        # call (each call costs a fixed tunnel round trip).  Chunk sizes
        # bucket to multiples of 2048 to bound compile variants.
        out_words = (3 if walk else 2 + B * S // 4) \
            + (3 * B if want_state else 0) + (2 if want_xcells else 0)
        row_bytes = max(2 * B, 8 * S, out_words * 4)
        # pow2 buckets capped at the transfer limit: a fine 512-step
        # bucket made nearly every batch (varying F) a fresh executable
        # — tens of seconds of compile each on the dev TPU dominated the
        # r2 bench wall.  pow2 keeps the variant count logarithmic.
        fmax = max(512, (max_batch_rows(row_bytes) // 512) * 512)
        fchunk = 512
        while fchunk < F and fchunk < fmax:
            fchunk *= 2
        fchunk = min(fchunk, fmax)
    else:
        row_bytes = max(B * 4, B * max_in, S * 16, B * S)
        fchunk = min(max_batch_rows(row_bytes), 2048)
    fchunk = max(ndev, (fchunk // ndev) * ndev)   # even mesh sharding
    sb_zero = not seed_base.any()
    # phase 1: dispatch every chunk (async; uploads/compute pipeline)
    pending = []
    for lo in range(0, F, fchunk):
        hi = min(F, lo + fchunk)
        pad = fchunk - (hi - lo)
        ss = (np.pad(seed_shift[lo:hi], ((0, pad), (0, 0)))
              if seed_shift.ndim == 2
              else np.pad(seed_shift[lo:hi], (0, pad)))
        rw = np.pad(rows[lo:hi], (0, pad), constant_values=1)
        sb = np.pad(seed_base[lo:hi], (0, pad)).astype(np.int32)
        bl = (np.pad(band_level[lo:hi], ((0, pad), (0, 0)),
                     constant_values=-1)
              if band_level is not None else None)
        ci = None
        if carry_in is not None:
            ci = (np.pad(carry_in[0][lo:hi], ((0, pad), (0, 0)),
                         constant_values=frag_align.BIG).astype(np.int32),
                  np.pad(carry_in[1][lo:hi], ((0, pad), (0, 0))
                         ).astype(np.uint32),
                  np.pad(carry_in[2][lo:hi], ((0, pad), (0, 0))
                         ).astype(np.uint32))
            ci = tuple(shard_rows(a) for a in ci)
        if packed is not None:
            # compressed wire format (decode fused on device)
            base, bn_d16, bi_p16, req2 = packed
            if dedup is None:
                bb = shard_rows(np.pad(base[lo:hi], (0, pad)))
                bd = shard_rows(np.pad(bn_d16[lo:hi], ((0, pad), (0, 0)),
                                       constant_values=frag_align.BN_PAD))
                bp = shard_rows(np.pad(bi_p16[lo:hi], ((0, pad), (0, 0)),
                                       constant_values=BI_P16_PAD))
                bl = shard_rows(bl)
            if rdc is not None:
                # 4-byte read coords; wire words rebuilt on device from
                # the batch read table
                rq2 = shard_rows(np.pad(rdc[lo:hi], (0, pad)))
            else:
                rq2 = shard_rows(np.pad(req2[lo:hi], ((0, pad), (0, 0),
                                                      (0, 0))))
            ss8 = shard_rows(ss.astype(np.int8))
            rw16 = shard_rows(rw.astype(np.int16))
            if want_xcells and ndev > 1:
                # GA mode (xcells/carry/state) on >1 local device: the
                # lane-major core under shard_map (same wire format)
                from graphchainer_tpu.parallel.device import shard_call
                fn = _packed_tl_shard_fn(S, max_in, n_levels,
                                         ci is not None, want_state,
                                         True, not sb_zero)
                extra = () if sb_zero else (shard_rows(sb),)
                if ci is not None:
                    extra += ci
                res = shard_call(
                    fn, (dev_eq, dev_len, bb, bd, bp, bl, ss8, rq2,
                         rw16) + extra,
                    (False, False) + (True,) * (7 + len(extra)))
            elif want_xcells:
                res = frag_align.align_fragments_packed_out(
                    dev_eq, dev_len, bb, bd, bp, ss8, rq2, rw16,
                    n_slices=S, max_in=max_in, band_level=bl,
                    n_levels=n_levels,
                    seed_base=None if sb_zero else shard_rows(sb),
                    carry_in=ci, want_state=want_state,
                    want_xcells=True)
            elif walk and ndev > 1 and ci is None and not want_state:
                # >1 local device: run under shard_map so the lane-major
                # transposes stay device-local (parallel/device.shard_call)
                from graphchainer_tpu.parallel.device import shard_call
                fn = _walk_shard_fn(S, max_in, n_levels,
                                    dedup is not None, rdc is not None)
                tbl_extra = (tbl_dev,) if rdc is not None else ()
                tbl_flags = (False,) * len(tbl_extra)
                if dedup is not None:
                    u_bb, u_bd, u_bp, u_bl, inv = dedup
                    bidx = np.pad(inv[lo:hi], (0, pad))
                    res = shard_call(fn, (dev_eq, dev_len, u_bb, u_bd,
                                          u_bp, u_bl, bidx, ss8, rq2,
                                          rw16, sb) + tbl_extra,
                                     (False,) * 6 + (True,) * 5
                                     + tbl_flags)
                else:
                    res = shard_call(fn, (dev_eq, dev_len, bb, bd, bp,
                                          bl, ss8, rq2, rw16, sb)
                                     + tbl_extra,
                                     (False, False) + (True,) * 8
                                     + tbl_flags)
            elif walk and dedup is not None:
                u_bb, u_bd, u_bp, u_bl, inv = dedup
                bidx = shard_rows(np.pad(inv[lo:hi], (0, pad)))
                res = frag_align.align_fragments_packed_out_tl_walk(
                    dev_eq, dev_len, u_bb, u_bd, u_bp, ss8,
                    (tbl_dev, rq2) if rdc is not None else rq2, rw16,
                    n_slices=S, max_in=max_in, band_level=u_bl,
                    n_levels=n_levels,
                    seed_base=None if sb_zero else shard_rows(sb),
                    carry_in=ci, want_state=want_state, band_idx=bidx)
            elif walk:
                # lane-major core + device-fused backwalk: 3 result
                # words per fragment instead of 2 + (B*S)/4
                res = frag_align.align_fragments_packed_out_tl_walk(
                    dev_eq, dev_len, bb, bd, bp, ss8,
                    (tbl_dev, rq2) if rdc is not None else rq2, rw16,
                    n_slices=S, max_in=max_in, band_level=bl,
                    n_levels=n_levels,
                    seed_base=None if sb_zero else shard_rows(sb),
                    carry_in=ci, want_state=want_state)
            elif ndev > 1:
                # lane-major core with carry/state on >1 local device:
                # shard_map keeps the lane transposes device-local
                from graphchainer_tpu.parallel.device import shard_call
                fn = _packed_tl_shard_fn(S, max_in, n_levels,
                                         ci is not None, want_state,
                                         False, not sb_zero)
                extra = () if sb_zero else (shard_rows(sb),)
                if ci is not None:
                    extra += ci
                res = shard_call(
                    fn, (dev_eq, dev_len, bb, bd, bp, bl, ss8, rq2,
                         rw16) + extra,
                    (False, False) + (True,) * (7 + len(extra)))
            else:
                # lane-major core: ~4x device throughput (fragments on
                # the 128 VPU lanes)
                res = frag_align.align_fragments_packed_out_tl(
                    dev_eq, dev_len, bb, bd, bp, ss8, rq2, rw16,
                    n_slices=S, max_in=max_in, band_level=bl,
                    n_levels=n_levels,
                    carry_in=ci, want_state=want_state,
                    seed_base=None if sb_zero else shard_rows(sb))
            pending.append((res, hi - lo))
            continue
        bn = np.pad(band_nodes_cat[lo:hi], ((0, pad), (0, 0)),
                    constant_values=-1)
        bi = np.pad(band_in[lo:hi], ((0, pad), (0, 0), (0, 0)),
                    constant_values=-1)
        rq = np.pad(req[lo:hi], ((0, pad), (0, 0), (0, 0)))
        # fragment axis rides the data mesh when >1 device is present
        bn, bi, ss, rq, rw, sb = (shard_rows(a)
                                  for a in (bn, bi, ss, rq, rw, sb))
        if bl is not None:
            bl = shard_rows(bl)
        if want_xcells:
            # lane-major core (fragments on the VPU lanes; ~4x the
            # F-major device throughput) — under shard_map on >1 local
            # device so the lane transposes stay device-local
            from graphchainer_tpu.parallel.device import shard_call
            fn = _tl_xcells_shard_fn(S, max_in, n_levels, want_state,
                                     ci is not None, bl is not None)
            extra = (bl,) if bl is not None else ()
            if ci is not None:
                extra += ci
            out = shard_call(fn, (dev_eq, dev_len, bn, bi, ss, rq, rw,
                                  sb) + extra,
                             (False, False) + (True,) * (6 + len(extra)))
            names = ["best_score", "best_slot", "best_col", "best_in"]
            if want_state:
                names += ["out_ssb", "out_hp", "out_hn"]
            names += ["xbest", "xslot", "xrow"]
            res = frag_align.FragResult(
                end_score=None, end_col=None,
                **dict(zip(names, out)))
        else:
            res = frag_align.align_fragments_tl(
                dev_eq, dev_len, bn, bi, ss, rq, rw, n_slices=S,
                max_in=max_in, seed_base=sb, band_level=bl,
                n_levels=n_levels, carry_in=ci,
                want_state=want_state)
        pending.append((res, hi - lo))
    # phase 2: download only the per-fragment best results (the full
    # per-slot matrices stay on device unless want_state); the packed
    # path pulls ONE array per chunk (a single tunnel round trip) and
    # decodes it here
    outs = []
    for res, keep in pending:
        if packed is not None:
            w = asarray_chunked(res)[:keep]         # (keep, D) int32
            cc = np.ascontiguousarray
            if walk:
                part = [w[:, 0],
                        w[:, 1] & 0xFF,
                        (w[:, 1] >> 8) & 0xFF,
                        ((w[:, 1] >> 16) & 1).astype(bool),
                        cc(w[:, 2]).view(np.uint32)]
                o = 3
            else:
                bs_words = B * S // 4
                part = [w[:, 0],
                        w[:, 1] & 0xFF,
                        (w[:, 1] >> 8) & 0xFF,
                        cc(w[:, 2:2 + bs_words]).view(np.int8).reshape(
                            keep, B, S)]
                o = 2 + bs_words
            if want_state:
                part += [cc(w[:, o:o + B]),
                         cc(w[:, o + B:o + 2 * B]).view(np.uint32),
                         cc(w[:, o + 2 * B:o + 3 * B]).view(np.uint32)]
                o += 3 * B
            if want_xcells:
                part += [w[:, o], w[:, o + 1] & 0xFF, w[:, o + 1] >> 8]
            outs.append(part)
            continue
        part = [np.asarray(res.best_score)[:keep],
                np.asarray(res.best_slot)[:keep],
                np.asarray(res.best_col)[:keep],
                asarray_chunked(res.best_in)[:keep]]
        if want_state:
            part += [asarray_chunked(res.out_ssb)[:keep],
                     asarray_chunked(res.out_hp)[:keep],
                     asarray_chunked(res.out_hn)[:keep]]
        if want_xcells:
            part += [np.asarray(res.xbest)[:keep],
                     np.asarray(res.xslot)[:keep],
                     np.asarray(res.xrow)[:keep]]
        outs.append(part)
    cat = [np.concatenate(parts, axis=0) for parts in zip(*outs)]
    o = 5 if walk else 4
    st = cat[o:o + 3] if want_state else (None, None, None)
    o += 3 if want_state else 0
    xc = cat[o:o + 3] if want_xcells else (None, None, None)
    return frag_align.FragResult(
        best_score=cat[0], best_slot=cat[1], best_col=cat[2],
        best_in=None if walk else cat[3], end_score=None, end_col=None,
        out_ssb=st[0], out_hp=st[1], out_hn=st[2],
        xbest=xc[0], xslot=xc[1], xrow=xc[2],
        walk_ok=cat[3] if walk else None,
        walk_mask=cat[4] if walk else None)


def backwalk(best_in: np.ndarray, band_nodes: np.ndarray, end_slot: int,
             end_slice: int) -> Optional[List[int]]:
    """Walk best_in pointers from (end_slot, end_slice) to the seed slot.
    Returns the slot sequence [end ... seed] or None on a broken walk."""
    B, S = best_in.shape
    slot, s = int(end_slot), int(end_slice)
    out = [slot]
    for _ in range(B * S + 4):
        e = int(best_in[slot, s])
        if e == frag_align.IN_SEED:
            return out
        if e == frag_align.IN_VERT:
            s -= 1
            if s < 0:
                return None
            continue
        if e < 0:
            return None
        slot = e
        out.append(slot)
    return None


def batch_backwalks(res, band_nodes: np.ndarray, rows: np.ndarray):
    """All fragment backwalks in one native call; returns a list of
    node-id arrays in walk order (end -> seed), empty on failure."""
    from graphchainer_tpu import native
    end_slice = (rows.astype(np.int64) - 1) // W
    return native.backwalks(np.asarray(res.best_in),
                            np.asarray(res.best_slot, dtype=np.int64),
                            end_slice, band_nodes)


def extract_anchor(g: AlignmentGraph, jobs: Sequence[FragJob],
                   band_nodes: np.ndarray, res, fi_fwd: int, fi_bwd: int,
                   frag_start: int, frag_end: int, seed_node: int,
                   seed_offset: int, rows: np.ndarray,
                   walks=None) -> Optional[Anchor]:
    """Join the forward and backward half-walks of one fragment into an
    Anchor.  fi_bwd < 0 means no backward half (seed at fragment start).
    `walks` are precomputed native backwalks (batch_backwalks)."""
    end_slot_f = int(res.best_slot[fi_fwd])
    sc_f = int(res.best_score[fi_fwd])
    if walks is not None:
        nodes_f = walks[fi_fwd]
        walk_ok_f = len(nodes_f) > 0
    else:
        best_in = np.asarray(res.best_in)
        end_slice_f = (int(rows[fi_fwd]) - 1) // W
        w = backwalk(best_in[fi_fwd], band_nodes[fi_fwd], end_slot_f,
                     end_slice_f)
        walk_ok_f = w is not None
        nodes_f = [int(band_nodes[fi_fwd][s]) for s in w] if w else []
    if not walk_ok_f or sc_f >= frag_align.BIG:
        return None
    path_f = [int(x) for x in reversed(nodes_f)]
    # trace end position: best slot's argmin column -> node offset
    cf = int(res.best_col[fi_fwd])
    last_node = int(band_nodes[fi_fwd][end_slot_f])
    last_off = cf + (seed_offset if end_slot_f == 0 else 0)

    score = sc_f
    path_b: List[int] = []
    first_node, first_off = seed_node, seed_offset
    if fi_bwd >= 0 and len(jobs[fi_bwd].rmm) > 0:
        sc_b = int(res.best_score[fi_bwd])
        end_slot_b = int(res.best_slot[fi_bwd])
        if walks is not None:
            nodes_b = walks[fi_bwd]
            walk_ok_b = len(nodes_b) > 0
        else:
            end_slice_b = (int(rows[fi_bwd]) - 1) // W
            w = backwalk(np.asarray(res.best_in)[fi_bwd],
                         band_nodes[fi_bwd], end_slot_b, end_slice_b)
            walk_ok_b = w is not None
            nodes_b = [int(band_nodes[fi_bwd][s]) for s in w] if w else []
        if not walk_ok_b or sc_b >= frag_align.BIG:
            return None
        score += sc_b
        # bwd walk [end ... seed] is already in original path order
        path_b = [int(x) for x in nodes_b]
        cb = int(res.best_col[fi_bwd])
        first_node = int(band_nodes[fi_bwd][end_slot_b])
        if end_slot_b == 0:
            first_off = (seed_offset - 1) - cb
        else:
            first_off = int(g.node_len[first_node]) - 1 - cb
        first_off = max(first_off, 0)

    # join at the seed node (slot 0 on both sides == seed_node)
    assert path_f[0] == seed_node
    if path_b:
        assert path_b[-1] == seed_node
        path = path_b[:-1] + path_f
    else:
        path = path_f
    # drop consecutive duplicates (paranoia)
    dedup = [path[0]]
    for p in path[1:]:
        if p != dedup[-1]:
            dedup.append(p)
    return Anchor(path=dedup, x=frag_start, y=frag_end - 1, score=score,
                  first_node=first_node, first_off=first_off,
                  last_node=last_node, last_off=last_off)
