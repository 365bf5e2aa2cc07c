"""The co-linear chaining alignment model: the end-to-end CLC pipeline.

Per batch of reads (re-design of the reference worker's chaining mode,
src/Aligner.cpp:656-922):

  1. minimizer seeds per read (host index lookup)
  2. fragment windows every `colinear_split_gap` bp of length
     `colinear_split_len`; best seed per window -> fwd+bwd kernel jobs
  3. ONE device call: banded fragment extension over all jobs
  4. anchors per read (host walk of kernel pointers)
  5. ONE device call: batched chaining event scan -> best chain per read
  6. stitching with batched native BFS -> longest contiguous node path
  7. ONE device call: banded polish alignment read vs path sequence
  8. CIGAR backtrace in the C++ runtime -> per-read alignment

Device work is always batched across reads and fragments; host work is
linear-time bookkeeping.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import threading

import numpy as np

from graphchainer_tpu import constants, native
from graphchainer_tpu.align import polish
from graphchainer_tpu.align.anchors import (Anchor, FragJob, GraphTensors,
                                            assemble_batch_cols,
                                            run_fragments)
from graphchainer_tpu.align.chaining import batch_arrays_cols
from graphchainer_tpu.graph.alignment_graph import AlignmentGraph
from graphchainer_tpu.graph.mpc import MPCIndex
from graphchainer_tpu.index.minimizer import MinimizerIndex, get_seeds
from graphchainer_tpu.ops import frag_align
from graphchainer_tpu.ops.chain_scan import chain_scan, chain_scan_anchors
from graphchainer_tpu.utils import timers
from graphchainer_tpu.utils.seq import match_masks


@dataclass
class ChainerConfig:
    colinear_split_len: int = constants.DEFAULT_COLINEAR_SPLIT_LEN
    colinear_split_gap: int = constants.DEFAULT_COLINEAR_SPLIT_GAP
    colinear_gap: int = constants.DEFAULT_COLINEAR_GAP
    band_slots: int = 32               # B: band node slots per fragment
    max_in: int = constants.MAX_IN_DEGREE
    band_slack: int = 8
    seed_density: float = constants.DEFAULT_SEED_MINIMIZER_DENSITY
    max_anchor_error: float = 0.5      # drop anchors with score > err*len
    seeds_per_fragment: int = 2        # try the k rarest seeds per window
                                       # (reference extends multiple seed
                                       # clusters, src/GraphAligner.h:121)
    polish_band_words: int = 8         # 256-row polish band
    # run the whole-read seed-and-extend baseline too and keep the better
    # alignment per read (reference src/Aligner.cpp:901-920).  Off by
    # default: it multiplies device round-trips, and the CLC path alone
    # already matches the baseline's accuracy on the test sets.
    compare_with_baseline: bool = False
    # selective rescue: reads whose CLC edit distance exceeds this
    # fraction of the read length (or that failed entirely) are re-aligned
    # with the whole-read baseline and the better result kept.  Cheap (it
    # only triggers on poor alignments) and recovers most of the
    # reference's always-compare behavior.
    rescue_threshold: float = 0.35
    # reference --fast-mode (src/Aligner.cpp:834-843): skip the base-level
    # polish; score = positional mismatch count along the path, no CIGAR.
    fast_mode: bool = False
    # CLC band escalation (the reference ramps its bandwidth on slices
    # that fail the score cutoff, src/GraphAlignerBitvectorBanded.h:572-
    # 644): reads whose polished edit distance still exceeds
    # rescue_threshold re-run the WHOLE fragment path once with this
    # wider band / in-degree cap before the (more expensive) GA-baseline
    # rescue.  Recovers anchors lost to max_in truncation and band
    # overflow on dense tangles; never triggers on benign graphs.
    # 0 = off.
    escalate_band: int = 96
    escalate_max_in: int = 12
    # norm-ED trigger for the escalation retry; None = use
    # rescue_threshold (so escalation precedes each GA rescue)
    escalate_threshold: Optional[float] = None
    # data-dependent band effort (the reference adapts its band to the
    # graph via flood fill + --tangle-effort; here the band is fixed, so
    # on DENSE graphs — where the max_in cap and fixed band make the CLC
    # DP approximate — fall back to the reference's own always-compare
    # behaviour (src/Aligner.cpp:901-920) instead of threshold rescue.
    # "Dense" = more than 2% of nodes exceed the max_in cap.  Costs
    # nothing on benign graphs (the bench graph has 0 such nodes).
    auto_compare_dense: bool = True
    # corridor re-polish (native corridor_polish_batch): exact banded DP
    # with per-cell backtrace over the path + 1-hop arm corridor,
    # recovering the arm choices the word-granular device backwalk got
    # wrong (the reference's per-cell backtrace gets this for free,
    # src/GraphAlignerBitvectorCommon.h:392-544)
    bubble_repair: bool = True
    corridor_band: int = 16            # +- read rows around the current
                                       # alignment diagonal (sweep on the
                                       # golden100 set: 16/24/48 and 1 vs
                                       # 2 passes all give 98/100 at-or-
                                       # better, mean delta +0.10 — so
                                       # default to the cheapest)
    corridor_passes: int = 1           # >1 re-runs improved reads
                                       # (changed runs expose new arms;
                                       # no measured gain on golden100)
    # component-sharded graph tables over the device mesh (SURVEY §7.1 /
    # BASELINE config 4: pan-genome graphs whose Eq tables shouldn't be
    # replicated per chip).  Fragments route to their component's device;
    # table gathers stay device-local (parallel/sharded_graph.py).
    # Ignored on a single device.
    shard_graph_tables: bool = False


@dataclass
class ReadAlignment:
    name: str
    seq: str
    positions: np.ndarray              # (N,2) per path char (node, offset)
    ops: Optional[np.ndarray]          # edit ops (polish.py codes)
    score: int                         # edit distance read vs path
    seq_start: int = 0
    seq_end: int = 0
    n_anchors: int = 0
    n_chained: int = 0
    n_seeds: int = 0
    error: Optional[str] = None        # per-read fault isolation marker
    is_secondary: bool = False
    secondary: List["ReadAlignment"] = field(default_factory=list)

    @property
    def failed(self) -> bool:
        return len(self.positions) == 0


class ChainerModel:
    def __init__(self, g: AlignmentGraph, mpc: MPCIndex,
                 index: MinimizerIndex,
                 cfg: Optional[ChainerConfig] = None,
                 file_seeds: Optional[dict] = None,
                 seed_fn=None, gx: Optional[GraphTensors] = None):
        self.g = g
        self.mpc = mpc
        self.index = index
        self.cfg = cfg or ChainerConfig()
        self.gx = gx or GraphTensors.build(g)
        self._baseline = None
        self._baseline_lock = threading.Lock()
        self._escalated = None
        indeg = np.diff(g.in_ptr)
        self._dense_graph = bool(
            np.mean(indeg > self.cfg.max_in) > 0.02)
        if self.cfg.shard_graph_tables and not hasattr(self.gx,
                                                      "shard_plan"):
            import jax
            ndev = len(jax.devices())
            if ndev > 1:
                from graphchainer_tpu.parallel.sharded_graph import (
                    build_sharded_tables, plan_component_shards)
                plan = plan_component_shards(g, ndev)
                self.gx.shard_plan = plan
                self.gx.shard_tables = build_sharded_tables(self.gx, plan)
        # external seeds: read name -> [SeedHit] (reference .gam seed
        # files, src/Aligner.cpp:1169-1190)
        self.file_seeds = file_seeds
        # alternative seeder callable (name, seq) -> [SeedHit]
        # (e.g. the MUM/MEM seeder, index/mem.py)
        self.seed_fn = seed_fn

    def baseline(self):
        with self._baseline_lock:
            return self._baseline_locked()

    def escalated(self) -> "ChainerModel":
        """Wide-band sibling model for the escalation retry (shares the
        graph tensors / index / MPC; escalation+rescue disabled so the
        retry cannot recurse)."""
        with self._baseline_lock:
            if self._escalated is None:
                from dataclasses import replace
                wide = replace(self.cfg,
                               band_slots=self.cfg.escalate_band,
                               max_in=self.cfg.escalate_max_in,
                               band_slack=self.cfg.band_slack * 2,
                               escalate_band=0, rescue_threshold=0.0,
                               compare_with_baseline=False,
                               auto_compare_dense=False)
                self._escalated = ChainerModel(
                    self.g, self.mpc, self.index, wide,
                    file_seeds=self.file_seeds, seed_fn=self.seed_fn,
                    gx=self.gx)
            return self._escalated

    def _baseline_locked(self):
        if self._baseline is None:
            from graphchainer_tpu.models.aligner import (AlignerConfig,
                                                         GraphAlignerModel)
            self._baseline = GraphAlignerModel(
                self.g, self.index,
                AlignerConfig(seed_density=self.cfg.seed_density,
                              polish_band_words=self.cfg.polish_band_words),
                gx=self.gx)
        return self._baseline

    # ------------------------------------------------------------------
    def _fragment_jobs_cols(self, reads: Sequence[Tuple[str, str]]):
        """Seeds + fragment windows -> COLUMNAR kernel job batch: one
        vectorized pass over all reads (window assignment, near-duplicate
        collapse and top-k-per-window selection run on the concatenated
        seed lists with the read id as the outermost sort key).

        Returns (JobCols, frags [nfrag,7] int64 rows of
        (read_idx, l, r, fi_fwd, fi_bwd, seed split, seed off),
        seed_counts)."""
        cfg = self.cfg
        from graphchainer_tpu.align.anchors import JobCols
        from graphchainer_tpu.index.minimizer import get_seed_arrays_batch
        # default (minimizer) seeding: the whole seed+window stage runs
        # in ONE native call that releases the GIL (was the largest host
        # stage; the Python path below stays as the oracle, pinned by
        # tests/test_minimizer.py, and serves file/custom seeders)
        import os as _os
        if (self.file_seeds is None and self.seed_fn is None
                and not _os.environ.get("GCTPU_PY_SEEDWINDOW")):
            return native.seed_window_batch(
                self.index, self.gx, reads, cfg.seed_density,
                cfg.colinear_split_len, cfg.colinear_split_gap,
                cfg.seeds_per_fragment)
        # one vectorized minimizer pass + index search for the whole batch
        batch_arrs = None
        if self.file_seeds is None and self.seed_fn is None:
            batch_arrs = get_seed_arrays_batch(
                self.index, [s for _, s in reads], cfg.seed_density)
        # local, not instance state: align_batch runs concurrently from
        # the pipeline's in-flight batches
        seed_counts = [0] * len(reads)
        flen, sep = cfg.colinear_split_len, cfg.colinear_split_gap
        kper = cfg.seeds_per_fragment
        parts = []
        for ri, (name, seq) in enumerate(reads):
            if self.file_seeds is not None or self.seed_fn is not None:
                if self.seed_fn is not None:
                    fs = self.seed_fn(name, seq)
                else:
                    fs = self.file_seeds.get(name, [])
                if not fs:
                    continue
                di = np.array([s.di_node for s in fs], dtype=np.int64)
                off = np.array([s.node_offset for s in fs], dtype=np.int64)
                sp = np.array([s.seq_pos for s in fs], dtype=np.int64)
                good = np.array([s.goodness for s in fs])
                mlen = np.array([s.match_len for s in fs], dtype=np.int64)
            else:
                arrs = batch_arrs[ri]
                if arrs is None:
                    continue
                di, off, sp, good = arrs
                mlen = np.full(len(di), self.index.k, dtype=np.int64)
            seed_counts[ri] = len(di)
            if len(seq) < 5:
                continue
            parts.append((np.full(len(di), ri, dtype=np.int64), di, off,
                          sp, good, mlen))
        z = np.zeros(0, np.int64)
        empty = (JobCols(seed=z, trim=z, rev=np.zeros(0, bool),
                         read_idx=z, lo=z, hi=z),
                 np.zeros((0, 7), dtype=np.int64), seed_counts)
        if not parts:
            return empty
        rid, di, off, sp, good, mlen = (np.concatenate(a)
                                        for a in zip(*parts))
        rlen = np.array([len(s) for _, s in reads], dtype=np.int64)
        rl = rlen[rid]
        # long seeds (MEMs can exceed the fragment length) anchor a
        # window by their start; clamp the effective length so they
        # are not dropped for spanning window boundaries
        mlen_eff = np.minimum(mlen, max(flen // 2, 1))
        short = rl < flen
        nwin = np.where(short, 1, (rl - flen) // sep + 1)
        wmin = np.where(short, 0,
                        np.maximum(-(-(sp + mlen_eff - flen) // sep), 0))
        wmax = np.where(short, np.where(sp + mlen_eff <= rl, 0, -1),
                        np.minimum(sp // sep, nwin - 1))
        valid = wmax >= wmin
        reps = np.where(valid, wmax - wmin + 1, 0)
        total = int(reps.sum())
        if total == 0:
            return empty
        sidx = np.repeat(np.arange(len(rid)), reps)
        run0 = np.cumsum(reps) - reps
        widx = (np.arange(total) - np.repeat(run0, reps)
                + np.repeat(wmin, reps))
        # near-duplicate collapse: same (read, window, node, offset
        # bucket).  lexsort on the raw columns — a packed int key
        # overflows on chromosome-scale node offsets
        obkt = off[sidx] >> 3
        dnode = di[sidx]
        srid = rid[sidx]
        o = np.lexsort((-good[sidx], obkt, dnode, widx, srid))
        first = np.ones(total, dtype=bool)
        first[1:] = ((srid[o][1:] != srid[o][:-1])
                     | (widx[o][1:] != widx[o][:-1])
                     | (dnode[o][1:] != dnode[o][:-1])
                     | (obkt[o][1:] != obkt[o][:-1]))
        o = o[first]
        # top-k per (read, window) by goodness
        o2 = o[np.lexsort((-good[sidx[o]], widx[o], srid[o]))]
        w_sorted, r_sorted = widx[o2], srid[o2]
        grp_first = np.ones(len(o2), dtype=bool)
        grp_first[1:] = ((w_sorted[1:] != w_sorted[:-1])
                         | (r_sorted[1:] != r_sorted[:-1]))
        grp_id = np.cumsum(grp_first) - 1
        grp_start = np.nonzero(grp_first)[0]
        rank = np.arange(len(o2)) - grp_start[grp_id]
        o2 = o2[rank < kper]
        # vectorized split lookup + frag geometry
        v_all, voff_all = self.gx.find_splits(di[sidx[o2]], off[sidx[o2]])
        v_all = v_all.astype(np.int64)
        voff_all = voff_all.astype(np.int64)
        frid = srid[o2]
        short_q = short[sidx[o2]]
        fl = np.where(short_q, 0, widx[o2] * sep)
        fr_ = np.where(short_q, rl[sidx[o2]], fl + flen)
        spq = sp[sidx[o2]]
        has_bwd = spq > fl
        nfrag = len(o2)
        job_start = np.zeros(nfrag, dtype=np.int64)
        np.cumsum(1 + has_bwd[:-1], out=job_start[1:])
        fi_fwd = job_start
        fi_bwd = np.where(has_bwd, job_start + 1, -1)
        F = int(job_start[-1]) + 1 + int(has_bwd[-1]) if nfrag else 0
        seed = np.empty(F, dtype=np.int64)
        trim = np.empty(F, dtype=np.int64)
        rev = np.zeros(F, dtype=bool)
        read_idx = np.empty(F, dtype=np.int64)
        lo = np.empty(F, dtype=np.int64)
        hi = np.empty(F, dtype=np.int64)
        seed[fi_fwd] = v_all
        trim[fi_fwd] = self.g.node_len[v_all].astype(np.int64) - voff_all
        read_idx[fi_fwd] = frid
        lo[fi_fwd] = spq
        hi[fi_fwd] = fr_
        bsel = np.nonzero(has_bwd)[0]
        bpos = fi_bwd[bsel]
        seed[bpos] = v_all[bsel]
        trim[bpos] = voff_all[bsel]
        rev[bpos] = True
        read_idx[bpos] = frid[bsel]
        lo[bpos] = fl[bsel]
        hi[bpos] = spq[bsel]
        frags = np.stack([frid, fl, fr_, fi_fwd, fi_bwd, v_all,
                          voff_all], axis=1)
        return (JobCols(seed=seed, trim=trim, rev=rev, read_idx=read_idx,
                        lo=lo, hi=hi), frags, seed_counts)

    def _fragment_jobs(self, reads: Sequence[Tuple[str, str]]):
        """Object-form adapter over _fragment_jobs_cols (tests / GA-mode
        compatibility): materializes FragJob rmm slices per job."""
        jc, frags, seed_counts = self._fragment_jobs_cols(reads)
        mms = {}
        jobs: List[FragJob] = []
        for i in range(len(jc)):
            ri = int(jc.read_idx[i])
            if ri not in mms:
                mms[ri] = match_masks(reads[ri][1])
            rmm = mms[ri][jc.lo[i]:jc.hi[i]]
            if jc.rev[i]:
                rmm = rmm[::-1]
            jobs.append(FragJob(rmm=rmm, seed_node=int(jc.seed[i]),
                                seed_trim_len=int(jc.trim[i]),
                                reverse=bool(jc.rev[i])))
        return jobs, frags, seed_counts

    # ------------------------------------------------------------------
    def align_batch(self, reads: Sequence[Tuple[str, str]]
                    ) -> List[ReadAlignment]:
        cfg = self.cfg
        out = [ReadAlignment(name=n, seq=s, positions=[], ops=None,
                             score=len(s), seq_end=len(s))
               for n, s in reads]
        with timers.stage("seed+window", len(reads)):
            jobs, frags, seed_counts = self._fragment_jobs_cols(reads)
        for ri, n in enumerate(seed_counts):
            out[ri].n_seeds = n
        if not len(jobs):
            return out

        with timers.stage("band_build", len(jobs)):
            read_mm_cat = match_masks("".join(s for _, s in reads))
            read_base = np.zeros(len(reads) + 1, dtype=np.int64)
            np.cumsum([len(s) for _, s in reads], out=read_base[1:])
            (band_nodes, band_nodes_cat, band_in, seed_shift, req, rows, S,
             band_level) = assemble_batch_cols(self.gx, jobs, read_mm_cat,
                                               read_base, B=cfg.band_slots,
                                               max_in=cfg.max_in,
                                               slack=cfg.band_slack)
        # ONE per-batch 2-bit read-code table shared by the fragment
        # kernel, the polish pass and the repair re-polish: each stage
        # wires only indices into it (None when a read has IUPAC bases —
        # all consumers fall back to self-contained wire formats)
        dev_tbl = polish.build_read_table([s for _, s in reads])
        read_src = None
        if dev_tbl is not None:
            # (empty rev jobs clamp to row 0: rows=1 don't-care garbage,
            # same as the host packer's clipped gather)
            read_src = (dev_tbl, jobs.read_idx,
                        np.where(jobs.rev, np.maximum(jobs.hi - 1, 0),
                                 jobs.lo),
                        jobs.rev)
        with timers.stage("frag_kernel", len(jobs)):
            res = run_fragments(self.gx, band_nodes_cat, band_in,
                                seed_shift, req, rows, S, cfg.max_in,
                                band_level=band_level, want_walk=True,
                                read_src=read_src)
        # DP cells = band slots x read rows per fragment (reference
        # cellsProcessed, src/Aligner.cpp:998-1002)
        timers.count("cells(frag)", int(rows.astype(np.int64).sum())
                     * band_nodes_cat.shape[1])

        # fused native backwalk + fwd/bwd join (one pass over all pairs;
        # semantics pinned against extract_anchor by
        # tests/test_frag_align.py test_join_anchors_matches_extract /
        # test_walk_mask_join_matches)
        fr = np.asarray(frags, dtype=np.int64).reshape(-1, 7)
        if res.walk_mask is not None:
            # the backwalk ran on device; only (ok, slot mask) came back
            (ok, score, fnode, foff, lnode, loff, poff, pdata) = \
                native.join_anchors_masked(
                    res.walk_ok, res.walk_mask, res.best_slot,
                    res.best_score, res.best_col, band_nodes,
                    self.g.node_len, fr[:, 3], fr[:, 4], fr[:, 5],
                    fr[:, 6], frag_align.BIG)
        else:
            end_slice = (rows.astype(np.int64) - 1) // 32
            (ok, score, fnode, foff, lnode, loff, poff, pdata) = \
                native.join_anchors(
                    np.asarray(res.best_in), np.asarray(res.best_slot),
                    np.asarray(res.best_score), np.asarray(res.best_col),
                    end_slice, band_nodes, self.g.node_len, fr[:, 3],
                    fr[:, 4], fr[:, 5], fr[:, 6], frag_align.BIG)
        keep = np.nonzero(
            (ok == 1)
            & (score <= cfg.max_anchor_error * (fr[:, 2] - fr[:, 1])))[0]
        # anchors stay COLUMNAR through chaining + stitching (the hot
        # path creates no per-anchor Python objects); frags are emitted
        # in read order, so `keep` is grouped by read
        counts = np.bincount(fr[keep, 0], minlength=len(reads))
        live = np.nonzero(counts)[0]
        if len(live) == 0:
            return out
        for ri in range(len(reads)):
            out[ri].n_anchors = int(counts[ri])
        a_x = fr[keep, 1]
        a_y = fr[keep, 2] - 1

        with timers.stage("chain_scan", len(live)):
            # fused on-device event build + scan (wire: ~10B/anchor vs
            # ~8 int16 words/event); falls back to the host packer when
            # the batch exceeds the device builder's envelope
            sres = chain_scan_anchors(
                self.g, self.mpc, counts[live],
                pdata[poff[keep]], pdata[poff[keep + 1] - 1], a_x, a_y)
            if sres is None:
                arrs = batch_arrays_cols(
                    self.g, self.mpc, counts[live],
                    pdata[poff[keep]], pdata[poff[keep + 1] - 1], a_x,
                    a_y, anchor_kmask=True)
                sres = chain_scan(**{k: arrs[k] for k in
                                     ("x", "y", "valid", "ev_type",
                                      "ev_anchor", "ev_k", "a_kmask",
                                      "ev_group")})
            c_val = np.asarray(sres.c_val)
            c_pred = np.asarray(sres.c_pred)

        polish_reads, polish_paths, polish_refs = [], [], []
        t_stitch = timers.time.perf_counter()
        # rebase the kept anchors' ragged paths into one flat array
        plens = poff[keep + 1] - poff[keep]
        p_off = np.zeros(len(keep) + 1, dtype=np.int64)
        np.cumsum(plens, out=p_off[1:])
        pidx = (np.arange(int(p_off[-1]), dtype=np.int64)
                - np.repeat(p_off[:-1], plens) + np.repeat(poff[keep],
                                                           plens))
        anch_off = np.zeros(len(live) + 1, dtype=np.int64)
        np.cumsum(counts[live], out=anch_off[1:])
        # one native pass: best_chain + stitch + extend_tails per read
        # (fault isolation: per-read ok flags instead of exceptions)
        (positions_l, n_chained, first_x, last_y, okst) = \
            native.stitch_batch(
                self.gx, anch_off, a_x, a_y, fnode[keep], foff[keep],
                lnode[keep], loff[keep], p_off, pdata[pidx],
                c_val, c_pred, [reads[ri][1] for ri in live],
                cfg.colinear_gap)
        for bi, ri in enumerate(live):
            try:
                out[ri].n_chained = int(n_chained[bi])
                if not okst[bi]:
                    continue
                read = reads[ri][1]
                positions = positions_l[bi]
                out[ri].positions = positions
                pathseq = self.gx.positions_seq(positions)
            except Exception as e:          # noqa: BLE001
                out[ri].positions = np.zeros((0, 2), dtype=np.int64)
                out[ri].error = f"{type(e).__name__}: {e}"
                continue
            if cfg.fast_mode:
                # positional mismatch count (no CIGAR)
                x = int(first_x[bi]) - max(int(first_x[bi]), 0)
                n = min(len(pathseq), len(read) - x)
                a = np.frombuffer(pathseq[:n].encode(), np.uint8)
                b = np.frombuffer(read[x:x + n].encode(), np.uint8)
                out[ri].score = int((a != b).sum()) + abs(len(read) - n)
                continue
            polish_reads.append(reads[ri][1])
            polish_paths.append(pathseq)
            polish_refs.append(ri)

        timers.add("stitch", timers.time.perf_counter() - t_stitch,
                   len(live))
        if polish_reads:
            with timers.stage("polish", len(polish_reads)):
                outcomes = polish.polish_batch(
                    polish_reads, polish_paths, bw=cfg.polish_band_words,
                    table=(None if dev_tbl is None else
                           (dev_tbl, np.asarray(polish_refs, np.int32))))
            for ri, oc in zip(polish_refs, outcomes):
                out[ri].score = oc.score
                out[ri].ops = oc.ops
            if cfg.bubble_repair:
                # corridor re-polish (native corridor_polish_batch):
                # exact banded DP with per-cell backtrace over the path
                # plus every 1-hop sibling/skip/insertion arm — resolves
                # all the bubble-arm choices the word-granular device
                # backwalk got wrong, JOINTLY, unlike the superseded
                # local repair (align/repair.py), whose per-locus view
                # missed arms whose cost smears into neighbouring ops
                # under global NW.  Recovers the reference's per-cell
                # backtrace quality (~0.6% of read length at 8-10% err)
                # for ~1.5ms/read of host C++, no device round trip.
                cand = [ri for ri in polish_refs
                        if out[ri].score > 0 and out[ri].ops is not None]
                for _ in range(max(cfg.corridor_passes, 0)):
                    if not cand:
                        break
                    with timers.stage("repair", len(cand)):
                        fixed_l = native.corridor_polish_batch(
                            self.gx,
                            [out[ri].positions for ri in cand],
                            [out[ri].ops for ri in cand],
                            [reads[ri][1] for ri in cand],
                            [out[ri].score for ri in cand],
                            band=cfg.corridor_band)
                    improved = []
                    for ri, fixed in zip(cand, fixed_l):
                        if fixed is None:
                            continue
                        sc, pos, ops = fixed
                        out[ri].score = sc
                        out[ri].positions = pos
                        out[ri].ops = ops
                        if sc > 0:
                            improved.append(ri)
                    # another pass only helps where the path changed:
                    # new runs expose new 1-hop alternatives
                    cand = improved

        esc_thr = (cfg.escalate_threshold
                   if cfg.escalate_threshold is not None
                   else cfg.rescue_threshold)
        if cfg.escalate_band > cfg.band_slots and esc_thr > 0:
            # band escalation before the GA rescue (reference bandwidth
            # ramp on score-flagged slices,
            # src/GraphAlignerBitvectorBanded.h:572-644): re-run still-bad
            # reads through the fragment path with a wider band and
            # in-degree cap — recovers anchors lost to max_in truncation
            # on dense tangles at a fraction of the GA-rescue cost
            esc = [ri for ri in range(len(reads))
                   if out[ri].failed
                   or out[ri].score > esc_thr
                   * max(len(reads[ri][1]), 1)]
            if esc:
                with timers.stage("escalate", len(esc)):
                    ealn = self.escalated().align_batch(
                        [reads[ri] for ri in esc])
                for bi, ri in enumerate(esc):
                    if not ealn[bi].failed and (
                            out[ri].failed
                            or ealn[bi].score < out[ri].score):
                        ealn[bi].n_seeds = max(ealn[bi].n_seeds,
                                               out[ri].n_seeds)
                        out[ri] = ealn[bi]

        if cfg.compare_with_baseline or (cfg.auto_compare_dense
                                         and self._dense_graph):
            retry = list(range(len(reads)))
        elif cfg.rescue_threshold > 0:
            retry = [ri for ri in range(len(reads))
                     if out[ri].failed
                     or out[ri].score > cfg.rescue_threshold
                     * max(len(reads[ri][1]), 1)]
        else:
            retry = []
        if retry:
            # keep the better of CLC / whole-read baseline per read
            # (reference src/Aligner.cpp:901-920: CLC wins only when the
            # baseline is absent or strictly worse by edit distance)
            with timers.stage("rescue", len(retry)):
                ga = self.baseline().align_batch(
                    [reads[ri] for ri in retry])
            for bi, ri in enumerate(retry):
                clc_better = ga[bi].failed or (not out[ri].failed
                                               and ga[bi].score
                                               > out[ri].score)
                if not clc_better:
                    # keep the CLC stage counters: the stats report counts
                    # seeds/anchors found, not which candidate won
                    ga[bi].n_seeds = max(ga[bi].n_seeds, out[ri].n_seeds)
                    ga[bi].n_anchors = out[ri].n_anchors
                    ga[bi].n_chained = out[ri].n_chained
                    out[ri] = ga[bi]
        return out
