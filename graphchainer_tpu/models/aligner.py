"""Whole-read seed-and-extend alignment (GraphAligner-style baseline).

Re-design of the reference's GraphAligner facade + banded extension
(src/GraphAligner.h AlignOneWay, getTwoDirectionalTrace,
src/GraphAlignerBitvectorBanded.h): a seed hit is extended bidirectionally
across the whole read.  The reference re-discovers the band every 64-row
slice with a priority flood fill; here the extension advances in WINDOWS
of up to 64 rows: each window runs the banded fragment kernel seeded at
the current frontier position with the accumulated score injected as the
seed base, then the frontier moves to the window's best end position and
the band is rebuilt there (the TPU analogue of slice-wise band
re-seeding; the band collapses to the single best position at window
boundaries, a deliberate simplification noted vs the reference).

Windows are batched across all active (read, direction) extension states,
so each loop iteration is ONE device call regardless of batch size.

Extension stops at the read ends or when a window's score delta exceeds
`window_error_cutoff * window_rows` (a simplified X-drop; the reference
uses an X-score cutoff / correctness HMM, src/GraphAlignerBitvectorBanded.h
:703-847).  If the final alignment covers too little of the read, the next
best seed is tried (reference seed-cluster retry, src/GraphAligner.h:121-173).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np

from graphchainer_tpu import constants
from graphchainer_tpu.align import polish
from graphchainer_tpu.align.correctness import CorrectnessState
from graphchainer_tpu.align.anchors import (FragJob, GraphTensors,
                                            assemble_batch, backwalk,
                                            run_fragments)
from graphchainer_tpu.align.stitch import path_to_positions
from graphchainer_tpu.graph.alignment_graph import AlignmentGraph
from graphchainer_tpu.index.minimizer import (MinimizerIndex,
                                              cluster_seeds, get_seeds)
from graphchainer_tpu.models.chainer import ReadAlignment
from graphchainer_tpu.ops import frag_align
from graphchainer_tpu.utils.seq import match_masks

W = 32
WINDOW_ROWS = 64           # rows per extension window (2 slices)


@dataclass
class AlignerConfig:
    band_slots: int = 48
    max_alignments: int = 4            # emit up to N selected alignments
                                       # per read (multimapping)
    max_in: int = constants.MAX_IN_DEGREE
    band_slack: int = 16
    seed_density: float = constants.DEFAULT_SEED_MINIMIZER_DENSITY
    window_error_cutoff: float = 0.55   # stop when a window is this bad
    min_coverage_frac: float = 0.3      # retry next seed below this
    max_seed_tries: int = 5
    polish_band_words: int = 8
    # reference --X-drop (src/AlignerMain.cpp:68,314-319): end the
    # extension when the running X-score (match +1 / edit -4, the vg
    # convention) drops more than this below its maximum.  None = off.
    x_drop: Optional[int] = None
    # reference --precise-clipping (src/AlignerMain.cpp:69,300-303):
    # identity cutoff between correct and wrong alignment; maps onto the
    # per-window error cutoff as (1 - identity).  None = keep default.
    precise_clipping: Optional[float] = None
    # reference --ramp-bandwidth/-B (src/AlignerMain.cpp:95): windows
    # that fail the error/HMM cutoff retry once with this band before
    # being clipped.  0 = off; must exceed band_slots otherwise.
    ramp_band_slots: int = 0
    # reference selection flags (src/AlignerMain.cpp:63,101-106): method
    # for picking the emitted non-overlapping alignment subset, and the
    # --E-cutoff filter (-1 = off)
    selection_method: str = "GreedyLength"
    e_cutoff: float = -1.0
    # reference seed-control flags (src/AlignerMain.cpp:64-65,79-80):
    # try every seed / extend up to density*len(read) seeds / discard
    # small diagonal clusters
    try_all_seeds: bool = False
    seed_extend_density: float = -1.0
    min_cluster_size: int = 0
    # reference --global-alignment (src/AlignerMain.cpp:66): never clip
    # on score cutoffs; extend to the read ends regardless
    global_alignment: bool = False

    def __post_init__(self):
        if self.precise_clipping is not None:
            if not 0.0 < self.precise_clipping < 1.0:
                raise ValueError("precise-clipping must be in (0, 1)")
            self.window_error_cutoff = 1.0 - self.precise_clipping
        if self.x_drop is not None and self.x_drop <= 1:
            raise ValueError("X-drop score cutoff must be > 1")
        if self.ramp_band_slots and self.ramp_band_slots <= self.band_slots:
            raise ValueError(
                "ramp bandwidth must be higher than default bandwidth")


@dataclass
class _ExtState:
    """One direction of one read's extension."""
    read_idx: int
    reverse: bool           # True = extending toward the read start
    mm: np.ndarray          # direction-oriented remaining rows
    row: int                # rows consumed so far in this direction
    node: int               # frontier node (original id)
    trim_len: int           # remaining columns of the frontier node
    base: int               # accumulated score at the frontier boundary
    path: List[int] = field(default_factory=list)  # original node ids
    last_off: int = -1      # direction-local end offset in the last node
    active: bool = True
    xscore: float = 0.0     # running X-score (match +1 / edit -4)
    xscore_max: float = 0.0
    # correctness HMM over per-window error fractions (reference
    # AlignmentCorrectnessEstimation drives band break decisions,
    # src/GraphAlignerBitvectorBanded.h:572-644)
    hmm: CorrectnessState = field(default_factory=CorrectnessState)


class GraphAlignerModel:
    def __init__(self, g: AlignmentGraph, index: MinimizerIndex,
                 cfg: Optional[AlignerConfig] = None,
                 gx: Optional[GraphTensors] = None):
        self.g = g
        self.index = index
        self.cfg = cfg or AlignerConfig()
        self.gx = gx or GraphTensors.build(g)
        # single-strand graph bp, the E-value database size
        self._db_size = int(np.sum(g.node_len)) // 2

    # ------------------------------------------------------------------
    def _init_states(self, ri: int, read_mm: np.ndarray, seed_node: int,
                     seed_offset: int, seed_row: int) -> List[_ExtState]:
        g = self.g
        node_len = int(g.node_len[seed_node])
        fwd = _ExtState(read_idx=ri, reverse=False,
                        mm=read_mm[seed_row:], row=0, node=seed_node,
                        trim_len=node_len - seed_offset, base=0,
                        path=[seed_node])
        bwd = _ExtState(read_idx=ri, reverse=True,
                        mm=read_mm[:seed_row][::-1], row=0, node=seed_node,
                        trim_len=seed_offset, base=0, path=[seed_node])
        if len(bwd.mm) == 0:
            bwd.active = False
        if len(fwd.mm) == 0:
            fwd.active = False
        return [fwd, bwd]

    # ------------------------------------------------------------------
    def _extend_round(self, states: List[_ExtState]):
        """One batched window step over all active states.  Windows that
        fail the error/HMM cutoff are retried once with the ramp band
        before being clipped (reference backtrack-and-retry with
        rampBandwidth, src/GraphAlignerBitvectorBanded.h:572-644)."""
        cfg = self.cfg
        act = [st for st in states if st.active]
        if not act:
            return False
        ramp = (cfg.ramp_band_slots
                if cfg.ramp_band_slots > cfg.band_slots else 0)
        retry = self._run_window(act, cfg.band_slots, can_retry=bool(ramp))
        if retry:
            self._run_window(retry, ramp, can_retry=False)
        return any(st.active for st in states)

    def _run_window(self, act: List[_ExtState], band_slots: int,
                    can_retry: bool) -> List[_ExtState]:
        """Run one window for `act`; commit results.  Returns the states
        whose commit was deferred for a wider-band retry."""
        cfg = self.cfg
        g = self.g
        jobs = []
        for st in act:
            rows = st.mm[st.row:st.row + WINDOW_ROWS]
            jobs.append(FragJob(rmm=rows, seed_node=st.node,
                                seed_trim_len=st.trim_len,
                                reverse=st.reverse))
        (band_nodes, band_nodes_cat, band_in, seed_shift, req, rows_arr, S,
         band_level) = assemble_batch(self.gx, jobs, B=band_slots,
                                      max_in=cfg.max_in,
                                      slack=cfg.band_slack)
        seed_base = np.array([st.base for st in act], dtype=np.int32)
        res = run_fragments(self.gx, band_nodes_cat, band_in, seed_shift,
                            req, rows_arr, S, cfg.max_in,
                            seed_base=seed_base, band_level=band_level)
        retry = []
        for i, st in enumerate(act):
            nrows = int(rows_arr[i])
            best = int(res.best_score[i])
            delta = best - st.base
            bad = (delta > cfg.window_error_cutoff * nrows
                   or not st.hmm.next_state(delta, nrows)
                          .current_is_correct())
            if cfg.global_alignment:
                bad = False             # --global-alignment: never clip
            if bad and can_retry:
                retry.append(st)        # state untouched; rerun wider
                continue
            st.hmm = st.hmm.next_state(delta, nrows)
            st.xscore += (nrows - delta) - 4.0 * delta
            st.xscore_max = max(st.xscore_max, st.xscore)
            if (bad or (not cfg.global_alignment
                        and cfg.x_drop is not None
                        and st.xscore_max - st.xscore > cfg.x_drop)):
                st.active = False       # X-drop / correctness-HMM clip
                continue
            slot = int(res.best_slot[i])
            walk = backwalk(np.asarray(res.best_in)[i], band_nodes[i],
                            slot, (nrows - 1) // W)
            if walk is None:
                st.active = False
                continue
            # walk is [end ... seed]; direction-local path order is
            # seed -> end
            nodes = [int(band_nodes[i][s]) for s in reversed(walk)]
            for nd in nodes[1:]:
                st.path.append(nd)
            end_node = nodes[-1]
            cb = int(res.best_col[i])
            # direction-local offset of the last consumed char
            if slot == 0:
                ln = int(g.node_len[st.node])
                cb += ln - st.trim_len
            st.last_off = cb
            st.row += nrows
            st.base = best
            st.node = end_node
            st.trim_len = int(g.node_len[end_node]) - (cb + 1)
            if st.row >= len(st.mm):
                st.active = False
        return retry

    # ------------------------------------------------------------------
    def _finalize(self, read: str, fwd: _ExtState, bwd: _ExtState,
                  seed_node: int, seed_offset: int, seed_row: int):
        """Join both directions into (positions, span)."""
        g = self.g
        # direction-local offsets -> original coordinates
        if bwd.row > 0 and bwd.last_off >= 0:
            first_node = bwd.path[-1]
            # bwd offsets count from the reversed node start
            first_off = int(g.node_len[first_node]) - 1 - bwd.last_off
            bwd_nodes = list(reversed(bwd.path[1:]))
        else:
            first_node, first_off = seed_node, seed_offset
            bwd_nodes = []
        if fwd.row > 0 and fwd.last_off >= 0:
            last_node = fwd.path[-1]
            last_off = fwd.last_off
            fwd_nodes = fwd.path[1:]
        else:
            last_node, last_off = seed_node, seed_offset
            fwd_nodes = []
        path = bwd_nodes + [seed_node] + fwd_nodes
        dedup = [path[0]]
        for p in path[1:]:
            if p != dedup[-1]:
                dedup.append(p)
        positions = path_to_positions(g, dedup, first_off, last_off)
        span = (seed_row - bwd.row, seed_row + fwd.row)
        return positions, span

    # ------------------------------------------------------------------
    def align_batch(self, reads: Sequence[Tuple[str, str]]
                    ) -> List[ReadAlignment]:
        cfg = self.cfg
        out = [ReadAlignment(name=n, seq=s, positions=[], ops=None,
                             score=len(s), seq_end=len(s))
               for n, s in reads]
        seed_lists = []
        for name, seq in reads:
            seeds = get_seeds(self.index, seq, cfg.seed_density)
            # diagonal clustering picks seeds from the best-supported
            # cluster first (reference OrderSeeds, src/GraphAligner.h:233)
            seeds = cluster_seeds(self.g, seeds,
                                  min_cluster_size=cfg.min_cluster_size)
            if cfg.try_all_seeds:
                ntry = len(seeds)
            elif cfg.seed_extend_density > 0:
                ntry = max(1, int(cfg.seed_extend_density * len(seq)))
            else:
                ntry = cfg.max_seed_tries
            seed_lists.append(seeds[:ntry])
        for ri, seeds in enumerate(seed_lists):
            out[ri].n_seeds = len(seeds)

        candidates = [[] for _ in reads]   # (positions, span) per try
        best_span = [(0, 0)] * len(reads)
        pending = [(ri, 0) for ri in range(len(reads))
                   if seed_lists[ri]]
        while pending:
            batch_states = []
            meta = []
            for ri, si in pending:
                seed = seed_lists[ri][si]
                v, off = self.g.find_split(seed.di_node, seed.node_offset)
                mm = match_masks(reads[ri][1])
                sts = self._init_states(ri, mm, v, off, seed.seq_pos)
                batch_states.extend(sts)
                meta.append((ri, si, sts, v, off, seed.seq_pos))
            while self._extend_round(batch_states):
                pass
            next_pending = []
            for ri, si, sts, v, off, srow in meta:
                fwd, bwd = sts
                positions, span = self._finalize(reads[ri][1], fwd, bwd,
                                                 v, off, srow)
                cov = (span[1] - span[0]) / max(len(reads[ri][1]), 1)
                prev_cov = ((best_span[ri][1] - best_span[ri][0])
                            / max(len(reads[ri][1]), 1))
                if len(positions):
                    candidates[ri].append((positions, span))
                if cov > prev_cov:
                    best_span[ri] = span
                if cov < cfg.min_coverage_frac \
                        and si + 1 < len(seed_lists[ri]):
                    next_pending.append((ri, si + 1))
            pending = next_pending

        # polish every candidate alignment (batched), then select a
        # non-overlapping subset per read (multimapping; reference
        # AlignmentSelection over per-seed alignments)
        polish_reads, polish_paths, refs = [], [], []
        for ri in range(len(reads)):
            for ci, (positions, span) in enumerate(candidates[ri]):
                # clipped alignments polish span-locally (the unaligned
                # read head/tail is clipped, not charged as indels)
                polish_reads.append(reads[ri][1][span[0]:span[1]])
                polish_paths.append(self.gx.positions_seq(positions))
                refs.append((ri, ci))
        scored = {}
        if polish_reads:
            outcomes = polish.polish_batch(polish_reads, polish_paths,
                                           bw=cfg.polish_band_words)
            for (ri, ci), oc in zip(refs, outcomes):
                scored[(ri, ci)] = oc
        from graphchainer_tpu.align.selection import (SelectionMethod,
                                                      SelectionOptions,
                                                      select_alignments)
        for ri in range(len(reads)):
            alts = []
            for ci, (positions, span) in enumerate(candidates[ri]):
                oc = scored.get((ri, ci))
                if oc is None:
                    continue
                a = ReadAlignment(name=out[ri].name, seq=out[ri].seq,
                                  positions=positions, ops=oc.ops,
                                  score=oc.score, seq_start=span[0],
                                  seq_end=span[1])
                alts.append(a)
            if not alts:
                continue
            from graphchainer_tpu.align.evalue import EValueCalculator
            sel = select_alignments(
                alts, SelectionOptions(
                    method=SelectionMethod(cfg.selection_method),
                    graph_size=self._db_size,
                    read_size=len(out[ri].seq),
                    e_cutoff=cfg.e_cutoff,
                    evalue_calc=EValueCalculator(
                        cfg.precise_clipping
                        if cfg.precise_clipping is not None else 0.5)))
            if not sel:
                continue
            if cfg.selection_method != "All":
                sel = sel[:cfg.max_alignments]
            primary = sel[0]
            primary.secondary = sel[1:]
            for a in primary.secondary:
                a.is_secondary = True
            primary.n_seeds = out[ri].n_seeds
            out[ri] = primary
        return out
