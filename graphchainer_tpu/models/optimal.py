"""Exact optimal alignment (--optimal-alignment).

Re-design of the reference's Dijkstra mode (src/GraphAlignerBitvectorDijkstra.h
+ AlignOneWayDijkstra, src/GraphAligner.h:85): the guaranteed-minimal edit
distance alignment of the whole read with free start/end positions in the
graph.  The reference expands (node, slice) states in score order; on TPU
the same result comes from running the banded kernel with the band set to
an ENTIRE component and free-start injection at every slot (full_start):
with the whole component in band there is no out-of-band approximation,
so one topo pass per slice is the exact DP.

Components up to max_component (4096) split nodes run on the kernel;
wider components fall back to the exact host checkpointed DP
(align/oracle.py dag_dp_ckpt), so the mode is UNBOUNDED like the
reference's — the kernel band is a fast path, not a cap.  Traceback is
always exact: the full oracle table when component x read fits in 20M
cells, else stripe-checkpointed recompute (O(n*sqrt(R)) memory).  Reads
are processed one at a time; the component is chosen by the read's best
minimizer seed (all components with seed hits are tried).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from graphchainer_tpu.align.anchors import GraphTensors, backwalk
from graphchainer_tpu.graph.alignment_graph import AlignmentGraph
from graphchainer_tpu.index.minimizer import MinimizerIndex, get_seeds
from graphchainer_tpu.models.chainer import ReadAlignment
from graphchainer_tpu.ops import frag_align
from graphchainer_tpu.parallel.device import asarray_chunked
from graphchainer_tpu.utils.seq import match_masks

W = 32
# Kernel fast-path bound: int16 backtrace pointers cap a band at 32767
# slots, and the level-parallel kernel steps once per topo LEVEL, so a
# chain-shaped component costs depth x 32 columns sequentially.  4096
# keeps worst-case chains tractable; components wider than this are NOT
# rejected — they take the exact host checkpointed-DP path instead.
MAX_COMPONENT = 4096


@dataclass
class OptimalConfig:
    max_component: int = MAX_COMPONENT
    polish_band_words: int = 8


def _pow2(x: int, lo: int) -> int:
    out = lo
    while out < x:
        out *= 2
    return out


class OptimalAlignerModel:
    def __init__(self, g: AlignmentGraph, index: MinimizerIndex,
                 cfg: Optional[OptimalConfig] = None,
                 gx: Optional[GraphTensors] = None):
        self.g = g
        self.index = index
        self.cfg = cfg or OptimalConfig()
        self.gx = gx or GraphTensors.build(g)
        self._comp_cache = {}

    def _component_band(self, c: int):
        """(band_nodes [1,B], band_in [1,B,max_in] int16, band_level
        [1,B] int32, n_real)."""
        if c in self._comp_cache:
            return self._comp_cache[c]
        g = self.g
        nodes = np.nonzero(g.comp == c)[0].astype(np.int64)
        n = len(nodes)
        assert n <= self.cfg.max_component
        B = _pow2(n, 64)
        slot_of = {int(v): i for i, v in enumerate(nodes)}
        max_in = 1
        in_lists = []
        for v in nodes:
            ins = [slot_of[int(u)] for u in g.in_neighbors(int(v))]
            in_lists.append(ins)
            max_in = max(max_in, len(ins))
        band_nodes = np.full((1, B), -1, dtype=np.int32)
        band_nodes[0, :n] = nodes
        band_in = np.full((1, B, max_in), -1, dtype=np.int16)
        band_level = np.full((1, B), -1, dtype=np.int32)
        lvls = np.zeros(n, dtype=np.int32)
        for i, ins in enumerate(in_lists):
            band_in[0, i, :len(ins)] = ins
            # node ids are topo ranks, so slot order is topo order
            lvls[i] = 1 + max((lvls[u] for u in ins), default=-1)
        band_level[0, :n] = lvls
        self._comp_cache[c] = (band_nodes, band_in, band_level, n)
        return self._comp_cache[c]

    def _align_component(self, read: str, c: int):
        from graphchainer_tpu.align.anchors import (level_bucket,
                                                    pack_row_planes)
        g = self.g
        nodes = np.nonzero(g.comp == c)[0]
        if len(nodes) > self.cfg.max_component:
            # component too wide for one kernel band: exact host
            # checkpointed DP (O(n*sqrt(R)) memory) — slow but unbounded,
            # like the reference's score-ordered Dijkstra expansion
            from graphchainer_tpu.align import oracle as orc
            cg = orc.build_char_graph(g, nodes)
            inject = np.zeros(cg.n, dtype=np.int64)
            fin, _, _ = orc.dag_dp_ckpt(cg, read, inject)
            return int(fin.min()), None, 0
        band_nodes, band_in, band_level, n_real = self._component_band(c)
        max_in = band_in.shape[2]
        rows = len(read)
        S = _pow2(-(-rows // W), 2)
        mm = np.zeros(S * W, dtype=np.uint8)
        mm[:rows] = match_masks(read)
        req = pack_row_planes(mm[None, :]).reshape(1, S, 4)
        dev_eq, dev_len = self.gx.device_tables()
        res = frag_align.align_fragments(
            dev_eq, dev_len, band_nodes, band_in,
            np.zeros(1, dtype=np.int32), req,
            np.array([rows], dtype=np.int32), n_slices=S, max_in=max_in,
            full_start=True, band_level=band_level,
            n_levels=level_bucket(band_level, band_nodes.shape[1]))
        score = int(np.asarray(res.best_score)[0])
        slot = int(np.asarray(res.best_slot)[0])
        best_in = asarray_chunked(res.best_in)[0]
        walk = backwalk(best_in, band_nodes[0], slot, (rows - 1) // W)
        if walk is None:
            return score, None, 0
        path = [int(band_nodes[0][s]) for s in reversed(walk)]
        end_col = int(np.asarray(res.best_col)[0])
        return score, path, end_col

    def align_batch(self, reads: Sequence[Tuple[str, str]]
                    ) -> List[ReadAlignment]:
        out = [ReadAlignment(name=n, seq=s,
                             positions=np.zeros((0, 2), np.int64),
                             ops=None, score=len(s), seq_end=len(s))
               for n, s in reads]
        for ri, (name, read) in enumerate(reads):
            seeds = get_seeds(self.index, read, -1)
            comps = []
            for s in seeds:
                v, _ = self.g.find_split(s.di_node, s.node_offset)
                c = int(self.g.comp[v])
                if c not in comps:
                    comps.append(c)
            if self.g.ncomp <= 16:
                # small graphs: guarantee optimality by trying everything
                comps += [c for c in range(self.g.ncomp) if c not in comps]
            elif not comps:
                comps = list(range(min(self.g.ncomp, 4)))
            best = None
            for c in comps[:16]:
                score, path, end_col = self._align_component(read, c)
                if best is None or score < best[0]:
                    best = (score, c, path, end_col)
            if best is None:
                continue
            score, comp, path, end_col = best
            out[ri].score = score
            # EXACT traceback always (r3: the 20M-cell cap is gone): the
            # full oracle table when it fits, else the checkpointed
            # stripe-recompute traceback (align/oracle.py dag_dp_ckpt /
            # backtrace_ckpt, O(n*sqrt(R)) memory, 2x forward work)
            from graphchainer_tpu.align import oracle as orc
            nodes = np.nonzero(self.g.comp == comp)[0]
            n_chars = int(self.g.node_len[nodes].sum())
            cg = orc.build_char_graph(self.g, nodes)
            inject = np.zeros(cg.n, dtype=np.int64)
            if n_chars * (len(read) + 1) <= 20_000_000:
                D = orc.dag_dp(cg, read, inject)
                end = int(np.argmin(D[:, len(read)]))
                positions, ops = orc.backtrace(cg, D, read, inject, end)
            else:
                fin, ckpts, stripe = orc.dag_dp_ckpt(cg, read, inject)
                end = int(np.argmin(fin))
                positions, ops = orc.backtrace_ckpt(cg, read, inject,
                                                    ckpts, stripe, end)
            out[ri].positions = positions
            out[ri].ops = ops
        return out
