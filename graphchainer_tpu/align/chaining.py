"""Co-linear chaining over the MPC index.

Exact semantics of the reference's colinearChaining /
colinearChainingByComponent (src/AlignmentGraph.cpp:1712-1863):

Recurrence over anchors j (read interval [x_j, y_j], split-node path):

  C[j] = max( y_j - x_j + 1,
              y_j - x_j + 1 + max{ C[j'] : j' precedes j, y_{j'} <= x_j - 1 },
              y_j         + max{ C[j'] - y_{j'} : j' precedes j,
                                 x_j <= y_{j'} <= y_j - 1 } )

"j' precedes j" means end(j') reaches start(j) in the DAG, decided through
the MPC last2reach index: j' is visible to j on path k at the topo moment
of j's backwards pointer (u, k), plus the same-node sweep when start(j)
and end(j') share a node.  Scores are read-coverage; gap limits apply only
at stitching (the reference ignores sep_limit inside the DP too).

This module provides the host oracle (used in tests and as a fallback) and
the event-list builder shared with the device scan (ops/chain_scan.py).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from graphchainer_tpu.align.anchors import Anchor
from graphchainer_tpu.graph.alignment_graph import AlignmentGraph
from graphchainer_tpu.graph.mpc import MPCIndex

# event sections within a topo group (processing order matters)
SEC_SAME = 0      # same-node sweep: interleaved start-queries / end-inserts
SEC_INSERT = 1    # global tree inserts for anchors ending at the node
SEC_QUERY = 2     # backwards-pointer queries

# event types
EV_SAME_START = 0
EV_SAME_END = 1
EV_INSERT = 2
EV_QUERY = 3


@dataclass
class ChainEvents:
    """Flat per-read event list, sorted in execution order."""
    ev_type: np.ndarray     # int32 [E]
    ev_anchor: np.ndarray   # int32 [E]
    ev_k: np.ndarray        # int32 [E] global path id (EV_QUERY only)
    ev_kmask: np.ndarray    # uint32 [E, KW] global path bitmask (EV_INSERT)
    ev_group: np.ndarray    # int32 [E] topo group id (same-node tagging)
    n_paths: int


def global_path_ids(mpc: MPCIndex) -> Tuple[np.ndarray, np.ndarray]:
    """Map (component, per-component k) -> global path id.  Returns
    (comp_path_base [ncomp], n_paths)."""
    ncomp = len(mpc.comp_width)
    base = np.zeros(ncomp + 1, dtype=np.int64)
    np.cumsum(mpc.comp_width, out=base[1:])
    return base, int(base[-1])


def build_events(g: AlignmentGraph, mpc: MPCIndex,
                 anchors: Sequence[Anchor]) -> ChainEvents:
    base, n_paths = global_path_ids(mpc)
    kw = max(1, -(-n_paths // 32))
    raw: List[Tuple] = []   # (group_node, section, y, x, j, subtype, payload)
    for j, a in enumerate(anchors):
        s, e = int(a.path[0]), int(a.path[-1])
        comp = int(g.comp[s])
        raw.append((s, SEC_SAME, a.y, a.x, j, 0, EV_SAME_START, -1, None))
        raw.append((e, SEC_SAME, a.y, a.x, j, 1, EV_SAME_END, -1, None))
        # global insert with the path set of the end node
        ks = mpc.node_paths(e)
        mask = np.zeros(kw, dtype=np.uint32)
        for k in ks:
            gk = int(base[comp]) + int(k)
            mask[gk // 32] |= np.uint32(1) << np.uint32(gk % 32)
        raw.append((e, SEC_INSERT, a.y, a.x, j, 0, EV_INSERT, -1, mask))
        # backwards-pointer queries at the start node
        us, kks = mpc.backwards(s)
        for u, k in zip(us, kks):
            gk = int(base[comp]) + int(k)
            raw.append((int(u), SEC_QUERY, a.y, a.x, j, 0, EV_QUERY, gk,
                        None))
    # execution order: (topo(node), section, y, x, j, subtype)
    raw.sort(key=lambda t: (t[0], t[1], t[2], t[3], t[4], t[5]))
    E = len(raw)
    ev_type = np.zeros(E, dtype=np.int32)
    ev_anchor = np.zeros(E, dtype=np.int32)
    ev_k = np.full(E, -1, dtype=np.int32)
    ev_kmask = np.zeros((E, kw), dtype=np.uint32)
    ev_group = np.zeros(E, dtype=np.int32)
    group = -1
    last_node = None
    for i, t in enumerate(raw):
        if t[0] != last_node:
            group += 1
            last_node = t[0]
        ev_type[i] = t[6]
        ev_anchor[i] = t[4]
        ev_group[i] = group
        if t[6] == EV_QUERY:
            ev_k[i] = t[7]
        if t[6] == EV_INSERT:
            ev_kmask[i] = t[8]
    return ChainEvents(ev_type=ev_type, ev_anchor=ev_anchor, ev_k=ev_k,
                       ev_kmask=ev_kmask, ev_group=ev_group,
                       n_paths=n_paths)


def chain_oracle(g: AlignmentGraph, mpc: MPCIndex,
                 anchors: Sequence[Anchor]) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side exact chaining DP via the event list.  Returns
    (C_val [A], C_pred [A])."""
    A = len(anchors)
    x = np.array([a.x for a in anchors], dtype=np.int64)
    y = np.array([a.y for a in anchors], dtype=np.int64)
    ln = y - x + 1
    C = ln.copy()
    pred = np.full(A, -1, dtype=np.int64)
    ev = build_events(g, mpc, anchors)
    kw = ev.ev_kmask.shape[1]
    ins = np.zeros((A, kw), dtype=np.uint32)
    tmp_tag = np.full(A, -1, dtype=np.int64)

    def pair_max(j, cand_mask, vals):
        """C[j] = max(C[j], (vals, j')) with reference pair semantics:
        larger value wins, ties prefer larger j'."""
        if not cand_mask.any():
            return
        vv = np.where(cand_mask, vals, np.int64(-1) << 40)
        jj = int(np.flatnonzero(vv == vv.max())[-1])
        if (vv[jj], jj) > (C[j], pred[j]):
            C[j] = vv[jj]
            pred[j] = jj

    for i in range(len(ev.ev_type)):
        t, j, grp = int(ev.ev_type[i]), int(ev.ev_anchor[i]), int(ev.ev_group[i])
        if t == EV_SAME_START:
            m = tmp_tag == grp
            pair_max(j, m & (y <= x[j] - 1), C + ln[j])
            pair_max(j, m & (x[j] <= y) & (y <= y[j] - 1), C - y + y[j])
        elif t == EV_SAME_END:
            tmp_tag[j] = grp
        elif t == EV_INSERT:
            ins[j] |= ev.ev_kmask[i]
        else:  # EV_QUERY
            gk = int(ev.ev_k[i])
            m = (ins[:, gk // 32] >> np.uint32(gk % 32)) & 1 == 1
            pair_max(j, m & (y <= x[j] - 1), C + ln[j])
            pair_max(j, m & (x[j] <= y) & (y <= y[j] - 1), C - y + y[j])
    return C, pred


def batch_arrays(g: AlignmentGraph, mpc: MPCIndex,
                 per_read_anchors: Sequence[Sequence[Anchor]],
                 A: Optional[int] = None, E: Optional[int] = None):
    """Pack per-read anchors + events into padded batch arrays for the
    device scan (ops/chain_scan.py).  Returns a dict of numpy arrays.

    Vectorized across the WHOLE batch: one concatenated event list for
    all reads, one lexsort, scatter into the padded (R, E) matrices —
    semantically identical to per-read build_events (pinned by
    tests/test_chaining.py test_batch_arrays_matches_build_events)."""
    def _bucket(x, m):
        out = m
        while out < x:
            out *= 2
        return out

    counts = np.array([len(a) for a in per_read_anchors], dtype=np.int64)
    Atot = int(counts.sum())
    s = np.empty(Atot, dtype=np.int64)
    e = np.empty(Atot, dtype=np.int64)
    ax = np.empty(Atot, dtype=np.int64)
    ay = np.empty(Atot, dtype=np.int64)
    i = 0
    for anchors in per_read_anchors:
        for a in anchors:
            s[i] = a.path[0]
            e[i] = a.path[-1]
            ax[i] = a.x
            ay[i] = a.y
            i += 1
    return batch_arrays_cols(g, mpc, counts, s, e, ax, ay, A=A, E=E)


def anchor_kmask_cols(g: AlignmentGraph, mpc: MPCIndex,
                      counts: np.ndarray, e: np.ndarray,
                      R: int, A: int) -> np.ndarray:
    """(R, A, KW) uint32 per-anchor INSERT path bitmask (the OR of the
    global-path bits through each anchor's END node) — the same table
    batch_arrays_cols(anchor_kmask=True) emits, built standalone for the
    on-device event builder (ops/chain_scan.chain_scan_anchors)."""
    base, n_paths = global_path_ids(mpc)
    kw = 1
    while kw < -(-n_paths // 32):
        kw *= 2
    a_kmask = np.zeros((R, A, kw), dtype=np.uint32)
    Atot = len(e)
    if Atot == 0:
        return a_kmask
    rid = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    jloc = (np.arange(Atot, dtype=np.int64)
            - np.repeat(np.cumsum(counts) - counts, counts))
    gbase = base[g.comp[e]]
    npk0 = mpc.nodepath_offsets[e]
    npn = (mpc.nodepath_offsets[e + 1] - npk0).astype(np.int64)
    NP = int(npn.sum())
    prep = np.repeat(np.arange(Atot, dtype=np.int64), npn)
    pflat = (np.arange(NP, dtype=np.int64)
             - np.repeat(np.cumsum(npn) - npn, npn) + npk0[prep])
    gk = gbase[prep] + mpc.nodepath_k[pflat]
    flat = (rid[prep] * A + jloc[prep]) * kw + gk // 32
    np.bitwise_or.at(a_kmask.reshape(-1), flat,
                     (np.uint32(1) << (gk % 32).astype(np.uint32)))
    return a_kmask


def batch_arrays_cols(g: AlignmentGraph, mpc: MPCIndex,
                      counts: np.ndarray, s: np.ndarray, e: np.ndarray,
                      ax: np.ndarray, ay: np.ndarray,
                      A: Optional[int] = None, E: Optional[int] = None,
                      anchor_kmask: bool = False):
    """Columnar batch_arrays: per-read anchor counts plus flat
    (start node, end node, x, y) arrays grouped by read.

    anchor_kmask: emit the INSERT path bitmask per ANCHOR ("a_kmask",
    (R, A, KW)) instead of per event ("ev_kmask", (R, E, KW)) — the mask
    depends only on the anchor's end node, and the per-anchor form is
    E/A-fold smaller on the wire (ops/chain_scan.py gathers per event on
    device; results bit-identical)."""
    def _bucket(x, m):
        out = m
        while out < x:
            out *= 2
        return out

    R = len(counts)
    base, n_paths = global_path_ids(mpc)
    kw = _bucket(max(1, -(-n_paths // 32)), 1)
    Atot = int(counts.sum())
    A = A or _bucket(int(counts.max(initial=1)), 64)
    if Atot == 0:
        Rp = _bucket(R, 16)
        out = dict(x=np.zeros((Rp, A), np.int32),
                   y=np.zeros((Rp, A), np.int32),
                   valid=np.zeros((Rp, A), bool),
                   ev_type=np.full((Rp, E or 512), -1, np.int16),
                   ev_anchor=np.zeros((Rp, E or 512), np.int16),
                   ev_k=np.full((Rp, E or 512), -1, np.int16),
                   ev_group=np.full((Rp, E or 512), -1, np.int16))
        if anchor_kmask:
            out["a_kmask"] = np.zeros((Rp, A, kw), np.uint32)
        else:
            out["ev_kmask"] = np.zeros((Rp, E or 512, kw), np.uint32)
        return out

    rid = np.repeat(np.arange(R, dtype=np.int64), counts)
    jloc = (np.arange(Atot, dtype=np.int64)
            - np.repeat(np.cumsum(counts) - counts, counts))
    gbase = base[g.comp[s]]

    # event rows: SAME_START(node=s,sec=0,sub=0), SAME_END(node=e,sec=0,
    # sub=1), INSERT(node=e,sec=1), QUERY(node=u,sec=2) per backwards
    # pointer of s — the same raw tuples build_events emits per read
    nb = (mpc.back_offsets[s + 1] - mpc.back_offsets[s]).astype(np.int64)
    NQ = int(nb.sum())
    qrep = np.repeat(np.arange(Atot, dtype=np.int64), nb)
    qflat = (np.arange(NQ, dtype=np.int64)
             - np.repeat(np.cumsum(nb) - nb, nb)
             + mpc.back_offsets[s][qrep])
    ev_node = np.concatenate([s, e, e, mpc.back_node[qflat]])
    ev_sec = np.concatenate([np.zeros(Atot, np.int64),
                             np.zeros(Atot, np.int64),
                             np.full(Atot, 1, np.int64),
                             np.full(NQ, 2, np.int64)])
    ev_sub = np.concatenate([np.zeros(Atot, np.int64),
                             np.ones(Atot, np.int64),
                             np.zeros(Atot, np.int64),
                             np.zeros(NQ, np.int64)])
    ev_t = np.concatenate([np.full(Atot, EV_SAME_START, np.int64),
                           np.full(Atot, EV_SAME_END, np.int64),
                           np.full(Atot, EV_INSERT, np.int64),
                           np.full(NQ, EV_QUERY, np.int64)])
    ev_j = np.concatenate([jloc, jloc, jloc, jloc[qrep]])
    ev_x = np.concatenate([ax, ax, ax, ax[qrep]])
    ev_y = np.concatenate([ay, ay, ay, ay[qrep]])
    ev_r = np.concatenate([rid, rid, rid, rid[qrep]])
    ev_kq = np.concatenate([np.full(3 * Atot, -1, np.int64),
                            gbase[qrep] + mpc.back_k[qflat]])
    # the anchor row id of each event (for the INSERT kmask fill below)
    ev_aid = np.concatenate([np.arange(Atot, dtype=np.int64)] * 3
                            + [qrep])

    # execution order per read: (node, section, y, x, j, subtype)
    o = np.lexsort((ev_sub, ev_j, ev_x, ev_y, ev_sec, ev_node, ev_r))
    ev_node, ev_t, ev_j, ev_kq, ev_r, ev_aid = (
        a[o] for a in (ev_node, ev_t, ev_j, ev_kq, ev_r, ev_aid))

    NE = len(o)
    new_read = np.ones(NE, dtype=bool)
    new_read[1:] = ev_r[1:] != ev_r[:-1]
    new_grp = new_read.copy()
    new_grp[1:] |= ev_node[1:] != ev_node[:-1]
    grp = np.cumsum(new_grp) - 1
    # per-read group base: group id at each read's first event
    read_start = np.nonzero(new_read)[0]
    per_read_ne = np.diff(np.append(read_start, NE))
    grp -= np.repeat(grp[read_start], per_read_ne)
    # per-read event position
    epos = np.arange(NE, dtype=np.int64) - np.repeat(read_start,
                                                     per_read_ne)

    E = E or _bucket(int(per_read_ne.max(initial=1)), 512)
    # pad the read axis to a pow2 bucket: R is the number of LIVE reads,
    # which varies batch to batch — unpadded it makes nearly every batch
    # a fresh kernel executable (tens of seconds of compile each on the
    # dev TPU).  Padded rows have zero valid anchors; callers index
    # results by live row, so the tail is simply ignored.
    R = _bucket(R, 16)
    x = np.zeros((R, A), dtype=np.int32)
    y = np.zeros((R, A), dtype=np.int32)
    valid = np.zeros((R, A), dtype=bool)
    x[rid, jloc] = ax
    y[rid, jloc] = ay
    valid[rid, jloc] = True
    # int16 event arrays halve the per-batch upload (A, E < 32768)
    ev_type = np.full((R, E), -1, dtype=np.int16)
    ev_anchor = np.zeros((R, E), dtype=np.int16)
    ev_k = np.full((R, E), -1, dtype=np.int16)
    ev_group = np.full((R, E), -1, dtype=np.int16)
    keep = epos < E
    rr, pp = ev_r[keep], epos[keep]
    ev_type[rr, pp] = ev_t[keep]
    ev_anchor[rr, pp] = ev_j[keep]
    ev_k[rr, pp] = ev_kq[keep]
    ev_group[rr, pp] = grp[keep]
    out = dict(x=x, y=y, valid=valid, ev_type=ev_type,
               ev_anchor=ev_anchor, ev_k=ev_k, ev_group=ev_group)

    # INSERT kmask: OR the global-path bits of each end node's path set
    if anchor_kmask:
        # per ANCHOR (every anchor has exactly one INSERT event, and the
        # mask depends only on its end node)
        a_kmask = np.zeros((R, A, kw), dtype=np.uint32)
        npk0 = mpc.nodepath_offsets[e]
        npn = (mpc.nodepath_offsets[e + 1] - npk0).astype(np.int64)
        NP = int(npn.sum())
        prep = np.repeat(np.arange(Atot, dtype=np.int64), npn)
        pflat = (np.arange(NP, dtype=np.int64)
                 - np.repeat(np.cumsum(npn) - npn, npn) + npk0[prep])
        gk = gbase[prep] + mpc.nodepath_k[pflat]
        flat = (rid[prep] * A + jloc[prep]) * kw + gk // 32
        np.bitwise_or.at(a_kmask.reshape(-1), flat,
                         (np.uint32(1) << (gk % 32).astype(np.uint32)))
        out["a_kmask"] = a_kmask
        return out
    ev_kmask = np.zeros((R, E, kw), dtype=np.uint32)
    ins = keep & (ev_t == EV_INSERT)
    if ins.any():
        ie = e[ev_aid[ins]]
        npk0 = mpc.nodepath_offsets[ie]
        npn = (mpc.nodepath_offsets[ie + 1] - npk0).astype(np.int64)
        NP = int(npn.sum())
        prep = np.repeat(np.arange(len(ie), dtype=np.int64), npn)
        pflat = (np.arange(NP, dtype=np.int64)
                 - np.repeat(np.cumsum(npn) - npn, npn) + npk0[prep])
        gk = gbase[ev_aid[ins]][prep] + mpc.nodepath_k[pflat]
        flat = ((ev_r[ins][prep] * E + epos[ins][prep]) * kw + gk // 32)
        np.bitwise_or.at(ev_kmask.reshape(-1), flat,
                         (np.uint32(1) << (gk % 32).astype(np.uint32)))
    out["ev_kmask"] = ev_kmask
    return out


def best_chain(g: AlignmentGraph, anchors: Sequence[Anchor],
               C: np.ndarray, pred: np.ndarray
               ) -> Tuple[List[int], int]:
    """Pick the best component's chain (reference colinearChaining,
    src/AlignmentGraph.cpp:1712-1735) and backtrack it."""
    if len(anchors) == 0:
        return [], 0
    comps = np.array([int(g.comp[a.path[-1]]) for a in anchors])
    best_ids: List[int] = []
    best_score = -1
    for c in np.unique(comps):
        sel = np.flatnonzero(comps == c)
        # pair max (C, j): ties prefer larger j
        jbest = int(sel[np.flatnonzero(C[sel] == C[sel].max())[-1]])
        if int(C[jbest]) > best_score:
            best_score = int(C[jbest])
            ids = []
            i = jbest
            while i != -1:
                ids.append(i)
                if pred[i] == i:
                    break
                i = int(pred[i])
            best_ids = list(reversed(ids))
    return best_ids, best_score
