"""Chain stitching: optimal chain -> one node path -> per-char positions.

Port of the reference's connect/stitch loop (src/Aligner.cpp:744-822):
walk the chained anchors, connect consecutive anchors with bounded-BFS
chain paths (getChainPath), flush on gaps keeping the longest contiguous
segment, then expand the winning node path into per-character
(node, offset) positions (pathToTrace, src/Aligner.cpp:409-424).

The BFS queries are precomputed in one batched native call (the budgets
depend only on the adjacent anchor pair, except in rare node-dedup corner
cases where the reference would use a slightly different source node).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from graphchainer_tpu import native
from graphchainer_tpu.align.anchors import Anchor
from graphchainer_tpu.graph.alignment_graph import AlignmentGraph


@dataclass
class StitchResult:
    positions: np.ndarray               # (N, 2) per-char (node, offset)
    pos_path: List[int]                 # winning node path


def path_to_positions(g: AlignmentGraph, pos_path: Sequence[int],
                      first_off: int, last_off: int) -> np.ndarray:
    """Expand a node path into per-char (node, offset) rows from first_off
    in the first node to last_off in the last node (reference
    pathToTrace).  Vectorized."""
    nodes = np.asarray(pos_path, dtype=np.int64)
    n = len(nodes)
    if n == 0:
        return np.zeros((0, 2), dtype=np.int64)
    starts = np.zeros(n, dtype=np.int64)
    ends = g.node_len[nodes].astype(np.int64) - 1
    starts[0] = first_off
    ends[-1] = last_off
    lens = np.maximum(ends - starts + 1, 0)
    total = int(lens.sum())
    v_rep = np.repeat(nodes, lens)
    run0 = np.cumsum(lens) - lens
    offs = (np.arange(total, dtype=np.int64) - np.repeat(run0, lens)
            + np.repeat(starts, lens))
    return np.stack([v_rep, offs], axis=1)


def batched_chain_paths(g: AlignmentGraph, queries):
    """queries: list of (src_node, dst_node, limit).  Returns node paths."""
    if not queries:
        return []
    src_e = np.repeat(np.arange(g.n_nodes, dtype=np.int64),
                      np.diff(g.out_ptr).astype(np.int64))
    qs = np.array([q[0] for q in queries], dtype=np.int64)
    qt = np.array([q[1] for q in queries], dtype=np.int64)
    ql = np.array([q[2] for q in queries], dtype=np.int64)
    return native.chain_paths(g.n_nodes, src_e, g.out_idx.astype(np.int64),
                              g.node_len.astype(np.int64), qs, qt, ql)


def extend_tails(g: AlignmentGraph, positions: np.ndarray,
                 read: str, head_len: int, tail_len: int) -> np.ndarray:
    """Greedily extend the stitched path over the read head/tail that no
    anchor covers (an improvement over the reference, which leaves the
    fragment-grid remainders unaligned and pays them as indels in the
    final NW).  At each branch the child whose next character matches the
    read is preferred; mismatches still extend (they cost the same as the
    insertion the NW would otherwise pay, and often less)."""
    if len(positions) == 0:
        return positions
    # forward tail
    v, o = int(positions[-1, 0]), int(positions[-1, 1])
    out: List[Tuple[int, int]] = []
    ti = len(read) - tail_len
    while tail_len > 0:
        if o + 1 < int(g.node_len[v]):
            o += 1
        else:
            outs = g.out_neighbors(v)
            if len(outs) == 0:
                break
            ch = read[ti] if 0 <= ti < len(read) else "N"
            nxt = None
            for w in outs:
                if g.node_seq(int(w))[0] == ch:
                    nxt = int(w)
                    break
            v = nxt if nxt is not None else int(outs[0])
            o = 0
        out.append((v, o))
        ti += 1
        tail_len -= 1
    tail_arr = np.asarray(out, dtype=np.int64).reshape(-1, 2)
    # backward head
    v, o = int(positions[0, 0]), int(positions[0, 1])
    hi = head_len - 1
    head: List[Tuple[int, int]] = []
    while head_len > 0:
        if o > 0:
            o -= 1
        else:
            ins = g.in_neighbors(v)
            if len(ins) == 0:
                break
            ch = read[hi] if 0 <= hi < len(read) else "N"
            nxt = None
            for w in ins:
                if g.node_seq(int(w))[-1] == ch:
                    nxt = int(w)
                    break
            v = nxt if nxt is not None else int(ins[0])
            o = int(g.node_len[v]) - 1
        head.append((v, o))
        hi -= 1
        head_len -= 1
    head.reverse()
    head_arr = np.asarray(head, dtype=np.int64).reshape(-1, 2)
    return np.concatenate([head_arr, positions, tail_arr], axis=0)


def stitch(g: AlignmentGraph, anchors: Sequence[Anchor],
           ids: Sequence[int], colinear_gap: int) -> Optional[StitchResult]:
    """Stitch the chained anchors `ids` into the longest contiguous
    per-char position list."""
    if not ids:
        return None
    # precompute BFS paths for adjacent pairs
    queries = []
    qidx = {}
    for i in range(1, len(ids)):
        prev, cur = anchors[ids[i - 1]], anchors[ids[i]]
        src = int(prev.path[-1])
        dst = int(cur.first_node)
        limit = colinear_gap
        if limit != -1:
            limit -= int(cur.first_off) + (int(g.node_len[src])
                                           - int(prev.last_off) - 1)
        qidx[i] = len(queries)
        queries.append((src, dst, max(limit, -1)))
    bfs_paths = batched_chain_paths(g, queries)

    longest = np.zeros((0, 2), dtype=np.int64)
    pos_path: List[int] = []
    nodes = set()
    first_off = 0
    last_off = 0
    for i, ai in enumerate(ids):
        a = anchors[ai]
        if not pos_path:
            pos_path = list(a.path)
            first_off = int(a.first_off)
            last_off = int(a.last_off)
            nodes.update(pos_path)
            continue
        gap = (a.path[0] == pos_path[-1] and colinear_gap != -1
               and int(a.first_off) - last_off > colinear_gap + 1)
        path: List[int] = []
        if a.path[0] not in nodes and pos_path[-1] != int(a.first_node):
            path = list(bfs_paths[qidx[i]]) if i in qidx else []
            if not path:
                gap = True
        if gap:
            tmp = path_to_positions(g, pos_path, first_off, last_off)
            if len(longest) < len(tmp):
                longest = tmp
            nodes.clear()
            pos_path = []
            first_off = int(a.first_off)
        else:
            for j in path:
                j = int(j)
                if j not in nodes:
                    nodes.add(j)
                    pos_path.append(j)
        for j in a.path:
            j = int(j)
            if j not in nodes:
                nodes.add(j)
                pos_path.append(j)
        last_off = int(a.last_off)
    if pos_path:
        tmp = path_to_positions(g, pos_path, first_off, last_off)
        if len(longest) < len(tmp):
            longest = tmp
    if len(longest) == 0:
        return None
    # recover the node path of the longest segment from its positions
    nodes = longest[:, 0]
    change = np.ones(len(nodes), dtype=bool)
    change[1:] = nodes[1:] != nodes[:-1]
    seg_path = [int(v) for v in nodes[change]]
    return StitchResult(positions=longest, pos_path=seg_path)
