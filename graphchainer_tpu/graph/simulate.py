"""Path generation and read simulation.

generate_path: random source-to-sink walk on the forward strand, for read
simulation ground truth (reference --generate-path,
src/AlignmentGraph.cpp:1498-1537).

simulate_reads: error-model read simulator (reference aux tool
src/SimulateReads.cpp): substitutions/insertions/deletions at given rates
from random positions of a path or the graph.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from graphchainer_tpu.graph.alignment_graph import AlignmentGraph


def generate_path(g: AlignmentGraph, seed: int = 0
                  ) -> Tuple[str, List[str]]:
    """Random forward-strand source-to-sink walk.  Returns (sequence,
    original node names along the walk)."""
    rng = np.random.default_rng(seed)
    sources = [v for v in range(g.n_nodes)
               if int(g.orig_node[v]) % 2 == 0
               and len(g.in_neighbors(v)) == 0]
    if not sources:
        raise ValueError("graph has no forward-strand source node")
    v = int(rng.choice(sources))
    seq_parts = [g.node_seq(v)]
    names = [g.gfa_name(v)]
    while True:
        outs = [int(w) for w in g.out_neighbors(v)
                if int(g.orig_node[w]) % 2 == 0]
        if not outs:
            break
        v = int(rng.choice(outs))
        seq_parts.append(g.node_seq(v))
        if g.gfa_name(v) != names[-1]:
            names.append(g.gfa_name(v))
    return "".join(seq_parts), names


def mutate_read(rng, seq: str, sub: float = 0.03, ins: float = 0.03,
                dele: float = 0.03) -> str:
    out = []
    for ch in seq:
        r = rng.random()
        if r < dele:
            continue
        if r < dele + sub:
            out.append(rng.choice(list("ACGT")))
        else:
            out.append(ch)
        if rng.random() < ins:
            out.append(rng.choice(list("ACGT")))
    return "".join(out)


def simulate_reads(path_seq: str, n: int, mean_len: int, seed: int = 0,
                   error_rate: float = 0.1,
                   len_std: Optional[int] = None) -> List[Tuple[str, str]]:
    """Simulate n reads from a path sequence with the given error rate
    (split evenly between sub/ins/del, pbsim-like)."""
    rng = np.random.default_rng(seed)
    len_std = len_std or mean_len // 4
    reads = []
    per = error_rate / 3
    for i in range(n):
        L = max(50, int(rng.normal(mean_len, len_std)))
        L = min(L, len(path_seq))
        start = int(rng.integers(0, max(len(path_seq) - L, 1)))
        frag = path_seq[start:start + L]
        read = mutate_read(rng, frag, sub=per, ins=per, dele=per)
        reads.append((f"sim_{i}_{start}_{L}", read))
    return reads
