#!/usr/bin/env python
"""Accuracy evaluation harness (re-design of the reference's
scripts/summary.py oracle): align simulated reads, reconstruct each
alignment's path sequence, and report per-read edit distance / alignment
length statistics as CSV + a summary line.

Usage: python scripts/eval.py [--graph-bp N] [--reads N] [--read-len N]
                              [--error-rate E] [--mode clc|ga] [--csv out]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from graphchainer_tpu.utils.jaxconfig import setup as _jax_setup
_jax_setup()


def nw_edit_distance(a, b):
    la, lb = len(a), len(b)
    D = np.zeros((la + 1, lb + 1), dtype=np.int64)
    D[:, 0] = np.arange(la + 1)
    D[0, :] = np.arange(lb + 1)
    bb = np.frombuffer(b.encode(), np.uint8)
    for i in range(1, la + 1):
        sub = (bb != ord(a[i - 1])).astype(np.int64)
        row = D[i - 1]
        t = np.empty(lb + 1, dtype=np.int64)
        t[0] = row[0] + 1
        t[1:] = np.minimum(row[:-1] + sub, row[1:] + 1)
        idx = np.arange(lb + 1)
        D[i] = np.minimum.accumulate(t - idx) + idx
    return int(D[la, lb])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graph-bp", type=int, default=200_000)
    ap.add_argument("--reads", type=int, default=64)
    ap.add_argument("--read-len", type=int, default=3000)
    ap.add_argument("--error-rate", type=float, default=0.1)
    ap.add_argument("--mode", default="clc", choices=["clc", "ga"])
    ap.add_argument("--include-reverse", action="store_true", default=True)
    ap.add_argument("--csv", default=None)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    import bench
    from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
    from graphchainer_tpu.graph.mpc import build_mpc
    from graphchainer_tpu.graph.simulate import generate_path, simulate_reads
    from graphchainer_tpu.index.minimizer import build_index
    from graphchainer_tpu.models.chainer import ChainerConfig, ChainerModel
    from graphchainer_tpu.utils.seq import revcomp

    rng = np.random.default_rng(args.seed)
    g = build_alignment_graph(bench.build_bench_graph(rng, args.graph_bp))
    idx = build_index(g, k=15, w=10)
    if args.mode == "ga":
        from graphchainer_tpu.models.aligner import (AlignerConfig,
                                                     GraphAlignerModel)
        model = GraphAlignerModel(g, idx, AlignerConfig())
    else:
        model = ChainerModel(g, build_mpc(g), idx, ChainerConfig())

    path_seq, _ = generate_path(g, seed=3)
    reads = simulate_reads(path_seq, args.reads, args.read_len,
                           seed=args.seed + 1, error_rate=args.error_rate,
                           len_std=args.read_len // 10)
    if args.include_reverse:
        reads = [(n, revcomp(s)) if i % 2 else (n, s)
                 for i, (n, s) in enumerate(reads)]

    t0 = time.time()
    rows = []
    B = 32
    for lo in range(0, len(reads), B):
        chunk = reads[lo:lo + B]
        for (name, seq), aln in zip(chunk, model.align_batch(chunk)):
            if aln.failed:
                rows.append((name, len(seq), -1, 0.0))
                continue
            pathseq = model.gx.positions_seq(aln.positions)
            ed = nw_edit_distance(seq, pathseq)
            rows.append((name, len(seq), ed, ed / max(len(seq), 1)))
    dt = time.time() - t0

    if args.csv:
        with open(args.csv, "w") as f:
            f.write("read,length,edit_distance,norm_edit_distance\n")
            for r in rows:
                f.write(",".join(str(x) for x in r) + "\n")
    ok = [r for r in rows if r[2] >= 0]
    print(f"aligned {len(ok)}/{len(rows)} reads in {dt:.1f}s "
          f"({len(rows)/dt:.1f} reads/s incl eval); "
          f"mean norm edit distance "
          f"{np.mean([r[3] for r in ok]):.4f} "
          f"(simulated error rate {args.error_rate})")


if __name__ == "__main__":
    main()
