#!/usr/bin/env python
"""Chromosome-scale validation: build a >=20 Mbp synthetic variation
graph (chr22-shaped: SNP/indel bubbles every ~60 bp), time index
construction (graph build, MPC, minimizer index), then align reads
end-to-end and report throughput + accuracy.

This is the BASELINE.md config-2 shaped run (chr22 ~40 Mbp; here the
default is 20 Mbp to keep wall time sane — override with SCALE_BP).

Usage: python scripts/scale_test.py [--reads N] [--read-len L]
Env: SCALE_BP (default 20_000_000), JAX_PLATFORMS (cpu to skip the TPU).

Prints one JSON line with build times, memory, reads/s, accuracy.
"""
from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from graphchainer_tpu.utils.jaxconfig import setup as _jax_setup
_jax_setup()


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=192)
    ap.add_argument("--read-len", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--error-rate", type=float, default=0.10)
    args = ap.parse_args()
    scale_bp = int(os.environ.get("SCALE_BP", 20_000_000))

    import bench
    from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
    from graphchainer_tpu.graph.mpc import build_mpc
    from graphchainer_tpu.graph.simulate import generate_path, simulate_reads
    from graphchainer_tpu.index.minimizer import build_index
    from graphchainer_tpu.models.chainer import ChainerConfig, ChainerModel

    out = {"scale_bp": scale_bp}
    rng = np.random.default_rng(7)

    t = time.time()
    bg = bench.build_bench_graph(rng, scale_bp)
    out["gfa_synthesis_s"] = round(time.time() - t, 1)

    t = time.time()
    g = build_alignment_graph(bg)
    out["graph_build_s"] = round(time.time() - t, 1)
    out["graph"] = g.stats()

    t = time.time()
    mpc = build_mpc(g)
    out["mpc_build_s"] = round(time.time() - t, 1)
    out["mpc_paths"] = int(len(mpc.path_comp))

    t = time.time()
    idx = build_index(g, k=15, w=10)
    out["minimizer_build_s"] = round(time.time() - t, 1)
    out["rss_after_index_gb"] = round(rss_gb(), 2)

    model = ChainerModel(g, mpc, idx, ChainerConfig())
    path_seq, _ = generate_path(g, seed=3)
    reads = simulate_reads(path_seq, args.reads, args.read_len, seed=11,
                           error_rate=args.error_rate,
                           len_std=args.read_len // 10)

    from concurrent.futures import ThreadPoolExecutor
    chunks = [reads[lo:lo + args.batch]
              for lo in range(0, len(reads), args.batch)]

    # warmup: one full untimed pass compiles every padded shape bucket
    # (same steady-state protocol as bench.py)
    t = time.time()
    with ThreadPoolExecutor(max_workers=4) as pool:
        list(pool.map(model.align_batch, chunks))
    out["warmup_s"] = round(time.time() - t, 1)

    from graphchainer_tpu.utils import timers
    timers.reset()      # stage report covers the timed pass only
    t = time.time()
    aligned = 0
    scores = []
    with ThreadPoolExecutor(max_workers=4) as pool:
        for chunk, alns in zip(chunks, pool.map(model.align_batch, chunks)):
            for (name, seq), a in zip(chunk, alns):
                if not a.failed:
                    aligned += 1
                    scores.append(a.score / max(len(seq), 1))
    dt = time.time() - t
    n = len(reads)
    out["reads"] = n
    out["align_wall_s"] = round(dt, 1)
    out["reads_per_s"] = round(n / dt, 2)
    out["aligned_fraction"] = round(aligned / max(n, 1), 4)
    out["mean_norm_edit_distance"] = (round(float(np.mean(scores)), 4)
                                      if scores else None)
    out["rss_peak_gb"] = round(rss_gb(), 2)
    from graphchainer_tpu.utils import timers
    out["stage_seconds"] = {k: round(v[0], 1)
                            for k, v in timers.snapshot().items()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
