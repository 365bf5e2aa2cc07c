#!/usr/bin/env python
"""In-process bench tuner: builds the model once, then measures the
steady-state reads/s of several (batch, workers) configurations without
paying the per-process executable-load warmup each time.

Usage: python scripts/tune_bench.py "64:1,64:3,64:4,64:6" [--reads N]
"""
from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphchainer_tpu.utils.jaxconfig import setup as _jax_setup
_jax_setup()


def main():
    combos = [(int(b), int(w)) for b, w in
              (c.split(":") for c in sys.argv[1].split(","))]
    n_reads = int(os.environ.get("BENCH_READS", 960))

    from bench import build_bench_graph
    from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
    from graphchainer_tpu.graph.mpc import build_mpc
    from graphchainer_tpu.graph.simulate import generate_path, simulate_reads
    from graphchainer_tpu.index.minimizer import build_index
    from graphchainer_tpu.models.chainer import ChainerConfig, ChainerModel
    from graphchainer_tpu.utils import timers

    rng = np.random.default_rng(7)
    g = build_alignment_graph(build_bench_graph(rng, 60_000))
    mpc = build_mpc(g)
    idx = build_index(g, k=15, w=10)
    model = ChainerModel(g, mpc, idx, ChainerConfig())
    path_seq, _ = generate_path(g, seed=3)
    import jax
    print("platform:", jax.default_backend(), file=sys.stderr)

    for batch, workers in combos:
        reads = simulate_reads(path_seq, n_reads + batch, 3000, seed=11,
                               error_rate=0.10, len_std=300)
        t0 = time.time()
        model.align_batch(reads[:batch])      # warm this batch size
        warm = time.time() - t0
        timers.reset()
        t1 = time.time()
        chunks = [reads[lo:lo + batch]
                  for lo in range(batch, len(reads), batch)]
        with ThreadPoolExecutor(max_workers=workers) as pool:
            list(pool.map(model.align_batch, chunks))
        dt = time.time() - t1
        n_timed = len(reads) - batch
        stages = {k: round(v[0], 2) for k, v in timers.snapshot().items()}
        print(json.dumps({"batch": batch, "workers": workers,
                          "reads_per_s": round(n_timed / dt, 1),
                          "wall_s": round(dt, 2), "warm_s": round(warm, 1),
                          "stages": stages}))


if __name__ == "__main__":
    main()
