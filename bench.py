#!/usr/bin/env python
"""Benchmark: reads/s/chip aligning simulated long reads to a synthetic
variation graph (chr-like backbone with SNP/indel bubbles).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "reads/s/chip", "vs_baseline": N}

Protocol (mirrors BASELINE.md): pbsim-like reads, length ~N(3000, 750),
10% error (sub/ins/del evenly), aligned with default CLC parameters
(split-len 35, split-gap 35, colinear-gap 10000).

Baseline: the reference publishes no numbers in-repo (BASELINE.md).  The
single-thread CPU baseline used here is 1.0 reads/s for ~3 kbp reads at
default parameters, a documented estimate from the paper-scale runtimes
(GraphChainer, Bioinformatics 2023: chr22-scale runs take hours at tens
of threads); refine when the reference binary can be built in-image.

Env knobs: BENCH_READS (default 96), BENCH_READ_LEN (3000),
BENCH_GRAPH_BP (60000), BENCH_BATCH (32), BENCH_PLATFORM (default: let
JAX pick, i.e. the TPU).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from graphchainer_tpu.utils.jaxconfig import setup as _jax_setup
_jax_setup()

PLATFORM = os.environ.get("BENCH_PLATFORM")
if PLATFORM:
    import jax
    jax.config.update("jax_platforms", PLATFORM)

BASELINE_READS_PER_S = 1.0   # single-thread CPU reference estimate (see doc)


def build_bench_graph(rng, total_bp: int):
    from graphchainer_tpu.io.gfa import Bigraph
    bg = Bigraph()
    prev = None
    bp = 0
    i = 0
    while bp < total_bp:
        spacer_len = int(rng.integers(40, 90))
        sp = bg.add_segment(f"s{i}", "".join(rng.choice(list("ACGT"),
                                                        spacer_len)))
        bp += spacer_len
        if prev is not None:
            for pn in prev:
                bg.links.append((pn, False, sp, False, 0))
        r = rng.random()
        if r < 0.7:      # SNP bubble
            a = bg.add_segment(f"a{i}", str(rng.choice(list("ACGT"))))
            b = bg.add_segment(f"b{i}", str(rng.choice(list("ACGT"))))
            bg.links.append((sp, False, a, False, 0))
            bg.links.append((sp, False, b, False, 0))
            prev = [a, b]
            bp += 1
        elif r < 0.85:   # short indel bubble
            ln = int(rng.integers(2, 8))
            a = bg.add_segment(f"a{i}", "".join(rng.choice(list("ACGT"),
                                                           ln)))
            prev = [sp, a]
            bg.links.append((sp, False, a, False, 0))
            bp += ln
        else:
            prev = [sp]
        i += 1
    end = bg.add_segment("end", "".join(rng.choice(list("ACGT"), 50)))
    for pn in prev:
        bg.links.append((pn, False, end, False, 0))
    return bg


def main():
    n_reads = int(os.environ.get("BENCH_READS", 192))
    read_len = int(os.environ.get("BENCH_READ_LEN", 3000))
    graph_bp = int(os.environ.get("BENCH_GRAPH_BP", 60_000))
    batch = int(os.environ.get("BENCH_BATCH", 64))

    from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
    from graphchainer_tpu.graph.mpc import build_mpc
    from graphchainer_tpu.graph.simulate import generate_path, simulate_reads
    from graphchainer_tpu.index.minimizer import build_index
    from graphchainer_tpu.models.chainer import ChainerConfig, ChainerModel

    rng = np.random.default_rng(7)
    t0 = time.time()
    g = build_alignment_graph(build_bench_graph(rng, graph_bp))
    mpc = build_mpc(g)
    idx = build_index(g, k=15, w=10)
    t_index = time.time() - t0

    model = ChainerModel(g, mpc, idx, ChainerConfig())
    path_seq, _ = generate_path(g, seed=3)
    # modest length spread keeps the padded kernel shapes in one bucket
    reads = simulate_reads(path_seq, n_reads + batch, read_len, seed=11,
                           error_rate=0.10, len_std=read_len // 10)

    # warmup / compile on the first batch
    model.align_batch(reads[:batch])

    t1 = time.time()
    aligned = 0
    scores = []
    total_bp = 0
    # two batches in flight: host prep of one overlaps device waits of the
    # other (mirrors the pipeline's inflight batching)
    from concurrent.futures import ThreadPoolExecutor
    # 3-deep batch overlap measured best over the tunneled TPU (2: ~65-70
    # reads/s, 3: ~73-76, 4: ~66): host stages of two batches hide one
    # batch's device round-trips
    workers = int(os.environ.get("BENCH_WORKERS", 3))
    with ThreadPoolExecutor(max_workers=workers) as pool:
        chunks = [reads[lo:lo + batch]
                  for lo in range(batch, len(reads), batch)]
        for chunk, alns in zip(chunks, pool.map(model.align_batch, chunks)):
            for (name, seq), a in zip(chunk, alns):
                total_bp += len(seq)
                if not a.failed:
                    aligned += 1
                    scores.append(a.score / max(len(seq), 1))
    dt = time.time() - t1
    n_timed = len(reads) - batch
    reads_per_s = n_timed / dt

    result = {
        "metric": f"reads/s/chip ({read_len}bp 10%-err reads vs "
                  f"{graph_bp}bp synthetic variation graph, default CLC "
                  "params)",
        "value": round(reads_per_s, 3),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_s / BASELINE_READS_PER_S, 3),
        "detail": {
            "n_reads": n_timed,
            "aligned_fraction": round(aligned / max(n_timed, 1), 4),
            "mean_norm_edit_distance": round(float(np.mean(scores)), 4)
            if scores else None,
            "wall_s": round(dt, 3),
            "bp_per_s": round(total_bp / dt, 1),
            "index_build_s": round(t_index, 2),
            "graph": g.stats(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
