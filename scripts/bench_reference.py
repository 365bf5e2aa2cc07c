#!/usr/bin/env python
"""Measure the reference GraphChainer binary on the exact bench.py
workload (same synthetic graph, same simulated reads, same seeds) and
record the single-thread CPU baseline that bench.py's `vs_baseline`
divides by.

Usage:
  scripts/refbuild/build_reference.sh            # once
  python scripts/bench_reference.py [--binary BIN] [--threads N]
                                    [--out BASELINE_MEASURED.json]

Writes a JSON file with reads/s + accuracy of the reference run and full
provenance.  bench.py picks it up from the repo root when present.

Env knobs mirror bench.py: BENCH_READS / BENCH_READ_LEN / BENCH_GRAPH_BP.
"""
from __future__ import annotations

import argparse
import json
import os
import platform
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def write_gfa(bg, path):
    with open(path, "w") as f:
        for name, seq in zip(bg.names, bg.seqs):
            f.write(f"S\t{name}\t{seq}\n")
        for a, ar, b, br, ov in bg.links:
            f.write(f"L\t{bg.names[a]}\t{'-' if ar else '+'}"
                    f"\t{bg.names[b]}\t{'-' if br else '+'}\t{ov}M\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--binary", default="/tmp/refbuild/bin/GraphChainer")
    ap.add_argument("--threads", type=int, default=1)
    ap.add_argument("--out", default="BASELINE_MEASURED.json")
    args = ap.parse_args()
    if not os.path.exists(args.binary):
        sys.exit(f"reference binary not found at {args.binary}; run "
                 "scripts/refbuild/build_reference.sh first")

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import bench
    from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
    from graphchainer_tpu.graph.simulate import generate_path, simulate_reads

    n_reads = int(os.environ.get("BENCH_READS", 192))
    read_len = int(os.environ.get("BENCH_READ_LEN", 3000))
    graph_bp = int(os.environ.get("BENCH_GRAPH_BP", 60_000))
    batch = int(os.environ.get("BENCH_BATCH", 64))

    rng = np.random.default_rng(7)
    bg = bench.build_bench_graph(rng, graph_bp)
    g = build_alignment_graph(bg)
    path_seq, _ = generate_path(g, seed=3)
    reads = simulate_reads(path_seq, n_reads + batch, read_len, seed=11,
                           error_rate=0.10, len_std=read_len // 10)
    # time the same read set bench.py times (it spends the first `batch`
    # reads on compile warmup; the reference has no warmup, so time all
    # timed reads identically)
    timed = reads[batch:]

    with tempfile.TemporaryDirectory() as td:
        gfa = os.path.join(td, "bench.gfa")
        fa = os.path.join(td, "reads.fa")
        gam = os.path.join(td, "out.gam")
        write_gfa(bg, gfa)
        with open(fa, "w") as f:
            for name, seq in timed:
                f.write(f">{name}\n{seq}\n")
        cmd = [args.binary, "-g", gfa, "-f", fa, "-a", gam,
               "-t", str(args.threads)]
        t0 = time.time()
        r = subprocess.run(cmd, capture_output=True, text=True)
        dt = time.time() - t0
        if r.returncode != 0:
            sys.exit(f"reference binary failed:\n{r.stdout}\n{r.stderr}")

        # accuracy via the same oracle harness
        csv = os.path.join(td, "summary.csv")
        h = subprocess.run(
            [sys.executable, "scripts/summary_harness.py", gfa, fa, csv,
             f"ref={gam}"], capture_output=True, text=True,
            env={**os.environ, "JAX_PLATFORMS": "cpu"})
        harness_line = (h.stdout.strip().splitlines() or [""])[-1]

    out = {
        "reads_per_s": round(len(timed) / dt, 3),
        "wall_s": round(dt, 2),
        "n_reads": len(timed),
        "threads": args.threads,
        "binary": args.binary,
        "build": "scripts/refbuild/build_reference.sh (stub deps, "
                 "minimizer seeding, default CLC params)",
        "workload": {
            "read_len": read_len, "graph_bp": graph_bp,
            "error_rate": 0.10, "seeds": [7, 3, 11],
        },
        "host": platform.processor() or platform.machine(),
        "accuracy": harness_line,
        "reference_stdout_tail": r.stdout.strip().splitlines()[-8:],
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
