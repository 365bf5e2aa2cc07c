#!/usr/bin/env python
"""Sustained big-read-set run (BASELINE.md config 3 shape; VERDICT r4
next-round #4): >=10k mixed-length reads against a 40 Mbp graph through
the REAL CLI pipeline (reader thread -> in-flight batches -> writer
threads -> GAM/GAF on disk), with a --sampling-step sweep {1,2,3}.

Unlike bench.py's 960-read two-pass protocol, this exercises sustained
pipeline behavior: queue depths, memory growth, writer backpressure,
output-file sizes.  Index artifacts (.npz minimizer + MPC) are built
once and cached across the sweep via --mpc-index/--minimizer-index.

Usage: python scripts/sustained_test.py [--reads 10000] [--workdir DIR]
Env: SUSTAINED_BP (default 40_000_000).

Writes SUSTAINED_r05.json (one dict per sweep step + provenance).
"""
from __future__ import annotations

import argparse
import json
import os
import resource
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "SUSTAINED_r05.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=10000)
    ap.add_argument("--workdir", default="/tmp/sustained_r05")
    ap.add_argument("--steps", default="1,2,3")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--platform", default=None,
                    help="JAX_PLATFORMS for the CLI children (e.g. cpu; "
                         "default: unset = real TPU)")
    args = ap.parse_args()
    bp = int(os.environ.get("SUSTAINED_BP", 40_000_000))
    os.makedirs(args.workdir, exist_ok=True)

    os.environ.setdefault("JAX_PLATFORMS", "cpu")   # host-side prep only
    import bench
    from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
    from graphchainer_tpu.graph.simulate import generate_path, simulate_reads

    gfa = os.path.join(args.workdir, "g.gfa")
    fa = os.path.join(args.workdir, "reads.fa")
    prep = {"scale_bp": bp, "n_reads": args.reads}
    if not (os.path.exists(gfa) and os.path.exists(fa)):
        rng = np.random.default_rng(7)
        t0 = time.time()
        bg = bench.build_bench_graph(rng, bp)
        with open(gfa, "w") as f:
            f.write("H\tVN:Z:1.0\n")
            for name, seq in zip(bg.names, bg.seqs):
                f.write(f"S\t{name}\t{seq}\n")
            for a, ar, b, br, ov in bg.links:
                f.write(f"L\t{bg.names[a]}\t{'-' if ar else '+'}"
                        f"\t{bg.names[b]}\t{'-' if br else '+'}\t{ov}M\n")
        g = build_alignment_graph(bg)
        path_seq, _ = generate_path(g, seed=3)
        # mixed lengths: 50% ~1.5k, 35% ~3k, 15% ~9k (long-tail ONT-ish)
        n1 = args.reads // 2
        n2 = int(args.reads * 0.35)
        n3 = args.reads - n1 - n2
        reads = (simulate_reads(path_seq, n1, 1500, seed=11,
                                error_rate=0.10, len_std=300)
                 + simulate_reads(path_seq, n2, 3000, seed=12,
                                  error_rate=0.10, len_std=600)
                 + simulate_reads(path_seq, n3, 9000, seed=13,
                                  error_rate=0.10, len_std=1500))
        with open(fa, "w") as f:
            for i, (name, seq) in enumerate(reads):
                f.write(f">r{i}_{name}\n{seq}\n")
        prep["prep_s"] = round(time.time() - t0, 1)

    results = {"prep": prep, "sweep": []}
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)        # default: the real TPU
    if args.platform:
        env["JAX_PLATFORMS"] = args.platform
    results["platform"] = args.platform or "tpu"
    env["PYTHONPATH"] = REPO
    mpc_npz = os.path.join(args.workdir, "mpc.npz")
    min_npz = os.path.join(args.workdir, "minimizer.npz")
    for step in [int(s) for s in args.steps.split(",")]:
        gam = os.path.join(args.workdir, f"out_step{step}.gam")
        gaf = os.path.join(args.workdir, f"out_step{step}.gaf")
        cmd = [sys.executable, "-m", "graphchainer_tpu.cli",
               "-g", gfa, "-f", fa, "-a", gam, "-a", gaf,
               "--sampling-step", str(step),
               "--batch-size", str(args.batch),
               "--mpc-index", mpc_npz, "--minimizer-index", min_npz]
        t0 = time.time()
        r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                           cwd=REPO)
        wall = time.time() - t0
        ru = resource.getrusage(resource.RUSAGE_CHILDREN)
        row = {"sampling_step": step, "wall_s": round(wall, 1),
               "rc": r.returncode,
               "child_maxrss_gb": round(ru.ru_maxrss / 1e6, 2),
               "gam_bytes": os.path.getsize(gam)
               if os.path.exists(gam) else 0,
               "gaf_bytes": os.path.getsize(gaf)
               if os.path.exists(gaf) else 0}
        for line in (r.stdout + r.stderr).splitlines():
            ls = line.strip()
            if ls.startswith(("Input reads:", "Reads with an alignment:",
                              "Alignments:", "graph:")):
                key = ls.split(":")[0].strip().lower().replace(" ", "_")
                row[key] = ls.split(":", 1)[1].strip()
        if r.returncode != 0:
            row["stderr_tail"] = r.stderr[-1000:]
        results["sweep"].append(row)
        print(json.dumps(row))
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
