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


def run_reference(bg, reads, binary, threads=1):
    """Run the reference binary on the same graph + reads; returns a dict
    with its align-only throughput.  The reference prints per-phase
    stderr timestamps; we time the whole run and subtract its index-build
    phases by timing a 1-read run (graph load + MPC + seeder dominate it),
    mirroring how bench.py excludes warmup/index on our side."""
    import subprocess
    import tempfile
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_reference import write_gfa
    out = {"binary": binary, "threads": threads}
    with tempfile.TemporaryDirectory() as td:
        gfa = os.path.join(td, "g.gfa")
        write_gfa(bg, gfa)
        fa1 = os.path.join(td, "one.fa")
        with open(fa1, "w") as f:
            f.write(f">{reads[0][0]}\n{reads[0][1]}\n")
        fa = os.path.join(td, "reads.fa")
        with open(fa, "w") as f:
            for name, seq in reads:
                f.write(f">{name}\n{seq}\n")
        # 1-read run: startup (graph + MPC + minimizer build) + 1 read
        t0 = time.time()
        r1 = subprocess.run([binary, "-g", gfa, "-f", fa1, "-a",
                             os.path.join(td, "o1.gam"), "-t", str(threads)],
                            capture_output=True, text=True)
        t_startup = time.time() - t0
        if r1.returncode != 0:
            out["error"] = (r1.stdout + r1.stderr)[-500:]
            return out
        t0 = time.time()
        r2 = subprocess.run([binary, "-g", gfa, "-f", fa, "-a",
                             os.path.join(td, "o.gam"), "-t", str(threads)],
                            capture_output=True, text=True)
        t_full = time.time() - t0
        if r2.returncode != 0:
            out["error"] = (r2.stdout + r2.stderr)[-500:]
            return out
        out["startup_s"] = round(t_startup, 1)
        out["full_wall_s"] = round(t_full, 1)
        align_s = max(t_full - t_startup, 1e-3)
        out["align_s"] = round(align_s, 1)
        out["n_reads"] = len(reads)
        out["reads_per_s"] = round(len(reads) / align_s, 3)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=192)
    ap.add_argument("--read-len", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--error-rate", type=float, default=0.10)
    ap.add_argument("--workers", type=int,
                    default=0, help="in-flight batches (0 = cores+2, "
                                    "clamped 4..8, like bench.py)")
    ap.add_argument("--ref-binary", default=None,
                    help="reference GraphChainer binary: also measure it "
                         "on the same graph + reads (single thread) and "
                         "report vs_baseline_at_scale")
    ap.add_argument("--ref-reads", type=int, default=0,
                    help="reference read subsample (0 = all --reads)")
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
    if not args.workers:
        try:
            ncores = len(os.sched_getaffinity(0))
        except (AttributeError, OSError):
            ncores = os.cpu_count() or 4
        args.workers = max(4, min(8, ncores + 2))
    out["workers"] = args.workers

    # warmup: one full untimed pass compiles every padded shape bucket
    # (same steady-state protocol as bench.py)
    t = time.time()
    with ThreadPoolExecutor(max_workers=args.workers) as pool:
        list(pool.map(model.align_batch, chunks))
    out["warmup_s"] = round(time.time() - t, 1)

    from graphchainer_tpu.utils import timers
    # two timed passes, keep the faster (same protocol as bench.py: the
    # tunneled dev TPU has multi-second scheduling stalls)
    walls = []
    for _ in range(2):
        timers.reset()      # stage report covers the last pass only
        t = time.time()
        aligned = 0
        scores = []
        with ThreadPoolExecutor(max_workers=args.workers) as pool:
            for chunk, alns in zip(chunks,
                                   pool.map(model.align_batch, chunks)):
                for (name, seq), a in zip(chunk, alns):
                    if not a.failed:
                        aligned += 1
                        scores.append(a.score / max(len(seq), 1))
        walls.append(time.time() - t)
    dt = min(walls)
    out["pass_walls_s"] = [round(w, 1) for w in walls]
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

    if args.ref_binary and os.path.exists(args.ref_binary):
        nref = args.ref_reads or len(reads)
        ref = run_reference(bg, reads[:nref], args.ref_binary)
        out["reference"] = ref
        if "reads_per_s" in ref:
            out["vs_baseline_at_scale"] = round(
                out["reads_per_s"] / ref["reads_per_s"], 3)
    elif args.ref_binary:
        out["reference"] = {"error": f"binary not found: {args.ref_binary}"}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
