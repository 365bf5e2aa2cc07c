#!/usr/bin/env python
"""Per-stage TPU microprofile: separates host prep, upload, device compute,
and download for each kernel in the CLC hot path on the live device.

Usage: python scripts/profile_tpu.py [--reads N] [--batch B]
Prints a JSON report; used to attribute wall time between tunnel RTT,
device compute, and host work (VERDICT r2 next-step #1a).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphchainer_tpu.utils.jaxconfig import setup as _jax_setup
_jax_setup()

import jax


def timeit(fn, n=5):
    """(min_s, mean_s) of fn() over n runs (after one untimed warmup)."""
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), sum(ts) / len(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=64)
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    from bench import build_bench_graph
    from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
    from graphchainer_tpu.graph.mpc import build_mpc
    from graphchainer_tpu.graph.simulate import generate_path, simulate_reads
    from graphchainer_tpu.index.minimizer import build_index
    from graphchainer_tpu.models.chainer import ChainerConfig, ChainerModel

    rng = np.random.default_rng(7)
    g = build_alignment_graph(build_bench_graph(rng, 60_000))
    mpc = build_mpc(g)
    idx = build_index(g, k=15, w=10)
    model = ChainerModel(g, mpc, idx, ChainerConfig())
    path_seq, _ = generate_path(g, seed=3)
    reads = simulate_reads(path_seq, args.batch, 3000, seed=11,
                           error_rate=0.10, len_std=300)

    report = {"platform": jax.default_backend(),
              "n_devices": len(jax.devices())}

    # ---- RTT floor: trivial jit dispatch + download
    one = np.zeros(4, np.int32)
    f = jax.jit(lambda x: x + 1)
    np.asarray(f(one))
    rtt_min, rtt_mean = timeit(lambda: np.asarray(f(one)))
    report["rtt_roundtrip"] = {"min_s": round(rtt_min, 4),
                               "mean_s": round(rtt_mean, 4)}

    # ---- full align_batch wall (serial)
    model.align_batch(reads)   # warmup/compile
    w_min, w_mean = timeit(lambda: model.align_batch(reads), n=3)
    report["align_batch_wall"] = {"min_s": round(w_min, 3),
                                  "mean_s": round(w_mean, 3),
                                  "reads": args.batch}

    # ---- stage decomposition on one batch
    from graphchainer_tpu.align.anchors import assemble_batch_cols
    from graphchainer_tpu.utils.seq import match_masks
    t0 = time.perf_counter()
    jobs, frags, _ = model._fragment_jobs_cols(reads)
    t_seed = time.perf_counter() - t0
    read_mm_cat = match_masks("".join(s for _, s in reads))
    read_base = np.zeros(len(reads) + 1, dtype=np.int64)
    np.cumsum([len(s) for _, s in reads], out=read_base[1:])
    t0 = time.perf_counter()
    band = assemble_batch_cols(model.gx, jobs, read_mm_cat, read_base,
                               B=model.cfg.band_slots,
                               max_in=model.cfg.max_in,
                               slack=model.cfg.band_slack)
    t_band = time.perf_counter() - t0
    report["host_prep"] = {"seed_window_s": round(t_seed, 4),
                           "band_build_s": round(t_band, 4),
                           "n_jobs": int(len(jobs))}

    # ---- frag kernel: full run_fragments (upload+compute+download)
    from graphchainer_tpu.align import anchors as anchors_mod
    (band_nodes, band_nodes_cat, band_in, seed_shift, req, rows, S,
     band_level) = band
    def frag_full():
        anchors_mod.run_fragments(model.gx, band_nodes_cat, band_in,
                                  seed_shift, req, rows, S,
                                  model.cfg.max_in, band_level=band_level,
                                  want_walk=True)
    fr_min, fr_mean = timeit(frag_full, n=3)
    report["frag_full"] = {"min_s": round(fr_min, 3),
                           "mean_s": round(fr_mean, 3)}
    frag_cells = int(rows.astype(np.int64).sum()) * band_nodes_cat.shape[1]
    report["frag_full"]["dp_cells"] = frag_cells
    report["frag_full"]["cells_per_s_incl_rtt"] = round(frag_cells / fr_min)

    # ---- polish kernel: align once to get real paths, then time the
    # batched polish device call (the largest DP-cell consumer: ~97% of
    # all cells at bw=8)
    from graphchainer_tpu.align import polish as polish_mod
    alns = model.align_batch(reads)
    p_reads, p_paths = [], []
    for (nm, sq), a in zip(reads, alns):
        if not a.failed and len(a.positions):
            p_reads.append(sq)
            p_paths.append(model.gx.positions_seq(a.positions))
    p_min, p_mean = timeit(
        lambda: polish_mod.polish_batch(p_reads, p_paths,
                                        bw=model.cfg.polish_band_words),
        n=3)
    pol_cells = sum(len(p) for p in p_paths) \
        * model.cfg.polish_band_words * 32
    report["polish_full"] = {"min_s": round(p_min, 3),
                             "mean_s": round(p_mean, 3),
                             "n_reads": len(p_reads),
                             "dp_cells": pol_cells,
                             "cells_per_s_incl_rtt": round(pol_cells
                                                           / p_min)}

    # ---- binding-constraint verdict (VERDICT r4 next-round #9): compare
    # each stage's wall against the dispatch RTT floor.  On the tunneled
    # dev TPU a kernel call whose wall ~= a trivial jit round trip is
    # DISPATCH-bound — raising dp_cells_per_s means fewer/bigger calls,
    # not faster kernels; on an untunneled TPU the same design is simply
    # HBM-resident with microsecond dispatch.
    rtt = rtt_min
    report["binding_constraint"] = {
        "rtt_floor_s": round(rtt, 4),
        "frag_call_over_rtt": round(fr_min / max(rtt, 1e-9), 1),
        "polish_call_over_rtt": round(p_min / max(rtt, 1e-9), 1),
        "verdict": ("dispatch/RTT-bound" if fr_min < 4 * rtt
                    else "device-compute-bound"),
    }

    print(json.dumps(report, indent=1))
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROFILE_r05.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
