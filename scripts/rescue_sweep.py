#!/usr/bin/env python
"""Rescue-threshold sweep (VERDICT r2 #10): ground the CLC rescue default
in measurements on BOTH a benign bench-shaped graph and the adversarial
dense tangle graph, instead of benign-graph-only tuning.

For each threshold: total edit distance, how many reads triggered the
GA-baseline rescue (the cost), and the always-compare / no-rescue
endpoints.  Writes RESCUE_SWEEP.json at the repo root.

Run: JAX_PLATFORMS=cpu python scripts/rescue_sweep.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from graphchainer_tpu.utils.jaxconfig import setup as _jax_setup
_jax_setup()


def workload_benign(rng):
    import bench
    from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
    from graphchainer_tpu.graph.simulate import generate_path, simulate_reads
    g = build_alignment_graph(bench.build_bench_graph(rng, 60_000))
    path_seq, _ = generate_path(g, seed=3)
    reads = simulate_reads(path_seq, 96, 1500, seed=11, error_rate=0.10,
                           len_std=150)
    return g, reads


def workload_dense(rng):
    from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
    from graphchainer_tpu.graph.simulate import tangle_bigraph
    from tests.test_e2e import simulate
    g = build_alignment_graph(tangle_bigraph(rng, n_knots=10, arms=8,
                                             spacer=40, arm_len=8))
    reads = []
    for i in range(32):
        read, _ = simulate(rng, g, err=0.1, min_len=300)
        reads.append((f"d{i}", read))
    return g, reads


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from graphchainer_tpu.graph.mpc import build_mpc
    from graphchainer_tpu.index.minimizer import build_index
    from graphchainer_tpu.models.chainer import ChainerConfig, ChainerModel
    from graphchainer_tpu.utils import timers

    out = {"thresholds": {}, "note":
           "rescue fires when polished norm-ED > threshold; "
           "auto_compare_dense handles dense graphs separately "
           "(always-compare, the reference's own behaviour) so the "
           "threshold only governs benign graphs"}
    rng = np.random.default_rng(5)
    gs = {}
    gs["benign"] = workload_benign(np.random.default_rng(7))
    gs["dense"] = workload_dense(rng)
    models = {}
    for wname, (g, reads) in gs.items():
        mpc = build_mpc(g)
        idx = build_index(g, k=13 if wname == "dense" else 15,
                          w=6 if wname == "dense" else 10)
        models[wname] = (g, mpc, idx, reads)

    rows = []
    for thr in (0.0, 0.05, 0.1, 0.15, 0.2, 0.25, 0.35, 0.5, -1.0):
        row = {"threshold": ("always-compare" if thr < 0 else thr)}
        for wname, (g, mpc, idx, reads) in models.items():
            cfg = ChainerConfig(
                polish_band_words=4,
                rescue_threshold=(0.35 if thr < 0 else thr),
                compare_with_baseline=(thr < 0),
                auto_compare_dense=False, escalate_band=0)
            model = ChainerModel(g, mpc, idx, cfg)
            timers.reset()
            t0 = time.time()
            alns = model.align_batch(reads)
            wall = time.time() - t0
            st = timers.snapshot()
            rescued = int(st.get("rescue", (0, 0))[1])
            tot = sum(a.score if not a.failed else len(a.seq)
                      for a in alns)
            row[wname] = {"total_ed": int(tot), "rescued_reads": rescued,
                          "wall_s": round(wall, 2)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    out["thresholds"] = rows
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "RESCUE_SWEEP.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
