#!/usr/bin/env python
"""Weak-scaling measurement of the device compute path over a virtual
CPU mesh: the same per-device fragment/chain/polish load is run on 1
device and on N devices (N x total work), and efficiency =
t_1 / t_N (1.0 = perfect weak scaling).

NOTE on interpretation: with XLA's virtual CPU devices all "devices"
share the host cores, so this measures the SPMD sharding/collective
overhead of the production kernels, not real multi-chip speedup — the
honest scaling number until >1 real TPU chip is available.  Run with
  python scripts/scaling_test.py [N]
(forces JAX_PLATFORMS=cpu with N virtual devices; default 8).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8


def run_child(ndev: int) -> dict:
    env = {**os.environ,
           "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": (os.environ.get("XLA_FLAGS", "")
                         + f" --xla_force_host_platform_device_count={ndev}"
                         ).strip(),
           "SCALING_CHILD": "1",
           "SCALING_NDEV": str(ndev)}
    r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                       capture_output=True, text=True, env=env,
                       timeout=1800)
    if r.returncode != 0:
        sys.exit(f"child ndev={ndev} failed:\n{r.stderr[-2000:]}")
    return json.loads(r.stdout.strip().splitlines()[-1])


def child():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import numpy as np

    import jax
    jax.config.update("jax_platforms", "cpu")
    # fingerprinted cache dir (utils/jaxconfig): a raw ~/.cache/jax here
    # wrote host-specific XLA:CPU AOT entries that a migrated VM then
    # loaded with mismatched target features (the r2 SIGILL class)
    from graphchainer_tpu.utils.jaxconfig import cache_dir
    jax.config.update("jax_compilation_cache_dir", cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    ndev = len(jax.devices())
    assert ndev == int(os.environ["SCALING_NDEV"])

    import bench
    from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
    from graphchainer_tpu.graph.mpc import build_mpc
    from graphchainer_tpu.graph.simulate import generate_path, simulate_reads
    from graphchainer_tpu.index.minimizer import build_index
    from graphchainer_tpu.models.chainer import ChainerConfig, ChainerModel

    rng = np.random.default_rng(7)
    g = build_alignment_graph(bench.build_bench_graph(rng, 60_000))
    mpc = build_mpc(g)
    idx = build_index(g, k=15, w=10)
    model = ChainerModel(g, mpc, idx, ChainerConfig())
    path_seq, _ = generate_path(g, seed=3)
    # weak scaling: per-device read count is fixed
    per_dev = 16
    n_reads = per_dev * ndev
    reads = simulate_reads(path_seq, n_reads + n_reads, 3000, seed=11,
                           error_rate=0.10, len_std=300)
    # warm with the SAME batch so the timed run hits zero compiles
    # (shape buckets depend on the batch's job counts)
    model.align_batch(reads[:n_reads])
    model.align_batch(reads[n_reads:])
    from graphchainer_tpu.utils import timers
    # best of 3 timed passes (shared-core virtual devices are noisy)
    dt = float("inf")
    for _ in range(3):
        timers.reset()
        t0 = time.time()
        alns = model.align_batch(reads[n_reads:])
        cur = time.time() - t0
        if cur < dt:
            dt = cur
            best = {k: round(v[0], 3) for k, v in timers.snapshot().items()}
    ok = sum(0 if a.failed else 1 for a in alns)
    # per-stage attribution: device-dispatch stages (frag_kernel,
    # chain_scan, polish) shard over the mesh; the rest is single-thread
    # host Python whose cost grows with TOTAL reads and bounds weak
    # scaling on shared-core virtual devices
    stages = best
    print(json.dumps({"ndev": ndev, "reads": n_reads, "wall_s": dt,
                      "aligned": ok, "stages": stages}))


def main():
    import multiprocessing
    one = run_child(1)
    many = run_child(N)
    eff = one["wall_s"] / many["wall_s"]
    # attribution (VERDICT r2 weak #6): which stages grew with N x total
    # work?  device stages (frag_kernel/chain_scan/polish) shard over the
    # mesh; host stages are single-thread Python that scales with TOTAL
    # reads and shares cores with the N virtual devices.
    host_stages = ("seed+window", "band_build", "stitch", "repair_scan")
    s1, sN = one.get("stages", {}), many.get("stages", {})
    host_1 = sum(v for k, v in s1.items() if k in host_stages)
    host_N = sum(v for k, v in sN.items() if k in host_stages)
    dev_1 = sum(v for k, v in s1.items() if k not in host_stages)
    dev_N = sum(v for k, v in sN.items() if k not in host_stages)
    # the hardware floor on shared-core virtual devices: N devices' worth
    # of compute must serialize onto `cores` physical cores, so even a
    # ZERO-overhead SPMD program cannot beat dev_1 * N / cores + host_N.
    # efficiency_vs_core_floor ~ 1.0 means the measured wall sits at that
    # floor — i.e. the sharding/collective overhead is nil and the
    # headline efficiency number is purely core oversubscription.
    cores = multiprocessing.cpu_count()
    core_floor = dev_1 * N / cores + host_N
    out = {
        "n_devices": N,
        "weak_scaling_efficiency": round(eff, 3),
        "t_1dev_s": round(one["wall_s"], 2),
        f"t_{N}dev_s": round(many["wall_s"], 2),
        "core_floor_s": round(core_floor, 2),
        "efficiency_vs_core_floor": round(
            min(core_floor / many["wall_s"], 1.0), 3),
        "host_python_share_at_N": round(host_N / many["wall_s"], 3),
        "per_dev_reads": one["reads"],
        "host_cores": cores,
        "attribution": {
            "host_python_s_1dev": round(host_1, 2),
            f"host_python_s_{N}dev": round(host_N, 2),
            "device_path_s_1dev": round(dev_1, 2),
            f"device_path_s_{N}dev": round(dev_N, 2),
            "stages_1dev": s1,
            f"stages_{N}dev": sN,
        },
        "note": "virtual CPU devices share host cores: this bounds SPMD "
                "sharding overhead, not real multi-chip speedup; the "
                "host_python stages process N x total reads on one "
                "thread, so their growth is the expected weak-scaling "
                "bound in this environment",
    }
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SCALING.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    if os.environ.get("SCALING_CHILD"):
        child()
    else:
        main()
