#!/usr/bin/env python
"""Multi-host (N>=2 process) GAM-equality artifact (BASELINE config 5
direction; VERDICT r4 missing #3c).

Runs the SAME workload through the pipeline as 1 process and as N
jax.distributed processes over a shared virtual-CPU mesh (reads striped
i %% N, per-process .partI outputs — parallel/multihost.py), then
compares the GAM outputs RECORD-BY-RECORD (byte equality per read after
regrouping the stripes).  Writes MULTIHOST_GAM_r05.json.

Usage: python scripts/multihost_gam_test.py [N]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
N = int(sys.argv[1]) if len(sys.argv) > 1 else 2

CHILD = r"""
import os, sys
sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from graphchainer_tpu.pipeline import PipelineParams, align_reads
gfa, reads, out, pid, npx, coord = sys.argv[1:7]
stats = align_reads(PipelineParams(
    graph_file=gfa, read_files=[reads], out_gam=out,
    num_processes=int(npx), process_id=int(pid), coordinator=coord,
    batch_size=16))
print("STATS", stats.reads, stats.reads_with_an_alignment, flush=True)
"""


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import numpy as np

    import bench
    from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
    from graphchainer_tpu.graph.simulate import generate_path, simulate_reads
    from graphchainer_tpu.io import gam as gam_mod
    from graphchainer_tpu.io.gam_reader import parse_alignment

    out = {"n_processes": N}
    with tempfile.TemporaryDirectory() as td:
        rng = np.random.default_rng(7)
        bg = bench.build_bench_graph(rng, 30_000)
        gfa = os.path.join(td, "g.gfa")
        with open(gfa, "w") as f:
            f.write("H\tVN:Z:1.0\n")
            for name, seq in zip(bg.names, bg.seqs):
                f.write(f"S\t{name}\t{seq}\n")
            for a, ar, b, br, ov in bg.links:
                f.write(f"L\t{bg.names[a]}\t{'-' if ar else '+'}"
                        f"\t{bg.names[b]}\t{'-' if br else '+'}\t{ov}M\n")
        g = build_alignment_graph(bg)
        path_seq, _ = generate_path(g, seed=3)
        reads = simulate_reads(path_seq, 64, 1500, seed=11,
                               error_rate=0.08, len_std=200)
        fa = os.path.join(td, "r.fa")
        with open(fa, "w") as f:
            for name, seq in reads:
                f.write(f">{name}\n{seq}\n")
        child = os.path.join(td, "child.py")
        with open(child, "w") as f:
            f.write(CHILD)
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   XLA_FLAGS=f"--xla_force_host_platform_device_count={N}",
                   PYTHONPATH=REPO)
        coord = "127.0.0.1:45937"

        # single process
        single = os.path.join(td, "single.gam")
        t0 = time.time()
        r = subprocess.run([sys.executable, child, gfa, fa, single, "0",
                            "1", coord], env=env, capture_output=True,
                           text=True, timeout=1500)
        assert r.returncode == 0, r.stderr[-2000:]
        out["single_wall_s"] = round(time.time() - t0, 1)

        # N processes
        multi = os.path.join(td, "multi.gam")
        t0 = time.time()
        procs = [subprocess.Popen(
            [sys.executable, child, gfa, fa, multi, str(p), str(N), coord],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True) for p in range(N)]
        fails = []
        for p, pr in enumerate(procs):
            so, se = pr.communicate(timeout=1500)
            if pr.returncode != 0:
                fails.append((p, se[-1500:]))
        assert not fails, fails
        out["multi_wall_s"] = round(time.time() - t0, 1)

        def by_name(path):
            return {parse_alignment(m).name: m for m in
                    gam_mod.read_gam(path)}
        ref = by_name(single)
        got = {}
        for p in range(N):
            got.update(by_name(f"{multi}.part{p}"))
        out["n_reads"] = len(reads)
        out["single_records"] = len(ref)
        out["multi_records"] = len(got)
        equal = sum(1 for k, v in ref.items() if got.get(k) == v)
        out["records_byte_equal"] = equal
        out["gam_equal"] = (len(ref) == len(got) == equal)

    art = os.path.join(REPO, "MULTIHOST_GAM_r05.json")
    with open(art, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    if not out["gam_equal"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
