"""Multi-host execution: 2 jax.distributed processes over a shared CPU
mesh must reproduce the single-process pipeline output exactly
(parallel/multihost.py; SURVEY §5 distributed comms backend)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

CHILD = r"""
import os, sys
sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")
import jax
jax.config.update("jax_platforms", "cpu")
from graphchainer_tpu.pipeline import PipelineParams, align_reads
gfa, reads, out, pid, npx, coord = sys.argv[1:7]
stats = align_reads(PipelineParams(
    graph_file=gfa, read_files=[reads], out_gaf=out,
    num_processes=int(npx), process_id=int(pid), coordinator=coord,
    batch_size=4))
print("STATS", stats.reads, stats.reads_with_an_alignment, flush=True)
"""


@pytest.mark.timeout(600)
def test_two_process_pipeline_matches_single(tmp_path, rng):
    # toy graph + reads
    segs = ["".join(rng.choice(list("ACGT"), 300)) for _ in range(4)]
    gfa = tmp_path / "g.gfa"
    with open(gfa, "w") as f:
        for i, s in enumerate(segs):
            f.write(f"S\t{i + 1}\t{s}\n")
        for i in range(3):
            f.write(f"L\t{i + 1}\t+\t{i + 2}\t+\t0M\n")
    path = "".join(segs)
    reads = tmp_path / "r.fa"
    with open(reads, "w") as f:
        for i in range(10):
            a = int(rng.integers(0, 500))
            rd = list(path[a:a + 500])
            for p in rng.choice(len(rd), 25, replace=False):
                rd[p] = rng.choice(list("ACGT"))
            f.write(f">r{i}\n{''.join(rd)}\n")

    child = tmp_path / "child.py"
    child.write_text(CHILD)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=2")
    env.pop("JAX_NUM_PROCESSES", None)
    coord = "127.0.0.1:45931"

    # single-process reference
    ref = tmp_path / "single.gaf"
    r = subprocess.run(
        [sys.executable, str(child), str(gfa), str(reads), str(ref),
         "0", "1", coord], env=env, capture_output=True, text=True,
        cwd="/root/repo", timeout=560)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "STATS 10 10" in r.stdout

    # two processes sharing a global mesh
    outs = [tmp_path / "two.gaf"] * 2
    p0 = subprocess.Popen(
        [sys.executable, str(child), str(gfa), str(reads), str(outs[0]),
         "0", "2", coord], env=env, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True, cwd="/root/repo")
    p1 = subprocess.Popen(
        [sys.executable, str(child), str(gfa), str(reads), str(outs[1]),
         "1", "2", coord], env=env, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True, cwd="/root/repo")
    o0, e0 = p0.communicate(timeout=560)
    o1, e1 = p1.communicate(timeout=560)
    assert p0.returncode == 0, e0[-2000:]
    assert p1.returncode == 0, e1[-2000:]
    # global psum'd stats identical on both processes
    assert "STATS 10 10" in o0, o0
    assert "STATS 10 10" in o1, o1

    def gaf_lines(path):
        with open(path) as f:
            return sorted(line.split("\t")[0:12] and line for line in f)

    merged = sorted(
        sum((open(f"{outs[0]}.part{i}").readlines() for i in range(2)),
            []))
    single = sorted(open(ref).readlines())
    assert merged == single
