#!/usr/bin/env python
"""Benchmark: reads/s/chip aligning simulated long reads to a synthetic
variation graph (chr-like backbone with SNP/indel bubbles).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "reads/s/chip", "vs_baseline": N}

Protocol (mirrors BASELINE.md): pbsim-like reads, length ~N(3000, 750),
10% error (sub/ins/del evenly), aligned with default CLC parameters
(split-len 35, split-gap 35, colinear-gap 10000).

Baseline: MEASURED from the reference binary (built offline via
scripts/refbuild/build_reference.sh) on the IDENTICAL workload — same
graph, same simulated reads, same seeds — single-threaded on this host's
CPU; the number and full provenance live in BASELINE_MEASURED.json
(regenerate with scripts/bench_reference.py).  Falls back to the round-1
documented estimate of 1.0 reads/s if the file is missing.

Both sides of the comparison are measured at STEADY STATE: the reference
baseline in BASELINE_MEASURED.json excludes binary build and index
construction, and this side warms every compiled shape bucket with one
full untimed pass before the timed passes (detail reports
warmup_compile_s and both pass walls).

Env knobs: BENCH_READS (default 960; the baseline is re-measured on the
same 960-read workload), BENCH_READ_LEN (3000), BENCH_GRAPH_BP (60000),
BENCH_BATCH (128), BENCH_WORKERS (in-flight batches; default: available
cores+2, clamped to 4..8), BENCH_PLATFORM (default: let JAX pick, i.e.
the TPU).

NOTE: an explicit BENCH_PLATFORM runs the benchmark IN-PROCESS and so
bypasses both the TPU-responsiveness probe and the BENCH_TPU_DEADLINE
guard child — a mid-run tunnel death will hang that path.  It is meant
for deliberate overrides (BENCH_PLATFORM=cpu, or =tpu when debugging the
device path interactively); the default path is the guarded one.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

def _tpu_responsive(timeout_s: int = 150) -> bool:
    """Probe the (tunneled) TPU in a SUBPROCESS: a hung tunnel blocks
    jax.devices() forever and cannot be interrupted in-process.  The
    dev tunnel has been observed to die for hours; falling back to CPU
    (clearly labeled) beats hanging the whole benchmark run."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); "
             "import jax.numpy as jnp; "
             "print(float(jnp.ones((2, 2)).sum()), d[0].platform)"],
            capture_output=True, text=True, timeout=timeout_s)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


PLATFORM = os.environ.get("BENCH_PLATFORM")
_fallback = False


def _result_line(text: str | None) -> str | None:
    """The complete result-JSON line in `text`, if any."""
    for line in (text or "").splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                if "metric" in json.loads(line):
                    return line
            except json.JSONDecodeError:
                pass
    return None


def _run_with_deadline() -> bool:
    """Run the whole benchmark in a child process under a hard deadline.

    The startup probe only covers a tunnel that is dead at LAUNCH; the
    dev tunnel has also died MID-RUN, and a hung device call blocks
    uninterruptibly in-process, so the only robust guard is a process
    boundary.  Child stdout is captured and forwarded only as the single
    result JSON line — if the child produced a complete result before
    dying (e.g. a teardown hang after printing), that result is used and
    the CPU re-run skipped, preserving the one-JSON-line contract.
    Returns True when a result line was printed; False means the caller
    should re-run on CPU."""
    import subprocess
    deadline = float(os.environ.get("BENCH_TPU_DEADLINE", 2400))
    # the parent already probed the TPU; tell the child to skip the probe
    env = dict(os.environ, BENCH_CHILD="1", BENCH_TPU_OK="1")
    out = None
    try:
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           timeout=deadline, env=env,
                           stdout=subprocess.PIPE, text=True)
        out = r.stdout
        if r.returncode != 0:
            print(f"WARNING: benchmark child exited rc={r.returncode} "
                  "on the TPU path", file=sys.stderr)
    except subprocess.TimeoutExpired as e:
        out = e.stdout
        if isinstance(out, bytes):
            out = out.decode("utf-8", "replace")
        print("WARNING: benchmark exceeded BENCH_TPU_DEADLINE "
              f"({deadline:.0f}s) on the TPU path (tunnel died "
              "mid-run?)", file=sys.stderr)
    line = _result_line(out)
    if line:
        print(line)
        return True
    print("WARNING: no result from the TPU child; re-running on CPU",
          file=sys.stderr)
    return False


def _init_platform():
    """Pick the benchmark platform (import-time side effects kept out of
    module import so scripts can reuse the graph builder)."""
    global PLATFORM, _fallback
    if (not PLATFORM and not os.environ.get("BENCH_TPU_OK")
            and not _tpu_responsive()):
        print("WARNING: TPU unresponsive (tunnel down?); benchmarking on "
              "CPU — reads/s is NOT a TPU measurement", file=sys.stderr)
        PLATFORM = "cpu"
        _fallback = True
    if PLATFORM == "cpu":
        # route through the env var (not just jax.config) so jaxconfig's
        # cache fingerprint folds in the live XLA:CPU LLVM feature
        # string — without it the CPU fallback reuses a pre-migration
        # host's AOT executables (`+prefer-no-scatter ... could lead to
        # SIGILL` cpu_aot_loader errors, the r2 test-gate crash class)
        os.environ["JAX_PLATFORMS"] = "cpu"
    from graphchainer_tpu.utils.jaxconfig import setup as _jax_setup
    _jax_setup()
    if PLATFORM:
        import jax
        jax.config.update("jax_platforms", PLATFORM)

def load_baseline():
    """(reads_per_s, provenance): measured reference-binary number when
    BASELINE_MEASURED.json exists (see module docstring), else the
    documented 1.0 reads/s estimate."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    if os.path.exists(path):
        with open(path) as f:
            d = json.load(f)
        return float(d["reads_per_s"]), {
            "source": "measured reference binary (single-thread CPU, "
                      "identical workload)",
            "wall_s": d.get("wall_s"), "threads": d.get("threads"),
            "host": d.get("host")}
    return 1.0, {"source": "documented estimate (reference binary not "
                           "measured on this host)"}


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
    global PLATFORM, _fallback
    if not os.environ.get("BENCH_CHILD") and not PLATFORM:
        # probe in the parent: a dead-at-startup tunnel goes straight to
        # CPU (no deadline child, no duplicate probe, no double run)
        if not _tpu_responsive():
            print("WARNING: TPU unresponsive (tunnel down?); benchmarking "
                  "on CPU — reads/s is NOT a TPU measurement",
                  file=sys.stderr)
            PLATFORM = "cpu"
            _fallback = True
        else:
            if _run_with_deadline():
                return
            PLATFORM = "cpu"
            _fallback = True
    _init_platform()
    n_reads = int(os.environ.get("BENCH_READS", 960))
    read_len = int(os.environ.get("BENCH_READ_LEN", 3000))
    graph_bp = int(os.environ.get("BENCH_GRAPH_BP", 60_000))
    batch = int(os.environ.get("BENCH_BATCH", 128))

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

    cfg = ChainerConfig()
    if os.environ.get("BENCH_POLISH_BW"):
        cfg.polish_band_words = int(os.environ["BENCH_POLISH_BW"])
    model = ChainerModel(g, mpc, idx, cfg)
    path_seq, _ = generate_path(g, seed=3)
    # modest length spread keeps the padded kernel shapes in one bucket
    reads = simulate_reads(path_seq, n_reads, read_len, seed=11,
                           error_rate=0.10, len_std=read_len // 10)
    chunks = [reads[lo:lo + batch] for lo in range(0, len(reads), batch)]

    from concurrent.futures import ThreadPoolExecutor
    from graphchainer_tpu.utils import timers
    # default in-flight batches: cores+2 (bounded 4..8) — the extra two
    # workers overlap device-blocked polish/frag dispatch with host
    # stages; measured on a 4-core host: 4 -> 479 reads/s, 6 -> 516,
    # 8 -> 472 (contention).  sched_getaffinity counts only the cores
    # this process may use (cgroup/affinity limits on shared VMs).
    try:
        ncores = len(os.sched_getaffinity(0))
    except (AttributeError, OSError):
        ncores = os.cpu_count() or 4
    workers = int(os.environ.get("BENCH_WORKERS",
                                 max(4, min(8, ncores + 2))))

    def one_pass(pool):
        aligned = 0
        scores = []
        total_bp = 0
        for chunk, alns in zip(chunks, pool.map(model.align_batch,
                                                chunks)):
            for (name, seq), a in zip(chunk, alns):
                total_bp += len(seq)
                if not a.failed:
                    aligned += 1
                    scores.append(a.score / max(len(seq), 1))
        return aligned, scores, total_bp

    # warmup: ONE full untimed pass compiles every padded shape bucket
    # the workload touches (per-batch fragment/dedup/chunk counts cross
    # pow2 buckets; a single-batch warmup left stragglers that landed
    # tens of compile-seconds inside the timed region).  The measured
    # number is STEADY-STATE throughput — the same protocol as the
    # reference baseline, whose 192 reads/s excludes binary build and
    # index construction.
    tw = time.time()
    with ThreadPoolExecutor(max_workers=workers) as pool:
        one_pass(pool)
    warmup_s = time.time() - tw

    # two timed passes; keep the faster (the tunneled dev TPU has
    # multi-second scheduling stalls that would otherwise dominate a
    # single 2-3s measurement window)
    walls = []
    aligned = 0
    scores = []
    total_bp = 0
    for _ in range(2):
        timers.reset()   # stage report covers the last pass only
        t1 = time.time()
        with ThreadPoolExecutor(max_workers=workers) as pool:
            aligned, scores, total_bp = one_pass(pool)
        walls.append(time.time() - t1)
    dt = min(walls)
    n_timed = len(reads)
    reads_per_s = n_timed / dt
    baseline, baseline_prov = load_baseline()

    if os.environ.get("BENCH_VERBOSE"):
        timers.report(out=sys.stderr)
        timers.report_counters(out=sys.stderr)

    # per-stage wall (thread-summed) + DP-cell counters for the JSON
    stages = {k: round(v[0], 3) for k, v in timers.snapshot().items()}
    cells = timers.counters()
    total_cells = sum(v for k, v in cells.items() if k.startswith("cells"))
    # device-side blocking time (dispatch->download of kernel results,
    # i.e. device compute + tunnel RTT; the rest of wall is host work)
    dev_s = sum(v for k, v in stages.items() if k.endswith("_device"))
    from graphchainer_tpu.ops.frag_align import pallas_frag_active
    result = {
        "metric": f"reads/s/chip ({read_len}bp 10%-err reads vs "
                  f"{graph_bp}bp synthetic variation graph, default CLC "
                  "params)",
        "value": round(reads_per_s, 3),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_s / baseline, 3),
        "detail": {
            "platform": ("cpu-fallback (TPU unresponsive or hung mid-run)"
                         if _fallback else (PLATFORM or "tpu")),
            "baseline_reads_per_s": baseline,
            "baseline_provenance": baseline_prov,
            "n_reads": n_timed,
            "aligned_fraction": round(aligned / max(n_timed, 1), 4),
            "mean_norm_edit_distance": round(float(np.mean(scores)), 4)
            if scores else None,
            "wall_s": round(dt, 3),
            "pass_walls_s": [round(w, 3) for w in walls],
            "bp_per_s": round(total_bp / dt, 1),
            "index_build_s": round(t_index, 2),
            "warmup_compile_s": round(warmup_s, 2),
            "batch": batch,
            "workers": workers,
            "stage_s_threadsum": stages,
            "dp_cells": cells,
            "dp_cells_per_s": round(total_cells / walls[-1], 1),
            "device_blocked_s_threadsum": round(dev_s, 3),
            "pallas_frag_active": pallas_frag_active(),
            "graph": g.stats(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
