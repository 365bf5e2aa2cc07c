#!/usr/bin/env python
"""Generate the pinned 100-read golden set (VERDICT r2 #6).

Runs the REAL reference binary (built by scripts/refbuild/
build_reference.sh) on a deterministic 100-read workload over the
bench-shaped variation graph and pins its per-read edit distances into
tests/data/golden100.json.  tests/test_parity.py::test_golden100 then
regenerates the identical workload (same seeds, no data files needed)
and requires our per-read edit distance to match or beat the pinned
reference number on >=95% of reads, with no drop in aligned count.

Workload: 88 reads ~1500bp at 8% error + 6 error-free reads + 6 hard
reads at 15% error, over a 30kbp bench-shaped graph (seeds pinned
below; bench.build_bench_graph(rng(31), 30000) like the live
head-to-head test).

Run: JAX_PLATFORMS=cpu python scripts/make_golden100.py
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

REF_BIN = os.environ.get("REF_BIN", "/tmp/refbuild/bin/GraphChainer")
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "data", "golden100.json")


def build_workload(tmpdir: str):
    """Deterministic graph + reads; MUST stay in lockstep with
    tests/test_parity.py::_golden100_workload."""
    import bench
    from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
    from graphchainer_tpu.graph.simulate import generate_path, simulate_reads
    from graphchainer_tpu.io.gfa import load_gfa

    rng = np.random.default_rng(31)
    bg = bench.build_bench_graph(rng, 30_000)
    gfa = os.path.join(tmpdir, "golden.gfa")
    with open(gfa, "w") as f:
        f.write("H\tVN:Z:1.0\n")
        for name, seq in zip(bg.names, bg.seqs):
            f.write(f"S\t{name}\t{seq}\n")
        for a, ar, b, br, ov in bg.links:
            f.write(f"L\t{bg.names[a]}\t{'-' if ar else '+'}"
                    f"\t{bg.names[b]}\t{'-' if br else '+'}\t{ov}M\n")
    g = build_alignment_graph(load_gfa(gfa))
    path_seq, _ = generate_path(g, seed=3)
    reads = simulate_reads(path_seq, 88, 1500, seed=11, error_rate=0.08,
                           len_std=150)
    clean_rng = np.random.default_rng(77)
    for i in range(6):
        a = int(clean_rng.integers(0, len(path_seq) - 1200))
        reads.append((f"clean{i}", path_seq[a:a + 1200]))
    reads += simulate_reads(path_seq, 6, 1500, seed=13, error_rate=0.15,
                            len_std=150)
    # simulate_reads names overlap between the two batches: disambiguate
    seen = {}
    uniq = []
    for name, seq in reads:
        if name in seen:
            name = f"{name}_hard"
        seen[name] = True
        uniq.append((name, seq))
    return gfa, g, uniq


def main():
    if not os.path.exists(REF_BIN):
        sys.exit(f"reference binary missing: {REF_BIN} "
                 "(scripts/refbuild/build_reference.sh)")
    import tempfile

    from graphchainer_tpu.io.gam_reader import load_gam_alignments
    from tests.test_polish import nw_edit_distance

    with tempfile.TemporaryDirectory() as td:
        gfa, g, reads = build_workload(td)
        fa = os.path.join(td, "r.fa")
        with open(fa, "w") as f:
            for name, seq in reads:
                f.write(f">{name}\n{seq}\n")
        ref_gam = os.path.join(td, "ref.gam")
        r = subprocess.run([REF_BIN, "-g", gfa, "-f", fa, "-a", ref_gam,
                            "-t", "1"], capture_output=True, text=True,
                           timeout=1200)
        if r.returncode != 0:
            sys.exit(f"reference binary failed:\n{r.stderr[-2000:]}")

        name_ids = {n: i for i, n in enumerate(g.names)}
        ref = {}
        for a in load_gam_alignments(ref_gam):
            pathseq = []
            for m in a.mappings:
                d = name_ids[m.node_name] * 2 + (1 if m.is_reverse else 0)
                s = g.di_seqs[d]
                ln = sum(e.get("from_length", 0) for e in m.edits)
                pathseq.append(s[m.offset:m.offset + ln])
            ref[a.name] = nw_edit_distance(a.sequence, "".join(pathseq))

    rows = {name: {"len": len(seq), "ref_ed": ref.get(name)}
            for name, seq in reads}
    aligned = sum(1 for v in rows.values() if v["ref_ed"] is not None)
    golden = {
        "provenance": {
            "binary": "reference GraphChainer built from /root/reference "
                      "by scripts/refbuild/build_reference.sh, -t 1, "
                      "default params",
            "workload": "make_golden100.py build_workload (seeds 31/3/"
                        "11/77/13, 30kbp bench graph, 100 reads)",
        },
        "n_reads": len(reads),
        "ref_aligned": aligned,
        "reads": rows,
    }
    with open(OUT, "w") as f:
        json.dump(golden, f, indent=1, sort_keys=True)
    eds = [v["ref_ed"] for v in rows.values() if v["ref_ed"] is not None]
    print(f"wrote {OUT}: {aligned}/{len(reads)} aligned, "
          f"mean ref ED {np.mean(eds):.1f}")


if __name__ == "__main__":
    main()
