#!/usr/bin/env python
"""Accuracy-oracle harness: per-read edit distance between each read and
its alignment's path sequence, from any GAM (ours or the reference
binary's).

Port of the reference's evaluation oracle (scripts/summary.py:19-34,
80-91,170-186): the path sequence is the concatenation of FULL node
sequences of the mappings (offsets ignored, revcomp on is_reverse), and
the accuracy metric is global edit distance read <-> path sequence.
Nodes are resolved by Position.name when set (the reference binary always
sets it) and by numeric node_id otherwise.

Usage:
  python scripts/summary_harness.py GRAPH.gfa READS.{fa,fq}[.gz] \
      out.csv LABEL1=FILE1.gam [LABEL2=FILE2.gam ...]

Writes a CSV with one row per read: name, length, then per label:
pathcnt, path_bps, revcnt, global_ed, align_rate.  Prints summary means.
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphchainer_tpu.utils.jaxconfig import setup as _jax_setup
_jax_setup()

COMP = str.maketrans("ACGTacgt", "TGCAtgca")


def revc(s: str) -> str:
    return s.translate(COMP)[::-1]


def load_gfa_segments(path: str):
    """name -> sequence (S lines only, like summary.py LoadGfaGraph)."""
    import gzip
    op = gzip.open if path.endswith(".gz") else open
    seqs = {}
    with op(path, "rt") as f:
        for line in f:
            if line.startswith("S\t"):
                parts = line.rstrip("\n").split("\t")
                seqs[parts[1]] = parts[2]
    return seqs


def path_info(aln, segs):
    """(path_seq, path_cnt, rev_cnt) per summary.py parse_alignment."""
    seq = []
    rev = 0
    for m in aln.mappings:
        key = m.node_name if m.node_name else str(m.node_id)
        if key not in segs:
            # reference binary GAMs carry internal ids in node_id; the
            # name field is authoritative.  Skip unknown ids loudly.
            raise KeyError(f"node {key!r} not in graph")
        s = segs[key]
        if m.is_reverse:
            rev += 1
            seq.append(revc(s))
        else:
            seq.append(s)
    return "".join(seq), len(aln.mappings), rev


def edit_distances(reads, paths):
    """Global NW distances via the banded polish kernel (band doubles on
    edge contact up to 1024 rows; distances above that band may
    overestimate and are flagged)."""
    from graphchainer_tpu.align import polish
    out = polish.polish_batch(reads, paths, bw=8)
    return ([oc.score for oc in out],
            [bool(oc.touched) for oc in out])


def main():
    if len(sys.argv) < 5:
        print(__doc__)
        sys.exit(2)
    gfa, reads_file, out_csv = sys.argv[1:4]
    gams = []
    for arg in sys.argv[4:]:
        label, _, path = arg.partition("=")
        if not path:
            label, path = os.path.basename(arg), arg
        gams.append((label, path))

    from graphchainer_tpu.io.fastq import stream_reads
    from graphchainer_tpu.io.gam_reader import load_gam_alignments

    segs = load_gfa_segments(gfa)
    reads = [(r.name, r.seq) for r in stream_reads(reads_file)]

    per_label = {}
    for label, path in gams:
        alns = {}
        for a in load_gam_alignments(path):
            alns.setdefault(a.name.split()[0], a)   # primary only
        per_label[label] = alns

    header = ["name", "length"]
    for label, _ in gams:
        header += [f"{label}_pathcnt", f"{label}_path_bps",
                   f"{label}_revcnt", f"{label}_global_ed",
                   f"{label}_align_rate", f"{label}_ed_capped"]
    rows = []
    # batch the edit distances per label (device-friendly)
    ed_results = {}
    for label, _ in gams:
        alns = per_label[label]
        pairs = []
        keys = []
        for name, seq in reads:
            a = alns.get(name)
            if a is None or not a.mappings:
                continue
            pseq, _, _ = path_info(a, segs)
            pairs.append((seq, pseq))
            keys.append(name)
        if pairs:
            eds, capped = edit_distances([p[0] for p in pairs],
                                         [p[1] for p in pairs])
            ed_results[label] = dict(zip(keys, zip(eds, capped)))
        else:
            ed_results[label] = {}

    sums = {label: [0, 0.0, 0.0] for label, _ in gams}  # n, ed/len, rate
    for name, seq in reads:
        row = [name, str(len(seq))]
        for label, _ in gams:
            a = per_label[label].get(name)
            if a is None or not a.mappings:
                row += ["", "", "", "", "0", ""]
                continue
            pseq, cnt, rev = path_info(a, segs)
            ed, capped = ed_results[label][name]
            row += [str(cnt), str(len(pseq)), str(rev), str(ed),
                    f"{len(pseq) / max(len(seq), 1):.3f}",
                    "1" if capped else "0"]
            sums[label][0] += 1
            sums[label][1] += ed / max(len(seq), 1)
            sums[label][2] += len(pseq) / max(len(seq), 1)
        rows.append(row)

    with open(out_csv, "w") as f:
        f.write(",".join(header) + "\n")
        for row in rows:
            f.write(",".join(row) + "\n")

    for label, _ in gams:
        n, ed, rate = sums[label]
        print(f"{label}: aligned {n}/{len(reads)}"
              + (f", mean norm ED {ed / n:.4f}, mean align rate "
                 f"{rate / n:.3f}" if n else ""))


if __name__ == "__main__":
    main()
