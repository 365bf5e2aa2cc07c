"""Auxiliary standalone tools (re-design of the reference's extra binaries,
SURVEY.md §2.9 / reference makefile:34-70).

Usage: python -m graphchainer_tpu.tools <command> [args]

Commands:
  gfa-path-sequence       GFA P/W paths -> FASTA (truth sequences; the
                          reference obtains these via external vg paths)
  extract-path-sequence   GAM -> FASTA of alignment path sequences
                          (reference ExtractPathSequence.cpp)
  select-longest          keep the longest alignment per read
                          (reference SelectLongestAlignment.cpp)
  postprocess             re-run alignment selection on a GAM
                          (reference Postprocess.cpp)
  extract-corrected       GAM -> corrected reads FASTA
                          (reference ExtractCorrectedReads.cpp)
  simulate-reads          error-model read simulator
                          (reference SimulateReads.cpp)
  reverse-reads           reverse-complement a read file
                          (reference ReverseReads.cpp)
  node-pos-csv            graph node -> approximate linear position CSV
                          (reference NodePosCsv.cpp)
  subsequence-identity    alignment path vs truth path agreement
                          (reference AlignmentSubsequenceIdentity.cpp)
  visualize               render an alignment as read/path text
                          (reference VisualizeAlignment.cpp)
  pick-adjacent-pairs     report read-adjacent alignment pairs
                          (reference PickAdjacentAlnPairs.cpp)
"""
from __future__ import annotations

import argparse
import sys
from typing import Dict, List

import numpy as np


import contextlib


@contextlib.contextmanager
def _out(path: str):
    if path == "-":
        yield sys.stdout
    else:
        f = open(path, "w")
        try:
            yield f
        finally:
            f.close()


def _load_node_seqs(graph_file: str) -> Dict[str, str]:
    from graphchainer_tpu.io.gfa import load_gfa
    from graphchainer_tpu.io.vg_graph import load_vg
    bg = load_vg(graph_file) if graph_file.endswith(".vg") \
        else load_gfa(graph_file)
    return {bg.names[i]: bg.seqs[i] for i in range(len(bg.names))}


def _mapping_seq(node_seqs: Dict[str, str], aln) -> str:
    """Path sequence consumed by a GAM alignment's mappings."""
    from graphchainer_tpu.utils.seq import revcomp
    out = []
    for m in aln.mappings:
        seq = node_seqs.get(str(m.node_id), "")
        if m.is_reverse:
            seq = revcomp(seq)
        consumed = sum(e.get("from_length", 0) for e in m.edits) \
            or (len(seq) - m.offset)
        out.append(seq[m.offset:m.offset + consumed])
    return "".join(out)


def cmd_extract_path_sequence(args):
    from graphchainer_tpu.io.gam_reader import load_gam_alignments
    node_seqs = _load_node_seqs(args.graph)
    with _out(args.output) as f:
        for aln in load_gam_alignments(args.gam):
            f.write(f">{aln.name}\n{_mapping_seq(node_seqs, aln)}\n")


def cmd_select_longest(args):
    from graphchainer_tpu.io import gam as gam_mod
    from graphchainer_tpu.io.gam_reader import parse_alignment
    msgs = gam_mod.read_gam(args.gam)
    best: Dict[str, tuple] = {}
    for msg in msgs:
        aln = parse_alignment(msg)
        ln = sum(e.get("to_length", 0) for m in aln.mappings
                 for e in m.edits)
        if aln.name not in best or ln > best[aln.name][0]:
            best[aln.name] = (ln, msg)
    w = gam_mod.GamWriter(args.output)
    for ln, msg in best.values():
        w.write(msg)
    w.close()


def cmd_postprocess(args):
    """Re-run alignment selection (greedy-length by default) on a GAM."""
    from dataclasses import dataclass

    from graphchainer_tpu.align.selection import (SelectionMethod,
                                                  SelectionOptions,
                                                  select_alignments)
    from graphchainer_tpu.io import gam as gam_mod
    from graphchainer_tpu.io.gam_reader import parse_alignment

    @dataclass
    class Item:
        seq_start: int
        seq_end: int
        score: int
        msg: bytes

    per_read: Dict[str, List[Item]] = {}
    for msg in gam_mod.read_gam(args.gam):
        aln = parse_alignment(msg)
        ln = sum(e.get("to_length", 0) for m in aln.mappings
                 for e in m.edits)
        per_read.setdefault(aln.name, []).append(
            Item(seq_start=0, seq_end=max(ln, 1), score=aln.score, msg=msg))
    opts = SelectionOptions(
        method=SelectionMethod(args.method))
    w = gam_mod.GamWriter(args.output)
    for name, items in per_read.items():
        for it in select_alignments(items, opts):
            w.write(it.msg)
    w.close()


def cmd_extract_corrected(args):
    from graphchainer_tpu.io.gam_reader import load_gam_alignments
    node_seqs = _load_node_seqs(args.graph)
    with _out(args.output) as f:
        for aln in load_gam_alignments(args.gam):
            seq = _mapping_seq(node_seqs, aln)
            if seq:
                f.write(f">{aln.name}\n{seq}\n")


def cmd_simulate_reads(args):
    from graphchainer_tpu.graph.simulate import generate_path, simulate_reads
    from graphchainer_tpu.pipeline import load_graph
    g = load_graph(args.graph)
    path_seq, names = generate_path(g, seed=args.seed)
    reads = simulate_reads(path_seq, args.count, args.length,
                           seed=args.seed, error_rate=args.error_rate)
    with _out(args.output) as f:
        for name, seq in reads:
            f.write(f">{name}\n{seq}\n")


def cmd_reverse_reads(args):
    from graphchainer_tpu.io.fastq import stream_reads
    from graphchainer_tpu.utils.seq import revcomp
    with _out(args.output) as f:
        for rd in stream_reads(args.reads):
            f.write(f">{rd.name}_reverse\n{revcomp(rd.seq)}\n")


def cmd_node_pos_csv(args):
    from graphchainer_tpu.pipeline import load_graph
    g = load_graph(args.graph)
    # approximate linear position: cumulative topo-order bp offset per
    # original node (first split's topo prefix sum)
    prefix = np.zeros(g.n_nodes + 1, dtype=np.int64)
    np.cumsum(g.node_len, out=prefix[1:])
    with _out(args.output) as f:
        f.write("node,approx_pos\n")
        seen = set()
        for v in range(g.n_nodes):
            d = int(g.orig_node[v])
            if d % 2 or d in seen:
                continue
            seen.add(d)
            f.write(f"{g.gfa_name(v)},{int(prefix[v])}\n")


def _lcs_len(a, b):
    """Longest common subsequence length of two sequences."""
    import numpy as np
    if not a or not b:
        return 0
    prev = np.zeros(len(b) + 1, dtype=np.int64)
    for x in a:
        cur = prev.copy()
        match = np.array([1 if x == y else 0 for y in b], dtype=np.int64)
        for j in range(1, len(b) + 1):
            cur[j] = max(cur[j - 1], prev[j], prev[j - 1] + match[j - 1])
        prev = cur
    return int(prev[-1])


def cmd_subsequence_identity(args):
    """Fraction of the alignment's node path contained (in order) in the
    truth path."""
    from graphchainer_tpu.io.gam_reader import load_gam_alignments
    truth = open(args.truth).read().split()
    with _out(args.output) as f:
        f.write("read,path_len,in_truth,identity\n")
        for aln in load_gam_alignments(args.gam):
            path = [str(m.node_id) for m in aln.mappings]
            common = _lcs_len(path, truth)
            ident = common / max(len(path), 1)
            f.write(f"{aln.name},{len(path)},{common},{ident:.4f}\n")


def cmd_visualize(args):
    from graphchainer_tpu.io.gam_reader import load_gam_alignments
    node_seqs = _load_node_seqs(args.graph)
    width = args.width
    with _out(args.output) as f:
        for aln in load_gam_alignments(args.gam):
            pathseq = _mapping_seq(node_seqs, aln)
            read = aln.sequence
            # walk edits to build aligned strings
            top, mid, bot = [], [], []
            pi = si = 0
            for m in aln.mappings:
                for e in m.edits:
                    fl, tl = e.get("from_length", 0), e.get("to_length", 0)
                    seq = e.get("sequence", "")
                    if fl == tl:
                        for k in range(fl):
                            a = pathseq[pi] if pi < len(pathseq) else "?"
                            b = read[si] if si < len(read) else "?"
                            top.append(a)
                            bot.append(b)
                            mid.append("|" if a == b else "X")
                            pi += 1
                            si += 1
                    elif tl == 0:
                        for k in range(fl):
                            top.append(pathseq[pi] if pi < len(pathseq)
                                       else "?")
                            bot.append("-")
                            mid.append(" ")
                            pi += 1
                    else:
                        for k in range(tl):
                            top.append("-")
                            bot.append(read[si] if si < len(read) else "?")
                            mid.append(" ")
                            si += 1
            f.write(f">{aln.name} score={aln.score}\n")
            for lo in range(0, len(top), width):
                f.write("P " + "".join(top[lo:lo + width]) + "\n")
                f.write("  " + "".join(mid[lo:lo + width]) + "\n")
                f.write("R " + "".join(bot[lo:lo + width]) + "\n\n")


def cmd_pick_adjacent_pairs(args):
    """Pairs of alignments of the same read whose read intervals are
    adjacent within --max-gap bp."""
    from graphchainer_tpu.io.gam_reader import load_gam_alignments
    per_read = {}
    for aln in load_gam_alignments(args.gam):
        ln = sum(e.get("to_length", 0) for m in aln.mappings
                 for e in m.edits)
        per_read.setdefault(aln.name, []).append((0, ln, aln))
    with _out(args.output) as f:
        f.write("read,left_end,right_start,gap\n")
        for name, items in per_read.items():
            items.sort(key=lambda t: t[0])
            for (s1, e1, a1), (s2, e2, a2) in zip(items[:-1], items[1:]):
                gap = s2 - e1
                if 0 <= gap <= args.max_gap:
                    f.write(f"{name},{e1},{s2},{gap}\n")


def cmd_gfa_path_sequence(args):
    """FASTA of named P/W paths embedded in a GFA (truth sequences for
    simulation/eval; the reference gets these externally via vg paths)."""
    from graphchainer_tpu.io.gfa import load_gfa, path_sequence
    from graphchainer_tpu.io.vg_graph import load_vg
    g = load_vg(args.graph) if args.graph.endswith(".vg") \
        else load_gfa(args.graph)
    names = [args.name] if args.name else sorted(g.paths)
    if args.name and args.name not in g.paths:
        raise SystemExit(f"no path {args.name!r}; available: "
                         f"{', '.join(sorted(g.paths)) or '(none)'}")
    with _out(args.output) as f:
        for name in names:
            f.write(f">{name}\n{path_sequence(g, name)}\n")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="graphchainer-tpu-tools")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("gfa-path-sequence")
    s.add_argument("--graph", required=True)
    s.add_argument("--name", default=None,
                   help="path/walk name (default: all)")
    s.add_argument("--output", "-o", default="-")
    s.set_defaults(fn=cmd_gfa_path_sequence)

    s = sub.add_parser("extract-path-sequence")
    s.add_argument("--gam", required=True)
    s.add_argument("--graph", required=True)
    s.add_argument("--output", "-o", default="-")
    s.set_defaults(fn=cmd_extract_path_sequence)

    s = sub.add_parser("select-longest")
    s.add_argument("--gam", required=True)
    s.add_argument("--output", "-o", required=True)
    s.set_defaults(fn=cmd_select_longest)

    s = sub.add_parser("postprocess")
    s.add_argument("--gam", required=True)
    s.add_argument("--output", "-o", required=True)
    from graphchainer_tpu.align.selection import SelectionMethod
    s.add_argument("--method", default="GreedyLength",
                   choices=[m.value for m in SelectionMethod])
    s.set_defaults(fn=cmd_postprocess)

    s = sub.add_parser("extract-corrected")
    s.add_argument("--gam", required=True)
    s.add_argument("--graph", required=True)
    s.add_argument("--output", "-o", default="-")
    s.set_defaults(fn=cmd_extract_corrected)

    s = sub.add_parser("simulate-reads")
    s.add_argument("--graph", required=True)
    s.add_argument("--count", type=int, default=100)
    s.add_argument("--length", type=int, default=3000)
    s.add_argument("--error-rate", type=float, default=0.1)
    s.add_argument("--seed", type=int, default=0)
    s.add_argument("--output", "-o", default="-")
    s.set_defaults(fn=cmd_simulate_reads)

    s = sub.add_parser("reverse-reads")
    s.add_argument("--reads", required=True)
    s.add_argument("--output", "-o", default="-")
    s.set_defaults(fn=cmd_reverse_reads)

    s = sub.add_parser("node-pos-csv")
    s.add_argument("--graph", required=True)
    s.add_argument("--output", "-o", default="-")
    s.set_defaults(fn=cmd_node_pos_csv)

    s = sub.add_parser("subsequence-identity")
    s.add_argument("--gam", required=True)
    s.add_argument("--truth", required=True,
                   help="whitespace-separated truth node names "
                        "(--generate-path .nodes output)")
    s.add_argument("--output", "-o", default="-")
    s.set_defaults(fn=cmd_subsequence_identity)

    s = sub.add_parser("visualize")
    s.add_argument("--gam", required=True)
    s.add_argument("--graph", required=True)
    s.add_argument("--width", type=int, default=80)
    s.add_argument("--output", "-o", default="-")
    s.set_defaults(fn=cmd_visualize)

    s = sub.add_parser("pick-adjacent-pairs")
    s.add_argument("--gam", required=True)
    s.add_argument("--max-gap", type=int, default=100)
    s.add_argument("--output", "-o", default="-")
    s.set_defaults(fn=cmd_pick_adjacent_pairs)

    args = p.parse_args(argv)
    args.fn(args)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
