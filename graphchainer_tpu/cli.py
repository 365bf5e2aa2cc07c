"""Command-line interface (re-design of reference src/AlignerMain.cpp).

Flag names mirror the reference binary where the concept carries over, so
existing GraphChainer invocations translate directly:

  GraphChainer -f reads.fq -g graph.gfa -a out.gam \
      --sampling-step 1 --colinear-split-len 35 --colinear-gap 10000

  python -m graphchainer_tpu -f reads.fq -g graph.gfa -a out.gam \
      --sampling-step 1 --colinear-split-len 35 --colinear-gap 10000
"""
from __future__ import annotations

import argparse
import math
import sys

from graphchainer_tpu import constants
from graphchainer_tpu.models.chainer import ChainerConfig
from graphchainer_tpu.pipeline import PipelineParams, align_reads


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="graphchainer-tpu",
        description="TPU-native sequence-to-graph aligner with co-linear "
                    "chaining (GraphChainer capabilities, re-built for "
                    "JAX/XLA/Pallas)")
    m = p.add_argument_group("mandatory")
    m.add_argument("-g", "--graph", required=True,
                   help="input graph (.gfa / .gfa.gz)")
    m.add_argument("-f", "--reads", action="append", default=[],
                   help="input reads (fasta or fastq, uncompressed or "
                        "gzipped); may repeat")
    m.add_argument("-a", "--alignments-out", action="append", default=[],
                   help="output file (.gaf / .gam / .json); may repeat")
    clc = p.add_argument_group("colinear chaining")
    clc.add_argument("--colinear-split-len", type=int,
                     default=constants.DEFAULT_COLINEAR_SPLIT_LEN,
                     help="length of split fragments (default 35)")
    clc.add_argument("--colinear-split-gap", type=int, default=None,
                     help="distance between fragments (default 35)")
    clc.add_argument("--sampling-step", type=float, default=None,
                     help="split-gap = ceil(arg * split-len) "
                          "(overrides --colinear-split-gap)")
    clc.add_argument("--colinear-gap", type=int,
                     default=constants.DEFAULT_COLINEAR_GAP,
                     help="max gap bp when stitching chains (default 10000)")
    clc.add_argument("--fast-mode", action="store_true",
                     help="skip the final base-level polish alignment "
                          "(positional mismatch count only)")
    clc.add_argument("--mode", choices=["clc", "ga", "optimal"],
                     default="clc",
                     help="clc = co-linear chaining (default); ga = plain "
                          "whole-read seed-and-extend (GraphAligner-style)")
    clc.add_argument("--global-alignment", action="store_true",
                     help="force the read to be aligned end-to-end even "
                          "if the alignment score is poor (GA mode; "
                          "reference src/AlignerMain.cpp:66)")
    clc.add_argument("--no-colinear-chaining", action="store_true",
                     help="do not run colinear chaining; align as plain "
                          "GraphAligner (alias for --mode ga; reference "
                          "src/AlignerMain.cpp:107)")
    clc.add_argument("--optimal-alignment",
                     action="store_true",
                     help="alias for --mode optimal (reference flag)")
    clc.add_argument("--seedless-DP", dest="seedless_dp",
                     action="store_true",
                     help="no seeding: discover alignment starts with a "
                          "free-start DP scan over the whole graph "
                          "(implies --mode ga; reference "
                          "src/AlignerMain.cpp:77)")
    clc.add_argument("--DP-restart-stride", dest="dp_restart_stride",
                     type=int, default=0,
                     help="with --seedless-DP, re-scan at this read-offset "
                          "stride to recover coverage after clips "
                          "(reference src/AlignerMain.cpp:78)")
    clc.add_argument("--compare-baseline", action="store_true",
                     help="in clc mode, also run the whole-read baseline "
                          "and keep the better alignment per read (the "
                          "reference always does this; costs extra device "
                          "rounds)")
    gen = p.add_argument_group("general")
    gen.add_argument("-t", "--threads", type=int, default=None,
                     help="concurrent in-flight batches (the analogue of "
                          "the reference's worker threads; device work is "
                          "batched). Default 3")
    gen.add_argument("--verbose", action="store_true")
    gen.add_argument("--num-processes", type=int, default=1,
                     help="multi-host execution: total process count "
                          "(all processes run the same command; reads "
                          "stripe by index, outputs get .partI suffixes)")
    gen.add_argument("--process-id", type=int, default=0,
                     help="this process's id in [0, num-processes)")
    gen.add_argument("--coordinator", default="127.0.0.1:43231",
                     help="jax.distributed coordinator host:port "
                          "(process 0's address)")
    gen.add_argument("--cigar-match-mismatch", action="store_true",
                     help="use M for matches and mismatches in cigar "
                          "strings instead of = and X (reference "
                          "src/AlignerMain.cpp:70)")
    gen.add_argument("--batch-size", type=int, default=64,
                     help="reads per device batch")
    gen.add_argument("--mpc-index", default=None,
                     help="minimum path cover index cache file (.npz); "
                          "built and saved if missing")
    gen.add_argument("--minimizer-index", default=None,
                     help="minimizer index cache file (.npz)")
    gen.add_argument("--corrected-out", default=None,
                     help="corrected reads FASTA out")
    gen.add_argument("--corrected-clipped-out", default=None,
                     help="corrected clipped reads FASTA out")
    gen.add_argument("--generate-path", default=None, metavar="PREFIX",
                     help="generate a random source-to-sink path "
                          "(PREFIX.fasta + PREFIX.nodes) and exit")
    gen.add_argument("--generate-path-seed", type=int, default=0)
    gen.add_argument("--graph-statistics", action="store_true",
                     help="print graph statistics and exit")
    seed = p.add_argument_group("seeding")
    seed.add_argument("--seeds-mem-count", type=int, default=0,
                      help="use MEM seeds: max occurrences per match "
                           "(reference --seeds-mem-count)")
    seed.add_argument("--seeds-mum-count", type=int, default=0,
                      help="use MUM seeds (unique matches) "
                           "(reference --seeds-mum-count)")
    seed.add_argument("--seeds-mxm-length", type=int, default=20,
                      help="min MUM/MEM length (reference "
                           "--seeds-mxm-length)")
    seed.add_argument("--seeds-mxm-cache-prefix", default=None,
                      help="suffix-array cache file prefix (reference "
                           "--seeds-mxm-cache-prefix)")
    seed.add_argument("--seeds-clustersize", type=int, default=0,
                      help="discard seed clusters with fewer than arg "
                           "seeds (reference src/AlignerMain.cpp:79)")
    seed.add_argument("--seeds-extend-density", type=float, default=-1.0,
                      help="extend up to approximately the best "
                           "(arg * sequence length) seeds; -1 = default "
                           "policy (reference src/AlignerMain.cpp:80)")
    seed.add_argument("--try-all-seeds", action="store_true",
                      help="don't use heuristics to discard seed hits "
                           "(reference src/AlignerMain.cpp:65)")
    seed.add_argument("--seeds-file", default=None,
                      help="external seeds from a .gam file (reference -s)")
    seed.add_argument("--seeds-minimizer-length", type=int,
                      default=constants.DEFAULT_SEED_MINIMIZER_LENGTH)
    seed.add_argument("--seeds-minimizer-windowsize", type=int,
                      default=constants.DEFAULT_SEED_MINIMIZER_WINDOW)
    seed.add_argument("--seeds-minimizer-density", type=float,
                      default=constants.DEFAULT_SEED_MINIMIZER_DENSITY)
    seed.add_argument("--seeds-minimizer-ignore-frequent", type=float,
                      default=0.0002,
                      help="discard the most frequent fraction of "
                           "minimizers")
    sel = p.add_argument_group("alignment selection")
    sel.add_argument("--all-alignments", action="store_true",
                     help="return all alignments instead of the best "
                          "non-overlapping set (reference "
                          "src/AlignerMain.cpp:63)")
    sel.add_argument("--greedy-length", action="store_true",
                     help="greedy non-overlapping selection by length "
                          "(default; reference src/AlignerMain.cpp:105)")
    sel.add_argument("--greedy-E", dest="greedy_e", action="store_true",
                     help="greedy non-overlapping selection by E-value")
    sel.add_argument("--greedy-score", dest="greedy_score",
                     action="store_true",
                     help="greedy non-overlapping selection by alignment "
                          "score")
    sel.add_argument("--schedule-score", dest="sched_score",
                     action="store_true",
                     help="optimal non-overlapping set by alignment score")
    sel.add_argument("--schedule-length", dest="sched_length",
                     action="store_true",
                     help="optimal non-overlapping set by alignment length")
    sel.add_argument("--schedule-inverse-E-sum", dest="sched_e_sum",
                     action="store_true",
                     help="optimal non-overlapping set by sum of inverse "
                          "E-values")
    sel.add_argument("--schedule-inverse-E-product", dest="sched_e_product",
                     action="store_true",
                     help="optimal non-overlapping set by product of "
                          "inverse E-values")
    sel.add_argument("--E-cutoff", dest="e_cutoff", type=float,
                     default=-1.0,
                     help="discard alignments with E-value > arg "
                          "(reference src/AlignerMain.cpp:62).  NOTE: "
                          "alignment scores here follow the reference's "
                          "documented formula (edits LOWER the score); the "
                          "reference binary's getAlignmentScore raises it, "
                          "so identical thresholds select different sets "
                          "(see PARITY.md); pass --evalue-legacy-score "
                          "for bit-compatible selection")
    sel.add_argument("--evalue-legacy-score", action="store_true",
                     help="use the reference binary's literal "
                          "getAlignmentScore sign (edits RAISE the "
                          "score) so --E-cutoff selects exactly the "
                          "reference's alignment set "
                          "(src/EValue.cpp:45-48)")
    ext = p.add_argument_group("extension")
    ext.add_argument("-b", "--bandwidth", type=int, default=None,
                     help="alignment band slots per fragment "
                          "(default 32 in CLC mode, 48 in GA mode; "
                          "max 127)")
    ext.add_argument("--polish-band", type=int, default=8,
                     help="polish band in 32-row words (default 8 = 256)")
    ext.add_argument("-B", "--ramp-bandwidth", type=int, default=0,
                     help="retry failing GA windows once with this wider "
                          "band before clipping (reference "
                          "src/AlignerMain.cpp:95; 0 = off)")
    ext.add_argument("--X-drop", dest="x_drop", type=int, default=None,
                     help="end extension when the X-score drops more than "
                          "arg below its max (GA mode; reference "
                          "src/AlignerMain.cpp:68)")
    ext.add_argument("--precise-clipping", type=float, default=None,
                     help="identity cutoff between correct and wrong "
                          "alignment ends (GA mode; reference "
                          "src/AlignerMain.cpp:69)")
    return p


def params_from_args(args) -> PipelineParams:
    if args.precise_clipping is not None \
            and not 0.0 < args.precise_clipping < 1.0:
        raise SystemExit("graphchainer-tpu: error: --precise-clipping "
                         "must be in (0, 1)")
    if args.x_drop is not None and args.x_drop <= 1:
        raise SystemExit("graphchainer-tpu: error: --X-drop score cutoff "
                         "must be > 1")
    if args.ramp_bandwidth and args.bandwidth \
            and args.ramp_bandwidth <= args.bandwidth:
        raise SystemExit("graphchainer-tpu: error: ramp bandwidth must be "
                         "higher than default bandwidth")
    for flag, val in (("-b/--bandwidth", args.bandwidth),
                      ("-B/--ramp-bandwidth", args.ramp_bandwidth)):
        if val and not 0 < val <= 127:
            raise SystemExit(f"graphchainer-tpu: error: {flag} must be in "
                             "[1, 127] (band slots are int8-indexed)")
    picked = [(f, m) for f, m in
              [("--all-alignments", args.all_alignments and "All"),
               ("--greedy-length", args.greedy_length and "GreedyLength"),
               ("--greedy-E", args.greedy_e and "GreedyE"),
               ("--greedy-score", args.greedy_score and "GreedyScore"),
               ("--schedule-score", args.sched_score and "ScheduleScore"),
               ("--schedule-length",
                args.sched_length and "ScheduleLength"),
               ("--schedule-inverse-E-sum",
                args.sched_e_sum and "ScheduleInverseESum"),
               ("--schedule-inverse-E-product",
                args.sched_e_product and "ScheduleInverseEProduct")] if m]
    if len(picked) > 1:
        raise SystemExit("graphchainer-tpu: error: only one alignment "
                         "selection method can be set ("
                         + ", ".join(f for f, _ in picked) + ")")
    selection_method = picked[0][1] if picked else "GreedyLength"
    if args.try_all_seeds and args.seeds_extend_density != -1.0:
        print("WARNING: --try-all-seeds and --seeds-extend-density are "
              "both set! --seeds-extend-density will be ignored",
              file=sys.stderr)
        args.seeds_extend_density = -1.0
    split_gap = args.colinear_split_gap
    if args.sampling_step is not None:
        split_gap = int(math.ceil(args.sampling_step
                                  * args.colinear_split_len))
    if split_gap is None:
        split_gap = constants.DEFAULT_COLINEAR_SPLIT_GAP
    cfg = ChainerConfig(
        colinear_split_len=args.colinear_split_len,
        colinear_split_gap=split_gap,
        colinear_gap=args.colinear_gap,
        band_slots=args.bandwidth or 32,
        polish_band_words=args.polish_band,
        seed_density=args.seeds_minimizer_density,
        compare_with_baseline=args.compare_baseline,
        fast_mode=args.fast_mode)
    params = PipelineParams(
        graph_file=args.graph, read_files=list(args.reads),
        batch_size=args.batch_size, mpc_index_file=args.mpc_index,
        minimizer_index_file=args.minimizer_index,
        seed_k=args.seeds_minimizer_length,
        seed_w=args.seeds_minimizer_windowsize,
        discard_fraction=args.seeds_minimizer_ignore_frequent,
        chainer=cfg, mode=args.mode, verbose=args.verbose,
        seed_file=args.seeds_file,
        mem_count=args.seeds_mem_count, mum_count=args.seeds_mum_count,
        mxm_length=args.seeds_mxm_length,
        mxm_cache_prefix=args.seeds_mxm_cache_prefix,
        x_drop=args.x_drop, precise_clipping=args.precise_clipping,
        ramp_band_slots=args.ramp_bandwidth, bandwidth=args.bandwidth,
        selection_method=selection_method, e_cutoff=args.e_cutoff,
        evalue_legacy_score=args.evalue_legacy_score,
        cigar_match_mismatch=args.cigar_match_mismatch,
        **({"inflight": max(args.threads, 1)}
           if args.threads is not None else {}),
        try_all_seeds=args.try_all_seeds,
        seed_extend_density=args.seeds_extend_density,
        min_cluster_size=args.seeds_clustersize,
        global_alignment=args.global_alignment,
        seedless_dp=args.seedless_dp,
        dp_restart_stride=args.dp_restart_stride,
        num_processes=args.num_processes, process_id=args.process_id,
        coordinator=args.coordinator,
        out_corrected=args.corrected_out,
        out_corrected_clipped=args.corrected_clipped_out)
    for out in args.alignments_out:
        if out.endswith(".gam"):
            params.out_gam = out
        elif out.endswith(".gaf"):
            params.out_gaf = out
        elif out.endswith(".json"):
            params.out_json = out
        else:
            raise SystemExit(f"unknown alignment output format: {out} "
                             "(use .gam/.gaf/.json)")
    return params


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if getattr(args, "optimal_alignment", False):
        args.mode = "optimal"
    if getattr(args, "no_colinear_chaining", False):
        args.mode = "ga"
    if getattr(args, "seedless_dp", False):
        args.mode = "ga"
    if args.graph_statistics:
        from graphchainer_tpu.pipeline import load_graph
        g = load_graph(args.graph)
        for k, v in g.stats().items():
            print(f"{k}: {v}")
        return 0
    if args.generate_path:
        from graphchainer_tpu.graph.simulate import generate_path
        from graphchainer_tpu.pipeline import load_graph
        g = load_graph(args.graph)
        seq, nodes = generate_path(g, seed=args.generate_path_seed)
        with open(args.generate_path + ".fasta", "w") as f:
            f.write(">generated_path\n" + seq + "\n")
        with open(args.generate_path + ".nodes", "w") as f:
            f.write(" ".join(str(n) for n in nodes) + "\n")
        return 0
    if not args.reads or not (args.alignments_out or args.corrected_out
                              or args.corrected_clipped_out):
        print("error: need reads (-f) and an output (-a / --corrected-out)",
              file=sys.stderr)
        return 1
    stats = align_reads(params_from_args(args))
    print(f"Input reads: {stats.reads} ({stats.bp_in_reads}bp)")
    print(f"Reads with an alignment: {stats.reads_with_an_alignment}")
    print(f"Alignments: {stats.alignments} ({stats.bp_in_alignments}bp)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
