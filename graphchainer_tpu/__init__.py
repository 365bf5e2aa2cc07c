"""graphchainer_tpu — a TPU-native sequence-to-graph alignment engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
algbio/GraphChainer (long-read to variation-graph alignment via co-linear
chaining over a minimum path cover of the DAG).

Layer map (mirrors SURVEY.md §1 of the reference, re-architected TPU-first):

  cli.py            argparse CLI (reference: src/AlignerMain.cpp)
  pipeline.py       read streaming -> batched device alignment -> writers
                    (reference: src/Aligner.cpp alignReads/runComponentMappings)
  models/           end-to-end alignment "models" (chainer = CLC pipeline,
                    aligner = seed-and-extend baseline)
  ops/              Pallas/jnp device kernels: Myers bit-parallel DP blocks,
                    banded graph extension, linear polish alignment,
                    chaining event scan
  graph/            GFA/vg bigraph -> doubled digraph -> <=32bp split nodes ->
                    topo-sorted tensor bundle; MPC index
                    (reference: src/AlignmentGraph.*, src/BigraphToDigraph.*)
  index/            minimizer seeding (reference: src/MinimizerSeeder.*)
  align/            host-side algorithm layer: anchors, chaining oracle,
                    stitching, selection, E-values, correctness HMM
  parallel/         device mesh / sharding / collectives
  io/               GFA, FASTA/FASTQ, GAF/GAM/JSON emitters
  utils/            revcomp, cigar, small helpers
  native/ (C++)     host runtime: topo sort, MPC build, BFS stitching
"""

__version__ = "0.1.0"

from graphchainer_tpu import constants  # noqa: F401
