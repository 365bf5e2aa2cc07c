"""Alignment selection + E-value tests (reference semantics)."""
import math
from dataclasses import dataclass

import pytest

from graphchainer_tpu.align.evalue import EValueCalculator
from graphchainer_tpu.align.selection import (SelectionMethod,
                                              SelectionOptions, incompatible,
                                              select_alignments)


@dataclass
class Aln:
    seq_start: int
    seq_end: int
    score: int


def test_incompatible_overlap_rule():
    # 5% of the shorter alignment (reference
    # src/AlignmentSelection.cpp:9-15)
    a = Aln(0, 1000, 10)
    b = Aln(990, 2000, 10)   # overlap 10 <= 50 -> compatible
    assert not incompatible(a, b)
    c = Aln(900, 2000, 10)   # overlap 100 > 50 -> incompatible
    assert incompatible(a, c)


def test_greedy_length_selection():
    alns = [Aln(0, 500, 5), Aln(0, 900, 50), Aln(1000, 1500, 2)]
    opts = SelectionOptions(method=SelectionMethod.GREEDY_LENGTH)
    out = select_alignments(alns, opts)
    # longest first; overlapping shorter one dropped; disjoint one kept
    assert out[0].seq_end == 900
    assert len(out) == 2


def test_schedule_length_optimal():
    # two short compatible alignments beat one long incompatible-with-both
    alns = [Aln(0, 600, 1), Aln(500, 1100, 1), Aln(0, 1000, 1)]
    opts = SelectionOptions(method=SelectionMethod.SCHEDULE_LENGTH)
    out = select_alignments(alns, opts)
    lens = sorted(a.seq_end - a.seq_start for a in out)
    assert sum(lens) >= 1000


def test_evalue_monotonic():
    calc = EValueCalculator(0.7)
    assert calc.lam > 0 and calc.K > 0
    # better alignments (fewer edits) have lower E
    e1 = calc.evalue(10**6, 10**4, 1000, 10)
    e2 = calc.evalue(10**6, 10**4, 1000, 100)
    assert e1 < e2
    # longer db -> higher E
    assert calc.evalue(10**7, 10**4, 1000, 10) > e1


def test_e_cutoff_filter():
    calc = EValueCalculator(0.7)
    good = Aln(0, 1000, 10)
    bad = Aln(0, 1000, 600)
    opts = SelectionOptions(method=SelectionMethod.ALL, graph_size=10**6,
                            read_size=1000, e_cutoff=1.0,
                            evalue_calc=calc)
    out = select_alignments([good, bad], opts)
    assert good in out and bad not in out


def test_correctness_hmm():
    from graphchainer_tpu.align.correctness import CorrectnessState
    st = CorrectnessState()
    # low error slices stay correct
    for _ in range(5):
        st = st.next_state(6, 32)   # ~0.19 per base
    assert st.current_is_correct()
    # a run of catastrophic slices flips to false
    for _ in range(5):
        st = st.next_state(16, 32)  # 0.5 per base
    assert not st.current_is_correct()
