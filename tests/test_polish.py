"""Banded linear polish alignment vs numpy NW oracle."""
import numpy as np
import pytest

from graphchainer_tpu.align.polish import polish_batch


def nw_edit_distance(a, b):
    la, lb = len(a), len(b)
    D = np.zeros((la + 1, lb + 1), dtype=np.int64)
    D[:, 0] = np.arange(la + 1)
    D[0, :] = np.arange(lb + 1)
    for i in range(1, la + 1):
        sub = (np.frombuffer(b.encode(), np.uint8)
               != ord(a[i - 1])).astype(np.int64)
        row = D[i - 1]
        t = np.minimum(row[:-1] + sub, row[1:] + 1)
        # sequential min over the row (vectorized prefix trick)
        idx = np.arange(lb + 1)
        tt = np.empty(lb + 1, dtype=np.int64)
        tt[0] = row[0] + 1
        tt[1:] = t
        D[i] = np.minimum.accumulate(tt - idx) + idx
    return int(D[la, lb])


def mutate(rng, seq, err):
    out = []
    for ch in seq:
        r = rng.random()
        if r < err / 3:
            continue
        if r < 2 * err / 3:
            out.append(rng.choice(list("ACGT")))
        else:
            out.append(ch)
        if rng.random() < err / 3:
            out.append(rng.choice(list("ACGT")))
    return "".join(out)


@pytest.mark.parametrize("seed", range(4))
def test_polish_score_matches_nw(seed):
    rng = np.random.default_rng(seed)
    reads, paths = [], []
    for _ in range(3):
        path = "".join(rng.choice(list("ACGT"), int(rng.integers(40, 200))))
        read = mutate(rng, path, 0.15)
        if len(read) == 0:
            read = "A"
        reads.append(read)
        paths.append(path)
    outs = polish_batch(reads, paths, bw=8)
    for rd, pt, o in zip(reads, paths, outs):
        want = nw_edit_distance(rd, pt)
        assert o.score == want, (len(rd), len(pt), o.score, want)
        # CIGAR consistency: ops must consume exactly the read and path,
        # and their cost must equal the score
        assert o.ops is not None
        ri = pi = cost = 0
        for op in o.ops:
            if op == 0 or op == 3:
                if op == 3:
                    cost += 1
                elif rd[ri] != pt[pi]:
                    cost += 1  # op said match but differs -> bug
                ri += 1
                pi += 1
            elif op == 1:
                pi += 1
                cost += 1
            else:
                ri += 1
                cost += 1
        assert ri == len(rd) and pi == len(pt)
        assert cost == o.score


def test_polish_identical_sequences():
    seq = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT" * 3
    outs = polish_batch([seq], [seq], bw=4)
    assert outs[0].score == 0
    assert all(op == 0 for op in outs[0].ops)


def test_polish_long_with_indel_drift(rng):
    # long sequences with net insertions stress the band slide
    path = "".join(rng.choice(list("ACGT"), 800))
    read = mutate(rng, path, 0.2)
    outs = polish_batch([read], [path], bw=8)
    want = nw_edit_distance(read, path)
    assert outs[0].score == want
