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


def test_packed2_wire_matches_packed4(rng):
    """The 2-bit pure-ACGT polish wire format must reproduce the 4-bit
    nibble path word for word (score, n_ops, touched, ops)."""
    import numpy as np
    from graphchainer_tpu.align.polish import pack_codes2, pack_nibbles
    from graphchainer_tpu.ops import linear_align
    from graphchainer_tpu.utils.seq import match_masks
    R, rmax, pmax, bw = 5, 256, 256, 2
    read_mm = np.zeros((R, rmax), dtype=np.uint8)
    path_mm = np.zeros((R, pmax), dtype=np.uint8)
    read_len = np.zeros(R, dtype=np.int32)
    path_len = np.zeros(R, dtype=np.int32)
    for i in range(R):
        n = int(rng.integers(40, 200))
        seq = "".join(rng.choice(list("ACGT"), n))
        q = list(seq)
        for p in rng.choice(n, max(1, n // 12), replace=False):
            q[p] = rng.choice(list("ACGT"))
        read_mm[i, :n] = match_masks("".join(q))
        path_mm[i, :n] = match_masks(seq)
        read_len[i] = path_len[i] = n
    w4 = np.asarray(linear_align.polish_full_packed(
        pack_nibbles(read_mm), pack_nibbles(path_mm), read_len, path_len,
        bw, max_steps=rmax + pmax))
    w2 = np.asarray(linear_align.polish_full_packed2(
        pack_codes2(read_mm), pack_codes2(path_mm), read_len, path_len,
        bw, max_steps=rmax + pmax))
    np.testing.assert_array_equal(w2, w4)


def test_polish_batch_iupac_falls_back(rng):
    """A batch with an ambiguous path char still polishes correctly via
    the 4-bit path."""
    from graphchainer_tpu.align.polish import polish_batch
    seq = "".join(rng.choice(list("ACGT"), 120))
    out = polish_batch([seq, seq], [seq, seq[:60] + "N" + seq[61:]], bw=2)
    assert out[0].score == 0
    assert out[1].score >= 0 and out[1].ops is not None


def test_host_polish_matches_device(rng):
    """native polish_host_batch (host banded NW) is bit-identical to the
    device kernel single pass: score, n_ops, touched, full ops."""
    from graphchainer_tpu import native
    from graphchainer_tpu.align import polish
    from graphchainer_tpu.utils.seq import match_masks

    def mutate(s, e):
        out = []
        for ch in s:
            r = rng.random()
            if r < e / 3:
                continue
            out.append(str(rng.choice(list("ACGT"))) if r < 2 * e / 3
                       else ch)
            if rng.random() < e / 3:
                out.append(str(rng.choice(list("ACGT"))))
        return "".join(out)

    reads, paths = [], []
    for _ in range(10):
        p = "".join(rng.choice(list("ACGT"), int(rng.integers(150, 2000))))
        paths.append(p)
        reads.append(mutate(p, 0.12))
    paths.append("ACGTN" * 60)                  # IUPAC path
    reads.append(mutate(paths[-1].replace("N", "G"), 0.05))
    dev = polish._polish_once(reads, paths, 4)
    sc, no, tc, ops = native.polish_host_batch(
        [match_masks(r) for r in reads], [match_masks(p) for p in paths], 4)
    for i, oc in enumerate(dev):
        assert oc.score == sc[i]
        assert (-1 if oc.ops is None else len(oc.ops)) == no[i]
        assert oc.touched == bool(tc[i])
        if oc.ops is not None:
            np.testing.assert_array_equal(oc.ops, ops[i])
    # the ramped wrappers agree end-to-end as well
    full_dev = polish.polish_batch(reads, paths, bw=4)
    full_host = polish.polish_batch_host(reads, paths, bw=4)
    for a, b in zip(full_dev, full_host):
        assert a.score == b.score
