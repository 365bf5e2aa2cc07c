"""Batched co-linear chaining event scan (device).

TPU re-design of the reference's Treap-based event sweep
(src/AlignmentGraph.cpp:1737-1863): the per-path search trees become
masked maxima over the anchor axis — each event step is a handful of
vectorized ops over (reads, anchors), and the sequential dimension is the
(host-sorted, padded) event list, driven by lax.scan.  Semantics are
bit-identical to align/chaining.chain_oracle (same event order, same
(value, id) lexicographic tie-breaking).

Capacity note: scores are combined as val * (A + 2) + (pred + 1) in int32,
requiring read_coverage * (A + 2) < 2^31 (fine for A <= 4096 and reads
up to ~100 kbp).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

EV_SAME_START = 0
EV_SAME_END = 1
EV_INSERT = 2
EV_QUERY = 3
EV_NONE = -1

import numpy as np

NEG = np.int32(-(1 << 30))


class ChainScanResult(NamedTuple):
    c_val: jax.Array    # (R, A) int32
    c_pred: jax.Array   # (R, A) int32


def chain_scan(x, y, valid, ev_type, ev_anchor, ev_k, ev_kmask=None,
               ev_group=None, a_kmask=None):
    """Run the chaining DP for a batch of reads.

    x, y:      (R, A) int32 anchor read intervals
    valid:     (R, A) bool
    ev_type:   (R, E) int32 (EV_*, EV_NONE padding)
    ev_anchor: (R, E) int32
    ev_k:      (R, E) int32 global path id for EV_QUERY
    ev_kmask:  (R, E, KW) uint32 path bitmask for EV_INSERT
    ev_group:  (R, E) int32 topo group id (tags the same-node scratch)
    a_kmask:   (R, A, KW) uint32 PER-ANCHOR path bitmask — the INSERT
               event's mask is a function of its anchor's end node, so
               shipping it per anchor instead of per event cuts the
               upload E/A-fold (the tunneled TPU is bandwidth-bound);
               the device gathers the per-event row by ev_anchor.
               Results are bit-identical (tests/test_chaining.py).
               Exactly one of ev_kmask / a_kmask must be given.
    """
    # runtime guard for the int32 (value, pred) packing below: the max
    # chain value is bounded by the max read coverage, i.e. max(y) + 1
    # (skipped under an enclosing jit trace, where y is abstract)
    A = x.shape[1]
    if isinstance(y, np.ndarray):     # host arrays only: a device array
        # would force a (possibly transfer-capped) download here
        max_cov = int(np.max(y, initial=0)) + 1
        if max_cov * (A + 2) >= (1 << 31):
            raise ValueError(
                f"chain_scan int32 packing overflow: read coverage "
                f"{max_cov} x (A={A} + 2) >= 2^31; reduce the anchor cap "
                "or split the read (see ops/chain_scan.py capacity note)")
    if not isinstance(x, np.ndarray):
        # device/traced arrays (e.g. the driver's dryrun jit): no host
        # packing possible
        if a_kmask is not None:
            return _chain_scan_a(x, y, valid, ev_type, ev_anchor, ev_k,
                                 a_kmask, ev_group)
        return _chain_scan(x, y, valid, ev_type, ev_anchor, ev_k,
                           ev_kmask, ev_group)

    # wire-pack the upload (the tunneled TPU is bandwidth-bound): event
    # type+anchor merge into one uint16, coordinates/masks narrow to the
    # smallest dtype that holds the batch; the decode widens on device
    # inside the jit (ChainScanResult is bit-identical either way)
    def _narrow(a):
        if a.dtype in (np.int32, np.int64) and a.size:
            if -32768 <= int(a.min()) and int(a.max()) < 32768:
                return a.astype(np.int16)
        return a

    if A <= 8192:
        ev_ta = (((ev_type.astype(np.int32) + 1) << 13)
                 | ev_anchor.astype(np.int32)).astype(np.uint16)
    else:
        ev_ta = None
    xn, yn = _narrow(x), _narrow(y)
    kn, gn = _narrow(ev_k), _narrow(ev_group)
    kmask = ev_kmask if a_kmask is None else a_kmask
    if kmask.size and int(kmask.max()) < 256:
        km = kmask.astype(np.uint8)
    elif kmask.size and int(kmask.max()) < 65536:
        km = kmask.astype(np.uint16)
    else:
        km = kmask

    if ev_ta is not None:
        args = (xn, yn, valid, ev_ta, kn, km, gn)
        fn = (_chain_scan_packed if a_kmask is None
              else _chain_scan_packed_a)
    else:
        args = (xn, yn, valid, ev_type, ev_anchor, kn, km, gn)
        fn = _chain_scan_wide if a_kmask is None else _chain_scan_wide_a

    # shard the read axis over the data mesh (reads are embarrassingly
    # parallel here; no-op on a single device)
    import jax as _jax
    from graphchainer_tpu.parallel.device import shard_rows
    ndev = len(_jax.devices())
    R = x.shape[0]
    # bucket the read axis (pow2 from 16) so batches with varying live
    # counts (failed reads, rescue subsets) reuse one compiled shape —
    # compiles cost tens of seconds on the dev TPU
    Rb = 16
    while Rb < R:
        Rb *= 2
    pad = Rb - R
    if ndev > 1:
        pad += (-Rb) % ndev
    if pad:
        # padded reads carry zero rows: with ev_ta == 0 the decoded
        # type is EV_NONE (t = -1) and valid is all-False
        args = tuple(np.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
                     for a in args)
    if ndev > 1:
        args = tuple(shard_rows(a) for a in args)
    # ONE download: (R, 2A) int32 [c_val ++ c_pred]
    w = np.asarray(fn(*args))
    return ChainScanResult(c_val=w[:R, :A], c_pred=w[:R, A:])


@jax.jit
def _chain_scan_packed(x, y, valid, ev_ta, ev_k, ev_kmask, ev_group):
    ta = ev_ta.astype(jnp.int32)
    res = _chain_scan(x.astype(jnp.int32), y.astype(jnp.int32), valid,
                      (ta >> 13) - 1, ta & 0x1FFF,
                      ev_k.astype(jnp.int32),
                      ev_kmask.astype(jnp.uint32),
                      ev_group.astype(jnp.int32))
    return jnp.concatenate([res.c_val, res.c_pred], axis=1)


@jax.jit
def _chain_scan_packed_a(x, y, valid, ev_ta, ev_k, a_kmask, ev_group):
    ta = ev_ta.astype(jnp.int32)
    res = _chain_scan_a(x.astype(jnp.int32), y.astype(jnp.int32), valid,
                        (ta >> 13) - 1, ta & 0x1FFF,
                        ev_k.astype(jnp.int32),
                        a_kmask.astype(jnp.uint32),
                        ev_group.astype(jnp.int32))
    return jnp.concatenate([res.c_val, res.c_pred], axis=1)


@jax.jit
def _chain_scan_wide(x, y, valid, ev_type, ev_anchor, ev_k, ev_kmask,
                     ev_group):
    res = _chain_scan(x.astype(jnp.int32), y.astype(jnp.int32), valid,
                      ev_type.astype(jnp.int32),
                      ev_anchor.astype(jnp.int32),
                      ev_k.astype(jnp.int32),
                      ev_kmask.astype(jnp.uint32),
                      ev_group.astype(jnp.int32))
    return jnp.concatenate([res.c_val, res.c_pred], axis=1)


@jax.jit
def _chain_scan_wide_a(x, y, valid, ev_type, ev_anchor, ev_k, a_kmask,
                       ev_group):
    res = _chain_scan_a(x.astype(jnp.int32), y.astype(jnp.int32), valid,
                        ev_type.astype(jnp.int32),
                        ev_anchor.astype(jnp.int32),
                        ev_k.astype(jnp.int32),
                        a_kmask.astype(jnp.uint32),
                        ev_group.astype(jnp.int32))
    return jnp.concatenate([res.c_val, res.c_pred], axis=1)


@partial(jax.jit, static_argnames=())
def _chain_scan_a(x, y, valid, ev_type, ev_anchor, ev_k, a_kmask,
                  ev_group):
    """_chain_scan with the INSERT kmask gathered per step from the
    per-anchor table (bit-identical results; E/A-fold smaller upload)."""
    kmask_ev = jnp.take_along_axis(
        a_kmask, jnp.clip(ev_anchor.astype(jnp.int32), 0,
                          x.shape[1] - 1)[..., None], 1)
    return _chain_scan(x, y, valid, ev_type, ev_anchor, ev_k,
                       kmask_ev, ev_group)


@partial(jax.jit, static_argnames=())
def _chain_scan(x, y, valid, ev_type, ev_anchor, ev_k, ev_kmask, ev_group):
    R, A = x.shape
    KW = ev_kmask.shape[-1]
    ln = y - x + 1
    c_val = jnp.where(valid, ln, NEG)
    c_pred = jnp.full((R, A), -1, jnp.int32)
    ins = jnp.zeros((R, A, KW), jnp.uint32)
    tmp_tag = jnp.full((R, A), -2, jnp.int32)

    arangeA = jnp.arange(A, dtype=jnp.int32)

    def step(state, ev):
        c_val, c_pred, ins, tmp_tag = state
        t, j, k, kmask, grp = ev
        t = t.astype(jnp.int32)
        j = j.astype(jnp.int32)
        k = k.astype(jnp.int32)
        grp = grp.astype(jnp.int32)
        j = jnp.clip(j, 0, A - 1)
        onehot = arangeA[None, :] == j[:, None]          # (R, A)

        xj = jnp.take_along_axis(x, j[:, None], 1)       # (R, 1)
        yj = jnp.take_along_axis(y, j[:, None], 1)
        lnj = yj - xj + 1

        # candidate mask per query type
        kc = jnp.clip(k, 0, KW * 32 - 1)
        kword = (kc // 32)[:, None]                       # (R, 1)
        kbit = (kc % 32)[:, None].astype(jnp.uint32)
        ins_k = (jnp.take_along_axis(
            ins, kword[..., None], 2)[..., 0] >> kbit) & 1
        is_same = (t == EV_SAME_START)[:, None]
        cand = jnp.where(is_same, tmp_tag == grp[:, None], ins_k == 1)
        cand &= valid

        candT = cand & (y <= xj - 1)
        candI = cand & (xj <= y) & (y <= yj - 1)
        combT = jnp.where(candT, (c_val + lnj) * (A + 2) + arangeA + 1, NEG)
        combI = jnp.where(candI, (c_val - y + yj) * (A + 2) + arangeA + 1,
                          NEG)
        best = jnp.maximum(combT.max(axis=1), combI.max(axis=1))  # (R,)
        bval = best // (A + 2)
        bpred = best % (A + 2) - 1

        cur_val = jnp.take_along_axis(c_val, j[:, None], 1)[:, 0]
        cur_pred = jnp.take_along_axis(c_pred, j[:, None], 1)[:, 0]
        better = (bval > cur_val) | ((bval == cur_val) & (bpred > cur_pred))
        do_q = ((t == EV_SAME_START) | (t == EV_QUERY)) & better \
            & (best > NEG)
        c_val = jnp.where((do_q[:, None] & onehot), bval[:, None], c_val)
        c_pred = jnp.where((do_q[:, None] & onehot), bpred[:, None], c_pred)

        do_end = (t == EV_SAME_END)
        tmp_tag = jnp.where(do_end[:, None] & onehot, grp[:, None], tmp_tag)

        do_ins = (t == EV_INSERT)
        ins = jnp.where((do_ins[:, None] & onehot)[..., None],
                        ins | kmask[:, None, :], ins)
        return (c_val, c_pred, ins, tmp_tag), None

    evs = (jnp.moveaxis(ev_type, 1, 0), jnp.moveaxis(ev_anchor, 1, 0),
           jnp.moveaxis(ev_k, 1, 0), jnp.moveaxis(ev_kmask, 1, 0),
           jnp.moveaxis(ev_group, 1, 0))
    (c_val, c_pred, _, _), _ = jax.lax.scan(
        step, (c_val, c_pred, ins, tmp_tag), evs)
    return ChainScanResult(c_val=c_val, c_pred=c_pred)
