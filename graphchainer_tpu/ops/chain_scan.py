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


@partial(jax.jit, static_argnames=("NBmax",))
def _chain_scan_anchors(x, y, counts, s, e, a_kmask, bo, bn, bk, comp,
                        pbase, NBmax: int):
    """Chain scan with the EVENT LIST built on device from per-anchor
    data + device-resident MPC tables (host wire: ~10 bytes/anchor
    instead of ~8 int16 event words/event — the tunneled TPU is
    bandwidth-bound).

    Per anchor j with path endpoints (s, e) the host packer emits
    SAME_START(s), SAME_END(e), INSERT(e) and one QUERY per last2reach
    back-pointer of s (align/chaining.py batch_arrays_cols); this builds
    the same raw tuples as (R, A*(3+NBmax)) slots, sorts them with the
    host's (node, sec, y, x, j, sub) order via a 4-key int32 lax.sort,
    and derives the group ids from node transitions.  Results are
    bit-identical to the host packer + chain_scan
    (tests/test_chaining.py test_chain_scan_anchors_matches_host).

    bo/bn/bk: mpc.back_offsets/back_node/back_k; comp: node component;
    pbase: global path-id base per component (device-resident, uploaded
    once per process).  NBmax: max back-pointers per node (static)."""
    R, A = s.shape
    x = x.astype(jnp.int32)
    y = y.astype(jnp.int32)
    s = jnp.clip(s.astype(jnp.int32), 0, bo.shape[0] - 2)
    e = e.astype(jnp.int32)
    counts = counts.astype(jnp.int32)
    arangeA = jnp.arange(A, dtype=jnp.int32)
    valid = arangeA[None, :] < counts[:, None]
    NE = 3 + NBmax

    nb = bo[s + 1] - bo[s]                          # (R, A)
    gb = pbase[comp[s]]                             # (R, A)
    qi = jnp.arange(NBmax, dtype=jnp.int32)
    qvalid = qi[None, None, :] < nb[..., None]      # (R, A, NBmax)
    qflat = jnp.clip(bo[s][..., None] + qi, 0, max(bn.shape[0] - 1, 0))
    qnode = bn[qflat]
    qk = gb[..., None] + bk[qflat]

    # slot layout per anchor: [SAME_START, SAME_END, INSERT, QUERY*NBmax]
    sec_c = np.array([0, 0, 1] + [2] * NBmax, np.int32)
    sub_c = np.array([0, 1, 0] + [0] * NBmax, np.int32)
    typ_c = np.array([EV_SAME_START, EV_SAME_END, EV_INSERT]
                     + [EV_QUERY] * NBmax, np.int32)
    q_c = np.array([0, 0, 0] + list(range(1, NBmax + 1)), np.int32)

    node = jnp.concatenate([s[..., None], e[..., None], e[..., None],
                            qnode], axis=-1)         # (R, A, NE)
    ok = valid[..., None] & jnp.concatenate(
        [jnp.ones((R, A, 3), bool), qvalid], axis=-1)
    k_ev = jnp.concatenate([jnp.full((R, A, 3), -1, jnp.int32), qk],
                           axis=-1)

    BIGK = jnp.int32(0x7FFFFFFF)
    key1 = jnp.where(ok, node, BIGK)
    key2 = jnp.where(ok, (sec_c << 29) | y[..., None], BIGK)
    key3 = jnp.where(ok, x[..., None], BIGK)
    key4 = jnp.where(ok, (arangeA[None, :, None] << 5) | (q_c << 1)
                     | sub_c, BIGK)      # q_c <= 8 needs bits 1..4
    # payload: host wire ev_ta convention ((type+1)<<13 | anchor; 0
    # decodes to EV_NONE for padded slots)
    p1 = jnp.where(ok, ((typ_c + 1) << 13) | arangeA[None, :, None],
                   jnp.int32(0))
    flat = lambda a: a.reshape(R, A * NE)
    key1, key2, key3, key4, p1, p2 = jax.lax.sort(
        [flat(key1), flat(key2), flat(key3), flat(key4), flat(p1),
         flat(k_ev)], dimension=1, num_keys=4)
    # group id = per-read rank of the node transition (host semantics)
    new_grp = jnp.concatenate(
        [jnp.ones((R, 1), bool), key1[:, 1:] != key1[:, :-1]], axis=1)
    grp = jnp.cumsum(new_grp.astype(jnp.int32), axis=1) - 1
    return _chain_scan_a(x, y, valid, (p1 >> 13) - 1, p1 & 0x1FFF, p2,
                         a_kmask.astype(jnp.uint32), grp)


@partial(jax.jit, static_argnames=("NBmax",))
def _chain_scan_anchors_out(x, y, counts, s, e, a_kmask, bo, bn, bk,
                            comp, pbase, NBmax: int):
    res = _chain_scan_anchors(x, y, counts, s, e, a_kmask, bo, bn, bk,
                              comp, pbase, NBmax)
    return jnp.concatenate([res.c_val, res.c_pred], axis=1)


def chain_scan_anchors(g, mpc, counts, s, e, ax, ay, A: int = None):
    """Host wrapper: pad/bucket the per-anchor arrays, fetch the cached
    device MPC tables and run the fused on-device event-build + scan.
    Returns ChainScanResult, or None when the batch does not fit the
    device builder (caller falls back to the host packer + chain_scan).

    counts: (R,) anchors per read; s/e/ax/ay: flat anchor arrays grouped
    by read (same contract as align/chaining.batch_arrays_cols)."""
    R = len(counts)
    Amax = int(counts.max(initial=1))
    A = A or _bucket_pow2(Amax, 64)
    if Amax > A or A > 1024:
        return None
    max_y = int(ay.max(initial=0))
    if max_y >= (1 << 29) or (max_y + 1) * (A + 2) >= (1 << 31):
        return None
    tabs = _mpc_dev_tables(g, mpc)
    if tabs is None or tabs[0] > 8:      # NBmax beyond the slot layout
        return None
    NBmax, bo, bn, bk, comp, pbase = tabs

    rid = np.repeat(np.arange(R, dtype=np.int64), counts)
    jloc = (np.arange(len(s), dtype=np.int64)
            - np.repeat(np.cumsum(counts) - counts, counts))
    Rb = _bucket_pow2(R, 16)
    import jax as _jax
    ndev = len(_jax.devices())
    if ndev > 1:
        Rb += (-Rb) % ndev
    sA = np.zeros((Rb, A), np.int32)
    eA = np.zeros((Rb, A), np.int32)
    xA = np.zeros((Rb, A), np.int32)
    yA = np.zeros((Rb, A), np.int32)
    cnt = np.zeros(Rb, np.int32)
    cnt[:R] = counts
    sA[rid, jloc] = s
    eA[rid, jloc] = e
    xA[rid, jloc] = ax
    yA[rid, jloc] = ay
    from graphchainer_tpu.align.chaining import anchor_kmask_cols
    km = anchor_kmask_cols(g, mpc, counts, e, Rb, A)
    # narrow the wire (decode widens on device)
    x16 = xA.astype(np.int16) if max_y < 32768 else xA
    y16 = yA.astype(np.int16) if max_y < 32768 else yA
    if km.size and int(km.max()) < 256:
        km = km.astype(np.uint8)
    from graphchainer_tpu.parallel.device import shard_rows
    args = (x16, y16, cnt, sA, eA, km)
    if ndev > 1:
        from graphchainer_tpu.parallel.device import shard_call
        w = np.asarray(shard_call(
            _anchors_shard_fn(NBmax),
            tuple(shard_rows(a) for a in args) + (bo, bn, bk, comp,
                                                  pbase),
            (True,) * 6 + (False,) * 5))
    else:
        w = np.asarray(_chain_scan_anchors_out(
            *args, bo, bn, bk, comp, pbase, NBmax=NBmax))
    from graphchainer_tpu.utils import timers
    # each event step is a vectorized candidate max over the A anchor
    # slots (the reference's per-event Treap queries, BASELINE.md's
    # "chaining DP cells")
    timers.count("cells(chain)", int(counts.sum()) * (3 + NBmax) * A)
    return ChainScanResult(c_val=w[:R, :A], c_pred=w[:R, A:])


def _bucket_pow2(x: int, m: int) -> int:
    out = m
    while out < x:
        out *= 2
    return out


from functools import lru_cache


@lru_cache(maxsize=None)
def _anchors_shard_fn(NBmax: int):
    def f(x, y, counts, s, e, km, bo, bn, bk, comp, pbase):
        return _chain_scan_anchors_out(x, y, counts, s, e, km, bo, bn,
                                       bk, comp, pbase, NBmax=NBmax)
    return f


def _mpc_dev_tables(g, mpc):
    """Device-resident last2reach tables for the on-device event builder
    (uploaded once per process per graph; ~16B/node)."""
    tabs = getattr(mpc, "_chain_dev_tables", None)
    if tabs is None:
        nb = np.diff(mpc.back_offsets)
        NBmax = int(nb.max(initial=0))
        from graphchainer_tpu.align.chaining import global_path_ids
        from graphchainer_tpu.parallel.device import device_put_chunked
        pbase, n_paths = global_path_ids(mpc)
        tabs = (NBmax,
                device_put_chunked(mpc.back_offsets.astype(np.int32)),
                device_put_chunked(mpc.back_node.astype(np.int32)),
                device_put_chunked(mpc.back_k.astype(np.int32)),
                device_put_chunked(g.comp.astype(np.int32)),
                device_put_chunked(pbase.astype(np.int32)))
        mpc._chain_dev_tables = tabs
    return tabs


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
