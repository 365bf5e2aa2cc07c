"""Pallas fragment kernel (ops/pallas_frag.py) vs the XLA lane-major
core — bit-identical outputs (interpret mode; the Mosaic compile is
probed at runtime by frag_align._pallas_frag_ok on TPU backends)."""
import numpy as np
import pytest

from graphchainer_tpu.align.anchors import assemble_batch_cols
from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
from graphchainer_tpu.graph.mpc import build_mpc
from graphchainer_tpu.graph.simulate import generate_path, simulate_reads
from graphchainer_tpu.index.minimizer import build_index
from graphchainer_tpu.models.chainer import ChainerConfig, ChainerModel
from graphchainer_tpu.utils.seq import match_masks

from tests.test_mpc import random_dag_bigraph


def test_pallas_frag_matches_xla_core(rng):
    import jax.numpy as jnp
    from graphchainer_tpu.ops import frag_align
    from graphchainer_tpu.ops.pallas_frag import frag_core_pallas

    bg = random_dag_bigraph(rng, n_seg=30, p_edge=0.25, max_len=60)
    g = build_alignment_graph(bg)
    mpc = build_mpc(g)
    idx = build_index(g, k=11, w=6)
    model = ChainerModel(g, mpc, idx, ChainerConfig(band_slots=16))
    path_seq, _ = generate_path(g, seed=5)
    reads = simulate_reads(path_seq, 8, min(len(path_seq), 400), seed=8,
                           error_rate=0.12)
    jc, frags, _ = model._fragment_jobs_cols(reads)
    read_mm_cat = match_masks("".join(s for _, s in reads))
    read_base = np.zeros(len(reads) + 1, dtype=np.int64)
    np.cumsum([len(s) for _, s in reads], out=read_base[1:])
    (band_nodes, bnc, bi, ss, req, rows, S, bl) = assemble_batch_cols(
        model.gx, jc, read_mm_cat, read_base, B=16, max_in=4, slack=8)
    F = bnc.shape[0]
    Fp = -(-F // 128) * 128
    pad = Fp - F

    # build the transposed core inputs exactly like align_fragments_tl
    N2 = model.gx.node_eq_cat.shape[0]
    bn = np.pad(bnc, ((0, pad), (0, 0)), constant_values=-1)
    ids = bn.astype(np.int64)
    idc = np.clip(ids, 0, N2 - 1)
    slot_eq = model.gx.node_eq_cat[idc]               # (F,B,4)
    slot_len = np.where(ids >= 0, model.gx.node_len_cat[idc], 0)
    shift = np.zeros_like(slot_len)
    shift[:, 0] = np.pad(ss, (0, pad))
    slot_eq = (slot_eq >> (shift.astype(np.uint32) & 31)[..., None])
    slot_len = slot_len - shift
    bi_p = np.pad(bi, ((0, pad), (0, 0), (0, 0)), constant_values=-1)
    bl_p = np.pad(bl, ((0, pad), (0, 0)), constant_values=-1)
    rq = np.pad(req, ((0, pad), (0, 0), (0, 0)))
    rw = np.pad(rows, (0, pad), constant_values=1)
    from graphchainer_tpu.align.anchors import level_bucket
    n_levels = level_bucket(bl_p, 16)

    eq_t = np.transpose(slot_eq, (2, 1, 0)).astype(np.uint32)
    len_t = np.transpose(slot_len, (1, 0)).astype(np.int32)
    bi_t = np.transpose(bi_p.astype(np.int32), (2, 1, 0))
    bl_t = np.transpose(bl_p.astype(np.int32), (1, 0))
    rq_t = np.transpose(rq, (1, 2, 0)).astype(np.uint32)
    fl = rw.astype(np.int32)[None, :]
    sb0 = np.zeros((1, Fp), np.int32)

    ref = frag_align._frag_core_t(
        jnp.asarray(eq_t), jnp.asarray(len_t), jnp.asarray(bi_t),
        jnp.asarray(bl_t), jnp.asarray(rq_t), jnp.asarray(fl),
        jnp.asarray(sb0), S=S, max_in=4, n_levels=n_levels,
        carried=False, carry=None, want_state=False)
    got = frag_core_pallas(
        jnp.asarray(eq_t), jnp.asarray(len_t), jnp.asarray(bi_t),
        jnp.asarray(bl_t), jnp.asarray(rq_t), jnp.asarray(fl),
        jnp.asarray(sb0), S=S, max_in=4, n_levels=n_levels,
        interpret=True)
    names = ["best_score", "best_slot", "best_col", "best_in"]
    for name, a, b in zip(names, got, ref[:4]):
        np.testing.assert_array_equal(np.asarray(a)[..., :F],
                                      np.asarray(b)[..., :F],
                                      err_msg=name)
