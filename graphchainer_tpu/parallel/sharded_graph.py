"""Component-sharded graph tables over the device mesh.

SURVEY §7.1 / BASELINE config 4: at pan-genome scale the HBM-resident
graph tables (Eq bitplanes + node lengths, `GraphTensors.node_eq_cat`)
should be SHARDED BY CONNECTED COMPONENT across the mesh instead of
replicated per chip (the reference has no analogue — it is single-host
shared-memory; src/Aligner.cpp:1267-1270).

Why by component: a fragment's DP band grows along edges, so every node
a fragment touches lives in the seed's weakly-connected component.
Assigning whole components to devices makes the fragment kernel's table
gathers DEVICE-LOCAL under shard_map — no collectives in the hot loop;
the only cross-device movement is routing each fragment's (tiny) job row
to its component's device on the host.

Pieces:
  plan_component_shards  greedy component -> device balancing + the
                         global->local node-id remap
  build_sharded_tables   (D, rows, 4)/(D, rows) tables laid out one
                         device-block per mesh row (NamedSharding P('dp'))
  route_fragments        bucket a fragment batch by device, pad buckets
                         to a common height, remap band ids to local
  unroute                scatter per-device results back to batch order

Equality with the replicated path is pinned by
tests/test_multichip.py::test_sharded_tables_full_model_equality (full
align_batch, 1 device vs 8-device virtual mesh).

HBM arithmetic (why this matters): chr22-scale (~40 Mbp, 2.5 M split
nodes) needs 2N x 4 x 4 B = ~80 MB replicated Eq; a 5x pan-genome set
~400 MB per chip replicated, but ~50 MB per chip sharded over 8 — the
difference between fitting alongside activations on a 16 GB v5e chip
with room to spare and burning a quarter of HBM on tables.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class ShardPlan:
    n_dev: int
    comp_dev: np.ndarray     # (ncomp,) int32: device of each component
    node_dev: np.ndarray     # (2N,) int32: device of each cat-table row
    local_id: np.ndarray     # (2N,) int32: row id within the device shard
    rows_per_dev: int        # padded shard height


def plan_component_shards(g, n_dev: int) -> ShardPlan:
    """Greedy balance: components descending by node count onto the
    least-loaded device.  Both strands of a node (cat rows v and v+N)
    live in the same component, hence on the same device."""
    N = g.n_nodes
    comp = np.asarray(g.comp, dtype=np.int64)
    sizes = np.bincount(comp, minlength=g.ncomp)
    order = np.argsort(-sizes, kind="stable")
    load = np.zeros(n_dev, dtype=np.int64)
    comp_dev = np.zeros(g.ncomp, dtype=np.int32)
    for c in order:
        d = int(np.argmin(load))
        comp_dev[c] = d
        load[d] += sizes[c]
    node_dev_half = comp_dev[comp]
    node_dev = np.concatenate([node_dev_half, node_dev_half]).astype(
        np.int32)
    # local ids: ascending global order within each device (both halves)
    local_id = np.zeros(2 * N, dtype=np.int32)
    rows = 0
    for d in range(n_dev):
        sel = np.nonzero(node_dev == d)[0]
        local_id[sel] = np.arange(len(sel), dtype=np.int32)
        rows = max(rows, len(sel))
    rows = max(rows, 1)
    # pad to a multiple of 8 so gather shapes bucket coarsely
    rows = -(-rows // 8) * 8
    return ShardPlan(n_dev=n_dev, comp_dev=comp_dev, node_dev=node_dev,
                     local_id=local_id, rows_per_dev=rows)


def build_sharded_tables(gx, plan: ShardPlan):
    """(D, rows, 4) uint32 Eq + (D, rows) int32 len, device d's block on
    mesh row d (axis 0 sharded over 'dp').  Padding rows get length 1 /
    zero Eq (no band ever references them)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from graphchainer_tpu.parallel.device import data_mesh
    D, R = plan.n_dev, plan.rows_per_dev
    eq = np.zeros((D, R, 4), dtype=np.uint32)
    ln = np.ones((D, R), dtype=np.int32)
    for d in range(D):
        sel = np.nonzero(plan.node_dev == d)[0]
        eq[d, :len(sel)] = gx.node_eq_cat[sel]
        ln[d, :len(sel)] = gx.node_len_cat[sel]
    mesh = data_mesh()
    if mesh is None:
        return jax.device_put(eq), jax.device_put(ln)
    sh = NamedSharding(mesh, P("dp"))
    return jax.device_put(eq, sh), jax.device_put(ln, sh)


def route_fragments(plan: ShardPlan, band_nodes_cat: np.ndarray):
    """Device routing for a fragment batch.

    Returns (frag_dev (F,), order (D*Fd,) int64 gather indices into the
    ORIGINAL batch building the device-blocked layout, keep (D*Fd,) bool,
    Fd).  Padding rows replicate fragment 0 (results discarded)."""
    F = len(band_nodes_cat)
    seed = np.clip(band_nodes_cat[:, 0], 0, len(plan.node_dev) - 1)
    frag_dev = plan.node_dev[seed]
    counts = np.bincount(frag_dev, minlength=plan.n_dev)
    Fd = int(counts.max(initial=1))
    Fd = -(-Fd // 8) * 8               # coarse buckets for compile reuse
    order = np.zeros(plan.n_dev * Fd, dtype=np.int64)
    keep = np.zeros(plan.n_dev * Fd, dtype=bool)
    for d in range(plan.n_dev):
        sel = np.nonzero(frag_dev == d)[0]
        order[d * Fd:d * Fd + len(sel)] = sel
        keep[d * Fd:d * Fd + len(sel)] = True
    return frag_dev, order, keep, Fd


def localize_bands(plan: ShardPlan, band_nodes_cat: np.ndarray):
    """Remap global cat-table ids to shard-local row ids (pad slots stay
    -1)."""
    ids = np.clip(band_nodes_cat, 0, len(plan.local_id) - 1)
    return np.where(band_nodes_cat >= 0, plan.local_id[ids],
                    -1).astype(np.int32)
