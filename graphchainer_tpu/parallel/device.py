"""Device transfer utilities.

The axon-tunneled dev TPU stalls on single transfers above ~0.5MB, and a
production HBM-resident design wants graph tables uploaded once anyway.
All host->device movement goes through jit-argument transfer in chunks of
<= MAX_TRANSFER bytes, concatenated on device; downloads slice the device
array and pull pieces of the same size."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

MAX_TRANSFER = 384 * 1024   # tunnel hangs at ~512KB; 400KB measured safe

_mesh = None


def data_mesh():
    """A 1-D data-parallel mesh over all LOCAL devices (None if single
    device — e.g. the tunneled dev TPU).  Under multi-host execution each
    process shards its own read stripe over its local chips only; the
    single global collective is the final stats psum
    (parallel/multihost.merge_stats_global)."""
    global _mesh
    devs = jax.local_devices()
    if len(devs) <= 1:
        return None
    if _mesh is None or _mesh.devices.size != len(devs):
        from jax.sharding import Mesh
        _mesh = Mesh(np.array(devs), ("dp",))
    return _mesh


def shard_rows(arr):
    """Shard axis 0 over the data mesh (no-op on a single device)."""
    mesh = data_mesh()
    if mesh is None:
        return arr
    from jax.sharding import NamedSharding, PartitionSpec as P
    spec = P("dp", *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def replicated_sharding():
    mesh = data_mesh()
    if mesh is None:
        return None
    from jax.sharding import NamedSharding, PartitionSpec as P
    return NamedSharding(mesh, P())


@jax.jit
def _identity(x):
    return x


def _rows_per_chunk(arr: np.ndarray) -> int:
    row_bytes = max(arr.nbytes // max(arr.shape[0], 1), 1)
    return max(1, MAX_TRANSFER // row_bytes)


# bound on dispatched-but-unfinished chunk uploads: chr-scale tables
# (~400 chunks at 40Mbp) dispatched all-async wedged the dev tunnel
# deterministically (three 40Mbp runs froze mid-upload while 20Mbp's
# ~200 chunks survived); blocking every K-th chunk keeps the tunnel's
# in-flight RPC queue shallow at negligible cost on real hardware
MAX_INFLIGHT_CHUNKS = 16


def device_put_chunked(arr: np.ndarray) -> jax.Array:
    """Upload a numpy array in <=MAX_TRANSFER pieces along axis 0, at
    most MAX_INFLIGHT_CHUNKS dispatched ahead of the last completion.
    On a multi-device mesh the array is replicated with a plain
    device_put (the transfer cap is a tunneled-single-chip artifact)."""
    repl = replicated_sharding()
    if repl is not None:
        return jax.device_put(arr, repl)
    if arr.nbytes <= MAX_TRANSFER:
        return _identity(arr)
    step = _rows_per_chunk(arr)
    parts = []
    for i in range(0, arr.shape[0], step):
        parts.append(_identity(arr[i:i + step]))
        if len(parts) % MAX_INFLIGHT_CHUNKS == 0:
            parts[-1].block_until_ready()
    # tree concatenate: bounded operand counts (a chr-scale table is
    # ~400 chunks; one flat 400-operand concat is a single giant HLO)
    while len(parts) > 64:
        parts = [jnp.concatenate(parts[j:j + 64], axis=0)
                 for j in range(0, len(parts), 64)]
    return jnp.concatenate(parts, axis=0)


def asarray_chunked(arr: jax.Array) -> np.ndarray:
    """Download a device array in <=MAX_TRANSFER pieces along axis 0."""
    nbytes = arr.size * arr.dtype.itemsize
    if nbytes <= MAX_TRANSFER:
        return np.asarray(arr)
    n = arr.shape[0]
    row_bytes = max(nbytes // max(n, 1), 1)
    step = max(1, MAX_TRANSFER // row_bytes)
    return np.concatenate([np.asarray(arr[i:i + step])
                           for i in range(0, n, step)], axis=0)


def max_batch_rows(row_bytes: int) -> int:
    """Largest axis-0 extent keeping a row_bytes-wide array uploadable in
    one piece."""
    return max(1, MAX_TRANSFER // max(row_bytes, 1))


def _shard_wrap(fn, sharded, mesh_devs):
    import jax
    from jax.sharding import Mesh, PartitionSpec as P
    try:
        from jax import shard_map          # jax >= 0.6
    except ImportError:                    # pragma: no cover
        from jax.experimental.shard_map import shard_map
    mesh = data_mesh()
    in_specs = tuple(P("dp") if s else P() for s in sharded)
    # no collectives inside: disable the varying-axis analysis (it
    # rejects lax.cond branches whose replication types differ)
    try:
        sm = shard_map(fn, mesh=mesh, in_specs=in_specs,
                       out_specs=P("dp"), check_vma=False)
    except TypeError:                      # pragma: no cover - older jax
        sm = shard_map(fn, mesh=mesh, in_specs=in_specs,
                       out_specs=P("dp"), check_rep=False)
    return jax.jit(sm)


_shard_cache = {}


def shard_call(fn, args, sharded):
    """Run `fn(*args)` with each LOCAL device computing its row-shard
    (jax.shard_map over the 1-D data mesh; no collectives inside).

    The lane-major kernels transpose the batch axis onto the vector
    lanes; under plain SPMD jit that transpose reshards the batch across
    devices every op.  shard_map keeps the whole kernel local per
    device: in_specs P('dp') for `sharded` args (row counts must divide
    the device count), P() for replicated ones, outputs row-sharded.

    Single device: plain fn(*args)."""
    mesh = data_mesh()
    if mesh is None:
        return fn(*args)
    key = (fn, tuple(sharded), mesh.devices.size)
    wrapped = _shard_cache.get(key)
    if wrapped is None:
        wrapped = _shard_wrap(fn, tuple(sharded), mesh.devices.size)
        _shard_cache[key] = wrapped
    return wrapped(*args)
