"""Cross-device collectives for the production pipeline.

The reference's stats are shared-memory atomics (src/Aligner.cpp:111-144).
The SPMD equivalent: each device reduces its read shard's statistics
locally, then the partial sums merge over the mesh with a psum riding the
ICI (shard_map so the collective is explicit, not compiler-inferred).
On a single device this degenerates to a plain sum."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def merge_stats(per_read: np.ndarray) -> np.ndarray:
    """Sum per-read stat rows (R, K) into totals (K,).

    With >1 local device the rows are sharded over a 1-D 'dp' mesh and
    reduced with jax.lax.psum inside shard_map; single-device falls back
    to a host sum (not worth a dispatch)."""
    per_read = np.asarray(per_read)
    devs = jax.local_devices()
    if len(devs) <= 1 or per_read.size == 0:
        return per_read.sum(axis=0)
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    try:
        from jax import shard_map          # jax >= 0.6
    except ImportError:                    # pragma: no cover
        from jax.experimental.shard_map import shard_map
    mesh = Mesh(np.array(devs), ("dp",))
    R = per_read.shape[0]
    pad = (-R) % len(devs)
    if pad:
        per_read = np.pad(per_read, ((0, pad), (0, 0)))

    def local_then_psum(x):
        return jax.lax.psum(jnp.sum(x, axis=0), "dp")

    fn = shard_map(local_then_psum, mesh=mesh,
                   in_specs=P("dp"), out_specs=P())
    arr = jax.device_put(per_read, NamedSharding(mesh, P("dp")))
    return np.asarray(jax.jit(fn)(arr))
