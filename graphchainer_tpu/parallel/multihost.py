"""Multi-host execution (jax.distributed).

The reference is a single-process thread pool (src/Aligner.cpp:1267-1270);
the TPU-pod equivalent is one process per host, each owning its local
chips, joined into one global device mesh by the JAX distributed runtime.
Reads stripe across processes (read i belongs to process i % P — no
coordination needed beyond the initial rendezvous), device work runs on
each process's local devices, and global statistics merge with a psum
over the global mesh at the end.

Wire-up (all processes run the same command):
    --num-processes P --process-id I --coordinator HOST:PORT
Output files get a ".partI" suffix per process (concatenate afterwards,
or leave sharded — GAM/GAF/JSON are all record-streams).
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


_initialized = False


def initialize(coordinator: str, num_processes: int, process_id: int):
    """Join the global JAX distributed runtime (idempotent)."""
    global _initialized
    if _initialized or num_processes <= 1:
        _initialized = True
        return
    import jax
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True


def process_count() -> int:
    import jax
    return jax.process_count()


def process_index() -> int:
    import jax
    return jax.process_index()


def stripe(items: Sequence, process_id: int, num_processes: int):
    """This process's read stripe (i % P == I keeps streaming order and
    balances long/short reads across hosts)."""
    return [x for i, x in enumerate(items) if i % num_processes == process_id]


def merge_stats_global(local_totals: np.ndarray) -> np.ndarray:
    """Sum a (K,) per-process stats vector over ALL processes with a psum
    on the global mesh.  Single-process: identity."""
    import jax
    if jax.process_count() <= 1:
        return np.asarray(local_totals)
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:                    # pragma: no cover
        from jax.experimental.shard_map import shard_map
    devs = jax.devices()
    mesh = Mesh(np.array(devs), ("dp",))
    nloc = len(jax.local_devices())
    # one row per LOCAL device (the local totals on the first local row,
    # zeros elsewhere) -> global (ndev, K) array -> psum over 'dp'
    rows = np.zeros((nloc, len(local_totals)), dtype=np.int64)
    rows[0] = np.asarray(local_totals, dtype=np.int64)
    garr = multihost_utils.host_local_array_to_global_array(
        rows, mesh, P("dp"))

    def f(x):
        return jax.lax.psum(jnp.sum(x, axis=0), "dp")

    fn = jax.jit(shard_map(f, mesh=mesh, in_specs=P("dp"), out_specs=P()))
    return np.asarray(jax.device_get(fn(garr)))


def part_suffix(path: Optional[str], process_id: int,
                num_processes: int) -> Optional[str]:
    """Per-process output file name (".partI" inserted before nothing —
    appended — so any extension keeps working)."""
    if path is None or num_processes <= 1:
        return path
    return f"{path}.part{process_id}"
