"""Device mesh + sharding layer.

The reference's only parallelism is N identical worker threads over a
shared queue (src/Aligner.cpp:1267-1270).  The TPU equivalent is SPMD data
parallelism over a device mesh:

  axes: 'data' = read batches (dp), 'seq' = fragments within reads (the
  sequence-parallel axis — fragments of one read spread across devices,
  chaining is the per-read reduction; SURVEY.md §5 'long context').

The fragment kernel's inputs are per-fragment self-contained tensors (the
band builder gathers all graph data on the host), so fragment jobs shard
over the full mesh; chaining/polish shard reads over 'data'.  Graph and
MPC tables stay host-side / replicated.  Per-shard statistics merge with
jax.lax collectives (psum) inside shard_map when running multi-host.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_seq: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_seq
    dev = np.array(devices[:n_data * n_seq]).reshape(n_data, n_seq)
    return Mesh(dev, ("data", "seq"))


def frag_sharding(mesh: Mesh) -> NamedSharding:
    """Fragment-axis tensors: shard dim 0 over the whole mesh."""
    return NamedSharding(mesh, P(("data", "seq")))


def read_sharding(mesh: Mesh) -> NamedSharding:
    """Read-axis tensors: shard dim 0 over 'data', replicate over 'seq'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(arr: np.ndarray, mult: int, axis: int = 0,
                    fill=0) -> np.ndarray:
    n = arr.shape[axis]
    rem = (-n) % mult
    if rem == 0:
        return arr
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, rem)
    return np.pad(arr, pad, constant_values=fill)
