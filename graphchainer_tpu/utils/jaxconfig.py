"""Central JAX configuration: persistent compile cache.

The engine's kernels are compiled per padded-shape bucket; the persistent
cache makes repeat processes (CLI runs, benchmarks, tests) skip
compilation entirely."""
from __future__ import annotations

import os

_done = False


def setup():
    global _done
    if _done:
        return
    _done = True
    import jax
    # the axon TPU plugin overrides jax_platforms at registration; honor an
    # explicit JAX_PLATFORMS=cpu request from the user
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    cache = os.environ.get("GRAPHCHAINER_JAX_CACHE",
                           os.path.expanduser("~/.cache/jax"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
