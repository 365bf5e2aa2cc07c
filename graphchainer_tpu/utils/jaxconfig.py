"""Central JAX configuration: persistent compile cache.

The engine's kernels are compiled per padded-shape bucket; the persistent
cache makes repeat processes (CLI runs, benchmarks, tests) skip
compilation entirely.

The cache directory is suffixed with a machine fingerprint (CPU feature
flags): XLA:CPU serializes AOT executables specialized to the compiling
host's vector extensions, and loading them on a different host SIGILLs /
segfaults inside jaxlib's cache deserialize (observed as the r2 test-gate
crash: `Loading XLA:CPU AOT result ... could lead to execution errors
such as SIGILL`).  A per-machine directory makes cross-host reuse
impossible by construction."""
from __future__ import annotations

import hashlib
import os
import platform

_done = False


def machine_tag() -> str:
    """Short fingerprint of the CPU the process runs on (feature flags
    change the validity of XLA:CPU AOT executables).

    Includes the model identity lines, not just the flags line: LLVM
    derives tuning features (e.g. +prefer-no-gather) from the CPU
    *model*, so two hosts with identical cpuinfo flags can still produce
    mutually unloadable AOT executables (observed live: `Target machine
    feature +prefer-no-gather is not supported on the host machine`)."""
    txt = platform.machine()
    want = ("flags", "Features", "model name", "model", "cpu family",
            "stepping", "vendor_id", "CPU implementer", "CPU part")
    try:
        with open("/proc/cpuinfo") as f:
            seen = set()
            for line in f:
                key = line.split(":")[0].strip()
                if key in want and key not in seen:
                    seen.add(key)
                    txt += line
                if len(seen) == len(want):
                    break
    except OSError:
        pass
    return hashlib.sha1(txt.encode()).hexdigest()[:10]


def cache_dir() -> str:
    base = os.environ.get("GRAPHCHAINER_JAX_CACHE",
                          os.path.expanduser("~/.cache/jax"))
    if not base:
        return base
    return os.path.join(base, machine_tag())


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
    cache = cache_dir()
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
