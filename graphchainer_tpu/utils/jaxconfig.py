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

    Uses RUNTIME cpuid (family/model/stepping + brand + feature leaves,
    via the native helper) when available: this environment's VM
    live-migrates between physical hosts, so boot-time /proc/cpuinfo
    goes stale while the cpuid-derived LLVM target features (e.g.
    +prefer-no-gather, a model-derived tuning flag invisible in cpuinfo)
    change — and loading another host's XLA:CPU AOT executables SIGILLs
    (the r2 test-gate crash).  Falls back to cpuinfo identity lines."""
    txt = platform.machine().encode()
    try:
        from graphchainer_tpu.native import cpu_signature
        txt += cpu_signature()
    except Exception:
        want = ("flags", "Features", "model name", "model", "cpu family",
                "stepping", "vendor_id", "CPU implementer", "CPU part")
        try:
            with open("/proc/cpuinfo") as f:
                seen = set()
                for line in f:
                    key = line.split(":")[0].strip()
                    if key in want and key not in seen:
                        seen.add(key)
                        txt += line.encode()
                    if len(seen) == len(want):
                        break
        except OSError:
            pass
    return hashlib.sha1(txt).hexdigest()[:10]


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
