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
_cpu_feats: bytes | None = None


def _xla_cpu_features() -> bytes:
    """The LLVM target-feature string XLA:CPU compiles with RIGHT NOW —
    the exact string cpu_aot_loader compares at cache-load time (compile
    a trivial function, serialize it, pull the `+feat,...` run out of the
    blob).  Catches tuning flags like +prefer-no-gather that are derived
    from kernel/microcode mitigation state and can change across VM
    live-migrations WITHOUT changing cpuid (the residual r2 mismatch the
    cpuid sweep missed).  Only called in CPU-platform processes: it must
    never trigger axon TPU plugin initialization (which hangs when the
    tunnel is down)."""
    global _cpu_feats
    if _cpu_feats is None:
        import re

        import jax
        import numpy as np
        f = jax.jit(lambda x: x + 1)
        blob = (f.lower(np.ones((4,), np.float32)).compile()
                .runtime_executable().serialize())
        m = re.search(rb"[+\-][a-z0-9\-\.]{2,24}"
                      rb"(?:,[+\-][a-z0-9\-\.]{2,24}){8,}", blob)
        _cpu_feats = m.group(0) if m else b""
    return _cpu_feats


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
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        # CPU-platform process (tests, dryrun, multihost children): fold
        # in the live LLVM feature string so the tag can never collide
        # across a migration that only flips compiler tuning flags
        try:
            txt += _xla_cpu_features()
        except Exception:
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
