"""Test config: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding is validated on virtual CPU devices (the real
environment has a single TPU chip); Pallas kernels run in interpret mode on
CPU (handled inside the ops modules).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

import jax  # noqa: E402

# the axon TPU plugin overrides jax_platforms at registration; tests must
# run on the 8-device virtual CPU backend regardless
jax.config.update("jax_platforms", "cpu")

# persistent compile cache: the fragment/chain/polish kernels are expensive
# to compile on the CPU backend; cache them across test runs.  The cache
# dir is machine-fingerprinted (utils/jaxconfig.cache_dir): XLA:CPU AOT
# executables are host-CPU-specific, and loading another host's entries
# segfaults inside jaxlib deserialize (the r2 test-gate crash).
from graphchainer_tpu.utils.jaxconfig import cache_dir  # noqa: E402

_cache = cache_dir()
if _cache:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


@pytest.fixture
def rng():
    return np.random.default_rng(12345)


@pytest.fixture(scope="session")
def toy_gfa(tmp_path_factory):
    """The reference's 4-node bubble toy graph (test/graph.gfa)."""
    p = tmp_path_factory.mktemp("data") / "graph.gfa"
    p.write_text(
        "S\t1\tACGTCATGCAGTCGTAACGTAGTCGTCACAGTCAGTCGTAGCTA\n"
        "S\t2\tA\n"
        "S\t3\tT\n"
        "S\t4\tGTAGCGTCAGTCAGTCAGTCGTAGCGTAACGTCGTAGTCAGT\n"
        "L\t1\t+\t2\t+\t0M\n"
        "L\t1\t+\t3\t+\t0M\n"
        "L\t2\t+\t4\t+\t0M\n"
        "L\t3\t+\t4\t+\t0M\n")
    return str(p)


TOY_READ = ("TCATCCACGTCGTAACGTAGTCGTCACAGTCAGTCGTAGCTAAGTACGTCAAGTCAGACAGT"
            "CGTAGCGTA")


# ---------------------------------------------------------------------
# fast tier: `pytest -m fast` gives a contributor a <5-minute signal
# (kernel oracles, host-algorithm units, light e2e).  Heavy files (full
# pipelines, multi-process, scale) stay in the default tier only.
_FAST_FILES = {
    "test_chaining.py", "test_polish.py", "test_repair.py",
    "test_io.py", "test_graph.py", "test_mpc.py", "test_minimizer.py",
    "test_selection.py", "test_myers.py", "test_chains.py",
    "test_mem.py",
}


def pytest_collection_modifyitems(items):
    for item in items:
        if item.fspath.basename in _FAST_FILES:
            item.add_marker(pytest.mark.fast)


@pytest.fixture(autouse=True)
def _enforce_timeout_marker(request):
    """Enforce @pytest.mark.timeout(N) with SIGALRM (pytest-timeout is
    not in this environment; without enforcement a hung multi-process
    test would hang the whole run).  Main-thread only — pytest runs
    tests in the main thread, so this holds here."""
    import signal
    import threading
    marker = request.node.get_closest_marker("timeout")
    if marker is None or not marker.args or \
            threading.current_thread() is not threading.main_thread():
        yield
        return
    seconds = int(marker.args[0])

    def _alarm(signum, frame):
        raise TimeoutError(
            f"test exceeded @pytest.mark.timeout({seconds}) wall bound")

    old = signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(seconds)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
