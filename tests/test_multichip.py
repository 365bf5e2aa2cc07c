"""Multi-device execution: the production stages shard over the 8-device
virtual CPU mesh (conftest forces it) and must produce results identical
to unsharded single-device execution."""
import numpy as np
import jax

from graphchainer_tpu.parallel.collectives import merge_stats
from graphchainer_tpu.parallel.device import data_mesh, shard_rows


def test_mesh_is_live():
    assert len(jax.devices()) == 8
    assert data_mesh() is not None


def test_chain_scan_sharded_equals_unsharded(rng):
    from graphchainer_tpu.ops.chain_scan import _chain_scan, chain_scan
    R, A, E, KW = 13, 8, 16, 1      # R deliberately not divisible by 8
    x = rng.integers(0, 50, size=(R, A)).astype(np.int32)
    y = (x + rng.integers(1, 20, size=(R, A))).astype(np.int32)
    valid = rng.random((R, A)) < 0.8
    ev_type = rng.integers(-1, 4, size=(R, E)).astype(np.int32)
    ev_anchor = rng.integers(0, A, size=(R, E)).astype(np.int32)
    ev_k = rng.integers(0, KW * 32, size=(R, E)).astype(np.int32)
    ev_kmask = rng.integers(0, 1 << 32, size=(R, E, KW), dtype=np.uint32)
    ev_group = rng.integers(0, 4, size=(R, E)).astype(np.int32)
    sharded = chain_scan(x, y, valid, ev_type, ev_anchor, ev_k, ev_kmask,
                         ev_group)
    direct = _chain_scan(x, y, valid, ev_type, ev_anchor, ev_k, ev_kmask,
                         ev_group)
    np.testing.assert_array_equal(np.asarray(sharded.c_val),
                                  np.asarray(direct.c_val))
    np.testing.assert_array_equal(np.asarray(sharded.c_pred),
                                  np.asarray(direct.c_pred))


def test_polish_sharded_row_extension(rng):
    """polish_batch pads the read axis to the device count and shards;
    results must equal exact NW regardless (R=5 not divisible by 8)."""
    from graphchainer_tpu.align import polish
    from tests.test_polish import nw_edit_distance
    reads, paths = [], []
    for _ in range(5):
        r = "".join(rng.choice(list("ACGT"), int(rng.integers(40, 90))))
        p = list(r)
        for _ in range(4):
            p[int(rng.integers(0, len(p)))] = str(rng.choice(list("ACGT")))
        reads.append(r)
        paths.append("".join(p))
    out = polish.polish_batch(reads, paths, bw=4)
    for r, p, oc in zip(reads, paths, out):
        assert oc.score == nw_edit_distance(r, p)


def test_merge_stats_psum(rng):
    rows = rng.integers(0, 100, size=(13, 7)).astype(np.int64)
    got = merge_stats(rows)
    np.testing.assert_array_equal(got, rows.sum(axis=0))
    # empty batch
    np.testing.assert_array_equal(
        merge_stats(np.zeros((0, 7), np.int64)), np.zeros(7, np.int64))


def test_fragment_batch_actually_sharded():
    """run_fragments places chunk inputs across all 8 devices."""
    arr = np.zeros((16, 4), np.int32)
    sharded = shard_rows(arr)
    assert len(sharded.sharding.device_set) == 8


def test_full_batch_1dev_equals_8dev(tmp_path):
    """The full CLC align_batch must produce IDENTICAL outputs on 1
    device and on the 8-virtual-device mesh (shard_map kernels, sharded
    chain scan, replicated band tables)."""
    import hashlib
    import json
    import os
    import subprocess
    import sys

    CHILD = r'''
import os, sys, json, hashlib
sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=%d"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import importlib.util
spec = importlib.util.spec_from_file_location("benchmod",
                                              "/root/repo/bench.py")
bm = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bm)
from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
from graphchainer_tpu.graph.mpc import build_mpc
from graphchainer_tpu.graph.simulate import generate_path, simulate_reads
from graphchainer_tpu.index.minimizer import build_index
from graphchainer_tpu.models.chainer import ChainerConfig, ChainerModel
rng = np.random.default_rng(7)
g = build_alignment_graph(bm.build_bench_graph(rng, 20_000))
mpc = build_mpc(g); idx = build_index(g, k=15, w=10)
model = ChainerModel(g, mpc, idx, ChainerConfig())
path_seq, _ = generate_path(g, seed=3)
reads = simulate_reads(path_seq, 16, 1200, seed=11, error_rate=0.10,
                       len_std=200)
out = model.align_batch(reads)
rows = [[a.name, int(a.score),
         hashlib.sha1(np.ascontiguousarray(
             a.positions).tobytes()).hexdigest() if len(a.positions)
         else ""] for a in out]
print("RESULT " + json.dumps(rows))
'''
    env = {k: v for k, v in os.environ.items()}
    env["PYTHONPATH"] = "/root/repo"

    def run(ndev):
        child = tmp_path / f"child{ndev}.py"
        child.write_text(CHILD % ndev)
        r = subprocess.run([sys.executable, str(child)], env=env,
                           capture_output=True, text=True, timeout=560,
                           cwd="/root/repo")
        assert r.returncode == 0, r.stderr[-2000:]
        line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("RESULT ")][-1]
        return json.loads(line[len("RESULT "):])

    one = run(1)
    eight = run(8)
    assert one == eight


def test_ga_batch_1dev_equals_8dev(tmp_path):
    """GA-mode align_batch (windowed extension: want_xcells + carry
    kernels under shard_map) must also be identical on 1 device and on
    the 8-virtual-device mesh."""
    import json
    import os
    import subprocess
    import sys

    CHILD = r'''
import os, sys, json, hashlib
sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=%d"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import importlib.util
spec = importlib.util.spec_from_file_location("benchmod",
                                              "/root/repo/bench.py")
bm = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bm)
from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
from graphchainer_tpu.graph.simulate import generate_path, simulate_reads
from graphchainer_tpu.index.minimizer import build_index
from graphchainer_tpu.models.aligner import AlignerConfig, GraphAlignerModel
rng = np.random.default_rng(7)
g = build_alignment_graph(bm.build_bench_graph(rng, 12_000))
idx = build_index(g, k=15, w=10)
model = GraphAlignerModel(g, idx, AlignerConfig())
path_seq, _ = generate_path(g, seed=3)
reads = simulate_reads(path_seq, 8, 900, seed=11, error_rate=0.10,
                       len_std=150)
out = model.align_batch(reads)
rows = [[a.name, int(a.score),
         hashlib.sha1(np.ascontiguousarray(
             a.positions).tobytes()).hexdigest() if len(a.positions)
         else ""] for a in out]
print("RESULT " + json.dumps(rows))
'''
    env = {k: v for k, v in os.environ.items()}
    env["PYTHONPATH"] = "/root/repo"

    def run(ndev):
        child = tmp_path / f"ga_child{ndev}.py"
        child.write_text(CHILD % ndev)
        r = subprocess.run([sys.executable, str(child)], env=env,
                           capture_output=True, text=True, timeout=560,
                           cwd="/root/repo")
        assert r.returncode == 0, r.stderr[-2000:]
        line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("RESULT ")][-1]
        return json.loads(line[len("RESULT "):])

    one = run(1)
    eight = run(8)
    assert one == eight


def test_sharded_tables_full_model_equality(tmp_path):
    """Component-sharded graph tables (parallel/sharded_graph, BASELINE
    config 4 direction): the full CLC align_batch with
    shard_graph_tables=True on the 8-virtual-device mesh must produce
    IDENTICAL outputs to single-device replicated-table execution, on a
    multi-component graph whose reads hit every component."""
    import json
    import os
    import subprocess
    import sys

    CHILD = r'''
import os, sys, json, hashlib
sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=%d"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from graphchainer_tpu.io.gfa import Bigraph
from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
from graphchainer_tpu.graph.mpc import build_mpc
from graphchainer_tpu.graph.simulate import simulate_reads
from graphchainer_tpu.index.minimizer import build_index
from graphchainer_tpu.models.chainer import ChainerConfig, ChainerModel

rng = np.random.default_rng(17)
bg = Bigraph()
comp_paths = []
for c in range(5):            # 5 disjoint bubble chains
    prev = None
    path = []
    for i in range(12):
        sp = bg.add_segment(f"c{c}s{i}", "".join(rng.choice(list("ACGT"),
                                                            int(rng.integers(60, 120)))))
        if prev is not None:
            bg.links.append((prev, False, sp, False, 0))
        a = bg.add_segment(f"c{c}a{i}", str(rng.choice(list("ACGT"))))
        b = bg.add_segment(f"c{c}b{i}", str(rng.choice(list("ACGT"))))
        bg.links.append((sp, False, a, False, 0))
        bg.links.append((sp, False, b, False, 0))
        path.append(bg.seqs[sp])
        path.append(bg.seqs[a])
        prev = a
    comp_paths.append("".join(path))
g = build_alignment_graph(bg)
assert g.ncomp >= 10       # 5 fwd + 5 rev strand components
mpc = build_mpc(g)
idx = build_index(g, k=15, w=10)
model = ChainerModel(g, mpc, idx, ChainerConfig(shard_graph_tables=True))
reads = []
for c, ps in enumerate(comp_paths):
    reads += [(f"{n}_c{c}", s) for n, s in
              simulate_reads(ps, 4, 500, seed=100 + c, error_rate=0.08,
                             len_std=80)]
out = model.align_batch(reads)
rows = [[a.name, int(a.score),
         hashlib.sha1(np.ascontiguousarray(
             a.positions).tobytes()).hexdigest() if len(a.positions)
         else ""] for a in out]
shp = getattr(model.gx, "shard_plan", None)
print("PLAN " + json.dumps(None if shp is None else
                           [int(shp.n_dev), int(shp.rows_per_dev)]))
print("RESULT " + json.dumps(rows))
'''
    env = {k: v for k, v in os.environ.items()}
    env["PYTHONPATH"] = "/root/repo"

    def run(ndev):
        child = tmp_path / f"shchild{ndev}.py"
        child.write_text(CHILD % ndev)
        r = subprocess.run([sys.executable, str(child)], env=env,
                           capture_output=True, text=True, timeout=560,
                           cwd="/root/repo")
        assert r.returncode == 0, r.stderr[-2000:]
        plan = [ln for ln in r.stdout.splitlines()
                if ln.startswith("PLAN ")][-1]
        line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("RESULT ")][-1]
        return (json.loads(plan[len("PLAN "):]),
                json.loads(line[len("RESULT "):]))

    plan1, one = run(1)
    plan8, eight = run(8)
    assert plan1 is None          # single device: flag is a no-op
    assert plan8 is not None and plan8[0] == 8
    assert one == eight
    assert all(score >= 0 and h for _, score, h in one)
