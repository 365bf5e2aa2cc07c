"""MPC construction tests: validity + minimality on toy and random DAGs.

Oracle: the antichain verifier (port of reference checkMinPathCover,
src/AlignmentGraph.cpp:1393-1428) plus brute-force max-antichain width on
tiny graphs (Dilworth: min #chains covering a DAG == max antichain).
"""
import itertools

import numpy as np
import pytest

from graphchainer_tpu.graph.alignment_graph import build_alignment_graph
from graphchainer_tpu.graph.mpc import MPCIndex, build_mpc, check_min_path_cover
from graphchainer_tpu.io.gfa import Bigraph, load_gfa


def random_dag_bigraph(rng, n_seg=8, p_edge=0.3, max_len=5):
    bg = Bigraph()
    for i in range(n_seg):
        L = int(rng.integers(1, max_len + 1))
        bg.add_segment(str(i), "".join(rng.choice(list("ACGT"), L)))
    for i in range(n_seg):
        for j in range(i + 1, n_seg):
            if rng.random() < p_edge:
                bg.links.append((i, False, j, False, 0))
    return bg


def brute_force_width(g):
    """Max antichain size per component over split nodes (tiny graphs)."""
    n = g.n_nodes
    reach = np.zeros((n, n), dtype=bool)
    for v in range(n):
        stack = [v]
        while stack:
            u = stack.pop()
            for w in g.out_neighbors(u):
                if not reach[v, int(w)]:
                    reach[v, int(w)] = True
                    stack.append(int(w))
    widths = {}
    for c in range(g.ncomp):
        nodes = np.nonzero(g.comp == c)[0]
        best = 1
        for r in range(2, len(nodes) + 1):
            found = False
            for sub in itertools.combinations(nodes, r):
                if all(not reach[a, b] and not reach[b, a]
                       for a, b in itertools.combinations(sub, 2)):
                    best = r
                    found = True
                    break
            if not found:
                break
        widths[c] = best
    return widths


def test_toy_graph_mpc(toy_gfa):
    g = build_alignment_graph(load_gfa(toy_gfa))
    mpc = build_mpc(g)
    # bubble graph: width 2 per strand component
    assert list(mpc.comp_width) == [2, 2]
    assert check_min_path_cover(g, mpc)


@pytest.mark.parametrize("seed", range(6))
def test_random_dag_mpc(seed):
    rng = np.random.default_rng(seed)
    bg = random_dag_bigraph(rng, n_seg=7, p_edge=0.35, max_len=3)
    g = build_alignment_graph(bg)
    mpc = build_mpc(g)
    assert check_min_path_cover(g, mpc), f"invalid MPC for seed {seed}"
    widths = brute_force_width(g)
    for c in range(g.ncomp):
        assert mpc.comp_width[c] == widths[c], (
            f"seed {seed} comp {c}: width {mpc.comp_width[c]} != "
            f"brute-force {widths[c]}")


def test_backwards_pointers_semantics(toy_gfa):
    g = build_alignment_graph(load_gfa(toy_gfa))
    mpc = build_mpc(g)
    # For every (u, k) pointer at v: u is on path k of v's component, u
    # reaches v, and u != v.
    for c in range(g.ncomp):
        pc = mpc.paths_of_component(c)
        for v in np.nonzero(g.comp == c)[0]:
            us, ks = mpc.backwards(int(v))
            for u, k in zip(us, ks):
                assert int(u) != int(v)
                assert int(u) in set(int(x) for x in pc[int(k)])
                # reachability
                seen, stack, ok = {int(u)}, [int(u)], False
                while stack and not ok:
                    x = stack.pop()
                    for w in g.out_neighbors(x):
                        if int(w) == int(v):
                            ok = True
                            break
                        if int(w) not in seen:
                            seen.add(int(w))
                            stack.append(int(w))
                assert ok


def test_last2reach_is_last(toy_gfa):
    """The pointer must be the LAST node of path k reaching v, not just any."""
    g = build_alignment_graph(load_gfa(toy_gfa))
    mpc = build_mpc(g)

    def reaches(a, b):
        seen, stack = {a}, [a]
        while stack:
            x = stack.pop()
            for w in g.out_neighbors(x):
                if int(w) == b:
                    return True
                if int(w) not in seen:
                    seen.add(int(w))
                    stack.append(int(w))
        return False

    for c in range(g.ncomp):
        pc = mpc.paths_of_component(c)
        for v in np.nonzero(g.comp == c)[0]:
            v = int(v)
            us, ks = mpc.backwards(v)
            ptr = {int(k): int(u) for u, k in zip(us, ks)}
            for k, path in enumerate(pc):
                # expected: last index j with path[j] != v and path[j]
                # reaches v
                exp = None
                for node in path:
                    node = int(node)
                    if node != v and reaches(node, v):
                        exp = node
                if exp is None:
                    assert k not in ptr
                else:
                    assert ptr.get(k) == exp, (v, k, ptr.get(k), exp)


def test_save_load_roundtrip(toy_gfa, tmp_path):
    g = build_alignment_graph(load_gfa(toy_gfa))
    mpc = build_mpc(g)
    f = str(tmp_path / "mpc.npz")
    mpc.save(f)
    m2 = MPCIndex.load(f)
    np.testing.assert_array_equal(mpc.path_nodes, m2.path_nodes)
    np.testing.assert_array_equal(mpc.back_node, m2.back_node)
    np.testing.assert_array_equal(mpc.comp_width, m2.comp_width)
