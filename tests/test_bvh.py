import numpy as np
import pytest

from tyrant_tpu.config import BVHConfig
from tyrant_tpu.scene import bvh as bvhmod


def random_tri_soup(n, seed=0, spread=10.0, size=0.5):
    r = np.random.default_rng(seed)
    v0 = (r.uniform(-spread, spread, (n, 3))).astype(np.float32)
    v1 = v0 + r.normal(0, size, (n, 3)).astype(np.float32)
    v2 = v0 + r.normal(0, size, (n, 3)).astype(np.float32)
    return v0, v1, v2


def tri_bounds(v0, v1, v2):
    lo = np.minimum(np.minimum(v0, v1), v2)
    hi = np.maximum(np.maximum(v0, v1), v2)
    return lo, hi


@pytest.mark.parametrize("n", [1, 2, 5, 64, 1000])
def test_build_invariants(n):
    v0, v1, v2 = random_tri_soup(n, seed=n)
    lo, hi = tri_bounds(v0, v1, v2)
    b = bvhmod.build_bvh(lo, hi)
    bvhmod.validate_bvh(b, lo, hi, n)
    assert b.prim_count.max() <= BVHConfig().max_prims_per_leaf
    stats = bvhmod.bvh_stats(b)
    assert stats["interior"] + stats["leaves"] == stats["nodes"]


def test_equal_counts_builder():
    v0, v1, v2 = random_tri_soup(500, seed=3)
    lo, hi = tri_bounds(v0, v1, v2)
    b = bvhmod.build_bvh(lo, hi, method="equal_counts")
    bvhmod.validate_bvh(b, lo, hi, 500)


def test_degenerate_same_centroid():
    # 16 identical triangles: centroid bounds degenerate on every axis.
    # Reference makes one huge leaf (bvh.cpp:101-109); we split to <=4.
    v0 = np.tile(np.array([[0.0, 0.0, 0.0]], np.float32), (16, 1))
    v1 = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (16, 1))
    v2 = np.tile(np.array([[0.0, 1.0, 0.0]], np.float32), (16, 1))
    lo, hi = tri_bounds(v0, v1, v2)
    b = bvhmod.build_bvh(lo, hi)
    bvhmod.validate_bvh(b, lo, hi, 16)
    assert b.prim_count.max() <= 4


def test_sah_beats_equal_counts_on_clustered():
    # clustered geometry is where SAH pays off: compare summed child surface
    # area heuristic cost proxy (interior SA sum)
    r = np.random.default_rng(9)
    cl1 = r.normal((-20, 0, 0), 0.5, (300, 3)).astype(np.float32)
    cl2 = r.normal((20, 0, 0), 0.5, (300, 3)).astype(np.float32)
    v0 = np.concatenate([cl1, cl2])
    v1 = v0 + 0.1
    v2 = v0 + np.array([0.1, 0.0, 0.0], np.float32)
    lo, hi = tri_bounds(v0, v1, v2)

    def sa_cost(b):
        d = np.maximum(b.hi - b.lo, 0)
        sa = 2 * (d[:, 0] * d[:, 1] + d[:, 0] * d[:, 2] + d[:, 1] * d[:, 2])
        return sa[1:].sum()  # exclude root

    sah = bvhmod.build_bvh(lo, hi, method="sah")
    eq = bvhmod.build_bvh(lo, hi, method="equal_counts")
    assert sa_cost(sah) <= sa_cost(eq) * 1.05


def test_thread_links_consistency():
    v0, v1, v2 = random_tri_soup(200, seed=5)
    lo, hi = tri_bounds(v0, v1, v2)
    b = bvhmod.build_bvh(lo, hi)
    is_leaf = b.prim_count > 0
    n_nodes = b.n_nodes
    for octant in range(8):
        # simulate full traversal (visit everything): must visit every node
        # exactly once and terminate
        visited = np.zeros(n_nodes, bool)
        node = 0
        steps = 0
        while node != -1:
            assert not visited[node], "cycle in threaded links"
            visited[node] = True
            steps += 1
            assert steps <= n_nodes
            if is_leaf[node]:
                node = b.miss_link[octant, node]
            else:
                neg = (octant >> b.split_axis[node]) & 1
                node = b.hit_link[neg, node]
        assert visited.all(), f"octant {octant}: not all nodes reachable"

    # miss-only walk (reject every box) must terminate immediately from root
    assert b.miss_link[:, 0].max() == -1
