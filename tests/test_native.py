"""Native C++ builder/loader vs numpy reference implementations."""

import numpy as np
import pytest

from tyrant_tpu.scene import bvh as bvhmod

from .test_bvh import random_tri_soup, tri_bounds

native = pytest.importorskip("tyrant_tpu.native.bvh_native")
from tyrant_tpu.native import ply_native  # noqa: E402


@pytest.mark.parametrize("n", [1, 2, 17, 500, 5000])
def test_native_builder_matches_numpy(n):
    v0, v1, v2 = random_tri_soup(n, seed=n)
    lo, hi = tri_bounds(v0, v1, v2)
    a = bvhmod.build_bvh(lo, hi)
    b = native.build_bvh(lo, hi)
    assert a.n_nodes == b.n_nodes
    np.testing.assert_array_equal(a.meta, b.meta)
    np.testing.assert_array_equal(a.second_child, b.second_child)
    np.testing.assert_array_equal(a.perm, b.perm)
    np.testing.assert_allclose(a.lo, b.lo, rtol=1e-6)
    np.testing.assert_allclose(a.hi, b.hi, rtol=1e-6)
    np.testing.assert_array_equal(a.hit_link, b.hit_link)
    np.testing.assert_array_equal(a.miss_link, b.miss_link)


def test_native_builder_equal_counts():
    v0, v1, v2 = random_tri_soup(300, seed=3)
    lo, hi = tri_bounds(v0, v1, v2)
    b = native.build_bvh(lo, hi, method="equal_counts")
    bvhmod.validate_bvh(b, lo, hi, 300)


def test_native_builder_degenerate():
    v0 = np.tile(np.array([[0.0, 0.0, 0.0]], np.float32), (16, 1))
    lo, hi = tri_bounds(v0, v0 + 0.5, v0 + np.array([0.5, 0, 0], np.float32))
    b = native.build_bvh(lo, hi)
    bvhmod.validate_bvh(b, lo, hi, 16)
    assert b.prim_count.max() <= 4


def test_native_builder_large_fast():
    import time
    v0, v1, v2 = random_tri_soup(200_000, seed=9)
    lo, hi = tri_bounds(v0, v1, v2)
    t0 = time.time()
    b = native.build_bvh(lo, hi)
    dt = time.time() - t0
    assert b.n_nodes > 50_000
    assert dt < 10.0, f"native build too slow: {dt:.1f}s"
    # spot invariants (full validate is O(n) python-loop slow)
    assert np.array_equal(np.sort(b.perm), np.arange(200_000))
    from tyrant_tpu.config import BVHConfig
    assert b.prim_count.max() <= BVHConfig().max_prims_per_leaf


def test_native_ply_matches_python():
    from tyrant_tpu.scene.ply import load_ply as py_load
    for name in ("cube.ply", "dragon.ply"):
        path = f"/root/reference/PathTracer/Data/{name}"
        v1, f1 = py_load(path)
        v2, f2 = ply_native.load_ply(path)
        np.testing.assert_allclose(v1, v2, rtol=1e-6)
        np.testing.assert_array_equal(f1, f2)


def test_native_ply_binary(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 1]], np.float32)
    p = tmp_path / "t.ply"
    with open(p, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(b"element vertex 4\n")
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        f.write(b"element face 2\n")
        f.write(b"property list uchar int vertex_indices\n")
        f.write(b"end_header\n")
        f.write(verts.astype("<f4").tobytes())
        for n, idx in [(3, [0, 1, 2]), (4, [0, 1, 3, 2])]:
            f.write(np.uint8(n).tobytes())
            f.write(np.asarray(idx, "<i4").tobytes())
    v, fc = ply_native.load_ply(str(p))
    np.testing.assert_allclose(v, verts)
    assert fc.shape == (3, 3)
