import jax.numpy as jnp
import numpy as np

from tyrant_tpu.config import VERY_FAR
from tyrant_tpu.ops import intersect


def test_ray_sphere_basic():
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    t = intersect.ray_sphere(o, d, jnp.asarray([[0.0, 0.0, 5.0]]), jnp.asarray([1.0]))
    np.testing.assert_allclose(np.asarray(t), 4.0, rtol=1e-5)
    # miss
    t = intersect.ray_sphere(o, d, jnp.asarray([[10.0, 0.0, 5.0]]), jnp.asarray([1.0]))
    assert np.asarray(t)[0] == 0.0
    # inside -> far root
    t = intersect.ray_sphere(o, d, jnp.asarray([[0.0, 0.0, 0.0]]), jnp.asarray([1.0]))
    np.testing.assert_allclose(np.asarray(t), 1.0, rtol=1e-5)


def test_moller_trumbore_hit_miss_backface():
    vert = jnp.asarray([[0.0, 0.0, 5.0]])
    e1 = jnp.asarray([[2.0, 0.0, 0.0]])
    e2 = jnp.asarray([[0.0, 2.0, 0.0]])
    o = jnp.asarray([[0.5, 0.5, 0.0]])
    # front face: ray along +z, det = dot(e1, cross(d, e2)) = d . (e2 x e1)?
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    t_front = np.asarray(intersect.moller_trumbore(o, d, vert, e1, e2))[0]
    d_back = jnp.asarray([[0.0, 0.0, -1.0]])
    o_back = jnp.asarray([[0.5, 0.5, 10.0]])
    t_back = np.asarray(intersect.moller_trumbore(o_back, d_back, vert, e1, e2))[0]
    # exactly one orientation hits (backface culling, loader.h:28)
    hits = sorted([t_front, t_back])
    assert hits[0] == 0.0 and abs(hits[1] - 5.0) < 1e-5
    # outside barycentric range
    o_miss = jnp.asarray([[5.0, 5.0, 0.0]])
    assert np.asarray(intersect.moller_trumbore(o_miss, d, vert, e1, e2))[0] == 0.0


def test_ray_aabb_slab():
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = np.asarray([[1.0, 1.0, 1.0]], dtype=np.float32)
    d /= np.linalg.norm(d)
    inv = jnp.asarray(1.0 / d)
    neg = jnp.asarray(d < 0)
    lo = jnp.asarray([[1.0, 1.0, 1.0]])
    hi = jnp.asarray([[2.0, 2.0, 2.0]])
    hit = intersect.ray_aabb(o, inv, neg, lo, hi, jnp.asarray([1e20]))
    assert bool(np.asarray(hit)[0])
    # early-reject when closest hit is nearer than the box
    hit = intersect.ray_aabb(o, inv, neg, lo, hi, jnp.asarray([0.5]))
    assert not bool(np.asarray(hit)[0])
    # behind the ray
    lo2 = jnp.asarray([[-3.0, -3.0, -3.0]])
    hi2 = jnp.asarray([[-2.0, -2.0, -2.0]])
    hit = intersect.ray_aabb(o, inv, neg, lo2, hi2, jnp.asarray([1e20]))
    assert not bool(np.asarray(hit)[0])
    # ray starting inside the box
    lo3 = jnp.asarray([[-1.0, -1.0, -1.0]])
    hi3 = jnp.asarray([[1.0, 1.0, 1.0]])
    hit = intersect.ray_aabb(o, inv, neg, lo3, hi3, jnp.asarray([1e20]))
    assert bool(np.asarray(hit)[0])


def test_ray_aabb_negative_direction():
    o = jnp.asarray([[5.0, 5.0, 5.0]])
    d = np.asarray([[-1.0, -1.0, -1.0]], dtype=np.float32)
    d /= np.linalg.norm(d)
    inv = jnp.asarray(1.0 / d)
    neg = jnp.asarray(d < 0)
    lo = jnp.asarray([[1.0, 1.0, 1.0]])
    hi = jnp.asarray([[2.0, 2.0, 2.0]])
    assert bool(np.asarray(intersect.ray_aabb(o, inv, neg, lo, hi, jnp.asarray([1e20])))[0])


def test_intersect_spheres_closest_and_tie():
    centers = jnp.asarray([[0.0, 0.0, 10.0], [0.0, 0.0, 5.0], [0.0, 0.0, 20.0]])
    radii = jnp.asarray([1.0, 1.0, 1.0])
    o = jnp.zeros((1, 3))
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    t, idx = intersect.intersect_spheres(o, d, centers, radii)
    np.testing.assert_allclose(np.asarray(t), 4.0, rtol=1e-5)
    assert np.asarray(idx)[0] == 1
    # total miss
    d2 = jnp.asarray([[0.0, 0.0, -1.0]])
    t2, idx2 = intersect.intersect_spheres(o, d2, centers, radii)
    assert np.asarray(t2)[0] == VERY_FAR and np.asarray(idx2)[0] == -1


def test_brute_force_triangles():
    # two parallel quads (4 tris) facing -z (visible to a +z ray under
    # backface culling: det = -dir.n must be > 0), ray should hit the nearer
    def quad(z):
        return [([-1, -1, z], [0, 2, 0], [2, 0, 0]),
                ([1, 1, z], [0, -2, 0], [-2, 0, 0])]
    tris = quad(5.0) + quad(9.0)
    vert = jnp.asarray([t[0] for t in tris], dtype=jnp.float32)
    e1 = jnp.asarray([t[1] for t in tris], dtype=jnp.float32)
    e2 = jnp.asarray([t[2] for t in tris], dtype=jnp.float32)
    o = jnp.asarray([[0.1, 0.2, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    t, idx = intersect.intersect_triangles_brute(o, d, vert, e1, e2)
    assert abs(np.asarray(t)[0] - 5.0) < 1e-4
    assert np.asarray(idx)[0] in (0, 1)
    # opposite direction from beyond both quads sees only backfaces -> miss
    o2 = jnp.asarray([[0.1, 0.2, 20.0]])
    d2 = jnp.asarray([[0.0, 0.0, -1.0]])
    t2, idx2 = intersect.intersect_triangles_brute(o2, d2, vert, e1, e2)
    assert np.asarray(idx2)[0] == -1
