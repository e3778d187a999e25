import jax.numpy as jnp
import numpy as np
import pytest

from tyrant_tpu.config import EPSILON, VERY_FAR
from tyrant_tpu.ops import intersect, traverse
from tyrant_tpu.scene import bvh as bvhmod

from .test_bvh import random_tri_soup, tri_bounds


def make_device_bvh(n_tris, seed=0, **soup_kw):
    v0, v1, v2 = random_tri_soup(n_tris, seed=seed, **soup_kw)
    lo, hi = tri_bounds(v0, v1, v2)
    b = bvhmod.build_bvh(lo, hi)
    dev = traverse.BVHDevice.from_host(b, v0, v1 - v0, v2 - v0)
    return dev, (v0, v1 - v0, v2 - v0), b


def random_rays(n, seed=0, spread=12.0):
    r = np.random.default_rng(seed + 1000)
    o = r.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("n_tris,n_rays", [(1, 64), (7, 256), (300, 512)])
def test_closest_hit_matches_brute_force(n_tris, n_rays):
    dev, (tv, te1, te2), _ = make_device_bvh(n_tris, seed=n_tris)
    o, d = random_rays(n_rays, seed=n_tris)

    t_bvh, id_bvh = traverse.closest_hit(o, d, dev)
    t_bf, id_bf = intersect.intersect_triangles_brute(
        o, d, jnp.asarray(tv), jnp.asarray(te1), jnp.asarray(te2))

    t_bvh, id_bvh = np.asarray(t_bvh), np.asarray(id_bvh)
    t_bf, id_bf = np.asarray(t_bf), np.asarray(id_bf)

    # same hit/miss classification and same distances
    np.testing.assert_array_equal(id_bvh >= 0, id_bf >= 0)
    hits = id_bf >= 0
    np.testing.assert_allclose(t_bvh[hits], t_bf[hits], rtol=1e-5)
    # identifiers map to the same triangle (compare geometry, since ids are
    # in different orders: BVH ids index the reordered array)
    perm_tv = np.asarray(dev.tri_vert)
    same_tri = np.allclose(perm_tv[id_bvh[hits]], tv[id_bf[hits]], atol=1e-6)
    assert same_tri


def test_any_hit_matches_brute_force():
    dev, (tv, te1, te2), _ = make_device_bvh(200, seed=11)
    o, d = random_rays(400, seed=11)
    t_bf, id_bf = intersect.intersect_triangles_brute(
        o, d, jnp.asarray(tv), jnp.asarray(te1), jnp.asarray(te2))
    t_bf = np.asarray(t_bf)

    max_dist = jnp.full((400,), 8.0, jnp.float32)
    occ = np.asarray(traverse.any_hit(o, d, max_dist, dev))
    # brute-force occlusion: any hit with t in (eps, maxd - eps)
    want = (t_bf < VERY_FAR) & (8.0 - t_bf > EPSILON)
    np.testing.assert_array_equal(occ, want)


def test_t_init_seeding():
    # pre-seeded closest distance must prune (reference seeds traversal with
    # the sphere-pass result, kernel.cu:125-141)
    dev, (tv, te1, te2), _ = make_device_bvh(100, seed=21)
    o, d = random_rays(100, seed=21)
    t_bf, id_bf = intersect.intersect_triangles_brute(
        o, d, jnp.asarray(tv), jnp.asarray(te1), jnp.asarray(te2))
    t_bf = np.asarray(t_bf)
    hits = t_bf < VERY_FAR
    # seed t_init just below each brute-force hit -> traversal must not
    # report a hit (nothing strictly closer by > eps)
    t_init = jnp.asarray(np.where(hits, t_bf - 2 * EPSILON, 1.0).astype(np.float32))
    t2, id2 = traverse.closest_hit(o, d, dev, t_init=t_init)
    assert (np.asarray(id2) == -1).all()


def test_traversal_depth_map_reports_visits():
    dev, _, b = make_device_bvh(300, seed=31)
    o, d = random_rays(256, seed=31)
    t, hid, visits = traverse.traversal_depth_map(o, d, dev)
    v = np.asarray(visits)
    assert (v >= 1).all()          # root always visited
    assert v.max() <= b.n_nodes    # never more visits than nodes
    # closest-hit results must agree with plain traversal
    t2, hid2 = traverse.closest_hit(o, d, dev)
    np.testing.assert_array_equal(np.asarray(hid), np.asarray(hid2))


def test_dragon_mesh_traversal():
    # mid-size real mesh (SURVEY.md §7 layer 5): reference asset, read-only
    from tyrant_tpu.scene.ply import load_ply
    verts, faces = load_ply("/root/reference/PathTracer/Data/dragon.ply")
    assert verts.shape[0] == 22126 and faces.shape[0] == 37986  # dragon.ply header
    v0, v1, v2 = (verts[faces[:, i]] for i in range(3))
    lo, hi = tri_bounds(v0, v1, v2)
    b = bvhmod.build_bvh(lo, hi)
    bvhmod.validate_bvh(b, lo, hi, faces.shape[0])
    dev = traverse.BVHDevice.from_host(b, v0, v1 - v0, v2 - v0)

    center = verts.mean(0)
    n = 512
    r = np.random.default_rng(7)
    o = np.tile(center + np.array([0, -60, 20], np.float32), (n, 1))
    # aim at triangle centroids: interior points are numerically robust,
    # unlike vertices where the barycentric test sits on a knife edge and
    # fma-fusion differences flip hit/miss between code paths
    fsel = faces[r.integers(0, faces.shape[0], n)]
    target = verts[fsel].mean(axis=1)
    d = target - o
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)

    t_bvh, id_bvh = traverse.closest_hit(jnp.asarray(o), jnp.asarray(d), dev)
    t_bf, id_bf = intersect.intersect_triangles_brute(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(v0),
        jnp.asarray(v1 - v0), jnp.asarray(v2 - v0))
    t_bvh, t_bf = np.asarray(t_bvh), np.asarray(t_bf)
    np.testing.assert_array_equal(np.asarray(id_bvh) >= 0, np.asarray(id_bf) >= 0)
    hits = t_bf < VERY_FAR
    assert hits.mean() > 0.5  # rays aimed at the dragon mostly hit
    np.testing.assert_allclose(t_bvh[hits], t_bf[hits], rtol=1e-5)
