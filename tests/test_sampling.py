import jax.numpy as jnp
import numpy as np

from tyrant_tpu.ops import rng, sampling


def _rand_dirs(n, seed=0):
    r = np.random.default_rng(seed)
    v = r.normal(size=(n, 3)).astype(np.float32)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_orthonormal_basis():
    w = jnp.asarray(_rand_dirs(500))
    u, v = sampling.orthonormal_basis(w)
    np.testing.assert_allclose(np.asarray(sampling.dot(u, w)), 0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sampling.dot(v, w)), 0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sampling.dot(u, v)), 0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sampling.dot(u, u)), 1, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sampling.dot(v, v)), 1, atol=1e-4)


def test_concentric_disk_in_unit_disk_and_uniform():
    r = np.random.default_rng(1)
    u = jnp.asarray(r.uniform(size=(20000, 2)).astype(np.float32))
    p = np.asarray(sampling.concentric_sample_disk(u))
    rad = np.linalg.norm(p, axis=-1)
    assert rad.max() <= 1.0 + 1e-5
    # uniform on disk: E[r^2] = 0.5
    assert abs((rad ** 2).mean() - 0.5) < 0.01
    # degenerate center maps to 0
    z = np.asarray(sampling.concentric_sample_disk(jnp.asarray([[0.5, 0.5]])))
    np.testing.assert_allclose(z, 0.0)


def test_cone_sample_within_extent():
    d = jnp.asarray(_rand_dirs(2000, 2))
    seeds = rng.seed_from(jnp.arange(2000), 1)
    extent = 0.05
    _, s = sampling.cone_sample(d, extent, seeds)
    cosang = np.asarray(sampling.dot(s, d))
    assert cosang.min() >= 1.0 - extent - 1e-4
    np.testing.assert_allclose(np.linalg.norm(np.asarray(s), axis=-1), 1.0, atol=1e-4)


def test_cosine_hemisphere_distribution():
    n = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (50000, 1)).astype(np.float32))
    seeds = rng.seed_from(jnp.arange(50000), 9)
    _, d = sampling.cosine_hemisphere_sample(n, seeds)
    d = np.asarray(d)
    cos_t = d[:, 2]
    assert cos_t.min() >= -1e-5
    # cosine-weighted: E[cos] = 2/3
    assert abs(cos_t.mean() - 2 / 3) < 0.01


def test_sphere_surface_sample_on_surface():
    c = jnp.asarray([[1.0, 2.0, 3.0]] * 1000, dtype=jnp.float32)
    seeds = rng.seed_from(jnp.arange(1000), 4)
    _, p = sampling.sphere_surface_sample(c, 2.5, seeds)
    r = np.linalg.norm(np.asarray(p) - np.asarray(c), axis=-1)
    np.testing.assert_allclose(r, 2.5, atol=1e-4)
    # rough uniformity: mean should be near center
    np.testing.assert_allclose(np.asarray(p).mean(0), np.asarray(c)[0], atol=0.3)


def test_reflect():
    d = jnp.asarray([[1.0, -1.0, 0.0]], dtype=jnp.float32)
    n = jnp.asarray([[0.0, 1.0, 0.0]], dtype=jnp.float32)
    r = np.asarray(sampling.reflect(d, n))
    np.testing.assert_allclose(r, [[1.0, 1.0, 0.0]], atol=1e-6)


def test_phong_lobe_concentration():
    w = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (20000, 1)).astype(np.float32))
    seeds = rng.seed_from(jnp.arange(20000), 13)
    _, d = sampling.phong_lobe_sample(w, 40.0, seeds)
    cos_t = np.asarray(d)[:, 2]
    # cos^n lobe with n=40: E[cos] = (n+1)/(n+2) ~ 0.976
    assert abs(cos_t.mean() - 41 / 42) < 0.005


def test_polygon_sample_disk_membership_and_mean():
    """Polygon lens samples lie inside the regular N-gon inscribed in the
    unit disk (checked against every edge half-plane) and average to the
    centroid; vertices are reached (max radius ~ 1)."""
    import math as m

    from tyrant_tpu.ops.sampling import polygon_sample_disk
    rng_ = np.random.default_rng(11)
    for blades, rot in ((3, 0.0), (5, 0.4), (6, 0.0), (8, 1.1)):
        u = jnp.asarray(rng_.random((20000, 2)), jnp.float32)
        p = np.asarray(polygon_sample_disk(u, blades, rot))
        # inside every edge half-plane: for edge j the outward normal
        # points at angle rot + 2*pi*(j+0.5)/n, support cos(pi/n)
        support = m.cos(m.pi / blades)
        for j in range(blades):
            a = rot + 2 * m.pi * (j + 0.5) / blades
            d = p[:, 0] * m.cos(a) + p[:, 1] * m.sin(a)
            assert d.max() <= support + 1e-5, (blades, j, d.max())
        r = np.linalg.norm(p, axis=1)
        assert r.max() > 0.98, (blades, r.max())  # vertices reached
        assert np.abs(p.mean(0)).max() < 0.02, (blades, p.mean(0))
        # uniform density: the inscribed-circle (radius cos(pi/n)) hit
        # fraction equals the area ratio pi*c^2 / (n/2 sin(2pi/n))
        frac = (r <= support).mean()
        area_poly = 0.5 * blades * m.sin(2 * m.pi / blades)
        expect = m.pi * support * support / area_poly
        assert abs(frac - expect) < 0.02, (blades, frac, expect)
