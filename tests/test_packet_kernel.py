"""Pallas packet-traversal kernel vs the XLA cascade oracle (interpret mode
on CPU; compiled-mode equivalence is exercised on real TPU by bench/driver).

Both kernel generations are covered: the mono 1024-ray packet (wave=False)
and the wave kernel (8 independent 128-ray sublane packets, wave=True)."""

import pytest

import jax.numpy as jnp
import numpy as np

from tyrant_tpu.config import VERY_FAR
from tyrant_tpu.ops.pallas.traverse_kernel import (PacketTables,
                                                   any_hit_packets,
                                                   closest_hit_packets,
                                                   tables_fit_vmem)
from tyrant_tpu.ops.traverse import any_hit, closest_hit
from tyrant_tpu.scene.procgen import terrain
from tyrant_tpu.scene.scene import Scene


def _setup(n_quads=32, towers=3, seed=3, n_rays=2048):
    v0, v1, v2 = terrain(n_quads=n_quads, towers=towers)
    sc = Scene.from_triangles(v0, v1, v2, builder="numpy")
    dev = sc.to_device().bvh
    tables = PacketTables(dev)
    r = np.random.default_rng(seed)
    o = np.tile([[0.0, -150.0, 60.0]], (n_rays, 1)).astype(np.float32) \
        + r.normal(0, 5, (n_rays, 3)).astype(np.float32)
    d = r.normal(size=(n_rays, 3)).astype(np.float32)
    d[:, 2] -= 0.5
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return dev, tables, jnp.asarray(o), jnp.asarray(d.astype(np.float32))


@pytest.mark.parametrize("wave", [False, True])
def test_packet_closest_matches_cascade(wave):
    dev, tables, o, d = _setup()
    t_ref, id_ref = closest_hit(o, d, dev)
    t_pk, id_pk = closest_hit_packets(o, d, tables, interpret=True, wave=wave)
    t_ref, id_ref = np.asarray(t_ref), np.asarray(id_ref)
    t_pk, id_pk = np.asarray(t_pk), np.asarray(id_pk)
    np.testing.assert_array_equal(id_ref >= 0, id_pk >= 0)
    hits = id_ref >= 0
    assert hits.mean() > 0.2
    np.testing.assert_allclose(t_ref[hits], t_pk[hits], rtol=1e-5)
    np.testing.assert_array_equal(id_ref[hits], id_pk[hits])


def test_packet_closest_with_t_init():
    dev, tables, o, d = _setup(seed=9)
    t_init = jnp.full((o.shape[0],), 80.0, jnp.float32)
    t_ref, id_ref = closest_hit(o, d, dev, t_init=t_init)
    t_pk, id_pk = closest_hit_packets(o, d, tables, t_init=t_init,
                                      interpret=True)
    np.testing.assert_array_equal(np.asarray(id_ref), np.asarray(id_pk))
    hits = np.asarray(id_ref) >= 0
    np.testing.assert_allclose(np.asarray(t_ref)[hits],
                               np.asarray(t_pk)[hits], rtol=1e-5)


@pytest.mark.parametrize("wave", [False, True])
def test_packet_any_hit_matches_cascade(wave):
    dev, tables, o, d = _setup(seed=5)
    maxd = jnp.full((o.shape[0],), 120.0, jnp.float32)
    occ_ref = np.asarray(any_hit(o, d, maxd, dev))
    occ_pk = np.asarray(any_hit_packets(o, d, maxd, tables, interpret=True,
                                        wave=wave))
    np.testing.assert_array_equal(occ_ref, occ_pk)


def test_packet_any_hit_active_mask():
    dev, tables, o, d = _setup(seed=7, n_rays=1024)
    maxd = jnp.full((1024,), 120.0, jnp.float32)
    active = jnp.asarray(np.arange(1024) % 2 == 0)
    occ = np.asarray(any_hit_packets(o, d, maxd, tables, active=active,
                                     interpret=True))
    assert not occ[1::2].any()  # inactive rays never occluded


def test_non_multiple_packet_padding():
    dev, tables, o, d = _setup(seed=11, n_rays=1500)  # not a multiple of 1024
    t_ref, id_ref = closest_hit(o, d, dev)
    t_pk, id_pk = closest_hit_packets(o, d, tables, interpret=True)
    np.testing.assert_array_equal(np.asarray(id_ref) >= 0,
                                  np.asarray(id_pk) >= 0)


def test_tables_fit_predicate():
    assert tables_fit_vmem(15_000)       # ~30k-tri scene
    assert not tables_fit_vmem(500_000)  # ~1M-tri scene -> HBM row DMA


@pytest.mark.parametrize("wave", [False, True])
def test_packet_hbm_mode_matches(wave):
    """The HBM row-DMA variant must agree with the VMEM variant.
    (t compared within FMA re-association tolerance: the wave kernel's
    graph contracts differently from the mono kernel's.)"""
    dev, tables, o, d = _setup(seed=21)
    t_ref, id_ref = closest_hit_packets(o, d, tables, interpret=True)
    tables.fits = False  # force the HBM path
    t_h, id_h = closest_hit_packets(o, d, tables, interpret=True, wave=wave)
    np.testing.assert_array_equal(np.asarray(id_ref), np.asarray(id_h))
    np.testing.assert_allclose(np.asarray(t_ref), np.asarray(t_h),
                               rtol=1e-6)
    maxd = jnp.full((o.shape[0],), 120.0, jnp.float32)
    occ_h = np.asarray(any_hit_packets(o, d, maxd, tables, interpret=True))
    occ_ref = np.asarray(any_hit(o, d, maxd, dev))
    np.testing.assert_array_equal(occ_h, occ_ref)


@pytest.mark.parametrize("wave", [False, True])
def test_treelet_dma_tail(wave):
    """HBM mode with a tiny VMEM treelet: most visits take the DMA
    tail path, and the result must still match the cascade exactly."""
    dev, tables, o, d = _setup(seed=23)
    t_ref, id_ref = closest_hit(o, d, dev)
    tables.fits = False
    t_h, id_h = closest_hit_packets(o, d, tables, interpret=True, wave=wave,
                                    treelet_rows=2)
    np.testing.assert_array_equal(np.asarray(id_ref), np.asarray(id_h))
    hits = np.asarray(id_ref) >= 0
    np.testing.assert_allclose(np.asarray(t_ref)[hits],
                               np.asarray(t_h)[hits], rtol=1e-5)


def test_treelet_anyhit_with_invalid_slots():
    """HBM any-hit with a tiny treelet and a mix of valid/invalid (maxd=0)
    shadow slots: exercises the sibling-pair prefetch together with the
    dead-slot union pruning and the early-exit guard that must never leave
    a prefetch DMA dangling at loop exit."""
    dev, tables, o, d = _setup(seed=31)
    n = o.shape[0]
    maxd = jnp.where(jnp.asarray(np.arange(n) % 3 == 0), 0.0, 120.0)
    occ_ref = np.asarray(any_hit(o, d, maxd, dev))
    tables.fits = False
    occ_h = np.asarray(any_hit_packets(o, d, maxd, tables, interpret=True,
                                       treelet_rows=2))
    np.testing.assert_array_equal(occ_ref, occ_h)


def test_wave_multi_block():
    """Wave mode with more rays than one grid block (catches block-size
    accounting bugs: every wave of every block must be traversed)."""
    dev, tables, o, d = _setup(seed=29, n_rays=2 * 4096 + 1500)
    t_ref, id_ref = closest_hit(o, d, dev)
    t_pk, id_pk = closest_hit_packets(o, d, tables, interpret=True, wave=True)
    np.testing.assert_array_equal(np.asarray(id_ref), np.asarray(id_pk))
    hits = np.asarray(id_ref) >= 0
    assert hits.mean() > 0.2
    np.testing.assert_allclose(np.asarray(t_ref)[hits],
                               np.asarray(t_pk)[hits], rtol=1e-5)


@pytest.mark.parametrize("wave", [False, True])
@pytest.mark.parametrize("hbm", [False, True])
def test_kernel_carried_normals(wave, hbm):
    """closest_hit_packets(normals=True): the extra output is the winning
    triangle's unnormalised cross(e1,e2), bit-identical (after
    normalisation) to the host-precomputed tri_shade normals, and the
    (t, id) outputs are unchanged vs the normals=False kernel."""
    v0, v1, v2 = terrain(n_quads=16, towers=2)
    sc = Scene.from_triangles(v0, v1, v2, builder="numpy")
    sd = sc.to_device()
    tables = PacketTables(sd.bvh)
    _, _, o, d = _setup(n_quads=16, towers=2, n_rays=1024)
    kw = dict(interpret=True, wave=wave)
    if hbm:
        kw["treelet_rows"] = 8
        tables.fits = False  # force the HBM/treelet code path
    t0, h0 = closest_hit_packets(o, d, tables, **kw)
    t1, h1, nrm = closest_hit_packets(o, d, tables, normals=True, **kw)
    np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    h = np.asarray(h1)
    hit = h >= 0
    assert hit.mean() > 0.2
    nk = np.asarray(nrm)[hit]
    nk = nk / np.maximum(np.linalg.norm(nk, axis=1, keepdims=True), 1e-30)
    ref = np.asarray(sd.tri_shade)[h[hit], 0:3]
    np.testing.assert_allclose(nk, ref, atol=1e-6)


def test_shade_gather_free_branch_matches():
    """_shade with a kernel-carried tri_normal (default-material fast path)
    produces the same outputs as the tri_shade-gather branch."""
    import jax
    import jax.numpy as jnp
    from tyrant_tpu.camera import Camera
    from tyrant_tpu.config import RenderConfig
    from tyrant_tpu.render import _intersect_scene, _raygen, _shade
    from tyrant_tpu import sky as skymod

    v0, v1, v2 = terrain(n_quads=16, towers=2)
    sc = Scene.from_triangles(v0, v1, v2, builder="numpy")
    sd = sc.to_device()
    assert sd.tri_default_mat
    tables = PacketTables(sd.bvh)
    cfg = RenderConfig(width=64, height=32, num_rays=2048, max_bounces=3)
    cam = Camera(position=(0.0, -150.0, 60.0), vertical_angle=-0.3)
    camd = cam.to_device(cfg)
    sun = skymod.sun_direction_from_position(jnp.asarray((0.05, 0.3)))
    sky_p = skymod.SkyParams(cfg.sky)
    gen = _raygen(cfg, camd, jnp.asarray(0), jnp.asarray(1, jnp.uint32),
                  cfg.height, 0)
    t, ident, is_tri, _ = _intersect_scene(gen["origin"], gen["direction"],
                                           sd, packet_tables=tables)
    _, _, nrm = closest_hit_packets(gen["origin"], gen["direction"], tables,
                                    interpret=True, normals=True)
    a = _shade(cfg, sd, sky_p, sun, gen, t, ident, is_tri,
               jnp.asarray(1, jnp.uint32))
    b = _shade(cfg, sd, sky_p, sun, gen, t, ident, is_tri,
               jnp.asarray(1, jnp.uint32), tri_normal=nrm)
    hit = np.asarray(t) < 1e19
    assert hit.mean() > 0.2
    # color / terminated / survive must agree everywhere; per-ray outputs
    # only on hit rows (miss rows carry garbage normals in BOTH branches,
    # masked out downstream by terminated/valid)
    for xa, xb in zip(jax.tree.leaves(a[:3]), jax.tree.leaves(b[:3])):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                   atol=1e-5)
    for xa, xb in zip(jax.tree.leaves(a[3:]), jax.tree.leaves(b[3:])):
        np.testing.assert_allclose(np.asarray(xa)[hit], np.asarray(xb)[hit],
                                   atol=1e-5)
