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
