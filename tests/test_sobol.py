"""Low-discrepancy sampler tests (cfg.sampler="sobol", ops/sobol.py).

Covers: the (0,2)-sequence elementary-interval property surviving the
shuffle+scramble, key decorrelation, config/state/checkpoint plumbing,
estimator consistency with the xorshift sampler (same converged image),
the convergence win the feature exists for, and the sharded path.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from tyrant_tpu.camera import Camera
from tyrant_tpu.config import small_config
from tyrant_tpu.ops import sobol
from tyrant_tpu.render import Renderer, init_state
from tyrant_tpu.scene.scene import Scene

from .test_render_golden import H as GH, SUN_POS, W as GW, \
    cluster_camera, compare

W, H = 48, 32


def _cfg(mode="sobol", num_rays=1 << 12, w=W, h=H):
    return dataclasses.replace(
        small_config(width=w, height=h, num_rays=num_rays), sampler=mode)


def _image(mode, steps, cam, scene=None, num_rays=1 << 12):
    r = Renderer(scene or Scene.load(None), _cfg(mode, num_rays),
                 sun_position=SUN_POS, donate=False)
    r.step(cam, steps)
    a = np.asarray(r.state.accum)
    return a[:, :3] / np.maximum(a[:, 3:4], 1)


# ---------------------------------------------------------------- point set

def test_elementary_intervals():
    """Shuffle + Owen scramble must preserve the (0,2)-sequence property:
    every 2^k-point prefix puts exactly one point in each elementary
    interval of area 2^-k."""
    for key_val in (1, 12345, 0xDEADBEEF):
        key = jnp.full((64,), key_val, jnp.uint32)
        idx = jnp.arange(64, dtype=jnp.uint32)
        u, v = map(np.asarray, sobol.sample_2d(idx, key))
        for npts in (16, 64):
            for a in (1, 2, 4, npts):
                b = npts // a
                flat = (np.floor(u[:npts] * a).astype(int) * b
                        + np.floor(v[:npts] * b).astype(int))
                counts = np.bincount(flat, minlength=a * b)
                assert counts.max() == 1 and counts.min() == 1, \
                    (key_val, npts, a, b)


def test_1d_prefix_stratified():
    d = np.asarray(sobol.sample_1d(jnp.arange(128, dtype=jnp.uint32),
                                   jnp.full((128,), 5, jnp.uint32)))
    assert len(set(np.floor(d * 128).astype(int))) == 128
    assert d.min() >= 0.0 and d.max() < 1.0


def test_keys_decorrelate():
    idx = jnp.arange(4096, dtype=jnp.uint32)
    u1, _ = sobol.sample_2d(idx, jnp.full((4096,), 111, jnp.uint32))
    u2, _ = sobol.sample_2d(idx, jnp.full((4096,), 222, jnp.uint32))
    c = np.corrcoef(np.asarray(u1), np.asarray(u2))[0, 1]
    assert abs(c) < 0.1, c
    assert abs(float(jnp.mean(u1)) - 0.5) < 0.02


# ---------------------------------------------------------------- plumbing

def test_state_and_config_plumbing():
    st = init_state(_cfg("sobol"))
    assert st.sample_idx.shape == (1 << 12,)
    assert st.sample_base.shape == ()
    assert init_state(_cfg("xorshift")).sample_idx.shape == (1,)
    with pytest.raises(ValueError):
        dataclasses.replace(small_config(), sampler="halton")
    with pytest.raises(ValueError):
        dataclasses.replace(small_config(), sampler="sobol",
                            adaptive_sampling="on")


def test_sample_index_bookkeeping():
    """After k steps the per-pixel sample index must equal the number of
    round-robin passes — derived arithmetically, never gathered."""
    cfg = _cfg("sobol", num_rays=1 << 10, w=16, h=16)
    r = Renderer(Scene.load(None), cfg, sun_position=SUN_POS, donate=False)
    cam = cluster_camera()
    r.step(cam, 5)
    total = 16 * 16
    gen_total = int(r.state.sample_base) * total + int(r.state.start_position)
    # every step generates (num_rays - carried) fresh rays; the counters
    # must account for exactly the fresh rays over all 5 steps
    assert gen_total > 0 and gen_total <= 5 * cfg.num_rays
    # carried rays' sample indices can never exceed the pass counter
    assert int(r.state.sample_idx.max()) <= int(r.state.sample_base) + 1


def test_checkpoint_roundtrip(tmp_path):
    from tyrant_tpu.checkpoint import load_state, save_state
    cfg = _cfg("sobol", num_rays=1 << 10)
    r = Renderer(Scene.load(None), cfg, sun_position=SUN_POS, donate=False)
    r.step(cluster_camera(), 3)
    p = str(tmp_path / "st.npz")
    save_state(p, r.state)
    st2, _ = load_state(p)
    assert np.array_equal(np.asarray(st2.sample_idx),
                          np.asarray(r.state.sample_idx))
    assert int(st2.sample_base) == int(r.state.sample_base)


# ------------------------------------------------------------- estimator

@pytest.mark.slow
def test_sobol_consistent_with_xorshift():
    """Same transport, different point sets: the two samplers must agree
    within MC tolerance (unbiasedness of the index bookkeeping)."""
    cam = cluster_camera()
    def acc(mode):
        r = Renderer(Scene.load(None), _cfg(mode, w=GW, h=GH),
                     sun_position=SUN_POS, donate=False)
        r.step(cam, 60)
        return np.asarray(r.state.accum)
    compare(acc("xorshift"), acc("sobol"))


@pytest.mark.slow
def test_sobol_converges_faster():
    """The point of the feature: materially lower error at equal ray
    budget (measured ~4x RMSE on this scene; assert 1.5x for headroom)."""
    cam = Camera()
    truth = _image("xorshift", 700, cam)
    e_xor = _image("xorshift", 40, cam)
    e_sob = _image("sobol", 40, cam)
    rmse_xor = float(np.sqrt(((e_xor - truth) ** 2).mean()))
    rmse_sob = float(np.sqrt(((e_sob - truth) ** 2).mean()))
    assert rmse_sob < rmse_xor / 1.5, (rmse_sob, rmse_xor)


def test_sobol_sharded_step_runs():
    import jax
    from tyrant_tpu.parallel.sharded import (init_sharded_state, make_mesh,
                                             make_sharded_step)
    import tyrant_tpu.sky as skymod
    mesh = make_mesh(jax.devices()[:8])
    cfg = dataclasses.replace(
        small_config(width=16, height=16, num_rays=1 << 9), sampler="sobol")
    st = init_sharded_state(cfg, mesh)
    assert st.sample_idx.shape == (8 * cfg.num_rays,)
    step = make_sharded_step(cfg, mesh)
    cam = cluster_camera()
    sun = skymod.sun_direction_from_position(jnp.asarray(SUN_POS))
    sc = Scene.load(None).to_device()
    st = step(st, sc, cam.to_device(cfg), sun)
    st = step(st, sc, cam.to_device(cfg), sun)
    acc = np.asarray(st.accum)
    assert np.isfinite(acc).all() and acc[:, 3].sum() > 0
