"""Adaptive sampling (beyond-reference; adaptive.py).

The estimator invariant: per-pixel mean = accum rgb / accum alpha is
unbiased under ANY visit schedule, so adaptive mode must keep images
consistent while re-directing the ray budget at high-error pixels."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from tyrant_tpu.adaptive import build_perm
from tyrant_tpu.camera import Camera
from tyrant_tpu.config import small_config
from tyrant_tpu.render import Renderer, init_state
from tyrant_tpu.scene.scene import Scene


def _cfg(adaptive="on", **kw):
    base = small_config(width=32, height=32, num_rays=1 << 12)
    return dataclasses.replace(base, adaptive_sampling=adaptive, **kw)


def _scene():
    v0 = np.array([[-200, -200, 0], [200, 200, 0]], np.float32)
    v1 = np.array([[200, -200, 0], [-200, 200, 0]], np.float32)
    v2 = np.array([[-200, 200, 0], [200, -200, 0]], np.float32)
    n = np.cross(v1 - v0, v2 - v0)
    flip = n[:, 2] < 0
    v1[flip], v2[flip] = v2[flip].copy(), v1[flip].copy()
    return Scene.from_triangles(v0, v1, v2, builder="numpy")


def _camera():
    cam = Camera()
    cam.position = np.array([0.0, 0.0, 50.0], np.float32)
    cam.vertical_angle = -1.2
    return cam


def test_state_dummies_when_off():
    st = init_state(_cfg("off"))
    assert st.moment2.shape == (1, 4)
    assert st.pixel_perm.shape == (1,)


def test_state_buffers_when_on():
    cfg = _cfg("on")
    st = init_state(cfg)
    p = cfg.width * cfg.height
    assert st.moment2.shape == (p, 4)
    np.testing.assert_array_equal(np.asarray(st.pixel_perm), np.arange(p))


def test_moment2_tracks_counts_and_cauchy_schwarz():
    """The squared flush rides the same keys as the radiance flush: the
    count columns must match exactly, and per channel
    n * sum(x^2) >= (sum x)^2 (Cauchy-Schwarz) must hold."""
    r = Renderer(_scene(), _cfg("on"))
    r.step(_camera(), 6)
    accum = np.asarray(r.state.accum, np.float64)
    m2 = np.asarray(r.state.moment2, np.float64)
    np.testing.assert_array_equal(accum[:, 3], m2[:, 3])
    n = accum[:, 3:4]
    lhs = n * m2[:, :3]
    rhs = accum[:, :3] ** 2
    assert (lhs >= rhs * (1 - 1e-5) - 1e-6).all()
    assert (m2 >= 0).all()


def test_adaptive_matches_uniform_before_first_rebuild():
    """With the identity perm (before any rebuild) the visit order equals
    the raster scan, so radiance accumulation matches the non-adaptive
    "scan" order bit for bit."""
    cfg_on = _cfg("on", raygen_order="scan", adaptive_interval=1000)
    cfg_off = _cfg("off", raygen_order="scan")
    ra = Renderer(_scene(), cfg_on)
    ru = Renderer(_scene(), cfg_off)
    cam = _camera()
    ra.step(cam, 4)
    ru.step(cam, 4)
    np.testing.assert_array_equal(np.asarray(ra.state.accum),
                                  np.asarray(ru.state.accum))


def test_build_perm_prioritises_high_variance():
    p = 256
    accum = np.zeros((p, 4), np.float32)
    m2 = np.zeros((p, 4), np.float32)
    accum[:, 3] = 8.0
    m2[:, 3] = 8.0
    accum[:, :3] = 4.0          # mean 0.5 everywhere
    m2[:, :3] = 2.0             # zero variance...
    noisy = np.arange(16) * 16  # ...except these pixels
    m2[noisy, :3] = 8.0
    perm = np.asarray(build_perm(jnp.asarray(accum), jnp.asarray(m2),
                                 jnp.asarray(0.0, jnp.float32), gamma=1.0))
    assert perm.shape == (p,)
    assert ((perm >= 0) & (perm < p)).all()
    # monotonic in pixel id: raster-coherent visit order
    assert (np.diff(perm) >= 0).all()
    counts = np.bincount(perm, minlength=p)
    mean_noisy = counts[noisy].mean()
    quiet = np.setdiff1d(np.arange(p), noisy)
    assert mean_noisy > 2.0 * counts[quiet].mean()


def test_build_perm_unsampled_first():
    p = 256
    accum = np.zeros((p, 4), np.float32)
    m2 = np.zeros((p, 4), np.float32)
    accum[:, 3] = 4.0
    m2[:, 3] = 4.0
    hole = np.arange(32, 48)
    accum[hole, 3] = 0.0        # never sampled
    m2[hole, 3] = 0.0
    perm = np.asarray(build_perm(jnp.asarray(accum), jnp.asarray(m2),
                                 jnp.asarray(0.0, jnp.float32), gamma=1.0))
    # unsampled pixels take the maximum observed error weight, so they
    # receive more visit slots than the (zero-variance) sampled pixels
    counts = np.bincount(perm, minlength=p)
    sampled = np.setdiff1d(np.arange(p), hole)
    assert counts[hole].min() >= counts[sampled].max()
    assert counts[hole].mean() > 1.5 * counts[sampled].mean()


def test_renderer_end_to_end_adaptive():
    """Full adaptive loop (rebuilds included): finite image, every-pixel
    coverage, and the same converged mean as uniform within MC noise."""
    cfg = _cfg("on", adaptive_interval=4)
    r = Renderer(_scene(), cfg)
    cam = _camera()
    for _ in range(4):
        r.step(cam, 4)
    assert r._sched.rebuilds >= 3
    accum = np.asarray(r.state.accum)
    assert np.isfinite(accum).all()
    sampled = (accum[:, 3] > 0).mean()
    assert sampled > 0.9

    ru = Renderer(_scene(), _cfg("off"))
    for _ in range(4):
        ru.step(cam, 4)
    img_a = np.asarray(r.image())
    img_u = np.asarray(ru.image())
    # same scene, same estimator: means agree to MC tolerance
    assert abs(img_a.mean() - img_u.mean()) < 0.05


def test_sharded_adaptive_runs():
    """Adaptive mode on the virtual 8-device mesh: per-strip moment
    buffers + per-strip perm rebuilds, no cross-device traffic."""
    import jax

    from tyrant_tpu.parallel.sharded import ShardedRenderer, make_mesh

    n_dev = min(8, len(jax.devices()))
    cfg = dataclasses.replace(
        small_config(width=32, height=8 * n_dev, num_rays=1 << 10),
        adaptive_sampling="on", adaptive_interval=2)
    mesh = make_mesh(jax.devices()[:n_dev])
    r = ShardedRenderer(_scene(), cfg, mesh=mesh)
    cam = _camera()
    for _ in range(3):
        r.step(cam, 2)
    assert r._sched.rebuilds >= 2
    accum = np.asarray(r.state.accum)
    assert np.isfinite(accum).all()
    assert accum[:, 3].sum() > 0
    perm = np.asarray(r.state.pixel_perm)
    p_local = 32 * 8
    assert perm.shape == (n_dev * p_local,)
    assert ((perm >= 0) & (perm < p_local)).all()


def test_stale_checkpoint_perm_fails_fast():
    """Loading a pre-adaptive state (dummy [1] perm) into an adaptive-on
    renderer must raise, not silently render black into pixel 0."""
    import pytest

    r = Renderer(_scene(), _cfg("on"))
    r.state = init_state(_cfg("off"))  # same shapes except dummy perm
    with pytest.raises(ValueError, match="pixel_perm"):
        r.step(_camera(), 1)


def test_build_perm_concentration_is_bounded():
    """One pathological pixel cannot absorb the whole budget: the integer
    weight floor keeps every other pixel's share nonzero in expectation
    (phase rotation covers them across rebuilds)."""
    p = 4096
    accum = np.zeros((p, 4), np.float32)
    m2 = np.zeros((p, 4), np.float32)
    accum[:, 3] = 8.0
    m2[:, 3] = 8.0
    accum[:, :3] = 4.0
    m2[:, :3] = 2.0
    m2[7, :3] = 1e6  # one pixel with enormous variance
    perm = np.asarray(build_perm(jnp.asarray(accum), jnp.asarray(m2),
                                 jnp.asarray(0.0, jnp.float32), gamma=1.0))
    counts = np.bincount(perm, minlength=p)
    assert counts[7] < 0.97 * p           # not the entire budget
    assert (counts > 0).sum() > 0.02 * p  # others still sampled


def test_checkpoint_roundtrip_adaptive(tmp_path):
    from tyrant_tpu.checkpoint import load_state, save_state
    r = Renderer(_scene(), _cfg("on", adaptive_interval=2))
    r.step(_camera(), 4)
    path = str(tmp_path / "st.npz")
    save_state(path, r.state)
    st, _meta = load_state(path)
    np.testing.assert_array_equal(np.asarray(st.moment2),
                                  np.asarray(r.state.moment2))
    np.testing.assert_array_equal(np.asarray(st.pixel_perm),
                                  np.asarray(r.state.pixel_perm))


def test_track_variance_and_noise_estimate():
    """track_variance='on' populates per-pixel second moments without
    adaptive raygen; the noise estimate decreases with samples and drives
    the CLI --until-noise stop."""
    import dataclasses
    from tyrant_tpu.camera import Camera
    from tyrant_tpu.config import small_config
    from tyrant_tpu.render import Renderer
    from tyrant_tpu.scene.scene import Scene

    cfg = dataclasses.replace(
        small_config(width=16, height=16, num_rays=1 << 10),
        track_variance="on")
    r = Renderer(Scene.load(None), cfg, donate=False)
    cam = Camera()
    cam.position = np.array([0.0, -170.0, 40.0], np.float32)
    cam.vertical_angle = -0.10
    r.step(cam, 8)
    n1 = r.noise_estimate()
    r.step(cam, 56)
    n2 = r.noise_estimate()
    assert np.isfinite(n1) and n1 > 0
    assert n2 < n1  # converging

    # default config refuses (moment2 is a dummy)
    r0 = Renderer(Scene.load(None), small_config(width=16, height=16,
                                                 num_rays=1 << 10),
                  donate=False)
    r0.step(cam, 1)
    import pytest
    with pytest.raises(RuntimeError):
        r0.noise_estimate()


def test_cli_until_noise(tmp_path, capsys):
    from tyrant_tpu import cli
    out = tmp_path / "n.png"
    cli.main(["render", "--width", "24", "--height", "16", "--rays", "1024",
              "--steps", "400", "--until-noise", "0.5",
              "--camera", "0", "-170", "40", "0", "-0.10",
              "--out", str(out)])
    assert out.exists()
