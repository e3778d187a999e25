"""Tone-mapping operators (reinhard = reference kernel.cu:648-662;
aces + exposure are beyond-reference production options)."""

import jax.numpy as jnp
import numpy as np

from tyrant_tpu.ops.tonemap import resolve


def _accum(vals):
    v = np.asarray(vals, np.float32)
    acc = np.concatenate([v, np.ones((v.shape[0], 1), np.float32)], axis=1)
    return jnp.asarray(acc)


def test_reinhard_matches_reference_formula():
    acc = _accum([[0.5, 1.0, 4.0]])
    img = np.asarray(resolve(acc, 1, 1)).reshape(3)
    want = (np.asarray([0.5, 1.0, 4.0]) / np.asarray([1.5, 2.0, 5.0])) \
        ** (1 / 2.2)
    np.testing.assert_allclose(img, want, rtol=1e-6)


def test_aces_brighter_midtones_and_bounded():
    acc = _accum([[0.18, 0.18, 0.18], [50.0, 50.0, 50.0]])
    rein = np.asarray(resolve(acc, 1, 2))
    aces = np.asarray(resolve(acc, 1, 2, operator="aces"))
    assert (aces >= 0).all() and (aces <= 1).all()
    # the filmic curve lifts midtones relative to reinhard
    assert aces[0, 0, 0] > rein[0, 0, 0]


def test_exposure_scales_before_curve():
    acc = _accum([[1.0, 1.0, 1.0]])
    doubled = np.asarray(resolve(acc, 1, 1, exposure=2.0))
    want = (2.0 / 3.0) ** (1 / 2.2)
    np.testing.assert_allclose(doubled, want, rtol=1e-6)


def test_zero_count_pixels_resolve_black():
    acc = jnp.zeros((4, 4), jnp.float32)
    img = np.asarray(resolve(acc, 2, 2))
    np.testing.assert_array_equal(img, 0.0)


def test_bloom_halo_and_gates():
    """Bloom spreads a gaussian halo from above-threshold pixels only;
    strength/threshold gates leave the image untouched."""
    import jax.numpy as jnp

    from tyrant_tpu.ops.tonemap import bloom

    img = np.zeros((32, 32, 3), np.float32)
    img[16, 16] = 50.0
    out = np.asarray(bloom(jnp.asarray(img), strength=0.1,
                           threshold=1.0, radius=4))
    assert out[16, 17, 0] > 0.1          # halo at the neighbour
    assert out[16, 20, 0] > 1e-3         # gaussian tail inside radius
    assert out[0, 0, 0] == 0.0           # far field untouched
    assert out[16, 16, 0] > 50.0         # energy added, not redistributed
    # threshold above every pixel: exact identity
    idem = np.asarray(bloom(jnp.asarray(img), strength=0.1,
                            threshold=100.0, radius=4))
    np.testing.assert_array_equal(idem, img)


def test_bloom_in_renderer_image():
    """cfg.bloom_strength routes the display resolve through the bloom;
    radiance() (the HDR export) stays bloom-free."""
    import dataclasses

    from tyrant_tpu.config import small_config
    from tyrant_tpu.render import Renderer
    from tyrant_tpu.scene.scene import Scene

    from .test_cli import _png_ok  # noqa: F401  (import proves no cycle)

    cfg = small_config(width=32, height=24, num_rays=1 << 10)
    cfgb = dataclasses.replace(cfg, bloom_strength=0.5, bloom_threshold=0.2,
                               bloom_radius=4)
    from tyrant_tpu.camera import Camera
    cam = Camera()
    r = Renderer(Scene.load(None), cfg, donate=False)
    rb = Renderer(Scene.load(None), cfgb, donate=False)
    r.step(cam, 3)
    rb.step(cam, 3)
    base = np.asarray(r.image())
    bloomed = np.asarray(rb.image())
    assert bloomed.mean() > base.mean()  # glare adds display energy
    # HDR radiance identical (bloom is display-only)
    np.testing.assert_array_equal(np.asarray(r.radiance()),
                                  np.asarray(rb.radiance()))


def test_auto_exposure_constant_field():
    """A constant-luminance field maps exactly to the photographic key:
    exposure = key / L, so exposed radiance hits middle grey."""
    from tyrant_tpu.ops.tonemap import auto_exposure
    rad = np.full((8, 8, 3), 0.5, np.float32)
    ex = auto_exposure(rad)
    assert abs(ex * 0.5 - 0.18) < 1e-3, ex
    # scale-invariance of the exposed image: doubling the radiance halves
    # the exposure
    assert abs(auto_exposure(rad * 2) - ex / 2) < 1e-3
