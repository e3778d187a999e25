"""AOV pass + à-trous denoiser (beyond-reference; render.render_aovs +
denoise.atrous_denoise)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from tyrant_tpu.camera import Camera
from tyrant_tpu.config import VERY_FAR, small_config
from tyrant_tpu.denoise import atrous_denoise
from tyrant_tpu.render import Renderer, render_aovs
from tyrant_tpu.scene.scene import Scene


def _scene():
    v0 = np.array([[-200, -200, 0], [200, 200, 0]], np.float32)
    v1 = np.array([[200, -200, 0], [-200, 200, 0]], np.float32)
    v2 = np.array([[-200, 200, 0], [200, -200, 0]], np.float32)
    n = np.cross(v1 - v0, v2 - v0)
    flip = n[:, 2] < 0
    v1[flip], v2[flip] = v2[flip].copy(), v1[flip].copy()
    return Scene.from_triangles(v0, v1, v2, builder="numpy")


CFG = small_config(width=32, height=32, num_rays=1 << 12)


def _cam():
    cam = Camera()
    cam.position = np.array([0.0, 0.0, 50.0], np.float32)
    cam.vertical_angle = -1.2
    return cam


# --------------------------------------------------------------------------
# AOV pass
# --------------------------------------------------------------------------

def test_aovs_floor_scene():
    scene = _scene().to_device()
    aovs = render_aovs(scene, _cam().to_device(CFG), CFG)
    alb = np.asarray(aovs["albedo"])
    nrm = np.asarray(aovs["normal"])
    dep = np.asarray(aovs["depth"])
    assert alb.shape == (32, 32, 3) and dep.shape == (32, 32)
    hit = dep < VERY_FAR
    assert hit.mean() > 0.5
    # floor normal faces the camera (+z), flipped toward the ray origin
    nz = nrm[..., 2][hit]
    # mostly floor (+z); the rest are the default spheres' curved normals
    assert (nz > 0.9).mean() > 0.7
    # miss pixels: neutral albedo, zero normal
    if (~hit).any():
        np.testing.assert_array_equal(alb[~hit], 1.0)
        np.testing.assert_array_equal(nrm[~hit], 0.0)
    # depth is deterministic: second call identical
    aovs2 = render_aovs(scene, _cam().to_device(CFG), CFG)
    np.testing.assert_array_equal(dep, np.asarray(aovs2["depth"]))


# --------------------------------------------------------------------------
# à-trous filter properties
# --------------------------------------------------------------------------

def _flat_guides(h, w, albedo=1.0):
    alb = jnp.full((h, w, 3), albedo, jnp.float32)
    nrm = jnp.tile(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (h, w, 1))
    dep = jnp.full((h, w), 10.0, jnp.float32)
    return alb, nrm, dep


def test_denoise_reduces_variance_on_flat_region():
    rng = np.random.default_rng(5)
    h = w = 64
    noisy = (0.5 + 0.2 * rng.standard_normal((h, w, 3))).astype(np.float32)
    noisy = np.clip(noisy, 0.0, None)
    alb, nrm, dep = _flat_guides(h, w)
    out = np.asarray(atrous_denoise(jnp.asarray(noisy), alb, nrm, dep,
                                    iterations=4))
    inner = (slice(8, -8), slice(8, -8))
    assert out[inner].std() < 0.35 * noisy[inner].std()
    # mean preserved (energy conservation of the normalised filter)
    assert abs(out[inner].mean() - noisy[inner].mean()) < 0.02


def test_denoise_preserves_albedo_edges():
    """A hard albedo edge (textured detail) passes through exactly via
    demodulation, even when irradiance is smoothed across it."""
    h = w = 32
    alb = np.ones((h, w, 3), np.float32)
    alb[:, : w // 2] = 0.2
    _, nrm, dep = _flat_guides(h, w)
    irr = 0.6  # constant irradiance (converged)
    rad = jnp.asarray(alb * irr)
    out = np.asarray(atrous_denoise(rad, jnp.asarray(alb), nrm, dep,
                                    iterations=3))
    np.testing.assert_allclose(out, np.asarray(alb) * irr, rtol=1e-4)


def test_denoise_respects_depth_edges():
    """Radiance does not bleed across a large depth discontinuity."""
    h = w = 32
    alb, nrm, _ = _flat_guides(h, w)
    dep = np.full((h, w), 10.0, np.float32)
    dep[:, w // 2:] = 200.0  # far background
    rad = np.full((h, w, 3), 0.2, np.float32)
    rad[:, w // 2:] = 0.9
    out = np.asarray(atrous_denoise(jnp.asarray(rad), alb, nrm,
                                    jnp.asarray(dep), iterations=4))
    left = out[:, : w // 2 - 2].mean()
    right = out[:, w // 2 + 2:].mean()
    assert abs(left - 0.2) < 0.02
    assert abs(right - 0.9) < 0.02


def test_denoise_sky_not_blackened():
    """Miss pixels (normal == 0) must keep their radiance: two sky
    pixels see each other at full weight; the center tap never zeroes."""
    h = w = 16
    alb = jnp.ones((h, w, 3), jnp.float32)
    nrm = jnp.zeros((h, w, 3), jnp.float32)           # all sky
    dep = jnp.full((h, w), 1e19, jnp.float32)
    rad = jnp.full((h, w, 3), 0.7, jnp.float32)
    out = np.asarray(atrous_denoise(rad, alb, nrm, dep, iterations=3))
    np.testing.assert_allclose(out, 0.7, rtol=1e-4)


def test_denoise_constant_image_is_identity():
    h = w = 16
    alb, nrm, dep = _flat_guides(h, w)
    rad = jnp.full((h, w, 3), 0.4, jnp.float32)
    out = np.asarray(atrous_denoise(rad, alb, nrm, dep, iterations=3))
    np.testing.assert_allclose(out, 0.4, rtol=1e-5)


# --------------------------------------------------------------------------
# Renderer integration
# --------------------------------------------------------------------------

def test_renderer_image_denoise_toggle():
    cfg = dataclasses.replace(CFG, denoise="on", denoise_iterations=2)
    r = Renderer(_scene(), cfg)
    r.step(_cam(), 3)
    img_dn = np.asarray(r.image())
    img_raw = np.asarray(r.image(denoise=False))
    assert img_dn.shape == img_raw.shape
    assert np.isfinite(img_dn).all()
    # the accumulation buffer is untouched by displaying either way
    img_raw2 = np.asarray(r.image(denoise=False))
    np.testing.assert_array_equal(img_raw, img_raw2)
    # denoising smooths: total variation drops
    tv = lambda im: np.abs(np.diff(im, axis=0)).mean() \
        + np.abs(np.diff(im, axis=1)).mean()
    assert tv(img_dn) < tv(img_raw)
