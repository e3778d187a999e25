"""Environment-light importance sampling tests (scene/envlight.py +
render env-NEE under MIS) and the delta-born MIS pdf encoding."""

import dataclasses

import numpy as np
import pytest

from tyrant_tpu.camera import Camera
from tyrant_tpu.config import small_config
from tyrant_tpu.render import Renderer
from tyrant_tpu.scene.envlight import build_alias, env_tables
from tyrant_tpu.scene.scene import Scene, Spheres

W, H = 24, 24


# ---------------------------------------------------------------- tables

def test_alias_table_distribution():
    rng = np.random.default_rng(3)
    p = rng.random(40)
    p /= p.sum()
    prob, alias = build_alias(p)
    n_draw = 400_000
    i = rng.integers(0, 40, n_draw)
    u = rng.random(n_draw)
    k = np.where(u < prob[i], i, alias[i])
    freq = np.bincount(k, minlength=40) / n_draw
    np.testing.assert_allclose(freq, p, atol=3e-3)


def test_env_pdf_integrates_to_one():
    rng = np.random.default_rng(5)
    em = rng.random((8, 16, 3)).astype(np.float32) * 3.0
    pdf_sa, rows = env_tables(em)
    eh, ew = 8, 16
    sin_t = np.sin((np.arange(eh) + 0.5) * np.pi / eh)
    omega = (2 * np.pi / ew) * (np.pi / eh) * np.repeat(sin_t, ew)
    assert abs(float((pdf_sa * omega).sum()) - 1.0) < 1e-4
    # alias rows carry the matching self/alias payloads
    assert rows.shape == (eh * ew, 12)
    k = 37
    a = int(rows[k, 1])
    np.testing.assert_allclose(rows[k, 2:5], em.reshape(-1, 3)[k], rtol=1e-6)
    np.testing.assert_allclose(rows[k, 6:9], em.reshape(-1, 3)[a], rtol=1e-6)
    np.testing.assert_allclose(rows[k, 9], pdf_sa[a], rtol=1e-6)


def test_black_envmap_falls_back_uniform():
    pdf_sa, _ = env_tables(np.zeros((4, 8, 3), np.float32))
    assert np.isfinite(pdf_sa).all() and (pdf_sa > 0).all()


# ------------------------------------------------------------- rendering

def _hotspot_env(bright=60.0):
    """Mostly-dim map with one bright texel block — the regime where
    BSDF-only env sampling is noisy and NEE shines."""
    em = np.full((8, 16, 3), 0.05, np.float32)
    em[2, 4] = bright  # a "sun" patch well above the horizon
    return em


def _sphere_only():
    s = Spheres.default_seven()
    keep = np.zeros(s.count, bool)
    keep[[0, 4]] = True  # one diffuse sphere + the ground
    return Spheres(center=s.center[keep], radius=s.radius[keep],
                   color=s.color[keep], emission=s.emission[keep],
                   refl=s.refl[keep])


def _cam():
    cam = Camera()
    cam.position = np.array([0.0, -120.0, 30.0], np.float32)
    cam.vertical_angle = -0.05
    return cam


def _image(mis, steps, num_rays=1 << 13, seed_scene=None):
    scene = seed_scene or Scene.load(None, spheres=_sphere_only(),
                                     envmap=_hotspot_env())
    cfg = dataclasses.replace(
        small_config(width=W, height=H, num_rays=num_rays), mis=mis)
    r = Renderer(scene, cfg, donate=False)
    r.step(_cam(), steps)
    a = np.asarray(r.state.accum)
    return a[:, :3] / np.maximum(a[:, 3:4], 1)


@pytest.mark.slow
def test_env_nee_consistent_and_lower_variance():
    """mis=on (env NEE + balance weights) and mis=off (BSDF-only) are
    both unbiased: long runs must agree.  At a short equal budget the
    NEE estimator must have materially lower error."""
    truth = _image("on", 300)
    long_off = _image("off", 300)
    rel = np.abs(long_off - truth) / np.maximum(truth, 1e-6)
    assert np.median(rel) < 0.08, float(np.median(rel))
    short_on = _image("on", 12)
    short_off = _image("off", 12)
    e_on = float(np.sqrt(((short_on - truth) ** 2).mean()))
    e_off = float(np.sqrt(((short_off - truth) ** 2).mean()))
    assert e_on < 0.5 * e_off, (e_on, e_off)


def test_env_nee_with_area_light_runs():
    s = Spheres.default_seven()
    scene = Scene.load(None, spheres=s, envmap=_hotspot_env(bright=10.0))
    cfg = dataclasses.replace(
        small_config(width=16, height=16, num_rays=1 << 11), mis="on")
    r = Renderer(scene, cfg, donate=False)
    r.step(_cam(), 6)
    a = np.asarray(r.state.accum)
    assert np.isfinite(a).all() and a[:, 3].sum() > 0


def test_env_nee_composes_with_sobol_and_fog():
    scene = Scene.load(None, spheres=_sphere_only(), envmap=_hotspot_env())
    cfg = dataclasses.replace(
        small_config(width=16, height=16, num_rays=1 << 11),
        mis="on", sampler="sobol", fog="on", fog_sigma_s=0.004,
        fog_z_max=60.0)
    r = Renderer(scene, cfg, donate=False)
    r.step(_cam(), 6)
    a = np.asarray(r.state.accum)
    assert np.isfinite(a).all() and a[:, 3].sum() > 0


def test_delta_transmission_sees_emitter_under_mis():
    """A light directly behind a glass sphere: the reference estimator
    (mis=off) drops transmitted emitter hits (lastSpecular=false,
    kernel.cu:500); with MIS the delta-born pdf-0 encoding restores them
    at weight 1 — the glass must glow brighter under mis=on."""
    spheres = Spheres(
        center=np.array([[0, 0, 20], [0, 60, 20], [0, 0, -1e4]], np.float32),
        radius=np.array([12.0, 15.0, 1e4 - 20], np.float32),
        # NB REFR "colour" is the Beer-Lambert absorption coefficient
        # (kernel.cu:511-513): keep it faint or the in-glass path length
        # annihilates the transmitted radiance outright
        color=np.array([[0.01, 0.01, 0.01], [1, 1, 1], [1, 1, 1]],
                       np.float32),
        emission=np.array([[0, 0, 0], [6, 6, 6], [0, 0, 0]], np.float32),
        refl=np.array([2, 4, 0], np.int32),  # REFR, LIGHT, DIFF ground
    )
    cam = Camera()
    cam.position = np.array([0.0, -80.0, 20.0], np.float32)

    def lum(mis):
        cfg = dataclasses.replace(
            small_config(width=W, height=H, num_rays=1 << 13), mis=mis)
        r = Renderer(Scene.load(None, spheres=spheres), cfg, donate=False)
        r.step(cam, 40)
        a = np.asarray(r.state.accum)
        img = (a[:, :3].mean(1) / np.maximum(a[:, 3], 1)).reshape(H, W)
        return float(img[8:16, 8:16].mean())  # the glass-sphere region

    assert lum("on") > 1.3 * lum("off"), (lum("on"), lum("off"))
