"""Delta lights: point / spot / directional (beyond-reference).

The reference's only light sources are the sun cone and emissive geometry
(kernel.cu:410-448); production renderers also need zero-area analytic
lights.  Delta lights are NEE-only (a BSDF ray cannot hit a measure-zero
emitter), which makes them exactly testable: with identical RNG streams,
the per-pixel DIFFERENCE between two renders that vary only the delta
light is the delta contribution times an identical per-pixel path-count
factor — so cross-config per-pixel ratios equal the analytic radiometric
ratios to float precision.

Geometry used throughout: an orthographic camera looking straight down at
a flat diffuse floor (z = 0, albedo 0.75), so each pixel maps to a known
world point and the expected irradiance is closed-form.
"""

import dataclasses
import json

import numpy as np
import pytest

from tyrant_tpu.camera import Camera
from tyrant_tpu.config import small_config
from tyrant_tpu.render import Renderer, _primary_dirs
from tyrant_tpu.scene.scene import (DIFF, DL_POINT, DL_SPOT, DeltaLights,
                                    Scene, Spheres)

ALBEDO = 0.75
ORTHO_H = 100.0
CAM_Z = 50.0
W = H = 32


def _floor_spheres():
    return Spheres(
        center=np.array([[0.0, 0.0, -1e4]], np.float32),
        radius=np.array([1e4], np.float32),
        color=np.array([[ALBEDO] * 3], np.float32),
        emission=np.zeros((1, 3), np.float32),
        refl=np.array([DIFF], np.int32))


def _cfg(mis=False):
    # max_bounces=0: NEE fires at the primary vertex only, so the delta
    # contribution is pure direct lighting (no indirect term muddying the
    # analytic expectations)
    return dataclasses.replace(
        small_config(width=W, height=H, num_rays=1 << 12, max_bounces=0),
        projection="ortho", ortho_height=ORTHO_H,
        mis="on" if mis else "off")


def _camera():
    cam = Camera()
    cam.position = np.array([0.0, 0.0, CAM_Z], np.float32)
    cam.vertical_angle = -np.pi / 2 + 1e-3
    return cam


def _render(specs, steps=6, mis=False, spheres=None):
    dl = DeltaLights.from_specs(specs) if specs else None
    scene = Scene.load(None, spheres=spheres or _floor_spheres(),
                       delta_lights=dl)
    r = Renderer(scene, _cfg(mis), sun_position=(0.05, 0.3), donate=False)
    r.step(_camera(), steps)
    acc = np.asarray(r.state.accum)
    img = acc[:, :3] / np.maximum(acc[:, 3:4], 1e-9)
    return img.reshape(H, W, 3)


def _pixel_world_points(ss: int = 1):
    """World hit point on the z=0 floor for every (sub)pixel (via the SAME
    projection helper the renderer uses).  ``ss`` supersamples each pixel
    ss x ss — the renderer jitters sample positions across the pixel
    footprint, so analytic expectations should be pixel-area averages."""
    import jax.numpy as jnp
    cfg = _cfg()
    params = _camera().to_device(cfg)
    w, h = W * ss, H * ss
    # raygen jitters px = x - u (reference convention), so pixel x's
    # footprint is [x-1, x]: supersample that span, not [x, x+1]
    q = np.arange(w * h)
    x = ((q % w) - ss + 0.5) / w - 0.5
    nj = (h - (q // w) + ss - 0.5) / h - 0.5
    d, off, _ = _primary_dirs(cfg, params, jnp.asarray(x, jnp.float32),
                              jnp.asarray(nj, jnp.float32))
    d = np.asarray(d, np.float64)
    o = np.asarray(params.position, np.float64)[None] + np.asarray(off)
    t = -o[:, 2] / d[:, 2]
    return (o + t[:, None] * d).reshape(h, w, 3)


def _block_mean(m, ss):
    return m.reshape(H, ss, W, ss).mean(axis=(1, 3)) if ss > 1 else m


def _point_val(pts, lpos, inten):
    """Analytic (rho/pi) * I * cos / d^2 map for a point light."""
    lvec = np.asarray(lpos, np.float64)[None, None] - pts
    d2 = np.sum(lvec * lvec, axis=-1)
    cos = lvec[:, :, 2] / np.sqrt(d2)
    return (ALBEDO / np.pi) * np.asarray(inten)[0] * cos / d2


def test_linearity_exact():
    r0 = _render([{"type": "point", "position": [0, 0, 30],
                   "intensity": [0, 0, 0]}])
    r1 = _render([{"type": "point", "position": [0, 0, 30],
                   "intensity": [400, 400, 400]}])
    r2 = _render([{"type": "point", "position": [0, 0, 30],
                   "intensity": [800, 800, 800]}])
    d1, d2 = r1 - r0, r2 - r0
    assert d1.max() > 1e-3  # the light actually contributes
    np.testing.assert_allclose(d2, 2.0 * d1, rtol=1e-4, atol=1e-6)


def test_point_inverse_square_and_cosine():
    # identical RNG across configs -> per-pixel diff ratio is the analytic
    # radiometric ratio exactly (the shared path-count factor cancels)
    base = {"type": "point", "intensity": [2000, 2000, 2000]}
    r0 = _render([dict(base, position=[0, 0, 50],
                       intensity=[0, 0, 0])], steps=12)
    ra = _render([dict(base, position=[0, 0, 50])], steps=12) - r0
    rb = _render([dict(base, position=[10, 0, 100])], steps=12) - r0
    # sub-pixel jitter -> the measured per-pixel value averages over the
    # pixel footprint; supersample the analytic maps to match.  The
    # residual is the shared-sample placement within each pixel (the
    # path-count factor cancels exactly; the placement term shrinks with
    # samples and with the light height), so pin the median tightly and
    # bound the tails.
    ss = 8
    pts = _pixel_world_points(ss)
    expect = _block_mean(_point_val(pts, [0, 0, 50], base["intensity"]), ss) \
        / _block_mean(_point_val(pts, [10, 0, 100], base["intensity"]), ss)
    got = ra[:, :, 0] / np.maximum(rb[:, :, 0], 1e-12)
    mask = rb[:, :, 0] > 1e-4
    assert mask.sum() > 200
    err = np.abs(got[mask] / expect[mask] - 1.0)
    assert np.median(err) < 0.02
    assert np.percentile(err, 95) < 0.08
    assert err.max() < 0.25


def test_spot_cone_and_interior_match():
    h = 40.0
    outer = 25.0
    point = {"type": "point", "position": [0, 0, h],
             "intensity": [500, 500, 500]}
    spot = {"type": "spot", "position": [0, 0, h],
            "direction": [0, 0, -1], "intensity": [500, 500, 500],
            "inner_deg": outer, "outer_deg": outer}
    r0 = _render([dict(point, intensity=[0, 0, 0])])
    dp = _render([point]) - r0
    ds = _render([spot]) - r0
    pts = _pixel_world_points()
    r = np.sqrt(pts[:, :, 0] ** 2 + pts[:, :, 1] ** 2)
    edge = h * np.tan(np.radians(outer))
    # sub-pixel jitter spreads each pixel's samples up to ~2.3 world units
    # from its center: keep both masks clear of the cone edge
    outside = r > edge + 3.0
    inside = r < edge - 3.0
    assert outside.sum() > 50 and inside.sum() > 50
    np.testing.assert_allclose(ds[outside], 0.0, atol=1e-7)
    np.testing.assert_allclose(ds[inside], dp[inside], rtol=1e-5, atol=1e-6)


def test_spot_soft_falloff_monotone():
    # ratio to a point light at the same position: the shared per-pixel
    # path-count factor AND the inverse-square kernel cancel exactly,
    # leaving the pure Hermite cone falloff
    h = 70.0
    spot = {"type": "spot", "position": [0, 0, h],
            "direction": [0, 0, -1], "intensity": [2000, 2000, 2000],
            "inner_deg": 10.0, "outer_deg": 35.0}
    point = {"type": "point", "position": [0, 0, h],
             "intensity": [2000, 2000, 2000]}
    r0 = _render([dict(spot, intensity=[0, 0, 0])])
    ds = (_render([spot]) - r0)[:, :, 0]
    dp = (_render([point]) - r0)[:, :, 0]
    pts = _pixel_world_points()
    r = np.sqrt(pts[:, :, 0] ** 2 + pts[:, :, 1] ** 2)
    ok = dp > 1e-5
    fall = np.where(ok, ds / np.maximum(dp, 1e-12), 0.0)
    # mask radii keep all jittered samples (~2.3 units from the pixel
    # center) strictly inside / outside the cone bands
    inner = ok & (r < h * np.tan(np.radians(10.0)) - 2.5)
    mid = ok & (r > h * np.tan(np.radians(15.0)) + 2.5) \
        & (r < h * np.tan(np.radians(30.0)) - 2.5)
    outer = ok & (r > h * np.tan(np.radians(35.0)) + 3.0)
    assert inner.sum() > 10 and mid.sum() > 50 and outer.sum() > 20
    np.testing.assert_allclose(fall[inner], 1.0, rtol=0.02)  # flat core
    assert 0.01 < fall[mid].mean() < 0.95          # transition band
    np.testing.assert_allclose(fall[outer], 0.0, atol=1e-6)


def test_directional_flat_irradiance():
    # straight-down directional vs point: per-pixel ratio is the analytic
    # I_dir / (I_pt * cos/d^2) map
    point = {"type": "point", "position": [0, 0, 30],
             "intensity": [500, 500, 500]}
    sun = {"type": "directional", "direction": [0, 0, -1],
           "intensity": [2, 2, 2]}
    r0 = _render([dict(point, intensity=[0, 0, 0])])
    dp = (_render([point]) - r0)[:, :, 0]
    dd = (_render([dict(point, intensity=[0, 0, 0]), sun])
          - _render([dict(point, intensity=[0, 0, 0]),
                     dict(sun, intensity=[0, 0, 0])]))[:, :, 0]
    # NB: both dd renders carry TWO delta lights so the light pick stream
    # matches; dp/r0 carry one.  dd and dp come from different pick
    # streams, so compare ROBUST statistics instead of per-pixel values:
    # directional irradiance is constant on the floor.
    pts = _pixel_world_points()
    expect_dir = (ALBEDO / np.pi) * 2.0
    # a directional light picked with p=1/2 carries weight n_lights=2:
    # the estimator stays unbiased; check the mean over many pixels
    assert abs(dd.mean() / expect_dir - 1.0) < 0.15
    assert dd.std() / dd.mean() < 0.6  # flat-ish (pick noise only)
    expect_pt = _point_val(pts, [0, 0, 30], point["intensity"])
    assert abs((dp / expect_pt).mean() - 1.0) < 0.15


def test_point_occlusion_umbra():
    # opaque blocker between light and floor: sharp point-light shadow
    blocker = Spheres(
        center=np.array([[0.0, 0.0, -1e4], [0.0, 0.0, 32.0]], np.float32),
        radius=np.array([1e4, 5.0], np.float32),
        color=np.array([[ALBEDO] * 3, [0.2, 0.2, 0.2]], np.float32),
        emission=np.zeros((2, 3), np.float32),
        refl=np.array([DIFF, DIFF], np.int32))
    light = {"type": "point", "position": [0, 0, 45],
             "intensity": [800, 800, 800]}
    r0 = _render([dict(light, intensity=[0, 0, 0])], spheres=blocker)
    d = (_render([light], spheres=blocker) - r0)[:, :, 0]
    pts = _pixel_world_points()
    r = np.sqrt(pts[:, :, 0] ** 2 + pts[:, :, 1] ** 2)
    # umbra circle on the floor: blocker r=5 at z=32, light at z=45 ->
    # radius 5 * 45/(45-32) = 17.3.  Pixels at r < ~7.3 see the blocker's
    # own lit TOP surface, so the dark zone is the annulus between the
    # blocker silhouette and the shadow edge (with ~2.3 units of
    # sub-pixel jitter margin on both sides).
    umbra = (r > 7.5) & (r < 15.0)
    lit = (r > 19.7) & (r < 45.0)
    assert umbra.sum() > 20 and lit.sum() > 100
    np.testing.assert_allclose(d[umbra], 0.0, atol=1e-7)
    assert (d[lit] > 1e-5).mean() > 0.5


def test_mis_delta_weight_is_one():
    light = {"type": "point", "position": [0, 0, 30],
             "intensity": [400, 400, 400]}
    dark = [dict(light, intensity=[0, 0, 0])]
    d_off = _render([light]) - _render(dark)
    d_on = _render([light], mis=True) - _render(dark, mis=True)
    np.testing.assert_allclose(d_on, d_off, rtol=1e-5, atol=1e-6)


def test_smoke_with_area_lights_and_delta():
    # delta lights alongside the default seven spheres (area light + sun)
    img = _render([{"type": "point", "position": [0, -80, 60],
                    "intensity": [300, 300, 300]}],
                  spheres=Spheres.default_seven())
    assert np.isfinite(img).all()
    assert img.max() > 0


def test_from_specs_validation():
    with pytest.raises(ValueError):
        DeltaLights.from_specs([{"type": "laser"}])
    with pytest.raises(ValueError):
        DeltaLights.from_specs([{"type": "point"}])  # no position
    with pytest.raises(ValueError):
        DeltaLights.from_specs([{"type": "spot", "position": [0, 0, 1]}])
    with pytest.raises(ValueError):
        DeltaLights.from_specs([{"type": "directional",
                                 "direction": [0, 0, 0]}])
    with pytest.raises(ValueError):
        DeltaLights.from_specs([{"type": "spot", "position": [0, 0, 1],
                                 "direction": [0, 0, -1],
                                 "inner_deg": 50, "outer_deg": 20}])
    dl = DeltaLights.from_specs([
        {"type": "point", "position": [1, 2, 3], "intensity": [5, 5, 5]},
        {"type": "spot", "position": [0, 0, 9], "direction": [0, 0, -2],
         "outer_deg": 30},
        {"type": "directional", "direction": [1, 0, 0]}])
    assert dl.count == 3
    assert dl.kind.tolist() == [DL_POINT, DL_SPOT, 2]
    np.testing.assert_allclose(np.linalg.norm(dl.direction, axis=1),
                               1.0, rtol=1e-6)
    rows = dl.pack()
    assert rows.shape == (3, 12)
    np.testing.assert_allclose(rows[1, 11], np.cos(np.radians(30)),
                               rtol=1e-6)


def test_json_description_lights(tmp_path):
    desc = {
        "spheres": [{"center": [0, 0, -1e4], "radius": 1e4,
                     "color": [0.75, 0.75, 0.75]}],
        "lights": [
            {"type": "point", "position": [0, 0, 30],
             "intensity": [100, 100, 100]},
            {"type": "directional", "direction": [0, 0, -1],
             "intensity": [1, 1, 1]},
        ],
    }
    p = tmp_path / "scene.json"
    p.write_text(json.dumps(desc))
    from tyrant_tpu.scene.description import load_description
    bundle = load_description(str(p))
    assert bundle.scene.delta_lights is not None
    assert bundle.scene.delta_lights.count == 2
    sd = bundle.scene.to_device()
    assert sd.n_delta_lights == 2
    assert sd.delta_lights.shape == (2, 12)
