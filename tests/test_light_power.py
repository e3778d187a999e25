"""Power-proportional NEE light selection (cfg.light_sampling == "power").

The reference has exactly one hard-coded light (kernel.cu:421), so uniform
selection is vacuous there; with many emitters of very different power,
uniform picks waste NEE samples on lights that contribute nothing.  Power
selection keeps the estimator unbiased (the contribution divides by the
actual pick pdf) while moving samples to where the radiance is.

Scene used: a huge diffuse floor sphere plus a BRIGHT and a DIM emissive
sphere (power ratio ~40000:1 via emission x area), orthographic camera
looking straight down.
"""

import dataclasses

import numpy as np

from tyrant_tpu.camera import Camera
from tyrant_tpu.config import small_config
from tyrant_tpu.render import Renderer
from tyrant_tpu.scene.scene import DIFF, LIGHT, Scene, Spheres

W = H = 16
ORTHO_H = 60.0


def _spheres(bright=200.0, dim=0.005, n_dim=5):
    # one bright emitter + n_dim near-black ones: uniform selection picks
    # the bright light 1/(n_dim+1) of the time at (n_dim+1)x weight
    centers = [[0.0, 0.0, -1e4], [-15.0, 0.0, 12.0]]
    for k in range(n_dim):
        centers.append([15.0, (k - n_dim / 2) * 8.0, 12.0])
    n = len(centers)
    em = np.zeros((n, 3), np.float32)
    em[1] = bright
    em[2:] = dim
    return Spheres(
        center=np.array(centers, np.float32),
        radius=np.array([1e4] + [3.0] * (n - 1), np.float32),
        color=np.full((n, 3), 0.75, np.float32),
        emission=em,
        refl=np.array([DIFF] + [LIGHT] * (n - 1), np.int32))


def _cfg(sampling, mis=False, bounces=0):
    return dataclasses.replace(
        small_config(width=W, height=H, num_rays=1 << 10,
                     max_bounces=bounces),
        projection="ortho", ortho_height=ORTHO_H,
        light_sampling=sampling, mis="on" if mis else "off")


def _camera():
    cam = Camera()
    cam.position = np.array([0.0, 0.0, 40.0], np.float32)
    cam.vertical_angle = -np.pi / 2 + 1e-3
    return cam


def _render(sampling, steps, mis=False, bounces=0):
    scene = Scene.load(None, spheres=_spheres())
    r = Renderer(scene, _cfg(sampling, mis, bounces),
                 sun_position=(0.05, 0.3), donate=False)
    r.step(_camera(), steps)
    acc = np.asarray(r.state.accum)
    img = acc[:, :3] / np.maximum(acc[:, 3:4], 1e-9)
    return img.reshape(H, W, 3)


def test_light_powers_table():
    # SceneData.light_powers = luminance x 4 pi r^2, in pick order
    scene = Scene.load(None, spheres=_spheres(bright=200.0, dim=0.005))
    sd = scene.to_device()
    assert len(sd.light_powers) == 6
    lum = np.array([0.2126, 0.7152, 0.0722]).sum()
    area = 4.0 * np.pi * 9.0
    np.testing.assert_allclose(sd.light_powers[0], 200.0 * lum * area,
                               rtol=1e-5)
    np.testing.assert_allclose(sd.light_powers[1], 0.005 * lum * area,
                               rtol=1e-5)


def test_unbiased_same_mean():
    # both estimators converge to the same direct-lighting image (the
    # per-pixel tolerance is dominated by the UNIFORM estimator's noise —
    # it picks the bright light 1/6 of the time at 6x weight)
    u = _render("uniform", steps=500)
    p = _render("power", steps=500)
    lit = u[:, :, 0] > np.percentile(u[:, :, 0], 40)
    err = np.abs(p - u)[lit].mean() / u[lit].mean()
    assert err < 0.055, f"power vs uniform pixel mean differs by {err:.3f}"
    g = abs(p[lit].mean() - u[lit].mean()) / u[lit].mean()
    assert g < 0.015, f"power vs uniform image mean differs by {g:.3f}"


def test_variance_reduction():
    # short runs: power selection should sit far closer to the converged
    # image than uniform (uniform wastes half its NEE picks on the dim
    # light and doubles the bright samples' weight)
    ref = _render("power", steps=400)
    u = _render("uniform", steps=24)
    p = _render("power", steps=24)
    mse_u = float(np.mean((u - ref) ** 2))
    mse_p = float(np.mean((p - ref) ** 2))
    assert mse_p < 0.55 * mse_u, (mse_p, mse_u)


def test_power_with_mis_same_mean():
    # the MIS emitter-hit side recomputes the power pick pdf from the hit
    # row; means must agree with the uniform-pick MIS estimator
    u = _render("uniform", steps=260, mis=True, bounces=1)
    p = _render("power", steps=260, mis=True, bounces=1)
    lit = u[:, :, 0] > np.percentile(u[:, :, 0], 40)
    err = np.abs(p - u)[lit].mean() / u[lit].mean()
    assert err < 0.07, f"MIS power vs uniform mean differs by {err:.3f}"


def test_uniform_default_unchanged():
    # light_sampling="uniform" must compile the identical program: same
    # accumulation bit-for-bit as an explicit default config
    a = _render("uniform", steps=4)
    cfg_default = dataclasses.replace(
        small_config(width=W, height=H, num_rays=1 << 10, max_bounces=0),
        projection="ortho", ortho_height=ORTHO_H)
    scene = Scene.load(None, spheres=_spheres())
    r = Renderer(scene, cfg_default, sun_position=(0.05, 0.3), donate=False)
    r.step(_camera(), 4)
    acc = np.asarray(r.state.accum)
    b = (acc[:, :3] / np.maximum(acc[:, 3:4], 1e-9)).reshape(H, W, 3)
    np.testing.assert_array_equal(a, b)
