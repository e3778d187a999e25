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
    # SceneData.light_powers = luminance x 4 pi r^2, in pick order — a
    # device-array LEAF (emission edits must not change the pytree aux,
    # or every brightness tweak would recompile the step program)
    scene = Scene.load(None, spheres=_spheres(bright=200.0, dim=0.005))
    sd = scene.to_device()
    pw = np.asarray(sd.light_powers)
    assert pw.shape == (6,)
    import jax
    lum = np.array([0.2126, 0.7152, 0.0722]).sum()
    area = 4.0 * np.pi * 9.0
    np.testing.assert_allclose(pw[0], 200.0 * lum * area, rtol=1e-5)
    np.testing.assert_allclose(pw[1], 0.005 * lum * area, rtol=1e-5)
    # leaf, not aux: two scenes differing only in emission share a pytree
    # structure (the jit cache key)
    sd2 = Scene.load(None, spheres=_spheres(bright=70.0)).to_device()
    assert (jax.tree_util.tree_structure(sd)
            == jax.tree_util.tree_structure(sd2))


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
    ref = _render("power", steps=600)
    # mask pixels that see an emitter directly: their value jitters with
    # subpixel coverage identically in both modes (emission 200 vs floor
    # ~0.2) and would swamp the light-pick comparison
    floor = ref[:, :, 0] < 1.0
    u = _render("uniform", steps=24)
    p = _render("power", steps=24)
    mse_u = float(np.mean((u - ref)[floor] ** 2))
    mse_p = float(np.mean((p - ref)[floor] ** 2))
    # measured ~5.4x lower MSE with the 0.75/0.25 defensive mixture
    assert mse_p < 0.35 * mse_u, (mse_p, mse_u)


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


def _many_light_scene(n_lights=96, bright_k=3):
    """A floor quad + n_lights small emissive triangles, a handful bright
    and the rest near-black — the > 64-light alias-pick regime."""
    from tyrant_tpu.scene.scene import BVHConfig
    rng = np.random.default_rng(3)
    v0 = [[-60.0, -60.0, 0.0], [60.0, -60.0, 0.0]]
    v1 = [[60.0, -60.0, 0.0], [60.0, 60.0, 0.0]]
    v2 = [[-60.0, 60.0, 0.0], [-60.0, 60.0, 0.0]]
    refl = [DIFF, DIFF]
    color = [[0.75] * 3, [0.75] * 3]
    for k in range(n_lights):
        c = np.array([rng.uniform(-40, 40), rng.uniform(-40, 40), 12.0])
        e = 60.0 if k < bright_k else 0.003
        v0.append(list(c))
        v1.append(list(c + [2.0, 0.0, 0.0]))
        v2.append(list(c + [0.0, 2.0, 0.0]))
        refl.append(LIGHT)
        color.append([e] * 3)
    # one distant dark sphere: zero-sphere scenes are unsupported (the
    # sphere intersector reduces over the sphere axis)
    far = Spheres(center=np.array([[0.0, 0.0, -1e6]], np.float32),
                  radius=np.array([1.0], np.float32),
                  color=np.zeros((1, 3), np.float32),
                  emission=np.zeros((1, 3), np.float32),
                  refl=np.array([DIFF], np.int32))
    return Scene.from_triangles(
        np.array(v0, np.float32), np.array(v1, np.float32),
        np.array(v2, np.float32), spheres=far,
        tri_refl=np.array(refl, np.int32),
        tri_color=np.array(color, np.float32))


def test_alias_table_rows():
    scene = _many_light_scene()
    sd = scene.to_device()
    assert len(sd.light_powers) == 96
    la = np.asarray(sd.light_alias)
    assert la.shape == (96, 4)
    # simulate the exact shade draw on a dense uniform grid: the empirical
    # pick distribution must match the power distribution
    p = np.asarray(sd.light_powers, np.float64)
    p = 0.75 * p / p.sum() + 0.25 / len(p)  # defensive mixture (scene.py)
    lu = (np.arange(200000) + 0.5) / 200000
    i0 = np.minimum((lu * 96).astype(np.int64), 95)
    frac = lu * 96 - i0
    take_self = frac < la[i0, 0]
    pick = np.where(take_self, i0, la[i0, 1].astype(np.int64))
    inv = np.where(take_self, la[i0, 2], la[i0, 3])
    counts = np.bincount(pick, minlength=96) / len(lu)
    np.testing.assert_allclose(counts, p, atol=2e-4)
    # the gathered 1/pdf matches the analytic pick pdf
    np.testing.assert_allclose(inv, 1.0 / p[pick], rtol=1e-4)


def test_many_light_unbiased():
    # alias-pick power sampling agrees with uniform selection in the mean
    # and cuts variance.  Sun below the horizon so the 96 emissive
    # triangles dominate the lighting (otherwise sun-strategy noise
    # swamps the light-pick comparison).
    def rend(sampling, steps):
        scene = _many_light_scene()
        r = Renderer(scene, _cfg(sampling), sun_position=(0.05, -0.4),
                     donate=False)
        r.step(_camera(), steps)
        acc = np.asarray(r.state.accum)
        return (acc[:, :3] / np.maximum(acc[:, 3:4], 1e-9)).reshape(H, W, 3)

    u = rend("uniform", 500)
    p = rend("power", 500)
    lit = u[:, :, 0] > np.percentile(u[:, :, 0], 40)
    g = abs(p[lit].mean() - u[lit].mean()) / u[lit].mean()
    assert g < 0.04, f"alias power vs uniform image mean differs by {g:.3f}"
    # short runs: 93 of 96 uniform picks hit near-black emitters at 96x
    # weight, so uniform should sit far from the converged image.  MSE on
    # FLOOR pixels only: pixels partially covered by an emissive triangle
    # jitter with subpixel sample positions identically in both modes and
    # would swamp the comparison (emission 60 vs floor ~0.2).
    ref = rend("power", 1200)
    floor = ref[:, :, 0] < 1.0
    us = rend("uniform", 16)
    ps = rend("power", 16)
    mse_u = float(np.mean((us - ref)[floor] ** 2))
    mse_p = float(np.mean((ps - ref)[floor] ** 2))
    assert mse_p < 0.35 * mse_u, (mse_p, mse_u)


def test_many_light_power_with_mis():
    # the >64-light ALIAS pick must pair with the MIS hit-side power pdf:
    # power+MIS must agree with the (reference-estimator) power/no-MIS
    # mean.  NB uniform+MIS is NOT a usable baseline here: a 1/96 pick
    # pdf makes the balance heuristic push nearly all bright-emitter
    # energy onto the rare BSDF-hit channel (~0.2% of paths), which
    # converges from far below at test-sized sample counts — power
    # selection keeps NEE dominant, which is exactly why it matters
    # under MIS.
    def rend(sampling, mis, steps):
        scene = _many_light_scene()
        r = Renderer(scene, _cfg(sampling, mis=mis, bounces=1),
                     sun_position=(0.05, -0.4), donate=False)
        r.step(_camera(), steps)
        acc = np.asarray(r.state.accum)
        return (acc[:, :3] / np.maximum(acc[:, 3:4], 1e-9)).reshape(H, W, 3)

    base = rend("power", False, 400)
    p = rend("power", True, 400)
    floor = base[:, :, 0] < 1.0
    g = abs(p[floor].mean() - base[floor].mean()) \
        / max(base[floor].mean(), 1e-9)
    assert g < 0.06, f"alias+MIS vs alias/no-MIS mean differs by {g:.3f}"
