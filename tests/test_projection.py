"""Camera projection modes (beyond-reference; render._primary_dirs).

The reference is perspective-only (kernel.cu:271-293).  These tests pin the
direction math of each added projection analytically, then smoke the full
pipeline through each mode.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from tyrant_tpu.camera import Camera
from tyrant_tpu.config import RenderConfig, small_config
from tyrant_tpu.render import Renderer, _primary_dirs, render_aovs
from tyrant_tpu.scene.scene import Scene, Spheres


def _cam_and_params(cfg):
    cam = Camera()
    cam.position = np.array([0.0, -50.0, 10.0], np.float32)
    return cam, cam.to_device(cfg)


def _unit_basis(params):
    ru = np.asarray(params.right, float)
    uu = np.asarray(params.up, float)
    return ru / np.linalg.norm(ru), uu / np.linalg.norm(uu)


def _dirs(cfg, ni, nj):
    _, params = _cam_and_params(cfg)
    d, off, live = _primary_dirs(
        cfg, params, jnp.asarray(ni, jnp.float32), jnp.asarray(nj, jnp.float32))
    return (np.asarray(d), None if off is None else np.asarray(off),
            None if live is None else np.asarray(live), params)


def test_perspective_matches_reference_basis():
    cfg = small_config(width=32, height=24)
    d, off, live, params = _dirs(cfg, [0.0, 0.25], [0.0, -0.1])
    assert off is None and live is None
    expect = np.asarray(params.direction)[None] \
        + np.array([[0.0], [0.25]]) * np.asarray(params.right)[None] \
        + np.array([[0.0], [-0.1]]) * np.asarray(params.up)[None]
    expect /= np.linalg.norm(expect, axis=-1, keepdims=True)
    np.testing.assert_allclose(d, expect, atol=1e-6)


def test_fisheye_axis_and_rim():
    # square image so the circle spans the full width too
    cfg = dataclasses.replace(small_config(width=32, height=32),
                              projection="fisheye",
                              fisheye_fov_degrees=180.0)
    d, _, live, params = _dirs(cfg, [0.0, 0.5, -0.5, 0.0], [0.0, 0.0, 0.0, 0.5])
    ru, uu = _unit_basis(params)
    fwd = np.asarray(params.direction, float)
    np.testing.assert_allclose(d[0], fwd, atol=1e-6)          # centre
    np.testing.assert_allclose(d[1], ru, atol=1e-5)           # right rim: +90
    np.testing.assert_allclose(d[2], -ru, atol=1e-5)          # left rim: -90
    np.testing.assert_allclose(d[3], uu, atol=1e-5)           # top rim
    assert live.all()
    # corner sits outside the image circle -> dead
    _, _, live2, _ = _dirs(cfg, [0.5], [0.5])
    assert not live2[0]


def test_fisheye_fov_scales_angle():
    cfg = dataclasses.replace(small_config(width=32, height=32),
                              projection="fisheye", fisheye_fov_degrees=90.0)
    d, _, _, params = _dirs(cfg, [0.5], [0.0])
    fwd = np.asarray(params.direction, float)
    # rim ray is 45 degrees off axis
    np.testing.assert_allclose(float(d[0] @ fwd), np.cos(np.pi / 4), atol=1e-5)


def test_equirect_cardinal_directions():
    cfg = dataclasses.replace(small_config(width=64, height=32),
                              projection="equirect")
    d, off, live, params = _dirs(
        cfg, [0.0, 0.25, -0.25, 0.0, 0.0, 0.4999999],
        [0.0, 0.0, 0.0, 0.5, -0.5, 0.0])
    assert off is None and live is None
    ru, uu = _unit_basis(params)
    fwd = np.asarray(params.direction, float)
    np.testing.assert_allclose(d[0], fwd, atol=1e-6)
    np.testing.assert_allclose(d[1], ru, atol=1e-5)    # +90 longitude
    np.testing.assert_allclose(d[2], -ru, atol=1e-5)   # -90 longitude
    np.testing.assert_allclose(d[3], uu, atol=1e-5)    # zenith
    np.testing.assert_allclose(d[4], -uu, atol=1e-5)   # nadir
    np.testing.assert_allclose(d[5], -fwd, atol=1e-4)  # wrap at the seam


def test_ortho_parallel_rays_with_offsets():
    cfg = dataclasses.replace(small_config(width=32, height=16),
                              projection="ortho", ortho_height=8.0)
    d, off, live, params = _dirs(cfg, [0.0, 0.5, 0.0], [0.0, 0.0, -0.5])
    assert live is None
    fwd = np.asarray(params.direction, float)
    ru, uu = _unit_basis(params)
    np.testing.assert_allclose(d, np.broadcast_to(fwd, (3, 3)), atol=1e-6)
    np.testing.assert_allclose(off[0], [0, 0, 0], atol=1e-6)
    # width = ortho_height * aspect = 16 world units -> half-width 8
    np.testing.assert_allclose(off[1], 8.0 * ru, atol=1e-4)
    np.testing.assert_allclose(off[2], -4.0 * uu, atol=1e-4)


@pytest.mark.parametrize("projection", ["fisheye", "equirect", "ortho"])
def test_render_smoke_each_projection(projection):
    cfg = dataclasses.replace(
        small_config(width=16, height=16, num_rays=1 << 10, max_bounces=3),
        projection=projection)
    scene = Scene.load(None, spheres=Spheres.default_seven())
    cam = Camera()
    cam.position = np.array([0.0, -170.0, 40.0], np.float32)
    r = Renderer(scene, cfg, sun_position=(0.05, 0.3), donate=False)
    r.step(cam, 4)
    acc = np.asarray(r.state.accum)
    assert np.isfinite(acc).all()
    assert acc[:, 3].sum() > 0  # paths completed
    # AOV pass shares the projection helper
    aovs = render_aovs(r.scene, cam.to_device(cfg), cfg)
    for k in ("albedo", "normal", "depth"):
        assert np.isfinite(np.asarray(aovs[k])).all()


def test_ortho_depth_of_plane_is_constant():
    # a giant floor sphere seen straight down: orthographic depth is flat,
    # perspective depth is not
    import tyrant_tpu.scene.scene as sc
    sp = Spheres(
        center=np.array([[0.0, 0.0, -1e5]], np.float32),
        radius=np.array([1e5], np.float32),
        color=np.array([[0.8, 0.8, 0.8]], np.float32),
        emission=np.zeros((1, 3), np.float32),
        refl=np.array([sc.DIFF], np.int32))
    scene = Scene.load(None, spheres=sp)
    cam = Camera()
    cam.position = np.array([0.0, 0.0, 50.0], np.float32)
    cam.vertical_angle = -np.pi / 2 + 1e-3  # look straight down
    base = small_config(width=8, height=8, num_rays=1 << 8)
    depths = {}
    for proj in ("perspective", "ortho"):
        cfg = dataclasses.replace(base, projection=proj, ortho_height=20.0)
        r = Renderer(scene, cfg, donate=False)
        aovs = render_aovs(r.scene, cam.to_device(cfg), cfg)
        depths[proj] = np.asarray(aovs["depth"])
    assert depths["ortho"].std() < 1e-2
    assert depths["perspective"].std() > 1e-1


def test_projection_validation():
    with pytest.raises(ValueError):
        RenderConfig(projection="pinhole")
    with pytest.raises(ValueError):
        RenderConfig(projection="fisheye", fisheye_fov_degrees=0.0)
    with pytest.raises(ValueError):
        RenderConfig(projection="ortho", ortho_height=-1.0)
