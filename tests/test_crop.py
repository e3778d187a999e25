"""Crop-window rendering (cfg.crop / --crop, beyond-reference).

Raygen's round-robin scan covers only the crop rectangle; everything
outside accumulates zero paths and resolves black.  Tiles compose: two
disjoint crops cover their union exactly once per pass.
"""

import dataclasses

import numpy as np
import pytest

from tyrant_tpu.camera import Camera
from tyrant_tpu.config import small_config
from tyrant_tpu.render import Renderer, init_state, render_step
from tyrant_tpu.scene.scene import Scene

W, H = 32, 24


def _cam():
    cam = Camera()
    cam.position = np.array([0.0, -170.0, 40.0], np.float32)
    cam.vertical_angle = -0.10
    return cam


def _alpha(cfg, steps=3):
    r = Renderer(Scene.load(None), cfg, donate=False)
    r.step(_cam(), steps)
    a = np.asarray(r.state.accum)
    return a[:, 3].reshape(H, W), a


def test_crop_coverage_and_black_outside():
    cfg = small_config(width=W, height=H, num_rays=1 << 10,
                       crop=(8, 4, 16, 16))
    alpha, _ = _alpha(cfg)
    inside = alpha[4:20, 8:24]
    outside = alpha.copy()
    outside[4:20, 8:24] = 0
    assert (inside > 0).all()          # every crop pixel sampled
    assert (outside == 0).all()        # nothing leaks outside


def test_crop_matches_full_render_statistically():
    """The crop region's converged mean equals the full render's same
    region (same estimator, different sample schedule)."""
    cfg_full = small_config(width=W, height=H, num_rays=1 << 12)
    cfg_crop = dataclasses.replace(cfg_full, crop=(8, 4, 16, 16))
    _, a_full = _alpha(cfg_full, steps=24)
    _, a_crop = _alpha(cfg_crop, steps=24)

    def mean_img(a):
        return (a[:, :3].mean(1)
                / np.maximum(a[:, 3], 1)).reshape(H, W)

    region = np.s_[6:18, 10:22]
    mf = mean_img(a_full)[region].mean()
    mc = mean_img(a_crop)[region].mean()
    assert abs(mf - mc) / mf < 0.05, (mf, mc)


def test_crop_tiles_compose():
    """Two disjoint crops = the union, each pixel visited once per pass
    in its own tile (per-pixel path counts stay balanced)."""
    base = small_config(width=W, height=H, num_rays=1 << 10)
    left = dataclasses.replace(base, crop=(0, 0, 16, H))
    right = dataclasses.replace(base, crop=(16, 0, 16, H))
    al, _ = _alpha(left)
    ar, _ = _alpha(right)
    assert (al[:, :16] > 0).all() and (al[:, 16:] == 0).all()
    assert (ar[:, 16:] > 0).all() and (ar[:, :16] == 0).all()


def test_crop_validation():
    cfg = small_config(width=W, height=H, num_rays=256,
                       crop=(20, 0, 16, 8))  # x0+cw > W
    with pytest.raises(ValueError, match="outside"):
        Renderer(Scene.load(None), cfg, donate=False).step(_cam(), 1)
    cfg2 = small_config(width=W, height=H, num_rays=256,
                        crop=(0, 0, 8, 8), adaptive_sampling="on")
    with pytest.raises(ValueError, match="adaptive"):
        Renderer(Scene.load(None), cfg2, donate=False).step(_cam(), 1)
    cfg3 = small_config(width=W, height=H, num_rays=256, crop=(0, 0, 8, 8))
    with pytest.raises(ValueError, match="row-strip"):
        render_step(init_state(cfg3, local_height=H // 2), None, None,
                    None, cfg=cfg3, local_height=H // 2)
