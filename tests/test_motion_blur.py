"""Camera motion blur (beyond-reference; cfg.motion_blur shutter).

Each fresh ray samples a shutter time on a SIDE RNG stream and sees the
camera pose lerped between the previous distinct pose and the current one
(render._raygen).  The side stream makes the blur exactly removable:
with zero inter-frame motion the blurred render is bit-identical to the
unblurred one.
"""

import dataclasses
import subprocess
import sys

import numpy as np

from tyrant_tpu.camera import Camera
from tyrant_tpu.config import small_config
from tyrant_tpu.render import Renderer
from tyrant_tpu.scene.scene import DIFF, LIGHT, Scene, Spheres

W = H = 32


def _spheres():
    # a small bright emissive sphere over a dark floor: a sharp feature
    # whose image-space footprint measures the blur
    return Spheres(
        center=np.array([[0.0, 0.0, -1e4], [0.0, 0.0, 10.0]], np.float32),
        radius=np.array([1e4, 4.0], np.float32),
        color=np.array([[0.05, 0.05, 0.05], [1, 1, 1]], np.float32),
        emission=np.array([[0, 0, 0], [8, 8, 8]], np.float32),
        refl=np.array([DIFF, LIGHT], np.int32))


def _cfg(shutter):
    return dataclasses.replace(
        small_config(width=W, height=H, num_rays=1 << 12, max_bounces=1),
        projection="ortho", ortho_height=80.0, motion_blur=shutter)


def _cam(x=0.0):
    cam = Camera()
    cam.position = np.array([x, 0.0, 50.0], np.float32)
    cam.vertical_angle = -np.pi / 2 + 1e-3
    return cam


def _render_two_frames(shutter, dx, steps=8):
    """Frame 0 at x=0, frame 1 at x=dx; returns frame 1's image."""
    r = Renderer(Scene.load(None, spheres=_spheres()), _cfg(shutter),
                 donate=False)
    r.step(_cam(0.0), 2)
    r.step(_cam(dx), steps)
    acc = np.asarray(r.state.accum)
    img = acc[:, :3] / np.maximum(acc[:, 3:4], 1e-9)
    return img.reshape(H, W, 3)


def test_zero_motion_is_bit_identical():
    # shutter on, but the camera never moved -> the lerp is degenerate and
    # the side-stream time draw must not perturb any other stream
    a = _render_two_frames(0.0, 0.0)
    b = _render_two_frames(1.0, 0.0)
    np.testing.assert_array_equal(a, b)


def test_shutter_zero_matches_no_blur_after_motion():
    a = _render_two_frames(0.0, 12.0)
    b = _render_two_frames(0.0, 12.0)
    np.testing.assert_array_equal(a, b)


def _bright_extent(img):
    cols = np.nonzero((img[:, :, 0] > 1.0).any(axis=0))[0]
    return (cols.min(), cols.max()) if cols.size else (0, -1)


def test_streak_extends_against_motion():
    dx = 12.0  # world units; ortho 80 across 32 px -> 2.5 units/px
    sharp = _render_two_frames(0.0, dx)
    blurred = _render_two_frames(1.0, dx)
    s_lo, s_hi = _bright_extent(sharp)
    b_lo, b_hi = _bright_extent(blurred)
    assert s_hi >= s_lo  # the emitter is visible
    # camera moved +x, so the emitter streaks toward larger x in frame 1
    # (earlier shutter times see the OLD camera -> feature offset +dx in
    # image space).  The streak widens by ~dx/2.5 = ~4.8 px on one side.
    assert b_hi - b_lo >= (s_hi - s_lo) + 3
    assert b_hi >= s_hi + 3
    assert abs(b_lo - s_lo) <= 1


def test_partial_shutter_shorter_streak():
    dx = 15.0
    full = _render_two_frames(1.0, dx)
    half = _render_two_frames(0.5, dx)
    f_lo, f_hi = _bright_extent(full)
    h_lo, h_hi = _bright_extent(half)
    assert (h_hi - h_lo) < (f_hi - f_lo)
    assert (h_hi - h_lo) > 0


def test_config_validation():
    import pytest
    from tyrant_tpu.config import RenderConfig
    with pytest.raises(ValueError):
        RenderConfig(motion_blur=-0.1)
    with pytest.raises(ValueError):
        RenderConfig(motion_blur=1.5)


def test_camera_look_at():
    cam = Camera()
    cam.position = np.array([10.0, -20.0, 30.0], np.float32)
    for target in ([0, 0, 0], [5, 40, -10], [10, -20, 80]):
        cam.look_at(target)
        d = np.asarray(target, np.float64) - cam.position
        n = np.linalg.norm(d)
        got = np.asarray(cam.direction, np.float64)
        if abs(d[2] / n) < 0.999:  # pitch not clamped
            np.testing.assert_allclose(got, d / n, atol=1e-6)
        else:  # straight up: pitch clamp keeps |v| < pi/2
            assert abs(cam.vertical_angle) < np.pi / 2


def test_cli_anim_smoke(tmp_path):
    out = tmp_path / "frames"
    cmd = [sys.executable, "-m", "tyrant_tpu.cli", "anim",
           "--width", "16", "--height", "16", "--rays", str(1 << 10),
           "--frames", "3", "--steps", "2", "--orbit", "30",
           "--shutter", "0.5", "--sun-to", "0.1", "0.5", "--out", str(out)]
    # fresh-process CPU jit compile is ~3 min alone; under full-suite CPU
    # contention 600 s was measured too tight (round-3 suite run)
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, r.stderr[-2000:]
    imgs = []
    for f in range(3):
        p = out / f"frame_{f:04d}.png"
        assert p.exists(), r.stderr[-2000:]
        from PIL import Image
        imgs.append(np.asarray(Image.open(p)))
    # the orbit actually moves the camera: consecutive frames differ
    assert (imgs[0] != imgs[1]).any()
    assert (imgs[1] != imgs[2]).any()
