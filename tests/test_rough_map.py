"""Roughness-texture tests (MTL map_Pr -> per-texel GGX roughness)."""

import math

import numpy as np

from tyrant_tpu.config import small_config
from tyrant_tpu.render import Renderer
from tyrant_tpu.scene.scene import GGX, Scene

from .test_normal_map import QUV, QV0, QV1, QV2, _down_camera


def _lum_map(scene, w=32, h=32, steps=12):
    cfg = small_config(width=w, height=h, num_rays=1 << 12)
    r = Renderer(scene, cfg, sun_position=(0.05, 0.3), donate=False)
    r.step(_down_camera(), steps)
    a = np.asarray(r.state.accum)
    return (a[:, :3].mean(1) / np.maximum(a[:, 3], 1)).reshape(h, w)


def _ggx_quad(tri_rough=None, rmap=None):
    kw = {}
    if rmap is not None:
        kw = dict(tri_rtex=np.zeros(2, np.int32), textures=[rmap],
                  tri_uv=QUV)
    return Scene.from_triangles(
        QV0, QV1, QV2, builder="numpy",
        tri_refl=np.full(2, GGX, np.int32),
        tri_color=np.full((2, 3), 0.9, np.float32),
        tri_rough=np.full(2, 0.9 if rmap is not None else tri_rough,
                          np.float32),
        **kw)


def test_constant_map_matches_scalar_roughness():
    """A constant-0.4 roughness map must shade like scalar Pr=0.4 and
    OVERRIDE the material's 0.9 scalar (same RNG streams, same math)."""
    rmap = np.full((2, 2, 3), 0.4, np.float32)
    img_map = _lum_map(_ggx_quad(rmap=rmap))
    img_scalar = _lum_map(_ggx_quad(tri_rough=0.4))
    np.testing.assert_allclose(img_map, img_scalar, atol=1e-4)
    img_rough = _lum_map(_ggx_quad(tri_rough=0.9))
    assert np.abs(img_map - img_rough).mean() > 1e-4  # override visible


def test_spatially_varying_roughness():
    """Half-smooth/half-rough map: the smooth half concentrates the sun
    highlight, so per-half luminance variance must differ materially."""
    rmap = np.full((2, 4, 3), 1.0, np.float32)
    rmap[:, :2] = 0.05  # u < 0.5 smooth
    img = _lum_map(_ggx_quad(rmap=rmap), steps=20)
    # the quad spans the image centre; compare left/right halves
    left = img[8:24, 2:15]
    right = img[8:24, 17:30]
    v_l, v_r = float(left.var()), float(right.var())
    assert np.isfinite(img).all()
    assert max(v_l, v_r) > 2 * max(min(v_l, v_r), 1e-12), (v_l, v_r)


def test_obj_map_pr_end_to_end(tmp_path):
    arr = np.full((2, 2), 0.25, np.float32)
    np.save(tmp_path / "r.npy", arr)
    (tmp_path / "m.mtl").write_text(
        "newmtl mat\nKd 0.8 0.8 0.8\nmap_Pr r.npy\n")
    (tmp_path / "q.obj").write_text(
        "mtllib m.mtl\n"
        "v -10 -10 0\nv 10 -10 0\nv 10 10 0\nv -10 10 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "usemtl mat\nf 1/1 2/2 3/3\nf 1/1 3/3 4/4\n")
    scene = Scene.load(str(tmp_path / "q.obj"), builder="numpy")
    # a roughness map implies GGX even without Pm
    assert (scene.tri_refl == GGX).all()
    assert scene.tri_rtex is not None and (scene.tri_rtex == 0).all()
    sd = scene.to_device()
    assert sd.has_rough_maps and not sd.has_normal_maps
    attr = np.asarray(sd.tri_attr)
    assert (attr[:2, 31] == 0.0).all()
    img = _lum_map(scene)
    assert np.isfinite(img).all() and img.max() > 0
