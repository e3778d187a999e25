"""Alpha-cutout tests (MTL map_d -> atlas alpha lane -> PASS-through)."""

import numpy as np

from tyrant_tpu.config import small_config
from tyrant_tpu.render import Renderer
from tyrant_tpu.scene.scene import Scene

from .test_normal_map import QUV, QV0, QV1, QV2, _down_camera

W = H = 32


def _render_lum(scene, steps=12):
    cfg = small_config(width=W, height=H, num_rays=1 << 12)
    r = Renderer(scene, cfg, sun_position=(0.05, 0.3), donate=False)
    r.step(_down_camera(), steps)
    a = np.asarray(r.state.accum)
    return (a[:, :3].mean(1) / np.maximum(a[:, 3], 1)).reshape(H, W)


def _quad(tex):
    return Scene.from_triangles(
        QV0, QV1, QV2, builder="numpy", tri_uv=QUV,
        tri_tex=np.zeros(2, np.int32), textures=[tex])


def test_atlas_alpha_lane():
    tex = np.ones((2, 2, 4), np.float32)
    tex[0, 0, 3] = 0.0
    sd = _quad(tex).to_device()
    assert sd.has_alpha_tex
    data = np.asarray(sd.tex_data)
    assert data[0, 3] == 1.0          # fallback row opaque
    assert (data[1:5, 3] == [0, 1, 1, 1]).all()
    # an all-opaque alpha channel must NOT enable the cutout program
    opaque = np.ones((2, 2, 4), np.float32)
    assert not _quad(opaque).to_device().has_alpha_tex


def test_half_transparent_quad():
    """u<0.5 transparent: those pixels see through the quad to whatever
    is behind (the lit ground sphere), matching the no-quad render; the
    opaque half shows the dark red surface instead."""
    tex = np.ones((2, 4, 4), np.float32)
    tex[:, :, :3] = [1.0, 0.1, 0.1]
    tex[:, :2, 3] = 0.0  # u < 0.5 fully transparent
    cfg = small_config(width=W, height=H, num_rays=1 << 12)
    cam = _down_camera(z=22.0)  # quad fills most of the frame

    def lum(scene):
        r = Renderer(scene, cfg, sun_position=(0.05, 0.3), donate=False)
        r.step(cam, 16)
        a = np.asarray(r.state.accum)
        return (a[:, :3].mean(1) / np.maximum(a[:, 3], 1)).reshape(H, W)

    img = lum(_quad(tex))
    behind = lum(Scene.load(None))  # same spheres, no quad
    left = img[12:20, 6:13].mean()
    right = img[12:20, 19:26].mean()
    b_left = behind[12:20, 6:13].mean()
    b_right = behind[12:20, 19:26].mean()
    # one half matches the no-quad scene within noise, the other doesn't
    rel = [abs(left - b_left) / b_left, abs(right - b_right) / b_right]
    assert min(rel) < 0.08, rel      # the transparent half
    assert max(rel) > 0.25, rel      # the opaque (red) half


def _no_spheres():
    from tyrant_tpu.scene.scene import Spheres
    s = Spheres.default_seven()
    keep = s.refl == 4
    return Spheres(center=s.center[keep], radius=s.radius[keep],
                   color=s.color[keep], emission=s.emission[keep],
                   refl=s.refl[keep])


def test_fully_transparent_equals_no_quad():
    """alpha=0 everywhere: the quad must be radiometrically invisible
    (each pass-through only delays the path by one wavefront step)."""
    tex = np.ones((2, 2, 4), np.float32)
    tex[:, :, 3] = 0.0
    sc = Scene.from_triangles(
        QV0, QV1, QV2, builder="numpy", tri_uv=QUV,
        tri_tex=np.zeros(2, np.int32), textures=[tex],
        spheres=_no_spheres())
    img_quad = _render_lum(sc, steps=24)
    img_none = _render_lum(Scene.load(None, spheres=_no_spheres()),
                           steps=24)
    rel = np.abs(img_quad - img_none) / np.maximum(img_none, 1e-9)
    assert rel.mean() < 0.03, rel.mean()


def test_obj_map_d_end_to_end(tmp_path):
    from PIL import Image
    rgba = np.zeros((4, 4, 4), np.uint8)
    rgba[:, :, :3] = 200
    rgba[:, :, 3] = 255
    rgba[:2, :2, 3] = 0  # transparent corner
    Image.fromarray(rgba, "RGBA").save(tmp_path / "leaf.png")
    (tmp_path / "m.mtl").write_text(
        "newmtl mat\nKd 1 1 1\nmap_Kd leaf.png\nmap_d leaf.png\n")
    (tmp_path / "q.obj").write_text(
        "mtllib m.mtl\n"
        "v -10 -10 0\nv 10 -10 0\nv 10 10 0\nv -10 10 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "usemtl mat\nf 1/1 2/2 3/3\nf 1/1 3/3 4/4\n")
    scene = Scene.load(str(tmp_path / "q.obj"), builder="numpy")
    sd = scene.to_device()
    assert sd.has_alpha_tex and sd.has_albedo_tex
    img = _render_lum(scene)
    assert np.isfinite(img).all() and img.max() > 0
