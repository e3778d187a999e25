"""Tangent-space normal mapping tests (MTL map_Kn -> shade perturbation).

Covers: MTL parsing + raw (non-sRGB) decode, tangent/handedness packing in
the attribute row, the shade/AOV perturbation against hand-computed world
normals, composition with instancing transforms (tangents derive from the
TRANSFORMED edges), and the identity map being a visual no-op.
"""

import dataclasses
import math

import numpy as np
import pytest

from tyrant_tpu.camera import Camera
from tyrant_tpu.config import small_config
from tyrant_tpu.render import Renderer, render_aovs
from tyrant_tpu.scene.instancing import MeshAsset
from tyrant_tpu.scene.scene import Scene

# a unit quad in the xy-plane: [-10,10]^2 at z=0, standard uv 0..1
QV0 = np.array([[-10, -10, 0], [-10, -10, 0]], np.float32)
QV1 = np.array([[10, -10, 0], [10, 10, 0]], np.float32)
QV2 = np.array([[10, 10, 0], [-10, 10, 0]], np.float32)
QUV = np.array([[[0, 0], [1, 0], [1, 1]],
                [[0, 0], [1, 1], [0, 1]]], np.float32)

# constant-tilt map: n_ts = (0.5, 0, sqrt(3)/2) — 30 deg toward +tangent
TILT = np.full((2, 2, 3), 0.0, np.float32)
TILT[:, :, 0] = 0.75
TILT[:, :, 1] = 0.5
TILT[:, :, 2] = 0.5 * (1.0 + math.sqrt(3.0) / 2.0)
EXPECT_N = np.array([0.5, 0.0, math.sqrt(3.0) / 2.0])


def _quad_scene(nmap=TILT, transform=None):
    if transform is None:
        return Scene.from_triangles(
            QV0, QV1, QV2, builder="numpy", tri_uv=QUV,
            tri_ntex=np.zeros(2, np.int32), textures=[nmap])
    asset = MeshAsset(v0=QV0, v1=QV1, v2=QV2, tri_uv=QUV,
                      tri_ntex=np.zeros(2, np.int32), textures=[nmap])
    return Scene.from_instances([asset], [(0, transform)], builder="numpy")


def _down_camera(z=60.0):
    cam = Camera()
    cam.position = np.array([0.0, 0.0, z], np.float32)
    cam.vertical_angle = -math.pi / 2 + 1e-3
    return cam


def _aov_normal_center(scene, w=32, h=32):
    cfg = small_config(width=w, height=h, num_rays=1 << 10)
    aov = render_aovs(scene.to_device(), _down_camera().to_device(cfg), cfg)
    return np.asarray(aov["normal"])[h // 2, w // 2]


def test_attr_packing_tangent_and_handedness():
    sd = _quad_scene().to_device()
    attr = np.asarray(sd.tri_attr)
    assert sd.has_normal_maps and not sd.has_albedo_tex
    assert attr[0, 26] == 0.0 and attr[1, 26] == 0.0  # map id
    # tangent = +x for the standard parameterisation, handedness +1
    for row in range(2):
        np.testing.assert_allclose(attr[row, 27:30], [1, 0, 0], atol=1e-5)
        assert attr[row, 30] == 1.0


def test_aov_normal_is_perturbed():
    n = _aov_normal_center(_quad_scene())
    np.testing.assert_allclose(n, EXPECT_N, atol=2e-3)


def test_identity_map_is_noop():
    flat = np.full((2, 2, 3), 0.5, np.float32)
    flat[:, :, 2] = 1.0
    n = _aov_normal_center(_quad_scene(nmap=flat))
    np.testing.assert_allclose(n, [0, 0, 1], atol=1e-5)


def test_tangent_follows_instance_transform():
    """rotate_z(90) maps the tangent +x -> +y; since tangents are computed
    from the TRANSFORMED edges in to_device, the perturbed normal must
    rotate with the instance."""
    c, s = 0.0, 1.0
    rz = np.array([[c, -s, 0, 0], [s, c, 0, 0], [0, 0, 1, 0]], np.float32)
    n = _aov_normal_center(_quad_scene(transform=rz))
    np.testing.assert_allclose(n, [0.0, 0.5, math.sqrt(3.0) / 2.0],
                               atol=2e-3)


def test_render_with_normal_map_runs_and_shifts_shading():
    """End-to-end: the tilted map must change the rendered radiance of the
    quad vs the identity map (the sun sees a different cosine)."""
    cfg = small_config(width=24, height=24, num_rays=1 << 12)
    cam = _down_camera()

    def lum(scene):
        r = Renderer(scene, cfg, sun_position=(0.05, 0.3), donate=False)
        r.step(cam, 10)
        a = np.asarray(r.state.accum)
        return (a[:, :3].sum(1) / np.maximum(a[:, 3], 1)).mean()

    flat = np.full((2, 2, 3), 0.5, np.float32)
    flat[:, :, 2] = 1.0
    l_flat = lum(_quad_scene(nmap=flat))
    l_tilt = lum(_quad_scene())
    assert np.isfinite(l_flat) and np.isfinite(l_tilt)
    assert abs(l_tilt - l_flat) / max(l_flat, 1e-9) > 0.02


def test_obj_mtl_normal_map_end_to_end(tmp_path):
    """map_Kn parsed from MTL, decoded WITHOUT sRGB gamma, wired through
    Scene.load."""
    from PIL import Image
    arr = np.zeros((2, 2, 3), np.uint8)
    arr[:, :] = (191, 128, 255)  # raw (0.749, 0.502, 1.0)
    Image.fromarray(arr).save(tmp_path / "n.png")
    (tmp_path / "m.mtl").write_text(
        "newmtl mat\nKd 1 1 1\nmap_Kn n.png\n")
    (tmp_path / "q.obj").write_text(
        "mtllib m.mtl\n"
        "v -10 -10 0\nv 10 -10 0\nv 10 10 0\nv -10 10 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "usemtl mat\nf 1/1 2/2 3/3\nf 1/1 3/3 4/4\n")
    scene = Scene.load(str(tmp_path / "q.obj"), builder="numpy")
    assert scene.tri_ntex is not None and (scene.tri_ntex == 0).all()
    sd = scene.to_device()
    assert sd.has_normal_maps
    # raw decode: atlas texel must be 191/255, not (191/255)^2.2
    tex = np.asarray(sd.tex_data)
    np.testing.assert_allclose(tex[1, 0], 191.0 / 255.0, atol=1e-3)
    # shade-visible: perturbed normal tilts toward +x
    n = _aov_normal_center(scene)
    assert n[0] > 0.3 and n[2] > 0.8


def test_degenerate_uv_disables_map():
    """Zero-area UV parameterisation cannot define a tangent: the packed
    map id must be -1 (shade keeps the geometric normal)."""
    uv = np.zeros((2, 3, 2), np.float32)  # all corners at uv (0,0)
    sc = Scene.from_triangles(QV0, QV1, QV2, builder="numpy", tri_uv=uv,
                              tri_ntex=np.zeros(2, np.int32),
                              textures=[TILT])
    attr = np.asarray(sc.to_device().tri_attr)
    assert (attr[:2, 26] == -1.0).all()
    n = _aov_normal_center(sc)
    np.testing.assert_allclose(n, [0, 0, 1], atol=1e-5)
