"""JSON scene-description tests (scene/description.py + CLI plumbing)."""

import json
import math
import os

import numpy as np
import pytest

from tyrant_tpu import cli
from tyrant_tpu.scene.description import load_description
from tyrant_tpu.scene.scene import LIGHT, REFR

TINY_OBJ = """
v 0 0 0
v 1 0 0
v 0 1 0
v 0 0 1
f 1 2 3
f 1 2 4
"""


def _write(tmp_path, name, obj):
    p = tmp_path / name
    p.write_text(obj if isinstance(obj, str) else json.dumps(obj))
    return str(p)


def test_spheres_only_description(tmp_path):
    path = _write(tmp_path, "s.json", {
        "spheres": [
            {"center": [0, 0, 10], "radius": 2, "material": "glass",
             "color": [0.9, 0.9, 1.0]},
            {"center": [0, 0, 40], "radius": 4, "material": "light",
             "emission": [5, 5, 5]},
        ],
        "default_spheres": False,
        "camera": {"position": [0, -20, 5], "vertical": 0.2,
                   "lens_radius": 0.1},
        "sun": [0.1, 0.4],
        "fog": {"scatter": 0.01, "g": 0.3, "z": [0, 50]},
        "render": {"bounces": 3, "mis": True, "tonemap": "aces",
                   "light_sampling": "power"},
    })
    b = load_description(path)
    assert b.scene.spheres.count == 2
    assert b.scene.spheres.refl.tolist() == [REFR, LIGHT]
    assert b.camera.lens_radius == pytest.approx(0.1)
    assert b.sun == (0.1, 0.4)
    assert b.config["fog"] == "on"
    assert b.config["fog_sigma_s"] == pytest.approx(0.01)
    assert b.config["max_bounces"] == 3
    assert b.config["mis"] == "on"
    assert b.config["tonemap"] == "aces"
    assert b.config["light_sampling"] == "power"


def test_default_spheres_plus_custom(tmp_path):
    path = _write(tmp_path, "s.json", {
        "default_spheres": True,
        "spheres": [{"center": [9, 9, 9], "radius": 1}],
    })
    b = load_description(path)
    assert b.scene.spheres.count == 8  # reference seven + one


def test_instanced_meshes(tmp_path):
    _write(tmp_path, "tri.obj", TINY_OBJ)
    path = _write(tmp_path, "scene.json", {
        "meshes": [{"name": "tri", "path": "tri.obj", "scale": 2.0}],
        "instances": [
            {"mesh": "tri"},
            {"mesh": "tri", "translate": [10, 0, 0], "rotate_z": 90},
        ],
        "default_spheres": True,
    })
    b = load_description(path, builder="numpy")
    assert b.scene.stats["triangles"] == 4  # 2 tris x 2 instances
    assert b.scene.stats["instances"] == 2
    # instance 2: scale 2 then Rz(90) then translate — vertex (1,0,0) of the
    # first triangle maps to (10, 2, 0)
    corners = np.concatenate([
        b.scene.tri_vert,
        b.scene.tri_vert + b.scene.tri_e1,
        b.scene.tri_vert + b.scene.tri_e2])
    d = np.linalg.norm(corners - np.array([10.0, 2.0, 0.0]), axis=1)
    assert d.min() < 1e-5


def test_meshes_without_instances_get_identity(tmp_path):
    _write(tmp_path, "tri.obj", TINY_OBJ)
    path = _write(tmp_path, "scene.json",
                  {"meshes": [{"path": "tri.obj"}]})
    b = load_description(path, builder="numpy")
    assert b.scene.stats["triangles"] == 2
    # default spheres kept when no sphere section is given
    assert b.scene.spheres.count == 7


def test_validation_errors(tmp_path):
    with pytest.raises(ValueError, match="unknown scene-description"):
        load_description(_write(tmp_path, "a.json", {"mesh": []}))
    with pytest.raises(ValueError, match="unknown sphere material"):
        load_description(_write(tmp_path, "b.json", {
            "spheres": [{"center": [0, 0, 0], "radius": 1,
                         "material": "velvet"}]}))
    with pytest.raises(ValueError, match="requires a 'meshes'"):
        load_description(_write(tmp_path, "c.json",
                                {"instances": [{"mesh": 0}]}))
    with pytest.raises(ValueError, match="unknown render key"):
        load_description(_write(tmp_path, "d.json",
                                {"render": {"samples": 4}}))
    _write(tmp_path, "tri.obj", TINY_OBJ)
    with pytest.raises(KeyError):
        load_description(_write(tmp_path, "e.json", {
            "meshes": [{"path": "tri.obj"}],
            "instances": [{"mesh": "nope"}]}))


def test_matrix_transform(tmp_path):
    _write(tmp_path, "tri.obj", TINY_OBJ)
    path = _write(tmp_path, "scene.json", {
        "meshes": [{"path": "tri.obj"}],
        "instances": [{"mesh": 0,
                       "matrix": [[0, -1, 0, 5], [1, 0, 0, 0],
                                  [0, 0, 1, 1]]}],
        "default_spheres": False,
        "spheres": [{"center": [0, 0, 40], "radius": 4,
                     "material": "light", "emission": [1, 1, 1]}],
    })
    b = load_description(path, builder="numpy")
    corners = np.concatenate([
        b.scene.tri_vert,
        b.scene.tri_vert + b.scene.tri_e1,
        b.scene.tri_vert + b.scene.tri_e2])
    # vertex (1,0,0) -> (5, 1, 1)
    d = np.linalg.norm(corners - np.array([5.0, 1.0, 1.0]), axis=1)
    assert d.min() < 1e-5


def test_cli_renders_json_scene(tmp_path):
    path = _write(tmp_path, "scene.json", {
        "spheres": [{"center": [0, 0, 20], "radius": 8,
                     "material": "diffuse", "color": [1, 0.4, 0.2]},
                    {"center": [0, 0, 60], "radius": 5, "material": "light",
                     "emission": [4, 4, 4]}],
        "default_spheres": False,
        "camera": {"position": [0, -60, 20]},
        "sun": [0.2, 0.5],
        "render": {"bounces": 3, "tonemap": "aces"},
    })
    out = tmp_path / "j.png"
    cli.main(["render", "--scene", path, "--width", "48", "--height", "32",
              "--rays", "1024", "--steps", "3", "--out", str(out)])
    assert os.path.exists(out)
    from PIL import Image
    with Image.open(out) as im:
        assert im.size == (48, 32)


def test_cli_flag_overrides_json(tmp_path):
    """An explicitly-passed CLI flag must beat the file's render section."""
    from types import SimpleNamespace
    path = _write(tmp_path, "scene.json",
                  {"render": {"bounces": 3, "exposure": 2.0}})
    args = SimpleNamespace(
        scene=path, width=32, height=24, rays=512, bounces=7,  # explicit
        no_spheres=False, sun=(0.05, 0.3), camera=None, scale=1.0,
        clamp=0.0, denoise=False, tonemap="reinhard", exposure=1.0,
        envmap=None, adaptive=False, mis=False, sampler="xorshift",
        texture_filter="bilinear", builder="auto", fog=False,
        fog_scatter=0.02, fog_absorb=0.0, fog_g=0.0, fog_z=(-1e8, 1e8))
    cfg, scene, cam = cli._build(args)
    assert cfg.max_bounces == 7        # CLI wins (non-default)
    assert cfg.exposure == 2.0         # JSON wins (CLI left default)


def test_mesh_material_override(tmp_path):
    """A mesh entry's "material"/"color"/"roughness" force the whole
    asset's look (composition over raw geometry)."""
    import json as _json

    from tyrant_tpu.scene.description import load_description
    from tyrant_tpu.scene.scene import GGX, LIGHT

    ply = tmp_path / "tri.ply"
    ply.write_text(
        "ply\nformat ascii 1.0\nelement vertex 3\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 1\nproperty list uchar int vertex_indices\n"
        "end_header\n0 0 0\n1 0 0\n0 1 0\n3 0 1 2\n")
    desc = {
        "meshes": [
            {"name": "a", "path": "tri.ply", "material": "metal",
             "color": [0.9, 0.5, 0.2], "roughness": 0.15},
            {"name": "b", "path": "tri.ply", "material": "light",
             "emission": [4, 4, 4]},
            {"name": "c", "path": "tri.ply", "color": [0.1, 0.2, 0.3]},
        ],
        "default_spheres": False,
    }
    p = tmp_path / "s.json"
    p.write_text(_json.dumps(desc))
    sc = load_description(str(p)).scene
    assert sc.tri_refl[0] == GGX and sc.tri_refl[1] == LIGHT
    np.testing.assert_allclose(sc.tri_color[0], [0.9, 0.5, 0.2])
    np.testing.assert_allclose(sc.tri_color[1], [4, 4, 4])
    np.testing.assert_allclose(sc.tri_color[2], [0.1, 0.2, 0.3])
    np.testing.assert_allclose(sc.tri_rough[0], 0.15)

    desc["meshes"][0]["material"] = "nonsense"
    p.write_text(_json.dumps(desc))
    with pytest.raises(ValueError, match="unknown mesh material"):
        load_description(str(p))
