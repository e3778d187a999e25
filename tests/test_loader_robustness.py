"""Malformed-input behavior of every loader: clean, early ValueError
(the reference's C12 fail-fast policy) — never a crash, hang, or silent
garbage scene."""

import pytest

from tyrant_tpu.scene.gltf import load_gltf
from tyrant_tpu.scene.obj import load_obj_scene
from tyrant_tpu.scene.ply import load_ply


def _w(tmp_path, name, data):
    p = tmp_path / name
    if isinstance(data, str):
        p.write_text(data)
    else:
        p.write_bytes(data)
    return str(p)


def test_ply_malformed(tmp_path):
    with pytest.raises(ValueError, match="end_header"):
        load_ply(_w(tmp_path, "a.ply", b"ply\nformat ascii 1.0\n"))
    with pytest.raises(ValueError, match="end_header"):
        load_ply(_w(tmp_path, "b.ply", b"not a ply\n"))
    # binary body shorter than the header claims
    with pytest.raises(ValueError):
        load_ply(_w(tmp_path, "c.ply",
                    b"ply\nformat binary_little_endian 1.0\n"
                    b"element vertex 10\nproperty float x\n"
                    b"property float y\nproperty float z\n"
                    b"end_header\n\x00\x00"))
    # ascii body with fewer rows than `element vertex` claims
    with pytest.raises(ValueError):
        load_ply(_w(tmp_path, "d.ply",
                    "ply\nformat ascii 1.0\nelement vertex 3\n"
                    "property float x\nproperty float y\n"
                    "property float z\nelement face 1\n"
                    "property list uchar int vertex_indices\n"
                    "end_header\n0 0 0\n"))


def test_glb_malformed(tmp_path):
    with pytest.raises(ValueError, match="bad magic"):
        load_gltf(_w(tmp_path, "a.glb", b"XXXX" + b"\x00" * 20))
    with pytest.raises(ValueError, match="no JSON chunk"):
        load_gltf(_w(tmp_path, "b.glb",
                     b"glTF\x02\x00\x00\x00\xff\x00\x00\x00"))
    with pytest.raises(ValueError, match="version"):
        load_gltf(_w(tmp_path, "c.glb",
                     b"glTF\x07\x00\x00\x00\x14\x00\x00\x00"))
    # external buffer missing: surfaced as the OS error, path named
    with pytest.raises(FileNotFoundError):
        load_gltf(_w(tmp_path, "d.gltf",
                     '{"asset":{"version":"2.0"},'
                     '"buffers":[{"uri":"missing.bin","byteLength":4}],'
                     '"scenes":[{"nodes":[]}],"scene":0}'))


def test_obj_malformed(tmp_path):
    with pytest.raises(ValueError, match="no vertices"):
        load_obj_scene(_w(tmp_path, "a.obj", "# nothing\n"))
    with pytest.raises(ValueError, match="face references vertex"):
        load_obj_scene(_w(tmp_path, "b.obj", "v 0 0 0\nf 1 2 9\n"))
    # malformed MTL degrades (warning) instead of failing the geometry
    _w(tmp_path, "m.mtl", "newmtl x\nKd not a number\n")
    m = load_obj_scene(_w(tmp_path, "c.obj",
                          "mtllib m.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\n"
                          "usemtl x\nf 1 2 3\n"))
    assert m.faces.shape == (1, 3)
