"""STL loader: binary + ASCII round-trips vs the PLY-loaded cube, the
"solid"-prefixed-binary ambiguity, and Scene.load dispatch."""

import os
import struct

import numpy as np
import pytest

from tyrant_tpu.scene.ply import load_ply
from tyrant_tpu.scene.stl import load_stl

CUBE = "/root/reference/PathTracer/Data/cube.ply"


def _tri_soup(verts, faces):
    return verts[faces]  # [F, 3, 3]


def _write_binary(path, tris, header=b"x" * 80):
    n = tris.shape[0]
    with open(path, "wb") as f:
        f.write(header[:80].ljust(80, b"\0"))
        f.write(struct.pack("<I", n))
        for t in tris:
            f.write(np.zeros(3, np.float32).tobytes())  # normal (ignored)
            f.write(np.asarray(t, np.float32).tobytes())
            f.write(struct.pack("<H", 0))


def _write_ascii(path, tris):
    with open(path, "w") as f:
        f.write("solid test\n")
        for t in tris:
            f.write(" facet normal 0 0 0\n  outer loop\n")
            for v in t:
                f.write(f"   vertex {v[0]} {v[1]} {v[2]}\n")
            f.write("  endloop\n endfacet\n")
        f.write("endsolid test\n")


def _canonical(verts, faces):
    """Order-independent triangle-soup key set."""
    soup = _tri_soup(verts, faces).reshape(-1, 9)
    # canonicalise vertex rotation within each triangle
    tris = soup.reshape(-1, 3, 3)
    keys = set()
    for t in tris:
        rots = [np.roll(t, -k, axis=0).tobytes() for k in range(3)]
        keys.add(min(rots))
    return keys


@pytest.fixture(scope="module")
def cube():
    if not os.path.exists(CUBE):
        pytest.skip("reference cube.ply unavailable")
    return load_ply(CUBE)


def test_binary_roundtrip(tmp_path, cube):
    v, f = cube
    p = str(tmp_path / "cube.stl")
    _write_binary(p, _tri_soup(v, f))
    v2, f2 = load_stl(p)
    assert f2.shape == f.shape
    assert _canonical(v2, f2) == _canonical(v, f)


def test_ascii_roundtrip(tmp_path, cube):
    v, f = cube
    p = str(tmp_path / "cube_ascii.stl")
    _write_ascii(p, _tri_soup(v, f))
    v2, f2 = load_stl(p)
    assert _canonical(v2, f2) == _canonical(v, f)


def test_binary_with_solid_header(tmp_path, cube):
    """Binary files whose 80-byte header starts with 'solid' (a common
    exporter quirk) must still parse as binary via the size equation."""
    v, f = cube
    p = str(tmp_path / "trap.stl")
    _write_binary(p, _tri_soup(v, f), header=b"solid exported-by-foo")
    v2, f2 = load_stl(p)
    assert _canonical(v2, f2) == _canonical(v, f)


def test_degenerate_faces_dropped(tmp_path):
    t = np.array([[[0, 0, 0], [1, 0, 0], [1, 0, 0]],       # degenerate
                  [[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
    p = str(tmp_path / "degen.stl")
    _write_binary(p, t)
    _, f = load_stl(p)
    assert f.shape == (1, 3)


def test_scene_load_dispatch(tmp_path, cube):
    from tyrant_tpu.scene.scene import Scene
    v, f = cube
    p = str(tmp_path / "cube.stl")
    _write_binary(p, _tri_soup(v, f))
    sc = Scene.load(p, builder="numpy")
    assert sc.stats["triangles"] == f.shape[0]
