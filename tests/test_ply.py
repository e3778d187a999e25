import numpy as np

from tyrant_tpu.scene.ply import load_ply

DATA = "/root/reference/PathTracer/Data"


def test_cube_ascii_with_comments():
    verts, faces = load_ply(f"{DATA}/cube.ply")
    assert verts.shape == (8, 3)
    # 6 quads fan-triangulated -> 12 tris (Assimp Triangulate equivalent)
    assert faces.shape == (12, 3)
    assert verts.min() == 0.0 and verts.max() == 1.0
    assert faces.min() >= 0 and faces.max() <= 7


def test_dragon_ascii_extra_props():
    verts, faces = load_ply(f"{DATA}/dragon.ply")
    assert verts.shape == (22126, 3)   # dragon.ply header: element vertex 22126
    assert faces.shape == (37986, 3)   # element face 37986 (all tris already)
    assert np.isfinite(verts).all()
    assert faces.max() < verts.shape[0]


def test_binary_roundtrip(tmp_path):
    # write a small binary_little_endian PLY and reload it
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 1]], np.float32)
    faces = [(3, [0, 1, 2]), (4, [0, 1, 3, 2])]
    p = tmp_path / "t.ply"
    with open(p, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(b"element vertex 4\n")
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        f.write(b"element face 2\n")
        f.write(b"property list uchar int vertex_indices\n")
        f.write(b"end_header\n")
        f.write(verts.astype("<f4").tobytes())
        for n, idx in faces:
            f.write(np.uint8(n).tobytes())
            f.write(np.asarray(idx, "<i4").tobytes())
    v, fc = load_ply(str(p))
    np.testing.assert_allclose(v, verts)
    # tri + fan-triangulated quad = 3 faces
    assert fc.shape == (3, 3)
    np.testing.assert_array_equal(fc[0], [0, 1, 2])
