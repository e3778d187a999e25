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


def test_vertex_colors_ascii(tmp_path):
    """PLY red/green/blue (scanned-mesh attribute): 8-bit decodes as sRGB
    to linear; Scene.load shades them as per-triangle mean albedo."""
    import numpy as np
    from tyrant_tpu.scene.ply import load_ply_attrs
    from tyrant_tpu.scene.scene import Scene
    p = tmp_path / "col.ply"
    p.write_text(
        "ply\nformat ascii 1.0\n"
        "element vertex 3\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "element face 1\nproperty list uchar int vertex_indices\n"
        "end_header\n"
        "0 0 0 255 0 0\n1 0 0 255 0 0\n0 1 0 255 0 0\n"
        "3 0 1 2\n")
    v, f, n, c = load_ply_attrs(str(p))
    assert n is None and c is not None
    np.testing.assert_allclose(c[0], [1.0, 0.0, 0.0], atol=1e-6)
    sc = Scene.load(str(p), builder="numpy")
    np.testing.assert_allclose(sc.tri_color[0], [1.0, 0.0, 0.0], atol=1e-6)


def test_vertex_colors_binary(tmp_path):
    import numpy as np
    from tyrant_tpu.scene.ply import load_ply_attrs
    p = tmp_path / "colb.ply"
    with open(p, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(b"element vertex 3\n")
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        f.write(b"property uchar red\nproperty uchar green\n"
                b"property uchar blue\n")
        f.write(b"element face 1\n")
        f.write(b"property list uchar int vertex_indices\nend_header\n")
        import struct
        for vert, col in [((0, 0, 0), (128, 128, 128)),
                          ((1, 0, 0), (128, 128, 128)),
                          ((0, 1, 0), (128, 128, 128))]:
            f.write(struct.pack("<fff3B", *vert, *col))
        f.write(struct.pack("<B3i", 3, 0, 1, 2))
    v, f2, n, c = load_ply_attrs(str(p))
    assert v.shape == (3, 3) and f2.shape == (1, 3)
    np.testing.assert_allclose(c, (128 / 255.0) ** 2.2, atol=1e-6)
