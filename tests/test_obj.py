import numpy as np

from tyrant_tpu.scene.obj import load_obj
from tyrant_tpu.scene.scene import Scene


def test_obj_cube(tmp_path):
    p = tmp_path / "cube.obj"
    p.write_text("""
# cube
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
v 0 0 1
v 1 0 1
v 1 1 1
v 0 1 1
f 1 2 3 4
f 5/1 6/2 7/3 8/4
f 1//1 2//2 6//3 5//4
f -4 -3 -1
""")
    verts, faces = load_obj(str(p))
    assert verts.shape == (8, 3)
    # three quads (2 tris each) + one tri = 7
    assert faces.shape == (7, 3)
    np.testing.assert_array_equal(faces[-1], [4, 5, 7])  # negative indices


def test_scene_load_obj(tmp_path):
    p = tmp_path / "t.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    sc = Scene.load(str(p), builder="numpy")
    assert sc.stats["triangles"] == 1
