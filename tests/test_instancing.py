"""Instancing by world-space flattening (beyond-reference; the reference
loads exactly one mesh, static_mesh.cpp:6).  scene/instancing.py."""

import numpy as np

from tyrant_tpu.scene.instancing import (MeshAsset, flatten_instances,
                                         rotate_y, scale, translate)
from tyrant_tpu.scene.scene import DIFF, SPEC, Scene


def _tet():
    """A small tetrahedron with outward-ish winding."""
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    f = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]])
    return MeshAsset(v0=v[f[:, 0]], v1=v[f[:, 1]], v2=v[f[:, 2]])


def test_flatten_matches_manual_transform():
    tet = _tet()
    xf = translate([3.0, -1.0, 2.0]) @ rotate_y(0.7) @ scale(2.0)
    flat = flatten_instances([tet], [(0, np.eye(4)), (0, xf)])
    assert flat.n_tris == 8
    # identity instance is bit-identical
    np.testing.assert_array_equal(flat.v0[:4], tet.v0)
    # transformed instance matches the hand-applied affine
    a, t = xf[:3, :3], xf[:3, 3]
    np.testing.assert_allclose(flat.v1[4:], tet.v1 @ a.T + t, rtol=1e-5)


def test_mirror_preserves_outward_winding():
    tet = _tet()
    m = scale([-1.0, 1.0, 1.0])  # det < 0
    flat = flatten_instances([tet], [(0, m)])
    a = m[:3, :3]
    n_obj = np.cross(tet.v1 - tet.v0, tet.v2 - tet.v0)
    n_world = n_obj @ np.linalg.inv(a)  # inverse-transpose, row form
    n_flat = np.cross(flat.v1 - flat.v0, flat.v2 - flat.v0)
    # winding swap keeps the geometric normal on the transformed-outward side
    assert (np.sum(n_flat * n_world, axis=1) > 0).all()


def test_vertex_normals_inverse_transpose():
    tet = _tet()
    vn = np.tile(np.float32([1, 0, 1]) / np.sqrt(2), (4, 3, 1))
    tet.tri_vn = vn
    s = scale([2.0, 1.0, 0.5])
    flat = flatten_instances([tet], [(0, s)])
    expect = np.float32([0.5, 0, 2])
    expect /= np.linalg.norm(expect)
    np.testing.assert_allclose(flat.tri_vn[0, 0], expect, atol=1e-6)


def test_texture_ids_offset_and_defaults():
    texA = [np.ones((4, 4, 3), np.float32)]
    texB = [np.zeros((2, 2, 3), np.float32) + 0.5]
    a = _tet()
    a.textures = texA
    a.tri_tex = np.zeros(4, np.int32)
    a.tri_uv = np.zeros((4, 3, 2), np.float32)
    b = _tet()
    b.textures = texB
    b.tri_tex = np.zeros(4, np.int32)
    b.tri_uv = np.zeros((4, 3, 2), np.float32)
    plain = _tet()
    flat = flatten_instances([a, b, plain], [(1, np.eye(4)), (0, np.eye(4)),
                                             (2, np.eye(4))])
    assert len(flat.textures) == 2
    assert (flat.tri_tex[:4] == 1).all()    # mesh B's texture sits at id 1
    assert (flat.tri_tex[4:8] == 0).all()
    assert (flat.tri_tex[8:] == -1).all()   # untextured mesh stays untextured


def test_material_merge_defaults():
    a = _tet()
    a.tri_refl = np.full(4, SPEC, np.int32)
    a.tri_color = np.tile(np.float32([1, 0.5, 0.25]), (4, 1))
    plain = _tet()
    flat = flatten_instances([a, plain], [(0, np.eye(4)), (1, np.eye(4))])
    assert (flat.tri_refl[:4] == SPEC).all()
    assert (flat.tri_refl[4:] == DIFF).all()
    np.testing.assert_array_equal(flat.tri_color[4:], 1.0)


def test_scene_from_instances_equals_manual_flat_scene():
    """The instanced Scene must be byte-for-byte the Scene built from the
    hand-flattened triangles (same builder => same BVH => same tables)."""
    tet = _tet()
    insts = [(0, np.eye(4)), (0, translate([2.5, 0, 0])),
             (0, translate([0, 2.5, 0]) @ rotate_y(1.1))]
    s_inst = Scene.from_instances([tet], insts, builder="numpy")
    flat = flatten_instances([tet], insts)
    s_manual = Scene.from_triangles(flat.v0, flat.v1, flat.v2,
                                    builder="numpy")
    assert s_inst.stats["instances"] == 3
    np.testing.assert_array_equal(s_inst.tri_vert, s_manual.tri_vert)
    np.testing.assert_array_equal(s_inst.bvh.meta, s_manual.bvh.meta)
    np.testing.assert_array_equal(s_inst.bvh.lo, s_manual.bvh.lo)
    d_inst = s_inst.to_device()
    d_manual = s_manual.to_device()
    np.testing.assert_array_equal(np.asarray(d_inst.bvh.node_packed),
                                  np.asarray(d_manual.bvh.node_packed))


def test_instanced_closest_hit():
    """Rays aimed at each instance hit at the transformed location."""
    from tyrant_tpu.ops.traverse import closest_hit
    tet = _tet()
    s = Scene.from_instances(
        [tet], [(0, np.eye(4)), (0, translate([10.0, 0, 0]))],
        builder="numpy")
    sd = s.to_device()
    import jax.numpy as jnp
    o = jnp.asarray([[0.25, 0.25, 5.0], [10.25, 0.25, 5.0],
                     [5.0, 0.25, 5.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]] * 3, jnp.float32)
    t, ref = closest_hit(o, d, sd.bvh)
    t = np.asarray(t)
    assert t[0] < 1e19 and t[1] < 1e19      # both instances hit
    np.testing.assert_allclose(t[0], t[1], rtol=1e-5)  # same local geometry
    assert t[2] > 1e19                       # the gap between them misses
