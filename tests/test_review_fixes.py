"""Regression pins for the round-3 feature-wave review findings."""

import numpy as np

from tyrant_tpu.scene.obj import load_obj_scene
from tyrant_tpu.scene.scene import GGX, Scene


def test_obj_const_d_without_uvs_blends(tmp_path):
    """Constant dissolve on a UV-less OBJ synthesizes zero UVs so the
    atlas gate engages (it used to render fully opaque)."""
    (tmp_path / "m.mtl").write_text("newmtl g\nKd 1 0 0\nd 0.5\n")
    (tmp_path / "s.obj").write_text(
        "mtllib m.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\nusemtl g\nf 1 2 3\n")
    m = load_obj_scene(str(tmp_path / "s.obj"))
    assert m.uvs is not None and m.tri_blend[0]
    sc = Scene.from_triangles(
        m.vertices[m.faces[:, 0]], m.vertices[m.faces[:, 1]],
        m.vertices[m.faces[:, 2]], builder="numpy", tri_uv=m.uvs,
        tri_tex=m.tri_tex, textures=m.textures, tri_blend=m.tri_blend)
    sd = sc.to_device()
    assert sd.has_blend and sd.has_alpha_tex


def test_ply_u16_colors_normalized(tmp_path):
    import struct
    p = tmp_path / "c.ply"
    with open(p, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n"
                b"element vertex 3\n"
                b"property float x\nproperty float y\nproperty float z\n"
                b"property ushort red\nproperty ushort green\n"
                b"property ushort blue\n"
                b"element face 1\n"
                b"property list uchar int vertex_indices\nend_header\n")
        for v in [(0, 0, 0), (1, 0, 0), (0, 1, 0)]:
            f.write(struct.pack("<fff3H", *v, 65535, 32768, 0))
        f.write(struct.pack("<B3i", 3, 0, 1, 2))
    from tyrant_tpu.scene.ply import load_ply_attrs
    _, _, _, c = load_ply_attrs(str(p))
    # 16-bit colors normalize to [0,1] linear (no sRGB decode)
    np.testing.assert_allclose(c[0], [1.0, 32768 / 65535.0, 0.0],
                               atol=1e-4)


def test_json_override_clears_stale_maps(tmp_path):
    """Overriding a metal-mapped glb mesh to diffuse must not disable
    per-texel metalness for OTHER meshes (per-triangle gate) nor leave a
    rough-map tap fighting a forced glass IOR."""
    import json as _json

    from tyrant_tpu.scene.description import load_description

    from .test_metal_map import _quad

    # build a metal-mapped asset on disk? cheaper: exercise the
    # per-triangle gate directly: one metal GGX tri + one flagged DIFF tri
    sc = _quad(1.0)  # both tris GGX + metal
    tr = np.asarray(sc.tri_refl).copy()
    tr[0] = 0  # force one triangle DIFF with a stale metal flag
    sc.tri_refl = tr
    sd = sc.to_device()
    assert sd.has_metal_maps  # the OTHER triangle keeps the feature
    row = np.asarray(sd.tri_shade)
    flagged = row[:2, 3] >= 32
    assert flagged.sum() == 1  # only the GGX triangle carries the flag

    # JSON override path: material override drops tri_rtex/metal/blend
    ply = tmp_path / "t.ply"
    ply.write_text(
        "ply\nformat ascii 1.0\nelement vertex 3\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 1\nproperty list uchar int vertex_indices\n"
        "end_header\n0 0 0\n1 0 0\n0 1 0\n3 0 1 2\n")
    desc = {"meshes": [{"path": "t.ply", "material": "glass",
                        "ior": 1.5}], "default_spheres": False}
    (tmp_path / "s.json").write_text(_json.dumps(desc))
    s2 = load_description(str(tmp_path / "s.json")).scene
    assert s2.tri_rtex is None or (np.asarray(s2.tri_rtex) < 0).all()
    assert s2.to_device().has_var_ior


def test_glb_in_json_keeps_wraps(tmp_path):
    """A glb instanced through a JSON description keeps its sampler wrap
    modes (MeshAsset.tex_wraps -> flatten -> Scene.texture_wraps)."""
    import json as _json

    from tyrant_tpu.scene.description import load_description

    from .test_gltf import TRI_POS, _Bin, _glb, _png_bytes

    b = _Bin()
    bv_tri = b.add(TRI_POS.tobytes())
    uvs = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
    bv_uv = b.add(uvs.tobytes())
    bv_img = b.add(_png_bytes(np.full((2, 2, 3), 99, np.uint8)))
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0, "scenes": [{"nodes": [0]}], "nodes": [{"mesh": 0}],
        "buffers": [{"byteLength": len(b.blob)}],
        "bufferViews": b.views,
        "accessors": [
            {"bufferView": bv_tri, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": bv_uv, "componentType": 5126, "count": 3,
             "type": "VEC2"}],
        "images": [{"bufferView": bv_img, "mimeType": "image/png"}],
        "samplers": [{"wrapS": 33071, "wrapT": 33071}],
        "textures": [{"source": 0, "sampler": 0}],
        "materials": [{"pbrMetallicRoughness":
                       {"baseColorTexture": {"index": 0},
                        "metallicFactor": 0.0}}],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0,
                                                   "TEXCOORD_0": 1},
                                    "material": 0}]}],
    }
    (tmp_path / "a.glb").write_bytes(_glb(gltf, b.blob))
    desc = {"meshes": [{"path": "a.glb"}], "default_spheres": False}
    (tmp_path / "s.json").write_text(_json.dumps(desc))
    sc = load_description(str(tmp_path / "s.json")).scene
    assert sc.texture_wraps is not None and tuple(
        sc.texture_wraps[0]) == (1, 1)
    meta = sc.to_device().tex_meta
    assert meta[0][3] == 1 and meta[0][4] == 1


def test_emissive_texture_scales_nee_power():
    """Textured emitters: NEE rows + power table integrate the texture
    MEAN (both MIS strategies agree on total power)."""
    v0 = np.array([[0, 0, 0]], np.float32)
    v1 = np.array([[1, 0, 0]], np.float32)
    v2 = np.array([[0, 1, 0]], np.float32)
    uv = np.array([[[0, 0], [1, 0], [0, 1]]], np.float32)
    tex = np.zeros((1, 2, 3), np.float32)
    tex[0, 0] = 1.0  # half the texels bright -> mean 0.5
    sc = Scene.from_triangles(
        v0, v1, v2, builder="numpy", tri_uv=uv,
        tri_refl=np.array([4], np.int32),  # LIGHT
        tri_color=np.full((1, 3), 2.0, np.float32),
        tri_tex=np.zeros(1, np.int32), textures=[tex])
    sd = sc.to_device()
    row = np.asarray(sd.tri_lights)[0]
    np.testing.assert_allclose(row[9:12], 1.0)  # 2.0 x mean 0.5


def test_obj_bad_pm_falls_back_to_pr(tmp_path):
    from PIL import Image
    Image.fromarray(np.full((2, 2), 128, np.uint8)).save(tmp_path / "pr.png")
    (tmp_path / "pm.png").write_bytes(b"not a png")
    (tmp_path / "m.mtl").write_text(
        "newmtl x\nmap_Pr pr.png\nmap_Pm pm.png\n")
    (tmp_path / "s.obj").write_text(
        "mtllib m.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\n"
        "vt 0 0\nvt 1 0\nvt 0 1\nusemtl x\nf 1/1 2/2 3/3\n")
    m = load_obj_scene(str(tmp_path / "s.obj"))
    assert m.tri_metal is None or not m.tri_metal[0]
    assert m.tri_rtex is not None and m.tri_rtex[0] >= 0  # Pr survives
    assert m.tri_refl[0] == GGX


def test_bloom_radius_clamped():
    import jax.numpy as jnp

    from tyrant_tpu.ops.tonemap import bloom
    img = jnp.ones((8, 8, 3), jnp.float32) * 3.0
    out = np.asarray(bloom(img, strength=0.1, threshold=1.0, radius=64))
    assert np.isfinite(out).all() and (out > 3.0).all()
