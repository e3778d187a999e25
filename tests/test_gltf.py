"""glTF 2.0 loader tests (scene/gltf.py, beyond-reference).

A synthetic GLB is assembled byte-by-byte in the test (no binary fixture
files): a textured quad + a 4-primitive mesh covering the material map
(DIFF / GGX / LIGHT / REFR / doubleSided), a node hierarchy with TRS and
matrix transforms, a KHR_lights_punctual spot+point pair, and a camera.
"""

import io
import json
import struct

import numpy as np
import pytest

from tyrant_tpu.scene.gltf import (_read_accessor, load_gltf,
                                   load_gltf_bundle)

DIFF, SPEC, REFR, PHONG, LIGHT, GGX = 0, 1, 2, 3, 4, 5

# +90 deg about X (gltf.py _YUP_TO_ZUP): (x, y, z) -> (x, -z, y)
R = np.array([[1.0, 0, 0], [0, 0, -1], [0, 1, 0]])


class _Bin:
    """Append-only binary blob with 4-byte alignment bookkeeping."""

    def __init__(self):
        self.blob = b""
        self.views = []

    def add(self, data: bytes, stride=None) -> int:
        pad = (-len(self.blob)) % 4
        self.blob += b"\0" * pad
        view = {"buffer": 0, "byteOffset": len(self.blob),
                "byteLength": len(data)}
        if stride:
            view["byteStride"] = stride
        self.views.append(view)
        self.blob += data
        return len(self.views) - 1


def _png_bytes(arr_u8: np.ndarray) -> bytes:
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(arr_u8).save(buf, format="PNG")
    return buf.getvalue()


def _glb(gltf: dict, blob: bytes) -> bytes:
    js = json.dumps(gltf).encode()
    js += b" " * ((-len(js)) % 4)
    blob += b"\0" * ((-len(blob)) % 4)
    total = 12 + 8 + len(js) + 8 + len(blob)
    return (b"glTF" + struct.pack("<II", 2, total)
            + struct.pack("<I", len(js)) + b"JSON" + js
            + struct.pack("<I", len(blob)) + b"BIN\0" + blob)


QUAD_POS = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
QUAD_IDX = np.array([0, 1, 2, 0, 2, 3], np.uint16)
QUAD_UV = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
QUAD_N = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
TRI_POS = np.array([[0, 0, 0], [2, 0, 0], [0, 2, 0]], np.float32)


def _build_test_glb(tmp_path, lights=True, camera=True):
    b = _Bin()
    bv_pos = b.add(QUAD_POS.tobytes())
    bv_idx = b.add(QUAD_IDX.tobytes())
    bv_uv = b.add(QUAD_UV.tobytes())
    bv_n = b.add(QUAD_N.tobytes())
    bv_tri = b.add(TRI_POS.tobytes())
    # 2x2 texture: constant mid-grey so sRGB decode is easy to check
    tex = np.full((2, 2, 3), 128, np.uint8)
    bv_png = b.add(_png_bytes(tex))

    accessors = [
        {"bufferView": bv_pos, "componentType": 5126, "count": 4,
         "type": "VEC3"},
        {"bufferView": bv_idx, "componentType": 5123, "count": 6,
         "type": "SCALAR"},
        {"bufferView": bv_uv, "componentType": 5126, "count": 4,
         "type": "VEC2"},
        {"bufferView": bv_n, "componentType": 5126, "count": 4,
         "type": "VEC3"},
        {"bufferView": bv_tri, "componentType": 5126, "count": 3,
         "type": "VEC3"},
    ]
    materials = [
        {"pbrMetallicRoughness": {
            "baseColorFactor": [0.8, 0.2, 0.2, 1.0],
            "baseColorTexture": {"index": 0},
            "metallicFactor": 0.0, "roughnessFactor": 0.5}},
        {"pbrMetallicRoughness": {
            "metallicFactor": 1.0, "roughnessFactor": 0.25}},
        {"emissiveFactor": [2.0, 3.0, 4.0],
         "doubleSided": True,  # must NOT duplicate: emitters are two-sided
         "extensions": {"KHR_materials_emissive_strength":
                        {"emissiveStrength": 2.0}}},
        {"extensions": {"KHR_materials_transmission":
                        {"transmissionFactor": 1.0}},
         "pbrMetallicRoughness": {"metallicFactor": 0.0,
                                  "roughnessFactor": 0.0}},
        {"doubleSided": True,
         "pbrMetallicRoughness": {"metallicFactor": 0.0}},
    ]
    meshes = [
        {"primitives": [{
            "attributes": {"POSITION": 0, "TEXCOORD_0": 2, "NORMAL": 3},
            "indices": 1, "material": 0}]},
        {"primitives": [
            {"attributes": {"POSITION": 4}, "material": 1},
            {"attributes": {"POSITION": 4}, "material": 2},
            {"attributes": {"POSITION": 4}, "material": 3},
            {"attributes": {"POSITION": 4}, "material": 4},
        ]},
    ]
    nodes = [
        {"mesh": 0, "translation": [1.0, 2.0, 3.0]},
        {"mesh": 1},
    ]
    scene_nodes = [0, 1]
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "buffers": [{"byteLength": len(b.blob)}],
        "bufferViews": b.views,
        "accessors": accessors,
        "materials": materials,
        "meshes": meshes,
        "images": [{"bufferView": bv_png, "mimeType": "image/png"}],
        "textures": [{"source": 0}],
        "nodes": nodes,
    }
    if lights:
        gltf["extensions"] = {"KHR_lights_punctual": {"lights": [
            {"type": "point", "color": [1.0, 0.5, 0.25], "intensity": 100.0},
            {"type": "spot", "intensity": 50.0,
             "spot": {"innerConeAngle": 0.2, "outerConeAngle": 0.5}},
        ]}}
        gltf["extensionsUsed"] = ["KHR_lights_punctual"]
        # point light at glTF (3, 4, 5); spot rotated -Z -> -Y (about X
        # by -90 deg), i.e. pointing "down" in glTF terms
        s = np.sin(-np.pi / 4)
        nodes.append({"translation": [3.0, 4.0, 5.0],
                      "extensions": {"KHR_lights_punctual": {"light": 0}}})
        nodes.append({"rotation": [s, 0.0, 0.0, np.cos(np.pi / 4)],
                      "extensions": {"KHR_lights_punctual": {"light": 1}}})
        scene_nodes += [2, 3]
    if camera:
        gltf["cameras"] = [{"type": "perspective",
                            "perspective": {"yfov": 0.9, "znear": 0.01}}]
        nodes.append({"camera": 0, "translation": [0.0, 0.0, 5.0]})
        scene_nodes.append(len(nodes) - 1)
    gltf["scenes"] = [{"nodes": scene_nodes}]

    path = tmp_path / "scene.glb"
    path.write_bytes(_glb(gltf, b.blob))
    return str(path)


def test_glb_geometry_and_transforms(tmp_path):
    g = load_gltf(_build_test_glb(tmp_path))
    # 1 quad primitive + 4 tri primitives
    assert len(g.meshes) == 5
    assert len(g.instances) == 5
    quad = g.meshes[0]
    assert quad.n_tris == 2
    # instance 0: glTF translation (1,2,3) then the y-up -> z-up root
    aid, world = g.instances[0]
    v0_world = (world[:3, :3] @ QUAD_POS[0] + world[:3, 3])
    np.testing.assert_allclose(v0_world, R @ np.array([1.0, 2.0, 3.0]),
                               atol=1e-6)
    # and without the axis swap the transform is pure translation
    g2 = load_gltf(_build_test_glb(tmp_path), y_up_to_z_up=False)
    _, world2 = g2.instances[0]
    np.testing.assert_allclose(world2[:3, :3], np.eye(3), atol=1e-12)


def test_glb_materials(tmp_path):
    g = load_gltf(_build_test_glb(tmp_path))
    quad, ggx, light, glass, dbl = g.meshes
    assert quad.tri_refl[0] == DIFF
    np.testing.assert_allclose(quad.tri_color[0], [0.8, 0.2, 0.2],
                               atol=1e-6)
    assert quad.tri_tex is not None and quad.tri_tex[0] == 0
    assert g.textures is not None and len(g.textures) == 1
    # sRGB decode: 128/255 ** 2.2
    np.testing.assert_allclose(g.textures[0][0, 0],
                               (128 / 255.0) ** 2.2, atol=1e-5)
    # glTF v runs top-down; the loader pre-flips into the OBJ convention
    np.testing.assert_allclose(quad.tri_uv[0, 0], [0.0, 1.0], atol=1e-6)

    assert ggx.tri_refl[0] == GGX
    np.testing.assert_allclose(ggx.tri_rough[0], 0.25, atol=1e-6)
    assert light.tri_refl[0] == LIGHT
    np.testing.assert_allclose(light.tri_color[0], [4.0, 6.0, 8.0],
                               atol=1e-5)  # emissiveFactor x strength 2
    # doubleSided emitter is NOT winding-duplicated (shade's tri-light NEE
    # is already two-sided; a copy would double its power)
    assert light.n_tris == 1
    assert glass.tri_refl[0] == REFR  # roughness 0 -> smooth glass
    # doubleSided: flipped-winding duplicate
    assert dbl.n_tris == 2
    np.testing.assert_allclose(dbl.v1[1], dbl.v2[0], atol=1e-6)
    np.testing.assert_allclose(dbl.v2[1], dbl.v1[0], atol=1e-6)


def test_glb_lights_and_camera(tmp_path):
    g = load_gltf(_build_test_glb(tmp_path))
    assert len(g.lights) == 2
    pt, spot = g.lights
    assert pt["type"] == "point"
    np.testing.assert_allclose(pt["position"], R @ [3.0, 4.0, 5.0],
                               atol=1e-6)
    np.testing.assert_allclose(pt["intensity"], [100.0, 50.0, 25.0],
                               atol=1e-4)
    assert spot["type"] == "spot"
    # node rotation takes -Z to -Y (glTF "down"); root swap -> -Z (z-up down)
    np.testing.assert_allclose(spot["direction"], [0.0, 0.0, -1.0],
                               atol=1e-6)
    np.testing.assert_allclose(spot["inner_deg"], np.degrees(0.2), atol=1e-4)
    np.testing.assert_allclose(spot["outer_deg"], np.degrees(0.5), atol=1e-4)

    # camera at glTF (0,0,5) looking down -Z -> z-up (0,-5,0) looking +y
    assert g.camera is not None
    np.testing.assert_allclose(g.camera["position"], [0.0, -5.0, 0.0],
                               atol=1e-6)
    np.testing.assert_allclose(g.camera["target"], [0.0, -4.0, 0.0],
                               atol=1e-6)
    np.testing.assert_allclose(g.camera["yfov_deg"], np.degrees(0.9),
                               atol=1e-4)


def test_gltf_json_with_data_uri(tmp_path):
    """The .gltf (pure JSON) container with a base64 data-URI buffer."""
    import base64
    glb_path = _build_test_glb(tmp_path, lights=False, camera=False)
    blob = open(glb_path, "rb").read()
    # re-read the JSON chunk and bin chunk, re-emit as .gltf + data URI
    jlen = struct.unpack_from("<I", blob, 12)[0]
    gltf = json.loads(blob[20:20 + jlen])
    boff = 20 + jlen + 8
    bin_chunk = blob[boff:]
    gltf["buffers"][0]["uri"] = ("data:application/octet-stream;base64,"
                                 + base64.b64encode(bin_chunk).decode())
    p = tmp_path / "scene.gltf"
    p.write_text(json.dumps(gltf))
    g = load_gltf(str(p))
    assert len(g.meshes) == 5
    np.testing.assert_allclose(g.meshes[0].v0[0], R @ QUAD_POS[0],
                               atol=1e-6)


def test_accessor_strided_and_sparse():
    """Interleaved (byteStride) and sparse accessors decode correctly."""
    # interleaved [pos VEC3 f32 | uv VEC2 f32] x 3 vertices, stride 20
    inter = np.zeros((3, 5), np.float32)
    inter[:, :3] = [[1, 2, 3], [4, 5, 6], [7, 8, 9]]
    inter[:, 3:] = [[0.1, 0.2], [0.3, 0.4], [0.5, 0.6]]
    blob = inter.tobytes()
    gltf = {
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": len(blob),
             "byteStride": 20}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": 0, "byteOffset": 12, "componentType": 5126,
             "count": 3, "type": "VEC2"},
        ],
    }
    pos = _read_accessor(gltf, [blob], 0)
    uv = _read_accessor(gltf, [blob], 1)
    np.testing.assert_allclose(pos, inter[:, :3])
    np.testing.assert_allclose(uv, inter[:, 3:])

    # sparse: base zeros, override rows 1 and 3
    sidx = np.array([1, 3], np.uint16).tobytes()
    svals = np.array([[9, 9, 9], [7, 7, 7]], np.float32).tobytes()
    blob2 = sidx + b"\0\0\0\0" + svals
    gltf2 = {
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 4},
            {"buffer": 0, "byteOffset": 8, "byteLength": 24}],
        "accessors": [{
            "componentType": 5126, "count": 5, "type": "VEC3",
            "sparse": {"count": 2,
                       "indices": {"bufferView": 0, "componentType": 5123},
                       "values": {"bufferView": 1}}}],
    }
    arr = _read_accessor(gltf2, [blob2], 0)
    np.testing.assert_allclose(arr[0], 0.0)
    np.testing.assert_allclose(arr[1], 9.0)
    np.testing.assert_allclose(arr[3], 7.0)


def test_gltf_bundle_renders(tmp_path):
    """End-to-end: bundle -> Renderer on the CPU mesh.  Covers the
    zero-sphere static gates (render.py), emissive-triangle NEE, the
    texture atlas and delta lights in one scene."""
    from tyrant_tpu.config import RenderConfig
    from tyrant_tpu.render import Renderer

    bundle = load_gltf_bundle(_build_test_glb(tmp_path), builder="numpy")
    sc = bundle.scene
    assert sc.spheres.count == 0
    assert sc.stats["triangles"] == 2 + 3 + 2  # quad + 3 tris + doubled tri
    assert sc.delta_lights is not None and sc.delta_lights.count == 2
    assert bundle.camera is not None
    np.testing.assert_allclose(bundle.camera.position, [0.0, -5.0, 0.0],
                               atol=1e-6)
    # looking +y: horizontal 0, vertical 0
    assert abs(bundle.camera.horizontal_angle) < 1e-5
    assert abs(bundle.camera.vertical_angle) < 1e-5

    cfg = RenderConfig(width=24, height=16, num_rays=768, max_bounces=3)
    r = Renderer(sc, cfg)
    r.step(bundle.camera, 2)
    img = np.asarray(r.image())
    assert img.shape == (16, 24, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0.0  # the sky alone guarantees signal


def test_gltf_scene_load_delegates(tmp_path):
    """Scene.load(path.glb) returns the composed scene (geometry path for
    API users who don't need the bundle camera)."""
    from tyrant_tpu.scene.scene import Scene
    sc = Scene.load(_build_test_glb(tmp_path), builder="numpy")
    assert sc.stats["triangles"] == 7
    assert sc.stats["instances"] == 5
    assert sc.spheres.count == 0


def test_gltf_uniform_scale_scales_layout(tmp_path):
    """scale rides the root matrix: node translations, lights and the
    camera scale WITH the vertices (a vertex-only scale distorts any
    scene with non-identity node transforms)."""
    g1 = load_gltf(_build_test_glb(tmp_path))
    g2 = load_gltf(_build_test_glb(tmp_path), scale=2.0)
    _, w1 = g1.instances[0]
    _, w2 = g2.instances[0]
    p1 = w1[:3, :3] @ QUAD_POS[1] + w1[:3, 3]
    p2 = w2[:3, :3] @ QUAD_POS[1] + w2[:3, 3]
    np.testing.assert_allclose(p2, 2.0 * p1, atol=1e-6)
    np.testing.assert_allclose(g2.lights[0]["position"],
                               2.0 * np.asarray(g1.lights[0]["position"]),
                               atol=1e-6)
    np.testing.assert_allclose(g2.camera["position"],
                               2.0 * np.asarray(g1.camera["position"]),
                               atol=1e-6)
    # directions stay unit length under a uniform scale
    np.testing.assert_allclose(np.linalg.norm(g2.lights[1]["direction"]),
                               1.0, atol=1e-6)


def test_gltf_no_scenes_key_walks_roots_only(tmp_path):
    """Without a 'scenes' array, only nodes that are nobody's child are
    walked (walking all nodes would duplicate children at the origin)."""
    b = _Bin()
    bv = b.add(TRI_POS.tobytes())
    gltf = {
        "asset": {"version": "2.0"},
        "buffers": [{"byteLength": len(b.blob)}],
        "bufferViews": b.views,
        "accessors": [{"bufferView": bv, "componentType": 5126,
                       "count": 3, "type": "VEC3"}],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0}}]}],
        "nodes": [{"children": [1], "translation": [5.0, 0.0, 0.0]},
                  {"mesh": 0}],
    }
    p = tmp_path / "noscene.glb"
    p.write_bytes(_glb(gltf, b.blob))
    g = load_gltf(str(p), y_up_to_z_up=False)
    assert len(g.instances) == 1  # the child once, through its parent
    _, world = g.instances[0]
    np.testing.assert_allclose(world[:3, 3], [5.0, 0.0, 0.0], atol=1e-12)


def test_gltf_mask_and_opaque_share_fully_opaque_image(tmp_path):
    """An image used by both a MASK and an OPAQUE material decodes once;
    with fully-opaque alpha they share ONE atlas entry (cutout can never
    fire at the 0.5 threshold)."""
    b = _Bin()
    bv_tri = b.add(TRI_POS.tobytes())
    bv_uv = b.add(np.zeros((3, 2), np.float32).tobytes())
    bv_png = b.add(_png_bytes(np.full((2, 2, 3), 200, np.uint8)))
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1]}],
        "buffers": [{"byteLength": len(b.blob)}],
        "bufferViews": b.views,
        "accessors": [
            {"bufferView": bv_tri, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": bv_uv, "componentType": 5126, "count": 3,
             "type": "VEC2"}],
        "images": [{"bufferView": bv_png, "mimeType": "image/png"}],
        "textures": [{"source": 0}],
        "materials": [
            {"pbrMetallicRoughness": {"baseColorTexture": {"index": 0},
                                      "metallicFactor": 0.0}},
            {"alphaMode": "MASK",
             "pbrMetallicRoughness": {"baseColorTexture": {"index": 0},
                                      "metallicFactor": 0.0}}],
        "meshes": [
            {"primitives": [{"attributes": {"POSITION": 0,
                                            "TEXCOORD_0": 1},
                             "material": 0}]},
            {"primitives": [{"attributes": {"POSITION": 0,
                                            "TEXCOORD_0": 1},
                             "material": 1}]}],
        "nodes": [{"mesh": 0}, {"mesh": 1}],
    }
    p = tmp_path / "shared.glb"
    p.write_bytes(_glb(gltf, b.blob))
    g = load_gltf(str(p))
    assert len(g.textures) == 1
    assert g.meshes[0].tri_tex[0] == g.meshes[1].tri_tex[0] == 0


def test_gltf_as_instanced_asset(tmp_path):
    """MeshAsset.load('.glb') pre-flattens the glTF graph into one asset
    that Scene.from_instances can re-instance (texture ids survive the
    second flatten because the list became local to the merged asset)."""
    from tyrant_tpu.scene.instancing import MeshAsset, translate
    from tyrant_tpu.scene.scene import Scene

    asset = MeshAsset.load(_build_test_glb(tmp_path))
    assert asset.n_tris == 7
    assert asset.textures is not None and len(asset.textures) == 1
    sc = Scene.from_instances(
        [asset], [(0, translate([0, 0, 0])), (0, translate([10, 0, 0]))],
        builder="numpy")
    assert sc.stats["triangles"] == 14
    # both instances of the one asset share its texture entry (per-MESH
    # offsetting in flatten_instances, not per-instance)
    assert sc.textures is not None and len(sc.textures) == 1
    assert sc.tri_tex.max() == 0


def test_gltf_texture_transform(tmp_path):
    """KHR_texture_transform bakes offset/rotation/scale into tri_uv in
    glTF UV space (before the OBJ-convention v-flip)."""
    b = _Bin()
    bv_tri = b.add(TRI_POS.tobytes())
    uvs = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
    bv_uv = b.add(uvs.tobytes())
    img = _png_bytes(np.full((2, 2, 3), 128, np.uint8))
    bv_img = b.add(img)

    def make(tt):
        tex_info = {"index": 0}
        if tt is not None:
            tex_info["extensions"] = {"KHR_texture_transform": tt}
        return {
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
            "textures": [{"source": 0}],
            "materials": [{"pbrMetallicRoughness":
                           {"baseColorTexture": tex_info,
                            "metallicFactor": 0.0}}],
            "meshes": [{"primitives": [{"attributes": {"POSITION": 0,
                                                       "TEXCOORD_0": 1},
                                        "material": 0}]}],
        }

    # offset + scale: u' = 0.5u + 0.25, v' = 0.5v + 0.125 (gltf space),
    # then the loader's v-flip -> (u', 1 - v')
    p = tmp_path / "tt.glb"
    p.write_bytes(_glb(make({"offset": [0.25, 0.125],
                             "scale": [0.5, 0.5]}), b.blob))
    g = load_gltf(str(p))
    np.testing.assert_allclose(
        g.meshes[0].tri_uv[0],
        [[0.25, 1 - 0.125], [0.75, 1 - 0.125], [0.25, 1 - 0.625]],
        atol=1e-6)

    # pure rotation pi/2: R=[[c,s],[-s,c]] -> (u,v)=(1,0) maps to (0,-1)
    p2 = tmp_path / "tt2.glb"
    p2.write_bytes(_glb(make({"rotation": np.pi / 2}), b.blob))
    g2 = load_gltf(str(p2))
    np.testing.assert_allclose(g2.meshes[0].tri_uv[0, 1], [0.0, 2.0],
                               atol=1e-6)  # v'=-1 -> flipped 1-(-1)

    # no extension: identity (regression guard for the rec reorder)
    p3 = tmp_path / "tt3.glb"
    p3.write_bytes(_glb(make(None), b.blob))
    g3 = load_gltf(str(p3))
    np.testing.assert_allclose(g3.meshes[0].tri_uv[0],
                               [[0, 1], [1, 1], [0, 0]], atol=1e-6)


def test_gltf_vertex_colors(tmp_path):
    """COLOR_0 (normalized ubyte VEC4) multiplies into the base color as
    a per-triangle mean (linear per spec, no sRGB decode)."""
    b = _Bin()
    bv_tri = b.add(TRI_POS.tobytes())
    cols = np.array([[255, 0, 0, 255]] * 3, np.uint8)
    bv_col = b.add(cols.tobytes())
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0, "scenes": [{"nodes": [0]}], "nodes": [{"mesh": 0}],
        "buffers": [{"byteLength": len(b.blob)}],
        "bufferViews": b.views,
        "accessors": [
            {"bufferView": bv_tri, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": bv_col, "componentType": 5121, "count": 3,
             "type": "VEC4", "normalized": True}],
        "materials": [{"pbrMetallicRoughness":
                       {"baseColorFactor": [0.5, 1.0, 1.0, 1.0],
                        "metallicFactor": 0.0}}],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0,
                                                   "COLOR_0": 1},
                                    "material": 0}]}],
    }
    p = tmp_path / "vcol.glb"
    p.write_bytes(_glb(gltf, b.blob))
    g = load_gltf(str(p))
    np.testing.assert_allclose(g.meshes[0].tri_color[0], [0.5, 0.0, 0.0],
                               atol=1e-6)


def test_gltf_emissive_texture(tmp_path):
    """emissiveTexture rides the albedo slot of LIGHT primitives: direct
    hits emit factor x texel (render.py tri-light policy)."""
    b = _Bin()
    bv_tri = b.add(TRI_POS.tobytes())
    uvs = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
    bv_uv = b.add(uvs.tobytes())
    img = _png_bytes(np.full((2, 2, 3), 188, np.uint8))
    bv_img = b.add(img)
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
        "textures": [{"source": 0}],
        "materials": [{"emissiveFactor": [2.0, 2.0, 2.0],
                       "emissiveTexture": {"index": 0}}],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0,
                                                   "TEXCOORD_0": 1},
                                    "material": 0}]}],
    }
    p = tmp_path / "em.glb"
    p.write_bytes(_glb(gltf, b.blob))
    g = load_gltf(str(p))
    m = g.meshes[0]
    assert m.tri_refl[0] == 4  # LIGHT
    np.testing.assert_allclose(m.tri_color[0], 2.0)
    assert m.tri_tex is not None and m.tri_tex[0] >= 0
    np.testing.assert_allclose(g.textures[m.tri_tex[0]][0, 0, 0],
                               (188 / 255.0) ** 2.2, atol=1e-3)
