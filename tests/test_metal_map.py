"""Per-texel metalness (glTF metallicRoughnessTexture B channel).

glTF appendix B defines the material as mix(dielectric_brdf, metal_brdf,
metalness); shade evaluates that mix stochastically — the GGX conductor
lobe is picked with probability metalness (channel 1 of the repacked
rough-map texel row, zero extra gathers), DIFF otherwise (render.py).
The flag rides the tri_shade refl lane as +32 (scene.py to_device).
"""

import numpy as np

from tyrant_tpu.config import small_config
from tyrant_tpu.render import Renderer
from tyrant_tpu.scene.scene import GGX, Scene

from .test_normal_map import QUV, QV0, QV1, QV2, _down_camera

W = H = 32


def _mr_tex(rough, metal):
    """Repacked metallicRoughness texel row: ch0=rough, ch1=metalness."""
    t = np.zeros((1, 1, 3), np.float32)
    t[..., 0] = rough
    t[..., 1] = metal
    t[..., 2] = rough
    return t


def _quad(metal_val, flag=True, refl=GGX):
    return Scene.from_triangles(
        QV0, QV1, QV2, builder="numpy", tri_uv=QUV,
        tri_rtex=np.zeros(2, np.int32),
        tri_tex=np.full(2, -1, np.int32),
        textures=[_mr_tex(0.3, metal_val)],
        tri_refl=np.full(2, refl, np.int32),
        tri_color=np.tile(np.asarray([0.9, 0.6, 0.2], np.float32), (2, 1)),
        tri_metal=np.ones(2, bool) if flag else None)


def _render(scene, steps=10):
    cfg = small_config(width=W, height=H, num_rays=1 << 12)
    r = Renderer(scene, cfg, sun_position=(0.05, 0.3), donate=False)
    r.step(_down_camera(z=22.0), steps)
    return np.asarray(r.state.accum)


def test_metal_flag_encoding():
    sd = _quad(1.0).to_device()
    assert sd.has_metal_maps and sd.has_rough_maps
    row = np.asarray(sd.tri_shade)
    assert (row[:2, 3] == 32.0 + GGX).all()
    # flag without GGX refl must stay off (no shading branch to pick)
    sd2 = _quad(1.0, refl=0).to_device()
    assert not sd2.has_metal_maps
    assert (np.asarray(sd2.tri_shade)[:2, 3] == 0.0).all()


def test_metalness_one_is_exactly_ggx():
    """metalness=1 picks the conductor every time; the pick uniform is a
    side RNG stream, so the render is BITWISE the solid-GGX render."""
    a = _render(_quad(1.0, flag=True))
    b = _render(_quad(1.0, flag=False))
    np.testing.assert_array_equal(a, b)


def test_metalness_zero_shades_diffuse():
    """metalness=0 always picks DIFF: statistically equal to the same
    quad declared DIFF (different compiled program, same estimator)."""
    a = _render(_quad(0.0, flag=True), steps=16)
    b = _render(_quad(0.0, flag=False, refl=0), steps=16)
    la = (a[:, :3].mean(1) / np.maximum(a[:, 3], 1)).reshape(H, W)
    lb = (b[:, :3].mean(1) / np.maximum(b[:, 3], 1)).reshape(H, W)
    region = np.s_[10:22, 8:24]
    rel = abs(la[region].mean() - lb[region].mean()) / lb[region].mean()
    assert rel < 0.05, rel


def test_gltf_metal_map_loader(tmp_path):
    """A DIFF-class material with a metallicRoughness texture gains the
    per-texel flag; the repacked map carries B x metallicFactor in ch1."""
    from tyrant_tpu.scene.gltf import load_gltf

    from .test_gltf import TRI_POS, _Bin, _glb, _png_bytes

    b = _Bin()
    bv_tri = b.add(TRI_POS.tobytes())
    uvs = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
    bv_uv = b.add(uvs.tobytes())
    mr = np.zeros((2, 2, 3), np.uint8)
    mr[..., 1] = 102   # G: roughness 0.4
    mr[..., 2] = 204   # B: metalness 0.8
    bv_img = b.add(_png_bytes(mr))
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
        "materials": [{"pbrMetallicRoughness":
                       {"metallicRoughnessTexture": {"index": 0},
                        "metallicFactor": 0.5}}],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0,
                                                   "TEXCOORD_0": 1},
                                    "material": 0}]}],
    }
    p = tmp_path / "metal.glb"
    p.write_bytes(_glb(gltf, b.blob))
    g = load_gltf(str(p))
    m = g.meshes[0]
    assert m.tri_metal is not None and m.tri_metal.all()
    assert m.tri_refl[0] == GGX  # flagged primitives engage GGX machinery
    tex = g.textures[m.tri_rtex[0]]
    np.testing.assert_allclose(tex[0, 0, 0], 102 / 255.0, atol=1e-6)
    np.testing.assert_allclose(tex[0, 0, 1], 204 / 255.0 * 0.5, atol=1e-6)


def test_obj_map_pm(tmp_path):
    """MTL map_Pm: roughness (map_Pr red / scalar Pr) packs into ch0,
    metalness (map_Pm red) into ch1 of one texel row; faces gain the
    stochastic-metal flag and GGX machinery."""
    from PIL import Image

    from tyrant_tpu.scene.obj import load_obj_scene

    Image.fromarray(np.full((2, 2), 51, np.uint8)).save(tmp_path / "pm.png")
    (tmp_path / "m.mtl").write_text(
        "newmtl brushed\nKd 0.8 0.8 0.8\nPr 0.22\nmap_Pm pm.png\n")
    (tmp_path / "s.obj").write_text(
        "mtllib m.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\n"
        "vt 0 0\nvt 1 0\nvt 0 1\n"
        "usemtl brushed\nf 1/1 2/2 3/3\n")
    m = load_obj_scene(str(tmp_path / "s.obj"))
    assert m.tri_metal is not None and m.tri_metal[0]
    assert m.tri_refl[0] == 5  # GGX
    tex = m.textures[m.tri_rtex[0]]
    np.testing.assert_allclose(tex[0, 0, 0], 0.22, atol=1e-6)  # scalar Pr
    np.testing.assert_allclose(tex[0, 0, 1], 51 / 255.0, atol=1e-3)
