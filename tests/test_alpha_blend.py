"""Stochastic alpha BLEND (beyond-reference).

glTF alphaMode BLEND / MTL constant ``d`` < 1 shade with probability
alpha and pass through with probability 1-alpha (render.py) — unbiased
linear over-compositing, one wavefront step per transparent layer.  The
flag rides the tri_shade refl lane as +16 (scene.py to_device), so
blend-free scenes compile the identical program.
"""

import numpy as np

from tyrant_tpu.config import small_config
from tyrant_tpu.render import Renderer
from tyrant_tpu.scene.scene import Scene

from .test_normal_map import QUV, QV0, QV1, QV2, _down_camera

W = H = 32


def _blend_quad(alpha, color=(0.0, 0.0, 0.0)):
    tex = np.ones((1, 1, 4), np.float32)
    tex[..., 3] = alpha
    return Scene.from_triangles(
        QV0, QV1, QV2, builder="numpy", tri_uv=QUV,
        tri_tex=np.zeros(2, np.int32), textures=[tex],
        tri_color=np.tile(np.asarray(color, np.float32), (2, 1)),
        tri_blend=np.ones(2, bool))


def test_blend_flag_encoding():
    sd = _blend_quad(0.5).to_device()
    assert sd.has_blend and sd.has_alpha_tex
    row = np.asarray(sd.tri_shade)
    assert (row[:2, 3] == 16.0).all()  # DIFF(0) + blend flag
    # an all-opaque alpha keeps the whole machinery off (identical program)
    sd2 = _blend_quad(1.0).to_device()
    assert not sd2.has_blend and not sd2.has_alpha_tex


def test_blend_half_coverage():
    """A BLACK quad with constant alpha 0.5 halves the radiance behind
    it: shade-with-prob-alpha contributes ~0 (black albedo), the
    pass-through half is exact — so lum ~= 0.5 * no-quad within MC noise."""
    cfg = small_config(width=W, height=H, num_rays=1 << 12)
    cam = _down_camera(z=22.0)

    def lum(scene):
        r = Renderer(scene, cfg, sun_position=(0.05, 0.3), donate=False)
        r.step(cam, 20)
        a = np.asarray(r.state.accum)
        return (a[:, :3].mean(1) / np.maximum(a[:, 3], 1)).reshape(H, W)

    img = lum(_blend_quad(0.5))
    behind = lum(Scene.load(None))
    region = np.s_[10:22, 8:24]
    ratio = img[region].mean() / behind[region].mean()
    assert 0.40 < ratio < 0.60, ratio


def test_blend_alpha_one_is_opaque():
    """alpha=1 blend triangles never pass through (threshold clip)."""
    tex = np.ones((1, 1, 4), np.float32)
    tex2 = np.zeros((1, 1, 4), np.float32)  # second texture forces alpha
    sc = Scene.from_triangles(
        QV0, QV1, QV2, builder="numpy", tri_uv=QUV,
        tri_tex=np.zeros(2, np.int32), textures=[tex, tex2],
        tri_color=np.tile(np.asarray([1.0, 0.1, 0.1], np.float32), (2, 1)),
        tri_blend=np.ones(2, bool))
    assert sc.to_device().has_blend
    cfg = small_config(width=W, height=H, num_rays=1 << 12)
    cam = _down_camera(z=22.0)
    r = Renderer(sc, cfg, sun_position=(0.05, 0.3), donate=False)
    r.step(cam, 8)
    a = np.asarray(r.state.accum)
    img = (a[:, :3] / np.maximum(a[:, 3:4], 1)).reshape(H, W, 3)
    center = img[10:22, 8:24]
    # red surface everywhere: green/blue well below red
    assert center[..., 0].mean() > 2.5 * center[..., 1].mean()


def test_gltf_blend_constant_alpha(tmp_path):
    """alphaMode BLEND + baseColorFactor alpha < 1 and no texture: the
    loader synthesizes a 1x1 white texel carrying the factor alpha."""
    from tyrant_tpu.scene.gltf import load_gltf

    from .test_gltf import TRI_POS, _Bin, _glb

    b = _Bin()
    bv = b.add(TRI_POS.tobytes())
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0, "scenes": [{"nodes": [0]}], "nodes": [{"mesh": 0}],
        "buffers": [{"byteLength": len(b.blob)}],
        "bufferViews": b.views,
        "accessors": [{"bufferView": bv, "componentType": 5126,
                       "count": 3, "type": "VEC3"}],
        "materials": [{"alphaMode": "BLEND",
                       "pbrMetallicRoughness":
                       {"baseColorFactor": [0.9, 0.9, 0.9, 0.25],
                        "metallicFactor": 0.0}}],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0},
                                    "material": 0}]}],
    }
    p = tmp_path / "blend.glb"
    p.write_bytes(_glb(gltf, b.blob))
    g = load_gltf(str(p))
    m = g.meshes[0]
    assert m.tri_blend is not None and m.tri_blend.all()
    assert m.tri_tex is not None and m.tri_tex[0] >= 0
    synth = g.textures[m.tri_tex[0]]
    assert synth.shape == (1, 1, 4)
    np.testing.assert_allclose(synth[0, 0], [1, 1, 1, 0.25])


def test_obj_constant_dissolve(tmp_path):
    from tyrant_tpu.scene.obj import load_obj_scene

    (tmp_path / "m.mtl").write_text(
        "newmtl glassy\nKd 0.2 0.4 0.8\nd 0.4\n"
        "newmtl solid\nKd 1 1 1\n")
    (tmp_path / "s.obj").write_text(
        "mtllib m.mtl\n"
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 2 0 0\nv 3 0 0\nv 2 1 0\n"
        "usemtl glassy\nf 1 2 3\nusemtl solid\nf 4 5 6\n")
    m = load_obj_scene(str(tmp_path / "s.obj"))
    assert m.tri_blend is not None
    assert m.tri_blend[0] and not m.tri_blend[1]
    synth = m.textures[m.tri_tex[0]]
    assert synth.shape == (1, 1, 4)
    np.testing.assert_allclose(synth[0, 0, 3], 0.4)
    assert m.tri_tex[1] == -1
