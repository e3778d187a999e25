"""Per-texture wrap modes (glTF sampler wrapS/wrapT): repeat / clamp /
mirror, selected statically from the tex_meta tuple (render._sample_texture).
"""

import numpy as np

from tyrant_tpu.render import _sample_texture
from tyrant_tpu.scene.scene import Scene

from .test_normal_map import QUV, QV0, QV1, QV2

# 2x1 texture: left texel black, right texel white
TEX = np.zeros((1, 2, 3), np.float32)
TEX[0, 1] = 1.0


def _scene_data(wrap):
    sc = Scene.from_triangles(
        QV0, QV1, QV2, builder="numpy", tri_uv=QUV,
        tri_tex=np.zeros(2, np.int32), textures=[TEX],
        texture_wraps=[wrap])
    return sc.to_device()


def _tap(sd, u):
    import jax.numpy as jnp
    texid = jnp.zeros(len(u), jnp.int32)
    uu = jnp.asarray(u, jnp.float32)
    vv = jnp.full(len(u), 0.5, jnp.float32)
    return np.asarray(_sample_texture(sd, texid, uu, vv, "nearest"))[:, 0]


def test_wrap_modes():
    us = [-0.3, 0.2, 0.8, 1.3, 2.2]
    # repeat: u mod 1 -> texel(2*frac)
    rep = _tap(_scene_data((0, 0)), us)
    np.testing.assert_allclose(rep, [1, 0, 1, 0, 0])
    # clamp: u<0 -> left texel, u>1 -> right texel
    cl = _tap(_scene_data((1, 0)), us)
    np.testing.assert_allclose(cl, [0, 0, 1, 1, 1])
    # mirror: 1.3 reflects to 0.7 (right), 2.2 wraps to 0.2 (left),
    # -0.3 reflects to 0.3 (left)
    mi = _tap(_scene_data((2, 0)), us)
    np.testing.assert_allclose(mi, [0, 0, 1, 1, 0])


def test_repeat_only_meta_stays_short():
    """Without wraps the meta stays 5-tuples of zeros and the tap compiles
    the wrap-free program (any_wrap False)."""
    sd = _scene_data((0, 0))
    assert all(m[3] == 0 and m[4] == 0 for m in sd.tex_meta)


def test_gltf_sampler_wraps(tmp_path):
    from tyrant_tpu.scene.gltf import load_gltf

    from .test_gltf import TRI_POS, _Bin, _glb, _png_bytes

    b = _Bin()
    bv_tri = b.add(TRI_POS.tobytes())
    uvs = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
    bv_uv = b.add(uvs.tobytes())
    img = _png_bytes(np.full((2, 2, 3), 128, np.uint8))
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
        "samplers": [{"wrapS": 33071, "wrapT": 33648}],
        "textures": [{"source": 0, "sampler": 0}],
        "materials": [{"pbrMetallicRoughness":
                       {"baseColorTexture": {"index": 0},
                        "metallicFactor": 0.0}}],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0,
                                                   "TEXCOORD_0": 1},
                                    "material": 0}]}],
    }
    p = tmp_path / "wrap.glb"
    p.write_bytes(_glb(gltf, b.blob))
    g = load_gltf(str(p))
    assert g.tex_wraps == [(1, 2)]  # clamp S, mirror T
