"""Per-triangle glass IOR (KHR_materials_ior / JSON "ior").

REFR triangles carry eta on the tri_shade lane 7 (unused as roughness
there); shade substitutes it for the reference's hard-coded 1.2 under
the has_var_ior static gate (render.py REFR block), so default scenes
compile the identical program.
"""

import numpy as np

from tyrant_tpu.config import small_config
from tyrant_tpu.render import Renderer
from tyrant_tpu.scene.scene import REFR, Scene, Spheres

from .test_normal_map import QV0, QV1, QV2, _down_camera

W = H = 32


def _no_spheres():
    s = Spheres.default_seven()
    keep = np.zeros(7, bool)
    keep[6] = True  # keep only the (far away) light sphere
    return Spheres(center=s.center[keep], radius=s.radius[keep],
                   color=s.color[keep], emission=s.emission[keep],
                   refl=s.refl[keep])


def _glass_quad(ior):
    # bright upper hemisphere, black lower: a normal-incidence camera ray
    # reflects to the zenith (bright) with probability r0(eta) and
    # transmits to the nadir (black) otherwise
    env = np.zeros((16, 32, 3), np.float32)
    env[:8] = 8.0
    return Scene.from_triangles(
        QV0, QV1, QV2, builder="numpy", spheres=_no_spheres(),
        tri_refl=np.full(2, REFR, np.int32),
        tri_ior=None if ior is None else np.full(2, ior, np.float32),
        envmap=env)


def test_ior_lane_encoding():
    sd = _glass_quad(2.4).to_device()
    assert sd.has_var_ior
    assert (np.asarray(sd.tri_shade)[:2, 7] == np.float32(2.4)).all()
    # default eta keeps the gate off (identical program)
    assert not _glass_quad(1.2).to_device().has_var_ior
    assert not _glass_quad(None).to_device().has_var_ior


def test_ior_default_is_bitwise_reference():
    """tri_ior=1.2 must not change a single bit vs no tri_ior at all."""
    cfg = small_config(width=W, height=H, num_rays=1 << 11)
    cam = _down_camera(z=40.0)
    out = []
    for ior in (None, 1.2):
        r = Renderer(_glass_quad(ior), cfg, donate=False)
        r.step(cam, 6)
        out.append(np.asarray(r.state.accum))
    np.testing.assert_array_equal(out[0], out[1])


def test_ior_drives_fresnel_reflectance():
    """Normal-incidence reflectance r0 = ((eta-1)/(eta+1))^2: ior 2.4 is
    ~20x more reflective than 1.2 — the quad region's brightness (it can
    only come from zenith reflections) must scale accordingly."""
    cfg = small_config(width=W, height=H, num_rays=1 << 12)
    cam = _down_camera(z=40.0)

    def lum(ior):
        r = Renderer(_glass_quad(ior), cfg, donate=False)
        r.step(cam, 24)
        a = np.asarray(r.state.accum)
        img = (a[:, :3].mean(1) / np.maximum(a[:, 3], 1)).reshape(H, W)
        return img[12:20, 12:20].mean()

    hi, lo = lum(2.4), lum(1.2)
    assert hi > 4.0 * lo, (hi, lo)


def test_gltf_ior(tmp_path):
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
        "materials": [{
            "pbrMetallicRoughness": {"metallicFactor": 0.0,
                                     "roughnessFactor": 0.0},
            "extensions": {
                "KHR_materials_transmission": {"transmissionFactor": 1.0},
                "KHR_materials_ior": {"ior": 1.45}}}],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0},
                                    "material": 0}]}],
    }
    p = tmp_path / "ior.glb"
    p.write_bytes(_glb(gltf, b.blob))
    g = load_gltf(str(p))
    m = g.meshes[0]
    assert m.tri_refl[0] == REFR
    np.testing.assert_allclose(m.tri_ior, 1.45)


def test_json_ior_override(tmp_path):
    import json as _json

    from tyrant_tpu.scene.description import load_description

    ply = tmp_path / "tri.ply"
    ply.write_text(
        "ply\nformat ascii 1.0\nelement vertex 3\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 1\nproperty list uchar int vertex_indices\n"
        "end_header\n0 0 0\n1 0 0\n0 1 0\n3 0 1 2\n")
    desc = {"meshes": [{"path": "tri.ply", "material": "glass",
                        "ior": 1.55}],
            "default_spheres": False}
    p = tmp_path / "s.json"
    p.write_text(_json.dumps(desc))
    sc = load_description(str(p)).scene
    assert sc.tri_refl[0] == REFR
    np.testing.assert_allclose(sc.tri_ior[0], 1.55)
    assert sc.to_device().has_var_ior
