"""RREFR rough-dielectric ("frosted glass") BSDF tests (beyond-reference).

The material is the REFR Fresnel/TIR/Beer math (kernel.cu:476-514)
evaluated through a VNDF-sampled GGX microfacet (render.py has_rrefr
block).  Pins: the smooth-roughness limit reproduces REFR, roughness
spreads the lobe without creating energy, and the JSON/glTF material
plumbing reaches the shade stage.
"""

import json

import numpy as np

from tyrant_tpu.camera import Camera
from tyrant_tpu.config import RenderConfig
from tyrant_tpu.render import Renderer
from tyrant_tpu.scene.scene import REFR, RREFR, Scene, Spheres


def _scene(refl, rough):
    """Default seven-sphere world with sphere 1 (the reference's REFR
    ball, kernel.cu:676) re-typed."""
    s = Spheres.default_seven()
    r = s.refl.copy()
    r[1] = refl
    ro = np.full(7, 0.3, np.float32)
    ro[1] = rough
    return Scene.load(None, spheres=Spheres(
        center=s.center, radius=s.radius, color=s.color,
        emission=s.emission, refl=r, roughness=ro))


def _render(scene, steps=24):
    cam = Camera()
    cam.position = np.array([40.0, -90.0, 30.0], np.float32)
    cam.look_at([40.0, 0.0, 16.5])
    cfg = RenderConfig(width=48, height=32, num_rays=2048, max_bounces=5)
    r = Renderer(scene, cfg)
    r.step(cam, steps)
    return np.asarray(r.radiance())


def test_smooth_limit_matches_refr():
    """roughness -> 0: the microfacet collapses onto the geometric normal,
    so RREFR must reproduce the smooth REFR image within MC noise (the
    reflect/transmit coin is literally the same draw)."""
    a = _render(_scene(REFR, 0.3))
    b = _render(_scene(RREFR, 0.03))
    assert np.isfinite(b).all()
    rel = abs(a.mean() - b.mean()) / a.mean()
    assert rel < 0.05, f"smooth-limit mean off by {rel:.3f}"
    # per-pixel agreement is looser: even a near-delta microfacet
    # perturbs refracted PATHS, which decorrelates the MC noise inside
    # the glass ball (chaotic ray trees), so only the estimator MEAN has
    # a tight limit; this bound just pins gross structure
    assert np.mean(np.abs(a - b)) / a.mean() < 0.25


def test_roughness_spreads_without_creating_energy():
    a = _render(_scene(REFR, 0.3))
    b = _render(_scene(RREFR, 0.4))
    assert np.isfinite(b).all()
    # same scene energy within MC tolerance (G1 <= 1: no amplification)
    assert abs(a.mean() - b.mean()) / a.mean() < 0.06
    # but a genuinely different image: the frosted ball scatters
    assert np.abs(a - b).max() > 0.05


def test_json_rough_glass_material(tmp_path):
    from tyrant_tpu.scene.description import load_description
    desc = {
        "spheres": [{"center": [0, 0, 5], "radius": 2,
                     "material": "rough_glass", "roughness": 0.35},
                    {"center": [0, 0, 100], "radius": 5,
                     "material": "light", "emission": [4, 4, 4]}],
        "default_spheres": False,
    }
    p = tmp_path / "frosted.json"
    p.write_text(json.dumps(desc))
    bundle = load_description(str(p))
    sc = bundle.scene
    i = int(np.nonzero(sc.spheres.refl == RREFR)[0][0])
    assert sc.spheres.roughness[i] == np.float32(0.35)
    assert sc.to_device().has_rrefr


def test_gltf_transmission_roughness_maps_to_rrefr(tmp_path):
    from tests.test_gltf import TRI_POS, _Bin, _glb
    from tyrant_tpu.scene.gltf import load_gltf
    b = _Bin()
    bv = b.add(TRI_POS.tobytes())
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0, "scenes": [{"nodes": [0]}], "nodes": [{"mesh": 0}],
        "buffers": [{"byteLength": len(b.blob)}],
        "bufferViews": b.views,
        "accessors": [{"bufferView": bv, "componentType": 5126,
                       "count": 3, "type": "VEC3"}],
        "materials": [{"extensions": {"KHR_materials_transmission":
                                      {"transmissionFactor": 1.0}},
                       "pbrMetallicRoughness": {"metallicFactor": 0.0,
                                                "roughnessFactor": 0.5}}],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0},
                                    "material": 0}]}],
    }
    p = tmp_path / "frosted.glb"
    p.write_bytes(_glb(gltf, b.blob))
    g = load_gltf(str(p))
    assert g.meshes[0].tri_refl[0] == RREFR
    np.testing.assert_allclose(g.meshes[0].tri_rough[0], 0.5)
