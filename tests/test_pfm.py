"""PFM HDR IO (utils/pfm.py) + Renderer.radiance + CLI --hdr plumbing."""

import numpy as np

from tyrant_tpu import cli
from tyrant_tpu.utils.pfm import read_pfm, write_pfm


def test_pfm_roundtrip_color(tmp_path):
    rng = np.random.default_rng(0)
    img = (rng.random((7, 5, 3)) * 1e4).astype(np.float32)  # HDR range
    p = str(tmp_path / "x.pfm")
    write_pfm(p, img)
    np.testing.assert_array_equal(read_pfm(p), img)


def test_pfm_roundtrip_grayscale(tmp_path):
    img = np.arange(12, dtype=np.float32).reshape(4, 3)
    p = str(tmp_path / "g.pfm")
    write_pfm(p, img)
    out = read_pfm(p)
    assert out.shape == (4, 3, 3)
    np.testing.assert_array_equal(out[:, :, 0], img)


def test_pfm_big_endian_and_scale(tmp_path):
    img = np.float32([[[1, 2, 3], [4, 5, 6]]])
    p = str(tmp_path / "be.pfm")
    with open(p, "wb") as f:
        f.write(b"PF\n2 1\n2.0\n")
        f.write(np.flipud(img).astype(">f4").tobytes())
    np.testing.assert_allclose(read_pfm(p), img * 2.0)


def test_radiance_is_accum_mean():
    from tyrant_tpu.camera import Camera
    from tyrant_tpu.config import small_config
    from tyrant_tpu.render import Renderer
    from tyrant_tpu.scene.scene import Scene

    cfg = small_config(width=16, height=12, num_rays=1 << 10)
    r = Renderer(Scene.load(None), cfg)
    r.step(Camera(), 2)
    rad = np.asarray(r.radiance())
    accum = np.asarray(r.state.accum)
    expect = (accum[:, :3] / np.maximum(accum[:, 3:4], 1e-8)).reshape(
        12, 16, 3)
    np.testing.assert_array_equal(rad, expect)
    assert np.isfinite(rad).all()


def test_cli_render_hdr(tmp_path):
    out = tmp_path / "x.png"
    hdr = tmp_path / "x.pfm"
    cli.main(["render", "--width", "32", "--height", "24", "--rays", "1024",
              "--steps", "2", "--out", str(out), "--hdr", str(hdr)])
    img = read_pfm(str(hdr))
    assert img.shape == (24, 32, 3)
    assert np.isfinite(img).all() and img.max() > 0


def test_envmap_loader_accepts_pfm(tmp_path):
    from tyrant_tpu.scene.texture import load_texture
    em = np.full((4, 8, 3), 2.5, np.float32)
    p = str(tmp_path / "env.pfm")
    write_pfm(p, em)
    np.testing.assert_array_equal(load_texture(p), em)
