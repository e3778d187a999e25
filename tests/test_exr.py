"""OpenEXR IO (utils/exr.py) + CLI --hdr extension dispatch."""

import struct

import numpy as np
import pytest

from tyrant_tpu import cli
from tyrant_tpu.utils.exr import read_exr, write_exr


def test_exr_roundtrip_float32(tmp_path):
    rng = np.random.default_rng(0)
    img = (rng.random((7, 5, 3)) * 1e4).astype(np.float32)  # HDR range
    p = str(tmp_path / "x.exr")
    write_exr(p, img, half=False)
    np.testing.assert_array_equal(read_exr(p), img)


def test_exr_roundtrip_half(tmp_path):
    rng = np.random.default_rng(1)
    img = (rng.random((4, 6, 3)) * 100).astype(np.float32)
    p = str(tmp_path / "h.exr")
    write_exr(p, img)  # default half
    out = read_exr(p)
    # exact at half precision: write quantizes, read upcasts losslessly
    np.testing.assert_array_equal(out, img.astype(np.float16)
                                  .astype(np.float32))


def test_exr_rgba_alpha(tmp_path):
    img = np.zeros((3, 2, 4), np.float32)
    img[..., :3] = 0.25
    img[..., 3] = np.linspace(0, 1, 6).reshape(3, 2)
    p = str(tmp_path / "a.exr")
    write_exr(p, img, half=False)
    out = read_exr(p)
    assert out.shape == (3, 2, 4)
    np.testing.assert_array_equal(out, img)


def test_exr_header_fields(tmp_path):
    """Magic, version, alphabetical chlist, NO_COMPRESSION — the invariants
    other readers check first."""
    p = str(tmp_path / "hdr.exr")
    write_exr(p, np.ones((2, 3, 3), np.float32))
    raw = open(p, "rb").read()
    magic, version = struct.unpack_from("<ii", raw, 0)
    assert magic == 20000630 and version == 2
    # channel names appear in alphabetical order: B before G before R
    assert raw.index(b"B\0") < raw.index(b"G\0") < raw.index(b"R\0")
    assert b"compression\0compression\0" in raw


def test_exr_rejects_bad_magic(tmp_path):
    p = tmp_path / "bad.exr"
    p.write_bytes(b"\x89PNG\r\n\x1a\n" + b"\0" * 64)
    with pytest.raises(ValueError, match="not an EXR"):
        read_exr(str(p))


def test_exr_rejects_bad_shape(tmp_path):
    with pytest.raises(ValueError, match="EXR wants"):
        write_exr(str(tmp_path / "x.exr"), np.ones((4, 4), np.float32))


def test_cli_render_hdr_exr(tmp_path):
    out = tmp_path / "x.png"
    hdr = tmp_path / "x.exr"
    cli.main(["render", "--width", "32", "--height", "24", "--rays", "1024",
              "--steps", "2", "--out", str(out), "--hdr", str(hdr)])
    img = read_exr(str(hdr))
    assert img.shape == (24, 32, 3)
    assert np.isfinite(img).all() and img.max() > 0


def test_envmap_loader_accepts_exr(tmp_path):
    from tyrant_tpu.scene.texture import load_texture
    em = np.full((4, 8, 3), 2.5, np.float32)
    p = str(tmp_path / "env.exr")
    write_exr(p, em, half=False)
    np.testing.assert_array_equal(load_texture(p), em)
