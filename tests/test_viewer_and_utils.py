"""Smoke tests for the viewer renderers and utils subsystems."""

import json

import numpy as np

from tyrant_tpu.camera import Camera
from tyrant_tpu.config import small_config
from tyrant_tpu.render import Renderer
from tyrant_tpu.scene.scene import Scene
from tyrant_tpu.utils.metrics import Metrics, render_stats
from tyrant_tpu.viewer import TerminalViewer, _to_png_bytes


def test_terminal_viewer_ansi():
    img = np.zeros((32, 64, 3), np.uint8)
    img[:16] = [255, 0, 0]
    img[16:] = [0, 0, 255]
    r = Renderer(Scene.load(None), small_config(16, 16, 1 << 8), donate=False)
    tv = TerminalViewer(r, Camera(), cols=32)
    s = tv._ansi(img)
    assert "\x1b[38;2;255;0;0m" in s
    assert "\x1b[48;2;0;0;255m" in s
    assert s.count("\n") >= 3


def test_png_bytes():
    img = np.random.default_rng(0).integers(0, 255, (8, 8, 3)).astype(np.uint8)
    png = _to_png_bytes(img)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"


def test_metrics_emit(capsys):
    import io
    sink = io.StringIO()
    m = Metrics(sink=sink)
    m.count("frames")
    m.count("frames")
    with m.time("step"):
        pass
    rec = m.emit(tag="x")
    assert rec["frames"] == 2
    assert "step_ms_avg" in rec
    parsed = json.loads(sink.getvalue())
    assert parsed["tag"] == "x"


def test_render_stats():
    cfg = small_config(8, 8, 1 << 8)
    r = Renderer(Scene.load(None), cfg, donate=False)
    r.step(Camera(), 2)
    s = render_stats(r.state, cfg)
    assert s["frame"] == 3
    assert 0.0 <= s["carry_fraction"] <= 1.0


def test_missing_scene_degrades(tmp_path, capsys):
    sc = Scene.load(str(tmp_path / "nope.ply"))
    assert sc.bvh is None
    assert sc.stats["nodes"] == 0


def test_packet_kernel_mode_selection():
    """'auto' picks the kernel generation PER STAGE for HBM-resident
    tables (round-4 in-step square, docs/PERFORMANCE.md: extend=mono,
    connect=wave, aov=wave) and mono everywhere for VMEM tables; forced
    modes override; unknown values refuse."""
    import pytest

    from tyrant_tpu.config import RenderConfig
    from tyrant_tpu.render import _WAVE_AUTO, _pick_wave

    with pytest.raises(ValueError, match="packet_kernel_mode"):
        RenderConfig(packet_kernel_mode="nonsense")
    for mode in ("auto", "mono", "wave", "wave-unsafe"):
        RenderConfig(packet_kernel_mode=mode)

    class _T:
        def __init__(self, fits):
            self.fits = fits

    auto = RenderConfig(packet_kernel_mode="auto")
    for stage in ("extend", "connect", "aov"):
        assert _pick_wave(auto, None, stage) is False
        assert _pick_wave(auto, _T(fits=True), stage) is False
        assert _pick_wave(auto, _T(fits=False), stage) \
            is _WAVE_AUTO[stage]
    assert _WAVE_AUTO == {"extend": False, "connect": True, "aov": True}
    assert _pick_wave(RenderConfig(packet_kernel_mode="mono"),
                      _T(fits=False)) is False
    assert _pick_wave(RenderConfig(packet_kernel_mode="wave"),
                      _T(fits=True)) is True
