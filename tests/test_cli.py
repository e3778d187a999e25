"""CLI smoke tests (render / bench / bvh-debug) at CPU-test sizes.

The CLI is the reference's app-shell equivalent (main.cpp + the
PERFORMANCE_TEST and BVH_DEBUG preprocessor modes, SURVEY.md C13/C14);
these tests pin the argument plumbing and the PNG/JSON outputs, which no
other test exercised end-to-end."""

import json
import os

import numpy as np
import pytest

from tyrant_tpu import cli

CUBE = "/root/reference/PathTracer/Data/cube.ply"


def _png_ok(path, size=None):
    assert os.path.exists(path)
    with open(path, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"
    from PIL import Image
    with Image.open(path) as im:
        im.load()
        if size is not None:
            assert im.size == size


def test_cli_render_spheres(tmp_path, capsys):
    out = tmp_path / "demo.png"
    cli.main(["render", "--width", "64", "--height", "48", "--rays", "2048",
              "--steps", "4", "--camera", "0", "-170", "40", "0", "-0.10",
              "--out", str(out)])
    _png_ok(out, size=(64, 48))


def test_cli_render_mesh(tmp_path):
    if not os.path.exists(CUBE):
        pytest.skip("reference cube.ply unavailable")
    out = tmp_path / "cube.png"
    cli.main(["render", "--scene", CUBE, "--width", "48", "--height", "32",
              "--rays", "1024", "--steps", "3", "--builder", "numpy",
              "--out", str(out)])
    _png_ok(out)


def test_cli_bench_json(tmp_path, capsys):
    txt = tmp_path / "Performance.txt"
    cli.main(["bench", "--width", "32", "--height", "24", "--rays", "1024",
              "--seconds", "0.05", "--json", "--txt", str(txt)])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    d = json.loads(line)
    assert len(d["poses"]) == 3
    assert d["total_mrays_per_s"] > 0
    assert np.isfinite(d["avg_frame_ms"])
    body = txt.read_text()
    # reference-style Performance.txt (performance_measure.cpp:24-42 with
    # the ms/seconds mislabel fixed)
    assert body.count("Average frame time") == 3
    assert "Min frame time" in body and "Max frame time" in body


def test_cli_bvh_debug(tmp_path):
    if not os.path.exists(CUBE):
        pytest.skip("reference cube.ply unavailable")
    out = tmp_path / "heat.png"
    cli.main(["bvh-debug", "--scene", CUBE, "--width", "48", "--height",
              "32", "--rays", "1024", "--builder", "numpy",
              "--camera", "0", "-6", "2", "0", "-0.2", "--out", str(out)])
    _png_ok(out)
