"""Workload-adaptive connect selection (round 5, VERDICT r4 item 4).

The device-side lax.cond picks the connect kernel generation from the
carried fraction; generations are bitwise-equivalent, so adaptive vs
fixed must produce identical images.  (On the bench scenes the knob
measured as a ~3% regression and defaults off — scripts/adaptive_ab.py
— but the machinery stays certified for other scene shapes.)
"""

import dataclasses

import numpy as np

import jax.numpy as jnp

from tyrant_tpu.camera import Camera
from tyrant_tpu.config import small_config
from tyrant_tpu.render import Renderer


def _mk_renderer(adaptive):
    from tyrant_tpu.scene.procgen import terrain
    from tyrant_tpu.scene.scene import Scene
    v0, v1, v2 = terrain(n_quads=12, towers=2)
    sc = Scene.from_triangles(v0, v1, v2, builder="numpy")
    cfg = small_config(width=64, height=48, num_rays=1 << 12,
                       use_packet_kernel="on",
                       adaptive_connect=adaptive,
                       # threshold of ONE carried ray: step 1 provably
                       # takes the mono branch (n_carried starts at 0)
                       # and later steps the wave branch (asserted
                       # below) — both sides of the cond execute
                       adaptive_connect_frac=1.0 / (1 << 12))
    r = Renderer(sc, cfg, donate=False)
    # force the HBM-table path: the adaptive cond only arms there
    if r.packet_tables is not None:
        r.packet_tables.fits = False
        r._step = None  # drop any cache (none yet; defensive)
        r.__init__(sc, cfg, donate=False)
        r.packet_tables.fits = False
    return r


def test_adaptive_connect_bitwise_equals_fixed():
    ra = _mk_renderer("auto")
    rf = _mk_renderer("off")
    assert ra.packet_tables is not None and not ra.packet_tables.fits
    cam = Camera()
    cam.position = np.array([0.0, -30.0, 25.0], np.float32)
    for r in (ra, rf):
        r.step(cam, 3)
    np.testing.assert_array_equal(np.asarray(ra.state.accum),
                                  np.asarray(rf.state.accum))
    # the WAVE branch of the cond actually executed: with the 1-ray
    # threshold, any surviving carried ray flips the pick after step 1
    # (step 1 itself ran mono, n_carried == 0 at entry)
    assert int(np.asarray(ra.state.n_carried)) >= 1


def test_adaptive_connect_config_validation():
    import pytest
    with pytest.raises(ValueError):
        small_config(adaptive_connect="maybe")


def test_split_extend_bitwise_equals_unsplit(monkeypatch):
    """TYRANT_SPLIT_EXTEND (refuted A/B knob, kept for reproducibility)
    must stay result-identical: the two half traversals use bitwise-
    equivalent kernel generations on disjoint slices."""
    # the baseline must really be unsplit even if the ambient
    # environment carries the knob (A/B scripts mutate os.environ)
    monkeypatch.delenv("TYRANT_SPLIT_EXTEND", raising=False)
    ra = _mk_renderer("off")
    assert ra.packet_tables is not None and not ra.packet_tables.fits
    cam = Camera()
    cam.position = np.array([0.0, -30.0, 25.0], np.float32)
    ra.step(cam, 2)

    monkeypatch.setenv("TYRANT_SPLIT_EXTEND", "1")
    rs = _mk_renderer("off")
    rs.step(cam, 2)
    np.testing.assert_array_equal(np.asarray(ra.state.accum),
                                  np.asarray(rs.state.accum))
