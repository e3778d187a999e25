"""Cross-version golden snapshot: a tiny fixed render compared against a
stored accumulation buffer.  Catches silent estimator/shading regressions
between rounds (the render is deterministic on CPU; compare with a small
tolerance to survive XLA fusion changes)."""

import os

import numpy as np

import jax.numpy as jnp

from tyrant_tpu import sky as skymod
from tyrant_tpu.camera import Camera
from tyrant_tpu.config import small_config
from tyrant_tpu.render import init_state, render_step
from tyrant_tpu.scene.scene import Scene

SNAP = os.path.join(os.path.dirname(__file__), "data", "golden_spheres.npz")
CFG = small_config(width=16, height=16, num_rays=1 << 10)
SUN = skymod.sun_direction_from_position(jnp.asarray([0.05, 0.3]))


def _render():
    scene = Scene.load(None).to_device()
    cam = Camera()
    cam.position = np.array([0.0, -170.0, 40.0], np.float32)
    cam.vertical_angle = -0.10
    camd = cam.to_device(CFG)
    st = init_state(CFG)
    for _ in range(6):
        st = render_step(st, scene, camd, SUN, cfg=CFG)
    return np.asarray(st.accum)


def test_golden_snapshot():
    """Compare against a stored render.  Shade RNG streams are seeded by
    slot index, so legitimate compaction-order changes shift per-path
    randomness — the comparison is therefore statistical (resolved image
    within Monte-Carlo tolerance) plus exact global invariants."""
    acc = _render()
    if not os.path.exists(SNAP):
        os.makedirs(os.path.dirname(SNAP), exist_ok=True)
        np.savez_compressed(SNAP, accum=acc)
        import pytest
        pytest.skip("golden snapshot created; rerun to compare")
    want = np.load(SNAP)["accum"]
    # total paths completed is order-independent: exact
    assert acc[:, 3].sum() == want[:, 3].sum()
    from tyrant_tpu.ops.tonemap import resolve
    img_a = np.asarray(resolve(jnp.asarray(acc), CFG.width, CFG.height))
    img_b = np.asarray(resolve(jnp.asarray(want), CFG.width, CFG.height))
    diff = np.abs(img_a - img_b)
    assert diff.mean() < 0.03, diff.mean()
