import numpy as np

from tyrant_tpu import sky as skymod
from tyrant_tpu.camera import Camera
from tyrant_tpu.checkpoint import load_state, save_state
from tyrant_tpu.config import small_config
from tyrant_tpu.render import init_state, render_step
from tyrant_tpu.scene.scene import Scene

import jax.numpy as jnp

CFG = small_config(width=16, height=16, num_rays=1 << 9)
SUN = skymod.sun_direction_from_position(jnp.asarray([0.05, 0.3]))


def test_checkpoint_resume_bitwise(tmp_path):
    scene = Scene.load(None).to_device()
    cam = Camera()
    cam.position = np.array([0.0, -170.0, 40.0], np.float32)
    cam.vertical_angle = -0.10
    camd = cam.to_device(CFG)

    st = init_state(CFG)
    for _ in range(3):
        st = render_step(st, scene, camd, SUN, cfg=CFG)

    p = str(tmp_path / "ckpt.npz")
    save_state(p, st, metadata={"sun": [0.05, 0.3], "frame_note": "test"})
    st_loaded, meta = load_state(p)
    assert meta["frame_note"] == "test"

    # resuming from the checkpoint must be bit-identical to continuing
    a = render_step(st, scene, camd, SUN, cfg=CFG)
    b = render_step(st_loaded, scene, camd, SUN, cfg=CFG)
    for f in ["accum", "origin", "direction", "direct", "pixel", "bounces"]:
        np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                      np.asarray(getattr(b, f)), err_msg=f)
    assert int(a.frame) == int(b.frame)
