"""Render a mesh with depth of field and a custom sun position, with
checkpoint/resume.

Usage: python examples/render_mesh_dof.py <mesh.ply> [out.png]
"""

import os
import sys

import numpy as np

from tyrant_tpu.camera import Camera
from tyrant_tpu.checkpoint import load_state, save_state
from tyrant_tpu.config import RenderConfig
from tyrant_tpu.ops.tonemap import to_uint8
from tyrant_tpu.render import Renderer
from tyrant_tpu.scene.scene import Scene


def main():
    mesh = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else "mesh.png"
    ckpt = out + ".ckpt.npz"

    cfg = RenderConfig(width=960, height=540, num_rays=1 << 19)
    scene = Scene.load(mesh)
    print("scene:", scene.stats)
    r = Renderer(scene, cfg, sun_position=(0.10, 0.25))

    center = scene.tri_vert.mean(0)
    cam = Camera()
    cam.position = (center + np.array([0, -70, 15], np.float32))
    cam.vertical_angle = -0.05
    cam.focal_distance = 20.0   # x3 scale applied internally (kernel.cu:286)
    cam.lens_radius = 0.35

    if os.path.exists(ckpt):
        r.state, meta = load_state(ckpt)
        r._last_pose = cam.pose_key()
        print(f"resumed at frame {int(r.state.frame)}")

    for chunk in range(6):
        r.step(cam, 50)
        save_state(ckpt, r.state, metadata={"mesh": mesh})
        print(f"frame {int(r.state.frame)} checkpointed")

    img = np.asarray(to_uint8(r.image()))
    from PIL import Image
    Image.fromarray(img).save(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
