"""Measure the steady-state carried-survivor fraction per bench pose.

VERDICT r4 item 4 wants connect's kernel generation picked per dispatch
from the host-visible carried count (``RenderState.n_carried``).  This
script records what that signal actually looks like at the three bench
poses on the terrain (and optionally the dragon), so the selection
threshold is set from data, not guessed.

Usage:  python scripts/carried_fraction.py [--scene terrain1m|dragon]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="terrain1m")
    ap.add_argument("--steps", type=int, default=12)
    args = ap.parse_args()

    from tyrant_tpu.bench.harness import _camera_for_pose
    from tyrant_tpu.config import RenderConfig
    from tyrant_tpu.render import Renderer
    from tyrant_tpu.scene.scene import Scene

    if args.scene == "dragon":
        scene = Scene.load("/root/reference/PathTracer/Data/dragon.ply")
    else:
        from tyrant_tpu.scene.procgen import benchmark_scene
        v0, v1, v2 = benchmark_scene(1_048_496)
        scene = Scene.from_triangles(v0, v1, v2)

    cfg = RenderConfig(width=1920, height=1080, num_rays=2 * 1_048_576,
                       max_bounces=5, use_packet_kernel="on",
                       fuse_step_chains="off")
    r = Renderer(scene, cfg, sun_position=(0.05, 0.3), donate=False)
    for pose in range(3):
        cam = _camera_for_pose(pose)
        fr = []
        for s in range(args.steps):
            r.step(cam, 1)
            fr.append(int(np.asarray(r.state.n_carried)) / cfg.num_rays)
        print(f"pose {pose}: carried fraction per step "
              + " ".join(f"{f:.3f}" for f in fr), flush=True)
        # reset accumulation between poses like the bench does
        from tyrant_tpu.render import reset_accumulation
        r.state = reset_accumulation(r.state)
        r._last_pose = None


if __name__ == "__main__":
    main()
