"""Volumetric-fog step-cost A/B: what does cfg.fog="on" add to the 2M step?

Fog adds, per shade: one slab-overlap + exponential free-flight draw per
segment, the medium-event override selects, one HG NEE branch, one slab
transmittance exp on the shadow colours, and one HG bounce sample — all
flat VPU math (no gathers, no new sort operands, no state fields).

Usage: python scripts/fog_cost.py [--rays N]
"""

import argparse
import dataclasses
import functools
import os
import sys
import time

print = functools.partial(print, flush=True)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=2 * 1_048_576)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from tyrant_tpu.bench.harness import _camera_for_pose
    from tyrant_tpu.config import RenderConfig
    from tyrant_tpu.render import Renderer
    from tyrant_tpu.scene.scene import Scene

    scene = Scene.load("/root/reference/PathTracer/Data/dragon.ply")
    cam = _camera_for_pose(0)

    for mode, kw in (("off", {}),
                     ("on", dict(fog_sigma_s=0.01, fog_g=0.4,
                                 fog_z_min=0.0, fog_z_max=60.0))):
        cfg = dataclasses.replace(
            RenderConfig(num_rays=args.rays), fog=mode, **kw)
        r = Renderer(scene, cfg, donate=True)
        r.step(cam, args.steps)          # reach steady state + compile
        float(jnp.sum(r.state.accum))
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            r.step(cam, 1)
            float(jnp.sum(r.state.accum))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        print(f"fog={mode}: median {ts[len(ts)//2]*1e3:.1f} ms/step "
              f"(all {['%.1f' % (t*1e3) for t in ts]})")


if __name__ == "__main__":
    main()
