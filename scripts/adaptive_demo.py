"""Adaptive-sampling convergence A/B: equal ray budget, measured error.

Renders the default sphere scene (high contrast: sun-lit floor, glass,
mirror, area-light shadows) three ways:

  * reference  — uniform sampling, LONG run (the "converged" image)
  * uniform    — N steps, adaptive_sampling="off"
  * adaptive   — N steps, adaptive_sampling="on" (same ray budget)

and reports mean relative error (per-pixel |mean - ref| / (ref + 0.05),
averaged) plus the p95 error — adaptive should cut the TAIL error (the
noisy pixels it targets) at equal budget.

Usage: python scripts/adaptive_demo.py [--steps N] [--ref-mult M]
       [--size WxH] [--rays N]
"""

import argparse
import dataclasses
import functools
import os
import sys
import time

print = functools.partial(print, flush=True)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument("--ref-mult", type=int, default=30,
                    help="reference run length = ref_mult * steps")
    ap.add_argument("--size", default="320x240")
    ap.add_argument("--rays", type=int, default=1 << 17)
    ap.add_argument("--interval", type=int, default=4)
    ap.add_argument("--sun", type=float, nargs=2, default=(0.05, 0.3),
                    help="sun position; (x, -0.5) puts the sun below the "
                         "horizon so the area light dominates (hard "
                         "penumbrae = strong variance dispersion)")
    args = ap.parse_args()
    w, h = (int(x) for x in args.size.split("x"))

    from tyrant_tpu.camera import Camera
    from tyrant_tpu.config import RenderConfig
    from tyrant_tpu.render import Renderer
    from tyrant_tpu.scene.scene import Scene

    scene = Scene.load(None)  # spheres-only (glass/mirror/phong/light)
    cam = Camera()
    cam.position = np.array([0.0, -170.0, 40.0], np.float32)
    cam.vertical_angle = -0.10

    def run(mode, steps, interval=4):
        cfg = RenderConfig(width=w, height=h, num_rays=args.rays,
                           adaptive_sampling=mode,
                           adaptive_interval=interval)
        r = Renderer(scene, cfg, sun_position=tuple(args.sun))
        t0 = time.time()
        done = 0
        while done < steps:
            k = min(steps - done, interval)
            r.step(cam, k)
            done += k
        acc = np.asarray(r.state.accum, np.float64)
        el = time.time() - t0
        n = np.maximum(acc[:, 3:4], 1e-9)
        mean = acc[:, :3] / n
        return mean, acc[:, 3], el

    print(f"reference ({args.ref_mult * args.steps} uniform steps)...")
    ref, _, el = run("off", args.ref_mult * args.steps)
    print(f"  {el:.1f}s")

    results = {}
    for mode in ("off", "on"):
        img, counts, el = run(mode, args.steps, args.interval)
        rel = np.abs(img - ref).mean(axis=1) / (ref.mean(axis=1) + 0.05)
        results[mode] = rel
        tag = "uniform " if mode == "off" else "adaptive"
        print(f"{tag}: mean rel err {rel.mean():.4f}  p95 {np.percentile(rel, 95):.4f}  "
              f"p99 {np.percentile(rel, 99):.4f}  "
              f"count spread {counts.min():.0f}-{counts.max():.0f}  {el:.1f}s")

    gain_mean = results["off"].mean() / max(results["on"].mean(), 1e-12)
    gain_p95 = (np.percentile(results["off"], 95)
                / max(np.percentile(results["on"], 95), 1e-12))
    print(f"adaptive gain: mean {gain_mean:.2f}x  p95 {gain_p95:.2f}x "
          f"(>1 = adaptive better at equal ray budget)")


if __name__ == "__main__":
    main()
