"""Round-5 A/B: workload-adaptive kernel selection (VERDICT r4 item 4).

Measures steady-state full-step medians per bench pose on the HBM-table
terrain for:

  fixed      adaptive_connect=off  (round-4 shipped: extend=mono,
             connect=wave via _WAVE_AUTO)
  aconn      adaptive_connect=auto (device-side lax.cond on the carried
             fraction picks connect mono/wave per dispatch)
  aboth      aconn + TYRANT_ADAPTIVE_EXTEND=1 (extend adapts too)
  split      aconn + TYRANT_SPLIT_EXTEND=1 (static half split: front
             half mono, carried-heavy tail half wave)

Context: scripts/carried_fraction.py measured the carried fraction
OSCILLATING period-2 (fresh-heavy 0.13-0.39 vs carried-heavy 0.58-0.97)
— a per-dispatch pick can beat any fixed per-pose choice.

Usage: python scripts/adaptive_ab.py [--modes fixed aconn ...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="terrain1m")
    ap.add_argument("--rays", type=int, default=2 * 1_048_576)
    ap.add_argument("--poses", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--modes", nargs="+",
                    default=["fixed", "aconn", "aboth"])
    ap.add_argument("--seconds", type=float, default=4.0)
    args = ap.parse_args()

    import jax.numpy as jnp

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

    results = {}
    for mode in args.modes:
        os.environ.pop("TYRANT_ADAPTIVE_EXTEND", None)
        os.environ.pop("TYRANT_SPLIT_EXTEND", None)
        ac = "off" if mode == "fixed" else "auto"
        if mode == "aboth":
            os.environ["TYRANT_ADAPTIVE_EXTEND"] = "1"
        if mode == "split":
            os.environ["TYRANT_SPLIT_EXTEND"] = "1"
        cfg = RenderConfig(width=1920, height=1080, num_rays=args.rays,
                           max_bounces=5, use_packet_kernel="on",
                           adaptive_connect=ac)
        print(f"== {mode}", flush=True)
        r = Renderer(scene, cfg, donate=False)
        for pi in args.poses:
            cam = _camera_for_pose(pi)
            t0 = time.perf_counter()
            r.step(cam, 8)
            float(jnp.sum(r.state.accum[:, 3]))
            warm_s = time.perf_counter() - t0
            times = []
            t_end = time.perf_counter() + args.seconds
            while time.perf_counter() < t_end:
                t0 = time.perf_counter()
                r.step(cam, 4)
                float(jnp.sum(r.state.accum[:, 3]))
                times.append((time.perf_counter() - t0) / 4)
            ms = float(np.median(times) * 1e3)
            results[(mode, pi)] = ms
            print(f"  pose {pi}: {ms:.1f} ms/step "
                  f"(n={len(times)}, warm {warm_s:.0f}s)", flush=True)
        del r
    print("\nsummary (ms/step, median):")
    for mode in args.modes:
        row = " ".join(f"{results.get((mode, pi), float('nan')):7.1f}"
                       for pi in args.poses)
        mean = np.mean([results.get((mode, pi), np.nan)
                        for pi in args.poses])
        print(f"  {mode:6s}: {row}   mean {mean:7.1f}")


if __name__ == "__main__":
    main()
