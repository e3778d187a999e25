"""Round-4 A/B: per-stage kernel-generation selection (VERDICT r3 item 3).

Extend (mixed fresh+carried wavefront), connect (32%-valid shadow
wavefront) and the AOV primary pass are separate traversal calls with
different coherence; round 3 picked mono-vs-wave once per scene and wave
regressed terrain pose 0.  This measures the steady-state full-step time
for every (extend, connect) kernel combination on the HBM-table terrain,
per pose, using the TYRANT_WAVE_* env overrides read by
render._pick_wave at trace time.

Only the 4-chain program is compiled per combo (warmups and timing both
run in multiples of the canonical chain length) to halve tunnel-compile
cost.

Usage: python scripts/stage_wave_ab.py [--scene terrain1m] [--poses 0 1 2]
       [--combos we,wc mono,mono ...]   # e.g. "1,0" = wave extend, mono connect
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="terrain1m")
    ap.add_argument("--rays", type=int, default=2 * 1_048_576)
    ap.add_argument("--poses", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--combos", nargs="+",
                    default=["1,1", "1,0", "0,1", "0,0"])
    ap.add_argument("--seconds", type=float, default=4.0)
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
    cfg = RenderConfig(width=1920, height=1080, num_rays=args.rays,
                       max_bounces=5, use_packet_kernel="on")

    results = {}
    for combo in args.combos:
        we, wc = combo.split(",")
        os.environ["TYRANT_WAVE_EXTEND"] = we
        os.environ["TYRANT_WAVE_CONNECT"] = wc
        label = f"extend={'wave' if we == '1' else 'mono'} " \
                f"connect={'wave' if wc == '1' else 'mono'}"
        print(f"== {label}", flush=True)
        r = Renderer(scene, cfg, donate=False)
        for pi in args.poses:
            cam = _camera_for_pose(pi)
            t0 = time.perf_counter()
            r.step(cam, 8)           # 2 chains: compile (first combo) + warm
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
            results[(combo, pi)] = ms
            print(f"  pose {pi}: {ms:.1f} ms/step "
                  f"(n={len(times)}, warm {warm_s:.0f}s)", flush=True)
    print("\nsummary (ms/step, median):")
    for combo in args.combos:
        row = " ".join(f"{results.get((combo, pi), float('nan')):7.1f}"
                       for pi in args.poses)
        print(f"  {combo}: {row}")


if __name__ == "__main__":
    main()
