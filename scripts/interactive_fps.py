"""Measure interactive 1080p progressive fly-through FPS (VERDICT r2
missing item 2: the README's interactive recipe had no recorded number).

Drives the viewer's pipelined step/fetch loop HEADLESS with a scripted
camera path: every displayed frame moves the camera (forcing the
progressive-accumulation reset the reference performs on movement,
kernel.cu:702-718), runs ``steps_per_frame`` wavefront steps, and fetches
the PREVIOUS frame's tonemapped framebuffer while the current frame's steps
run on device (viewer.py:96-124 pipelining).

Usage: python scripts/interactive_fps.py [--rays N] [--frames K]
       [--steps-per-frame S] [--scene dragon|terrain1m]
Prints one summary line with ms/frame + FPS for the fly-through and for a
static (converging) camera.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def fly_path(cam, i):
    """Scripted fly-through: orbit-ish strafe + forward + slow look."""
    cam.move(forward=0.6, strafe=0.35, delta=1.0)
    cam.look(2.0, 0.4 * np.sin(i * 0.15))


def measure(renderer, camera, n_frames, steps_per_frame, move,
            preview_scale=1, fetch=True, sync_every=1):
    import jax.numpy as jnp

    from tyrant_tpu.ops.tonemap import to_uint8
    times = []
    pending = None
    for i in range(n_frames):
        t0 = time.perf_counter()
        if move:
            fly_path(camera, i)
        renderer.step(camera, steps_per_frame)
        if fetch:
            img_dev = to_uint8(renderer.image())  # async on device
            if preview_scale > 1:
                img_dev = img_dev[::preview_scale, ::preview_scale]
            if pending is not None:
                np.asarray(pending)  # fetch previous frame (overlaps steps)
            pending = img_dev
            img_dev.block_until_ready()
        else:
            # render-only cadence: hard sync every ``sync_every`` frames
            # (sync_every > 1 = the pipelined-viewer dispatch pattern:
            # frames queue on device and the ~20 ms relay round-trip
            # amortises; display lags <= sync_every frames)
            if (i + 1) % sync_every == 0 or i == n_frames - 1:
                float(jnp.sum(renderer.state.accum[:4, 3]))
        times.append(time.perf_counter() - t0)
    if pending is not None:
        np.asarray(pending)
    ms = np.asarray(times[2:]) * 1e3  # skip compile/reset warmup frames
    return float(ms.mean()), float(np.median(ms)), float(ms.min())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=262_144)  # README recipe
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--steps-per-frame", type=int, default=1)
    ap.add_argument("--scene", default="dragon")
    ap.add_argument("--preview-scale", type=int, default=1,
                    help="fetch the framebuffer downsampled by this factor")
    ap.add_argument("--sync-every", type=int, default=1,
                    help="render-only mode: hard-sync every K frames "
                         "(K>1 = pipelined dispatch, amortises the "
                         "tunnel's ~20 ms relay tax)")
    ap.add_argument("--preset", default=None, choices=[None, "interactive"],
                    help="'interactive' = config.interactive_config() "
                         "(128k wavefront, kernel normals on — the "
                         "VERDICT r4 item 3 preset)")
    ap.add_argument("--relay-tax-ms", type=float, default=20.0,
                    help="per-frame axon-relay round-trip to subtract for "
                         "the device-side number (measured ~20 ms, "
                         "docs/PERFORMANCE.md)")
    args = ap.parse_args()

    from tyrant_tpu.config import RenderConfig, interactive_config
    from tyrant_tpu.render import Renderer
    from tyrant_tpu.scene.scene import Scene

    if args.scene == "dragon":
        scene = Scene.load("/root/reference/PathTracer/Data/dragon.ply")
    else:
        from tyrant_tpu.scene.procgen import benchmark_scene
        v0, v1, v2 = benchmark_scene(1_048_576)
        scene = Scene.from_triangles(v0, v1, v2)

    if args.preset == "interactive":
        cfg = interactive_config(width=args.width, height=args.height)
        args.rays = cfg.num_rays
    else:
        cfg = RenderConfig(width=args.width, height=args.height,
                           num_rays=args.rays,
                           max_bounces=5, use_packet_kernel="on")
    r = Renderer(scene, cfg)

    from tyrant_tpu.bench.harness import _camera_for_pose
    cam = _camera_for_pose(0)
    # warm both compiled paths (step + tonemap fetch)
    measure(r, cam, 3, args.steps_per_frame, move=False,
            preview_scale=args.preview_scale)

    ps = args.preview_scale
    mean_r, med_r, _ = measure(r, _camera_for_pose(0), args.frames,
                               args.steps_per_frame, move=True, fetch=False,
                               sync_every=args.sync_every)
    mean_f, med_f, min_f = measure(r, _camera_for_pose(0), args.frames,
                                   args.steps_per_frame, move=True,
                                   preview_scale=ps)
    print(f"scene={args.scene} {args.width}x{args.height} wavefront={args.rays} "
          f"steps/frame={args.steps_per_frame} frames={args.frames} "
          f"preview_scale={ps}")
    print(f"fly-through render-only (no display fetch): "
          f"{mean_r:6.1f} ms/frame  {1e3 / mean_r:5.1f} FPS "
          f"(median {med_r:.1f})")
    dev = mean_r - args.relay_tax_ms
    print(f"  tax-subtracted device-side estimate "
          f"(-{args.relay_tax_ms:.0f} ms relay round-trip/frame): "
          f"{dev:6.1f} ms/frame  {1e3 / max(dev, 1e-3):5.1f} FPS")
    print(f"fly-through + pipelined display fetch: "
          f"{mean_f:6.1f} ms/frame  {1e3 / mean_f:5.1f} FPS "
          f"(median {med_f:.1f}, best {min_f:.1f})")


if __name__ == "__main__":
    main()
