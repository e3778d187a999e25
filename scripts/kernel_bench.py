"""Standalone packet-kernel bench on realistic workloads (round-2 scout).

Times closest-hit and any-hit packet traversal on (a) coherent primaries and
(b) the bounce-mix survivor wavefront of a steady-state render, so kernel
changes can be A/B'd without running the full step.  Workloads are cached in
/tmp/kernel_bench_ways.npz (regenerate with --regen).

Usage: python scripts/kernel_bench.py [--rays N] [--scene dragon|terrain1m]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0]))


def timeit(fn, *args, reps=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] * 1e3, out


def build_workloads(scene_name, n_rays, path):
    from tyrant_tpu.bench.harness import _camera_for_pose
    from tyrant_tpu.config import RenderConfig
    from tyrant_tpu.render import Renderer
    from tyrant_tpu.scene.scene import Scene

    if scene_name == "dragon":
        scene = Scene.load("/root/reference/PathTracer/Data/dragon.ply")
    else:
        from tyrant_tpu.scene.procgen import benchmark_scene
        v0, v1, v2 = benchmark_scene(1_048_576)
        scene = Scene.from_triangles(v0, v1, v2)
    cfg = RenderConfig(width=1920, height=1080, num_rays=n_rays,
                       max_bounces=5, use_packet_kernel="on")
    r = Renderer(scene, cfg, donate=False)
    cam = _camera_for_pose(0)
    r.step(cam, 6)
    sync(r.state.accum)
    st = r.state
    from tyrant_tpu.render import _raygen
    import jax.numpy as jnp
    gen = _raygen(cfg, cam.to_device(cfg), st.start_position, st.frame,
                  cfg.height, 0)
    # the wavefront a real step traces = fresh top-off in the front slots,
    # carried survivors at the tail (render_step's merge); the front slots
    # of the RAW state hold terminated rays' stale directions, which would
    # overstate incoherence
    keep = (jnp.arange(cfg.num_rays) >= (cfg.num_rays - st.n_carried))[:, None]
    mix_o = jnp.where(keep, st.origin, gen["origin"])
    mix_d = jnp.where(keep, st.direction, gen["direction"])
    print(f"carried {int(st.n_carried)} / {cfg.num_rays}", file=sys.stderr)
    np.savez(path,
             mix_o=np.asarray(mix_o), mix_d=np.asarray(mix_d),
             pri_o=np.asarray(gen["origin"]),
             pri_d=np.asarray(gen["direction"]))
    print(f"saved workloads to {path}", file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=2 * 1_048_576)
    ap.add_argument("--scene", default="dragon")
    ap.add_argument("--regen", action="store_true")
    ap.add_argument("--regen-only", action="store_true",
                    help="only (re)build the cached wavefront, skip timing")
    ap.add_argument("--anyhit", action="store_true")
    ap.add_argument("--mono", action="store_true",
                    help="skip the wave variants")
    ap.add_argument("--wave", action="store_true",
                    help="skip the mono variants")
    ap.add_argument("--treelet", type=int, default=None,
                    help="override TREELET_ROWS (HBM scenes)")
    args = ap.parse_args()

    path = f"/tmp/kernel_bench_{args.scene}_{args.rays}.npz"
    if args.regen or not os.path.exists(path):
        build_workloads(args.scene, args.rays, path)
    if args.regen_only:
        return

    from tyrant_tpu.config import RenderConfig
    from tyrant_tpu.ops.pallas.traverse_kernel import (PacketTables,
                                                       any_hit_packets,
                                                       closest_hit_packets)
    from tyrant_tpu.scene.scene import Scene

    if args.scene == "dragon":
        scene = Scene.load("/root/reference/PathTracer/Data/dragon.ply")
    else:
        from tyrant_tpu.scene.procgen import benchmark_scene
        v0, v1, v2 = benchmark_scene(1_048_576)
        scene = Scene.from_triangles(v0, v1, v2)
    sd = scene.to_device()
    tables = PacketTables(sd.bvh)
    print(f"rows={tables.rows.shape} fits_vmem={tables.fits} "
          f"depth={getattr(tables, 'max_depth', '?')}", file=sys.stderr)

    data = np.load(path)
    N = args.rays
    for label in ("pri", "mix"):
        o = jnp.asarray(data[f"{label}_o"][:N])
        d = jnp.asarray(data[f"{label}_d"][:N])
        for wave in ((False,) if args.mono
                     else (True,) if args.wave else (False, True)):
            tag = "wave" if wave else "mono"
            f = jax.jit(lambda oo, dd: closest_hit_packets(
                oo, dd, tables, wave=wave, treelet_rows=args.treelet))
            t, (tt, hh) = timeit(f, o, d)
            mrays = N / t / 1e3
            hitfrac = float(jnp.mean((hh >= 0).astype(jnp.float32)))
            print(f"closest {label} {tag}: {t:7.1f} ms  {mrays:6.1f} Mrays/s"
                  f"  hit={hitfrac:.2f}")
            if args.anyhit:
                maxd = jnp.where(tt < 1e19, tt, 100.0)
                fa = jax.jit(lambda oo, dd, m: any_hit_packets(
                    oo, dd, m, tables, wave=wave,
                    treelet_rows=args.treelet))
                t, _ = timeit(fa, o, d, maxd)
                print(f"anyhit  {label} {tag}: {t:7.1f} ms  "
                      f"{N / t / 1e3:6.1f} Mrays/s")


if __name__ == "__main__":
    main()
