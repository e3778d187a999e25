"""Round-3 scout: full decomposition of a STEADY-STATE wavefront step.

The existing stage_profile times the fresh-primary stages from an initial
state; this script reaches steady state first (carried bounce tail present)
and then times every component of the real step — raygen, extend, shade,
connect, the 14-operand compaction sort, and the accumulation kernel — on
the true steady-state inputs.  Each number carries the ~20 ms axon-relay
sync tax; subtract it mentally for device time.

Usage: python scripts/steady_profile.py [--scene dragon|terrain1m] [--rays N]
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
    return float(jnp.sum(jnp.abs(jax.tree.leaves(x)[0])))


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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=2 * 1_048_576)
    ap.add_argument("--scene", default="dragon")
    ap.add_argument("--pose", type=int, default=0)
    args = ap.parse_args()

    from tyrant_tpu.bench.harness import _camera_for_pose
    from tyrant_tpu.config import RenderConfig
    from tyrant_tpu.render import (RenderState, Renderer, _connect,
                                   _intersect_scene, _pick_wave, _raygen,
                                   _shade, render_step, _KEY_GRID)
    from tyrant_tpu.scene.scene import Scene
    from tyrant_tpu import sky as skymod

    if args.scene == "dragon":
        scene = Scene.load("/root/reference/PathTracer/Data/dragon.ply")
    else:
        from tyrant_tpu.scene.procgen import benchmark_scene
        v0, v1, v2 = benchmark_scene(1_048_576)
        scene = Scene.from_triangles(v0, v1, v2)
    cfg = RenderConfig(width=1920, height=1080, num_rays=args.rays,
                       max_bounces=5, use_packet_kernel="on")
    r = Renderer(scene, cfg, donate=False)
    cam = _camera_for_pose(args.pose)
    r.step(cam, 8)
    sync(r.state.accum)
    st = r.state
    sd = r.scene
    tables = r.packet_tables
    wave = _pick_wave(cfg, tables)
    camd = cam.to_device(cfg)
    n = cfg.num_rays
    print(f"scene={args.scene} wave={wave} carried={int(st.n_carried)}/{n}",
          file=sys.stderr)

    res = {}

    # 1. raygen
    raygen = jax.jit(lambda s: _raygen(cfg, camd, s.start_position, s.frame,
                                       cfg.height, 0))
    res["raygen"], gen = timeit(raygen, st)

    # the real merged wavefront
    slot = jnp.arange(n, dtype=jnp.int32)
    keep = slot >= (n - st.n_carried)

    def merge(car, new):
        m = keep[:, None] if new.ndim == 2 else keep
        return jnp.where(m, car, new)

    rays = dict(origin=merge(st.origin, gen["origin"]),
                direction=merge(st.direction, gen["direction"]),
                direct=merge(st.direct, gen["direct"]),
                pending=merge(st.pending, gen["pending"]),
                pixel=merge(st.pixel, gen["pixel"]),
                bounces=merge(st.bounces, gen["bounces"]),
                last_specular=merge(st.last_specular, gen["last_specular"]))
    rays = jax.tree.map(jnp.asarray, rays)

    # 2. extend on the real mix
    extend = jax.jit(lambda o, d: _intersect_scene(
        o, d, sd, packet_tables=tables, wave=wave))
    res["extend(mix)"], ext = timeit(extend, rays["origin"],
                                     rays["direction"])

    # 3. shade on the real hits
    shade = jax.jit(lambda rr, t, i, tri, tn: _shade(
        cfg, sd, r.sky_params, r.sun_dir, rr, t, i, tri, st.frame,
        tri_normal=tn))
    res["shade"], sh = timeit(shade, rays, *ext)
    color, terminated, survive, next_rays, shadow = sh
    vfrac = float(jnp.mean(shadow["valid"].astype(jnp.float32)))
    print(f"shadow valid frac = {vfrac:.2f}", file=sys.stderr)

    # 4. connect on the real shadow wavefront
    connect = jax.jit(lambda s: _connect(sd, s, packet_tables=tables,
                                         wave=wave))
    res["connect(mix)"], _ = timeit(connect, shadow)

    # 5. the compaction sort exactly as render_step builds it (the key is
    # the SHARED production helper, so this never drifts from render_step)
    def compact(next_rays, survive, pend):
        from tyrant_tpu.ops.pallas.accum_kernel import sentinel
        from tyrant_tpu.render import compaction_sort_key
        sent = sentinel(cfg.width * cfg.height)
        key = compaction_sort_key(next_rays, survive, sd.bvh.node_packed,
                                  sent)
        packed = (next_rays["pixel"] << 5) | (next_rays["bounces"] << 1) \
            | next_rays["last_specular"].astype(jnp.int32)
        o, d, dr = (next_rays["origin"], next_rays["direction"],
                    next_rays["direct"])
        return jax.lax.sort(
            (key, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
             dr[:, 0], dr[:, 1], dr[:, 2], pend[:, 0], pend[:, 1],
             pend[:, 2], packed), num_keys=1)

    shadow_contrib = connect(shadow)
    pend = rays["pending"] + color + shadow_contrib
    res["sort14"], sorted_ = timeit(jax.jit(compact), next_rays, survive,
                                    pend)

    # 6. accumulation kernel on the sorted output
    from tyrant_tpu.ops.pallas.accum_kernel import (accumulate_sorted,
                                                    sentinel)
    key_s, p0, p1, p2 = sorted_[0], sorted_[10], sorted_[11], sorted_[12]
    sent = sentinel(cfg.width * cfg.height)
    term_s = key_s < sent
    upd_pix = jnp.minimum(key_s, sent)
    upd_vals = jnp.where(term_s[:, None],
                         jnp.stack([p0, p1, p2, jnp.ones_like(p0)], axis=1),
                         0.0)
    res["accum"], _ = timeit(jax.jit(accumulate_sorted), st.accum, upd_pix,
                             upd_vals)

    # 7. the full fused step
    from functools import partial
    full = jax.jit(partial(render_step, cfg=cfg, sky_params=r.sky_params,
                           packet_tables=tables))
    res["full_step"], _ = timeit(lambda: full(st, sd, camd, r.sun_dir))

    stage_sum = sum(v for k, v in res.items() if k != "full_step")
    print(f"\n=== steady-state step decomposition ({args.scene}, "
          f"{n} rays, pose {args.pose}) ===")
    for k, v in res.items():
        print(f"  {k:14s} {v:7.1f} ms")
    print(f"  {'stage sum':14s} {stage_sum:7.1f} ms "
          f"(each stage carries ~20 ms sync tax)")


if __name__ == "__main__":
    main()
