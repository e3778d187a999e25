"""Round-3 step-plumbing micros: sort operand scaling + shade components.

1. Does the 14-operand compaction multisort's cost scale with operand
   count?  (If yes, payload slimming — octahedral directions, bf16 pending
   — buys real ms; if the cost is key-comparison-bound, it buys nothing.)
2. What do the shade stage's components cost in isolation: the 8-iteration
   phong rejection loop, sky_and_sunsky, sun+cone NEE sampling?

Usage: python scripts/step_micro.py [--rays N] [--phase sort|key|shade]

Each phase is sized to stay well under the axon tunnel's patience (every
jit costs 20-90 s of remote compile; a client killed mid-TPU-call wedges
the worker for 15-60 min) and prints incrementally with flush=True.
"""

import argparse
import functools
import os
import sys
import time

print = functools.partial(print, flush=True)

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
    return ts[len(ts) // 2] * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=2 * 1_048_576)
    ap.add_argument("--phase", default="sort",
                    choices=("sort", "key", "shade"))
    args = ap.parse_args()
    n = args.rays

    key = jax.random.PRNGKey(0)
    ki = jax.random.randint(key, (n,), 0, 1 << 22, jnp.int32)
    fs = [jax.random.normal(jax.random.fold_in(key, i), (n,), jnp.float32)
          for i in range(13)]

    if args.phase == "sort":
        print("== lax.sort operand scaling (2M u32 key + k f32 payloads) ==")
        for k in (0, 3, 9, 13):
            ops = (ki, *fs[:k])
            f = jax.jit(lambda *a: jax.lax.sort(a, num_keys=1))
            ms = timeit(f, *ops)
            print(f"  payloads={k:2d}: {ms:7.1f} ms")
        return

    if args.phase == "key":
        print("== sort key dtype ==")
        kf = ki.astype(jnp.float32)
        for name, kk in (("u32", ki), ("f32", kf)):
            f = jax.jit(lambda *a: jax.lax.sort(a, num_keys=1))
            ms = timeit(f, kk, *fs[:6])
            print(f"  key={name}, 6 payloads: {ms:7.1f} ms")
        return

    # --- phase "shade": components on a synthetic wavefront ---
    from tyrant_tpu import sky as skymod
    from tyrant_tpu.config import RenderConfig
    from tyrant_tpu.ops import rng as rngmod
    from tyrant_tpu.ops.sampling import (cone_sample, dot, normalize,
                                         phong_lobe_sample)

    cfg = RenderConfig(width=1920, height=1080, num_rays=n)
    sky_params = skymod.SkyParams(cfg.sky)
    sun_dir = skymod.sun_direction_from_position(jnp.asarray((0.05, 0.3)))
    d = jax.random.normal(key, (n, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    normal = jnp.abs(d)
    normal = normal / jnp.linalg.norm(normal, axis=1, keepdims=True)
    seed0 = rngmod.seed_from(jnp.asarray(3, jnp.uint32),
                             jnp.arange(n, dtype=jnp.int32), 0, 0x5ADE)

    print("== shade components ==")

    def sky_fused(dd):
        return skymod.sky_and_sunsky(dd, sun_dir, sky_params)

    print(f"  sky_and_sunsky      : {timeit(jax.jit(sky_fused), d):7.1f} ms")

    def sun_only(dd):
        return skymod.sun(dd, sun_dir, sky_params)

    print(f"  sun (NEE radiance)  : {timeit(jax.jit(sun_only), d):7.1f} ms")

    def cone(seed):
        se = 1.0 - sky_params.sun_angular_diameter_cos
        return cone_sample(jnp.broadcast_to(sun_dir, (n, 3)), se, seed)[1]

    print(f"  cone_sample         : {timeit(jax.jit(cone), seed0):7.1f} ms")

    pe = 40.0
    w_refl = normalize(d - normal * (2.0 * dot(normal, d))[:, None])

    def phong_loop(seed, iters):
        def it(_, carry):
            s, cur, ok = carry
            s, cand = phong_lobe_sample(w_refl, pe, s)
            take = ~ok & (dot(cand, normal) > 1e-3)
            cur = jnp.where(take[:, None], cand, cur)
            return s, cur, ok | take

        s, cand0 = phong_lobe_sample(w_refl, pe, seed)
        ok0 = dot(cand0, normal) > 1e-3
        s, out, ok = jax.lax.fori_loop(0, iters, it, (s, cand0, ok0))
        return jnp.where(ok[:, None], out, w_refl)

    for iters in (8, 2, 0):
        f = jax.jit(lambda s, i=iters: phong_loop(s, i))
        print(f"  phong loop iters={iters} : {timeit(f, seed0):7.1f} ms")


if __name__ == "__main__":
    main()
