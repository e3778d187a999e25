"""Round-2 perf scout: true per-component costs of one 2M wavefront step
on the real TPU, plus microbenches of the suspect ops (compaction sort,
scatter-add, gathers).  Run: python scripts/profile_step.py [--rays N]

Not part of the library; findings land in docs/PERFORMANCE.md.
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
    return float(jnp.sum(jnp.abs(x) if x.dtype != bool else x))


def timeit(fn, *args, reps=5, warmup=2, **kw):
    for _ in range(warmup):
        out = fn(*args, **kw)
    leaves = jax.tree.leaves(out)
    sync(leaves[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        sync(jax.tree.leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] * 1e3, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=2 * 1_048_576)
    ap.add_argument("--micro-only", action="store_true")
    ap.add_argument("--skip-micro", action="store_true")
    args = ap.parse_args()
    N = args.rays

    print(f"backend={jax.default_backend()} N={N}", file=sys.stderr)

    key = jax.random.PRNGKey(0)

    if not args.skip_micro:
        # --- microbench: compaction-style sort + payload application ---
        k1, k2 = jax.random.split(key)
        keys32 = jax.random.randint(k1, (N,), 0, 8 * 8 ** 3, jnp.int32)
        payload3 = jax.random.normal(k2, (N, 3), jnp.float32)
        p3b = payload3 + 1.0
        p3c = payload3 + 2.0
        pi = jnp.arange(N, dtype=jnp.int32)
        pb = pi + 1

        t, _ = timeit(jax.jit(lambda k: jnp.argsort(k)), keys32)
        print(f"argsort[{N}] i32: {t:.1f} ms")

        def argsort_gather(k, a, b, c, d, e):
            o = jnp.argsort(k, stable=True)
            return a[o], b[o], c[o], d[o], e[o]

        t, _ = timeit(jax.jit(argsort_gather), keys32, payload3, p3b, p3c,
                      pi, pb)
        print(f"argsort + 3x[N,3] + 2x[N] gathers: {t:.1f} ms")

        def multisort(k, a, b, c, d, e):
            return jax.lax.sort((k, a[:, 0], a[:, 1], a[:, 2],
                                 b[:, 0], b[:, 1], b[:, 2],
                                 c[:, 0], c[:, 1], c[:, 2], d, e),
                                num_keys=1)

        t, _ = timeit(jax.jit(multisort), keys32, payload3, p3b, p3c, pi, pb)
        print(f"lax.sort key + 11 operand columns: {t:.1f} ms")

        # --- scatter-add variants into a 2M x 4 framebuffer ---
        P = 1920 * 1080
        pix = jax.random.randint(k1, (N,), 0, P, jnp.int32)
        upd = jax.random.normal(k2, (N, 4), jnp.float32)
        fb = jnp.zeros((P, 4), jnp.float32)

        t, _ = timeit(jax.jit(lambda f, p, u: f.at[p].add(u)), fb, pix, upd)
        print(f"scatter-add random [N->P,4]: {t:.1f} ms")

        pix_sorted = jnp.sort(pix)
        t, _ = timeit(jax.jit(lambda f, p, u: f.at[p].add(
            u, indices_are_sorted=True)), fb, pix_sorted, upd)
        print(f"scatter-add sorted+hint: {t:.1f} ms")

        t, _ = timeit(jax.jit(
            lambda f, p, u: f + jax.ops.segment_sum(u, p, num_segments=P,
                                                    indices_are_sorted=True)),
            fb, pix_sorted, upd)
        print(f"segment_sum sorted+hint: {t:.1f} ms")

        # one-column scatter vs 4: is it width- or row-bound?
        t, _ = timeit(jax.jit(lambda f, p, u: f.at[p].add(u)),
                      jnp.zeros((P,), jnp.float32), pix, upd[:, 0])
        print(f"scatter-add random [N->P,1]: {t:.1f} ms")

        # --- compaction-sort alternatives (round 2): 14-operand multisort
        # vs (key, idx) sort + one packed-matrix gather ---
        cols13 = [payload3[:, i % 3] + i for i in range(13)]

        def multisort14(k, cols):
            return jax.lax.sort((k, *cols), num_keys=1)

        t, _ = timeit(jax.jit(multisort14), keys32, cols13)
        print(f"lax.sort key + 13 operands: {t:.1f} ms")

        def sort2_gather(k, cols):
            idx = jnp.arange(k.shape[0], dtype=jnp.int32)
            _, idx_s = jax.lax.sort((k, idx), num_keys=1)
            mat = jnp.stack(cols, axis=1)
            return mat[idx_s]

        t, _ = timeit(jax.jit(sort2_gather), keys32, cols13)
        print(f"sort(key,idx) + [N,13] gather: {t:.1f} ms")

        # --- raygen + sky costs at N ---
        from tyrant_tpu import sky as skymod
        from tyrant_tpu.camera import Camera
        from tyrant_tpu.config import RenderConfig as _RC
        from tyrant_tpu.render import _raygen
        _cfg = _RC(width=1920, height=1080, num_rays=N)
        _cam = Camera().to_device(_cfg)
        t, _ = timeit(jax.jit(lambda s, f: _raygen(_cfg, _cam, s, f,
                                                   _cfg.height, 0)),
                      jnp.asarray(0, jnp.int32), jnp.asarray(1, jnp.uint32))
        print(f"_raygen {N}: {t:.1f} ms")
        dirs = payload3 / jnp.linalg.norm(payload3, axis=1, keepdims=True)
        sp = skymod.SkyParams(_cfg.sky)
        sund = skymod.sun_direction_from_position(jnp.asarray([0.05, 0.3]))
        t, _ = timeit(jax.jit(
            lambda dd: skymod.sky_and_sunsky(dd, sund, sp)), dirs)
        print(f"sky_and_sunsky {N}: {t:.1f} ms")
        t, _ = timeit(jax.jit(lambda dd: skymod.sun(dd, sund, sp)), dirs)
        print(f"sun {N}: {t:.1f} ms")

    if args.micro_only:
        return

    # --- the full step, stage by stage ---
    from tyrant_tpu.bench.harness import _camera_for_pose
    from tyrant_tpu.config import RenderConfig
    from tyrant_tpu.render import Renderer
    from tyrant_tpu.scene.scene import Scene
    from tyrant_tpu.utils.profiling import stage_profile

    scene = Scene.load("/root/reference/PathTracer/Data/dragon.ply")
    cfg = RenderConfig(width=1920, height=1080, num_rays=N,
                       max_bounces=5, use_packet_kernel="on")
    r = Renderer(scene, cfg, donate=False)
    cam = _camera_for_pose(0)
    # reach bounce-heavy steady state first
    r.step(cam, 6)
    sync(r.state.accum)
    prof = stage_profile(r, cam, n_steps=5)
    for k, v in prof.items():
        print(f"{k}: {v:.2f}")

    # full step minus pieces: isolate accumulation+compaction cost by
    # comparing full_step to stage sum
    print("residual (full - raygen-extend-shade-connect): "
          f"{prof['full_step_ms'] - prof['stage_sum_ms']:.2f} ms")


if __name__ == "__main__":
    main()
