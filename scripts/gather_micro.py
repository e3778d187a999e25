"""Microbench: the gather costs inside _shade at 2M rays (round-2 scout).

Hypothesis: shade's ~8 independent table gathers (5 sphere columns + 3
triangle columns) dominate its 106 ms, at the ~166M rows/s v5e gather
ceiling.  Tests packing strategies: one wide row per table, one-hot matmul
for the tiny sphere table.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=5, warmup=2):
    f = jax.jit(fn)
    for _ in range(warmup):
        out = f(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        float(jnp.sum(jax.tree.leaves(out)[0]))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] * 1e3


def main():
    N = 2 * 1_048_576
    T = 38_000
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    tid = jax.random.randint(k1, (N,), 0, T, jnp.int32)
    sid = jax.random.randint(k1, (N,), 0, 7, jnp.int32)

    tbl12 = jax.random.normal(k2, (T, 12), jnp.float32)
    tbl16 = jax.random.normal(k2, (T, 16), jnp.float32)
    tbl8 = jax.random.normal(k2, (T, 8), jnp.float32)
    tbl1 = jax.random.normal(k2, (T,), jnp.float32)
    tbl3 = jax.random.normal(k2, (T, 3), jnp.float32)
    sph3 = jax.random.normal(k2, (7, 3), jnp.float32)
    sph16 = jax.random.normal(k2, (8, 16), jnp.float32)

    print(f"[T,12] gather 2M: {timeit(lambda t, i: t[i], tbl12, tid):.1f} ms")
    print(f"[T,16] gather 2M: {timeit(lambda t, i: t[i], tbl16, tid):.1f} ms")
    print(f"[T,8]  gather 2M: {timeit(lambda t, i: t[i], tbl8, tid):.1f} ms")
    print(f"[T]    gather 2M: {timeit(lambda t, i: t[i], tbl1, tid):.1f} ms")
    print(f"[T,3]  gather 2M: {timeit(lambda t, i: t[i], tbl3, tid):.1f} ms")
    print(f"3 indep gathers ([T,12]+[T]+[T,3]): "
          f"{timeit(lambda a, b, c, i: (a[i], b[i], c[i]), tbl12, tbl1, tbl3, tid):.1f} ms")
    print(f"[7,3] sphere gather 2M: {timeit(lambda t, i: t[i], sph3, sid):.1f} ms")
    print(f"5 indep sphere gathers: "
          f"{timeit(lambda t, i: (t[i], t[i] + 1, t[i] * 2, t[i] - 1, t[i] * 3), sph3, sid):.1f} ms")

    def onehot_fetch(t, i):
        oh = (i[:, None] == jnp.arange(8, dtype=jnp.int32)[None]).astype(
            jnp.bfloat16)
        return jnp.dot(oh, t.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)

    print(f"one-hot matmul [2M,8]x[8,16]: {timeit(onehot_fetch, sph16, sid):.1f} ms")

    def select_fetch(t, i):
        acc = jnp.zeros((i.shape[0], 16), jnp.float32)
        for s in range(7):
            acc = jnp.where((i == s)[:, None], t[s][None], acc)
        return acc

    print(f"select chain 7x16: {timeit(select_fetch, sph16, sid):.1f} ms")

    # raygen cost check
    from tyrant_tpu.camera import Camera
    from tyrant_tpu.config import RenderConfig
    from tyrant_tpu.render import _raygen
    cfg = RenderConfig(width=1920, height=1080, num_rays=N)
    cam = Camera().to_device(cfg)
    t = timeit(lambda s, f: _raygen(cfg, cam, s, f, cfg.height, 0),
               jnp.asarray(0, jnp.int32), jnp.asarray(1, jnp.uint32))
    print(f"_raygen 2M: {t:.1f} ms")

    # sky cost check
    from tyrant_tpu import sky as skymod
    d = jax.random.normal(k2, (N, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    sp = skymod.SkyParams(cfg.sky)
    sund = skymod.sun_direction_from_position(jnp.asarray([0.05, 0.3]))
    t = timeit(lambda dd: skymod.sky_and_sunsky(dd, sund, sp), d)
    print(f"sky_and_sunsky 2M: {t:.1f} ms")
    t = timeit(lambda dd: skymod.sun(dd, sund, sp), d)
    print(f"sun 2M: {t:.1f} ms")


if __name__ == "__main__":
    main()
