"""On-chip benchmark + per-level decomposition for the level-stream
kernel (ops/pallas/stream_kernel.py) on the real cached wavefronts.

Round-4/5 results (v5e; docs/PERFORMANCE.md round-4/5 logs): exact vs
the packet kernels at every size tested.  Round 5's vector-domain
emission cut the per-block floor 26 -> 15 us but the 2M terrain mix
only moved 3.48 -> 3.40 s (vs the wave packet kernel's 396 ms): the
per-level mode below located the binding term — deep-level
run-fragmented per-instance serial work at a fitted ~5-14 us/instance —
and the mapping is closed (round-5 log, closure + addendum).

Usage:
  python scripts/stream_bench.py [--scene terrain1m|dragon]
      [--workload mix|pri] [--cap 2] [--verify] [--levels]
Needs the cached wavefront from scripts/kernel_bench.py --regen-only.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="terrain1m")
    ap.add_argument("--workload", default="mix", choices=["mix", "pri"])
    ap.add_argument("--rays", type=int, default=2 * 1_048_576)
    ap.add_argument("--cap", type=int, default=2,
                    help="frontier capacity multiple (cap_mult)")
    ap.add_argument("--verify", action="store_true",
                    help="compare ids against the packet kernel")
    ap.add_argument("--levels", action="store_true",
                    help="per-level timing decomposition (jit per level)")
    args = ap.parse_args()

    from tyrant_tpu.ops.pallas.traverse_kernel import PacketTables
    from tyrant_tpu.scene.scene import Scene

    if args.scene == "dragon":
        scene = Scene.load("/root/reference/PathTracer/Data/dragon.ply")
    else:
        from tyrant_tpu.scene.procgen import benchmark_scene
        v0, v1, v2 = benchmark_scene(1_048_496)
        scene = Scene.from_triangles(v0, v1, v2)
    sd = scene.to_device()
    tables = PacketTables(sd.bvh)
    print(f"rows {tables.rows.shape}", flush=True)

    cache = f"/tmp/kernel_bench_{args.scene}_{args.rays}.npz"
    if not os.path.exists(cache):
        sys.exit(f"{cache} missing — run kernel_bench.py --regen-only")
    data = np.load(cache)
    o = jnp.asarray(data[f"{args.workload}_o"])
    d = jnp.asarray(data[f"{args.workload}_d"])
    n = o.shape[0]
    t0v = jnp.full((n,), 1e20, jnp.float32)

    if args.levels:
        _per_level(tables, o, d, args.cap)
        return

    from tyrant_tpu.ops.pallas.stream_kernel import _stream_impl
    t0 = time.time()
    comp = _stream_impl.lower(tables.rows, o, d, t0v, interpret=False,
                              cap_mult=args.cap).compile()
    print(f"compiled in {time.time() - t0:.0f}s", flush=True)
    comp(tables.rows, o, d, t0v)[0].block_until_ready()
    for _ in range(3):
        t1 = time.perf_counter()
        t_s, id_s, ovf = comp(tables.rows, o, d, t0v)
        float(jnp.sum(t_s))
        dt = (time.perf_counter() - t1) * 1e3
        print(f"stream {args.workload}: {dt:.1f} ms  "
              f"{n / dt / 1e3:.1f} Mrays/s  ovf={int(ovf)}", flush=True)
    if args.verify:
        from tyrant_tpu.ops.pallas.traverse_kernel import \
            closest_hit_packets
        t_p, id_p = closest_hit_packets(o, d, tables)
        bad = int(jnp.sum((id_p != id_s).astype(jnp.int32)))
        print(f"vs packet kernel: {bad}/{n} id mismatches", flush=True)


def _per_level(tables, o, d, cap_mult):
    from jax.experimental import pallas as pl

    from tyrant_tpu.ops.pallas import stream_kernel as sk

    o = np.asarray(o)
    d = np.asarray(d)
    npad = o.shape[0]
    cap_tiles = ((pl.cdiv(cap_mult * npad, 128) + 7) // 8) * 8

    def tiles_of(*fields):
        planes = [np.asarray(f).reshape(npad // 128, 128) for f in fields]
        planes += [np.zeros((npad // 128, 128), np.float32)] \
            * (sk.NFIELD - len(planes))
        t = np.stack(planes, axis=1)
        return np.concatenate(
            [t, np.zeros((cap_tiles - t.shape[0], sk.NFIELD, 128),
                         np.float32)], 0)

    t0p = np.full(npad, 1e20, np.float32)
    q = jnp.asarray(tiles_of(o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1],
                             d[:, 2], t0p,
                             np.arange(npad, dtype=np.float32),
                             np.zeros(npad, np.float32)))
    rt = jnp.zeros((cap_tiles, 2, 128), jnp.float32)
    qs, rts = jnp.zeros_like(q), jnp.zeros_like(rt)
    hq = jnp.full((cap_tiles, sk.NFIELD, 128), -1.0, jnp.float32)
    np_pairs, hbase = npad, 0
    run = jax.jit(sk._run_level, static_argnums=(8, 9, 10),
                  donate_argnums=(3, 4))
    level, total = 0, 0.0
    while np_pairs > 0 and level < 40:
        t0 = time.perf_counter()
        qo, rto, hqo, nout, hout, ovf = run(
            tables.rows, q, rt, qs, rts, hq, np_pairs, hbase, cap_tiles,
            cap_tiles, False)
        float(jnp.sum(nout))
        dt = (time.perf_counter() - t0) * 1e3
        blocks = (np_pairs + 1023) // 1024
        print(f"level {level:2d}: {np_pairs:9d} pairs {blocks:5d} blocks "
              f"{dt:7.1f} ms  {dt * 1e3 / max(blocks, 1):6.1f} us/blk "
              f"ovf={int(ovf[0])}", flush=True)
        total += dt
        q, rt, qs, rts, hq = qo, rto, q, rt, hqo
        np_pairs, hbase = int(nout[0]), int(hout[0])
        level += 1
    print(f"total {total:.0f} ms (incl. per-level dispatch syncs; level 0 "
          f"carries the compile)")


if __name__ == "__main__":
    main()
