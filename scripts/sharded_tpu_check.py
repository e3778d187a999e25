"""Execute the sharded PACKET-KERNEL path on real TPU hardware.

The CPU test mesh proves the shard_map plumbing with the kernel in
interpret mode; the shard_map + compiled-Mosaic interaction can only be
proven on the chip (VERDICT r2 item 6b).  This runs the sharded step on a
1-device TPU ``Mesh`` — same shard_map program, same replicated fat-row
table, compiled Pallas kernels — and compares per-ray step time against the
plain single-chip Renderer.

Usage: python scripts/sharded_tpu_check.py [--rays N]
Prints PASS if the sharded step is finite and within 25% of the
single-chip step (round-1 done criterion was ~10%; 25% allows for the
per-shard scalar-vector plumbing at 1 device).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=2 * 1_048_576)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tyrant_tpu.bench.harness import _camera_for_pose
    from tyrant_tpu.config import RenderConfig
    from tyrant_tpu.parallel import sharded
    from tyrant_tpu.render import Renderer
    from tyrant_tpu.scene.scene import Scene

    backend = jax.default_backend()
    if backend == "cpu":
        print("FAIL: needs a TPU backend (got cpu)")
        return 1

    scene = Scene.load("/root/reference/PathTracer/Data/dragon.ply")
    cfg = RenderConfig(width=1920, height=1080, num_rays=args.rays,
                       max_bounces=5, use_packet_kernel="on")
    cam = _camera_for_pose(0)

    def sync(x):
        return float(jnp.sum(x))

    def timed_steps(stepper, n=4):
        t0 = time.perf_counter()
        stepper.step(cam, n)
        sync(stepper.state.accum)
        return (time.perf_counter() - t0) / n * 1e3

    mesh = sharded.make_mesh(jax.devices()[:1])
    rs = sharded.ShardedRenderer(scene, cfg, mesh=mesh)
    assert rs.packet_tables is not None, "packet tables must be active"
    rs.step(cam, 2)  # compile + steady state
    sync(rs.state.accum)
    ms_sharded = timed_steps(rs)
    acc = np.asarray(rs.state.accum)
    finite = bool(np.isfinite(acc).all() and (acc[:, 3] > 0).any())
    del rs

    r1 = Renderer(scene, cfg, donate=False)
    r1.step(cam, 2)
    sync(r1.state.accum)
    ms_single = timed_steps(r1)

    ratio = ms_sharded / ms_single
    print(f"backend={backend} sharded(1-dev mesh) {ms_sharded:.1f} ms/step  "
          f"single-chip {ms_single:.1f} ms/step  ratio {ratio:.3f}  "
          f"finite={finite}")
    ok = finite and ratio < 1.25
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
