"""A/B: per-step jit dispatch vs one jitted lax.scan over k steps.

Each Renderer.step dispatch is a host->device round over the axon tunnel;
fusing k wavefront steps into one jit (lax.scan over the RenderState carry)
removes k-1 dispatches and lets XLA overlap cross-step work.  If the win is
real it helps the bench (which times step chains) and the interactive
viewer (steps_per_frame > 1) alike.

Usage: python scripts/scan_fuse_bench.py [--scene dragon|terrain1m]
       [--rays N] [--k 8]
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=2 * 1_048_576)
    ap.add_argument("--scene", default="dragon")
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--pose", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tyrant_tpu.bench.harness import _camera_for_pose
    from tyrant_tpu.config import RenderConfig
    from tyrant_tpu.render import Renderer, render_step
    from tyrant_tpu.scene.scene import Scene

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
    camd = cam.to_device(cfg)
    k = args.k

    # steady state first (single dispatches: don't compile a warmup chain)
    r._fuse = False
    r.step(cam, 6)
    float(jnp.sum(r.state.accum))

    def time_chain(fn, state, reps=5):
        best = []
        for _ in range(reps):
            t0 = time.perf_counter()
            state = fn(state)
            float(jnp.sum(state.accum))
            best.append(time.perf_counter() - t0)
        best.sort()
        return best[len(best) // 2] * 1e3 / k, state

    # A: k individual dispatches (today's Renderer loop)
    def chain_a(state):
        for _ in range(k):
            state = r._step(state, r.scene, camd, r.sun_dir)
        return state

    # warmup/compile
    st = chain_a(r.state)
    float(jnp.sum(st.accum))
    ms_a, st = time_chain(chain_a, st)
    print(f"A: {k} dispatched steps : {ms_a:7.1f} ms/step")

    # B: one jit, lax.scan over k steps
    step = partial(render_step, cfg=cfg, sky_params=r.sky_params,
                   packet_tables=r.packet_tables)

    @jax.jit
    def chain_b(state):
        def body(s, _):
            return step(s, r.scene, camd, r.sun_dir), None
        return jax.lax.scan(body, state, None, length=k)[0]

    st = chain_b(st)
    float(jnp.sum(st.accum))
    ms_b, st = time_chain(chain_b, st)
    print(f"B: lax.scan({k}) fused  : {ms_b:7.1f} ms/step")
    print(f"delta: {ms_a - ms_b:+.1f} ms/step ({(ms_a / ms_b - 1) * 100:+.1f}%)")


if __name__ == "__main__":
    main()
