"""A/B bench for the connect (shadow) pass on real steady-state shadow
wavefronts (round-3 item 1: connect cost ~= extend cost, yet shadow rays
are structurally easier).

Captures the exact shadow wavefront a steady-state render step traces
(carried survivors + fresh top-off -> extend -> shade), then times:
  a) unsplit any-hit over the full mixed wavefront (round-2 behaviour),
  b) the parity split: two half-wavefronts that are each PURE
     (all-sun-rays / all-light-rays) by _shade's deterministic NEE split,
  c) each half separately (who is the expensive one?),
  d) split + per-half origin-cell sort (upper bound for re-sorting gains;
     sort cost reported separately).

Usage: python scripts/connect_bench.py [--rays N] [--scene dragon|terrain1m]
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


def load_scene(name):
    from tyrant_tpu.scene.scene import Scene
    if name == "dragon":
        return Scene.load("/root/reference/PathTracer/Data/dragon.ply")
    from tyrant_tpu.scene.procgen import benchmark_scene
    v0, v1, v2 = benchmark_scene(1_048_576)
    return Scene.from_triangles(v0, v1, v2)


def build_shadow_workload(scene, n_rays, path):
    """The shadow wavefront of a steady-state step: replicate render_step's
    merge -> extend -> shade on the renderer's carried state."""
    from tyrant_tpu.bench.harness import _camera_for_pose
    from tyrant_tpu.config import RenderConfig
    from tyrant_tpu.render import (Renderer, _intersect_scene, _raygen,
                                   _shade)

    cfg = RenderConfig(width=1920, height=1080, num_rays=n_rays,
                       max_bounces=5, use_packet_kernel="on")
    r = Renderer(scene, cfg, donate=False)
    cam = _camera_for_pose(0)
    r.step(cam, 6)
    sync(r.state.accum)
    st = r.state
    gen = _raygen(cfg, cam.to_device(cfg), st.start_position, st.frame,
                  cfg.height, 0)
    keep = jnp.arange(n_rays) >= (n_rays - st.n_carried)

    def merge(car, new):
        m = keep[:, None] if new.ndim == 2 else keep
        return jnp.where(m, car, new)

    rays = dict(
        origin=merge(st.origin, gen["origin"]),
        direction=merge(st.direction, gen["direction"]),
        direct=merge(st.direct, gen["direct"]),
        pending=merge(st.pending, gen["pending"]),
        pixel=merge(st.pixel, gen["pixel"]),
        bounces=merge(st.bounces, gen["bounces"]),
        last_specular=merge(st.last_specular, gen["last_specular"]),
    )
    t, ident, is_tri, _tn = _intersect_scene(rays["origin"], rays["direction"],
                                        scene.to_device(),
                                        packet_tables=r.packet_tables)
    _, _, _, _, shadow = _shade(cfg, scene.to_device(), r.sky_params,
                                r.sun_dir, rays, t, ident, is_tri, st.frame)
    maxd = jnp.where(shadow["valid"], shadow["max_dist"], 0.0)
    np.savez(path, o=np.asarray(shadow["origin"]),
             d=np.asarray(shadow["direction"]), maxd=np.asarray(maxd))
    print(f"saved shadow workload ({float(jnp.mean(shadow['valid'].astype(jnp.float32))):.2f} valid) to {path}",
          file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=2 * 1_048_576)
    ap.add_argument("--scene", default="dragon")
    ap.add_argument("--regen", action="store_true")
    ap.add_argument("--regen-only", action="store_true",
                    help="only (re)build the cached shadow wavefront")
    args = ap.parse_args()
    N = args.rays

    path = f"/tmp/connect_bench_{args.scene}_{N}.npz"
    scene = load_scene(args.scene)
    if args.regen or not os.path.exists(path):
        build_shadow_workload(scene, N, path)
    if args.regen_only:
        return

    from tyrant_tpu.ops.pallas.traverse_kernel import (PacketTables,
                                                       any_hit_packets)
    sd = scene.to_device()
    tables = PacketTables(sd.bvh)
    print(f"rows={tables.rows.shape} fits_vmem={tables.fits}",
          file=sys.stderr)

    data = np.load(path)
    o = jnp.asarray(data["o"][:N])
    d = jnp.asarray(data["d"][:N])
    maxd = jnp.asarray(data["maxd"][:N])

    f_all = jax.jit(lambda o, d, m: any_hit_packets(o, d, m, tables))
    t_all, _ = timeit(f_all, o, d, maxd)
    print(f"a) unsplit  anyhit {N}: {t_all:7.1f} ms "
          f"({N / t_all / 1e3:6.1f} Mrays/s)")

    # a') wave kernel on the same wavefront: ~32% of slots are valid, and
    # wave's per-128-subpacket early exit drains sparse-valid packets far
    # sooner than mono's all-1024 exit (round-3 hypothesis)
    f_wave = jax.jit(lambda o, d, m: any_hit_packets(o, d, m, tables,
                                                     wave=True))
    t_w, _ = timeit(f_wave, o, d, maxd)
    print(f"a') unsplit WAVE  {N}: {t_w:7.1f} ms "
          f"({N / t_w / 1e3:6.1f} Mrays/s)")

    def split(o, d, m):
        occ_e = any_hit_packets(o[0::2], d[0::2], m[0::2], tables)
        occ_o = any_hit_packets(o[1::2], d[1::2], m[1::2], tables)
        return jnp.stack([occ_e, occ_o], axis=1).reshape(-1)

    t_sp, _ = timeit(jax.jit(split), o, d, maxd)
    print(f"b) parity-split   : {t_sp:7.1f} ms "
          f"({N / t_sp / 1e3:6.1f} Mrays/s)")

    # which STRATEGY costs what?  The NEE choice is a per-ray coin
    # (render.py: packet-pure blocks were reverted), so slot parity does
    # NOT separate strategies — partition on the host by the actual
    # strategy signature instead (valid sun rays carry maxd == VERY_FAR,
    # valid light rays a finite distance, invalid slots 0), padding each
    # subset to whole packets with invalid slots (dropped from unions).
    maxd_h = np.asarray(maxd)
    sun_m = maxd_h > 1e19
    light_m = (maxd_h > 0) & ~sun_m
    for tag, m_h in (("sun  ", sun_m), ("light", light_m)):
        idx = np.nonzero(m_h)[0]
        pad = (-idx.size) % 1024
        oo = np.concatenate([np.asarray(o)[idx],
                             np.zeros((pad, 3), np.float32)])
        dd = np.concatenate([np.asarray(d)[idx],
                             np.ones((pad, 3), np.float32)])
        mm = np.concatenate([maxd_h[idx], np.zeros(pad, np.float32)])
        t_h, _ = timeit(jax.jit(
            lambda o, d, m: any_hit_packets(o, d, m, tables)),
            jnp.asarray(oo), jnp.asarray(dd), jnp.asarray(mm))
        print(f"c) {tag} subset ({idx.size}): {t_h:7.1f} ms")

    # d) per-half origin-cell sort upper bound (traversal only)
    lo = jnp.asarray(np.asarray(sd.bvh.node_packed)[0, 0:3])
    hi = jnp.asarray(np.asarray(sd.bvh.node_packed)[0, 3:6])
    span = jnp.maximum(hi - lo, 1e-3)

    def cell_sorted(o, d, m):
        g = 16
        q = jnp.clip(((o - lo) / span * g).astype(jnp.int32), 0, g - 1)
        key = (q[:, 0] * g + q[:, 1]) * g + q[:, 2]
        order = jnp.argsort(key)
        return o[order], d[order], m[order]

    for tag, m_h in (("sun  ", sun_m), ("light", light_m)):
        idx = np.nonzero(m_h)[0]
        pad = (-idx.size) % 1024
        oo = jnp.asarray(np.concatenate(
            [np.asarray(o)[idx], np.zeros((pad, 3), np.float32)]))
        dd = jnp.asarray(np.concatenate(
            [np.asarray(d)[idx], np.ones((pad, 3), np.float32)]))
        mm = jnp.asarray(np.concatenate(
            [maxd_h[idx], np.zeros(pad, np.float32)]))
        os_, ds_, ms_ = jax.jit(cell_sorted)(oo, dd, mm)
        os_, ds_, ms_ = jax.block_until_ready((os_, ds_, ms_))
        t_h, _ = timeit(jax.jit(
            lambda o, d, m: any_hit_packets(o, d, m, tables)), os_, ds_, ms_)
        print(f"d) {tag} subset, cell-sorted: {t_h:7.1f} ms (sort excluded)")


if __name__ == "__main__":
    main()
