"""Explain the per-pose step-time spread of the terrain bench (VERDICT r2
weak item 5: 239 / 552 / 465 ms across the three poses — why?).

Simulates the packet kernel's traversal on HOST (numpy) against the real
fat-row table, per bench pose, on sampled 1024-ray primary packets, and
reports the quantities the kernel's cost model is made of:

  * union visits per packet (the while-loop trip count = the mono kernel's
    cost unit),
  * deep visits (BFS row >= treelet_rows: the per-visit HBM DMA fraction),
  * leaf-pass fraction (visits that run the 2x6 Möller-Trumbore unroll),
  * per-ray hit fraction and distances.

Runs on CPU — no TPU needed.  Usage:
    python scripts/pose_variance.py [--tris N] [--packets K] [--scene dragon]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

VERY_FAR = 1e20
EPSILON = 1e-3


def simulate_packet(rows, o, d, treelet_rows, leaf_width=6):
    """Host replica of the mono packet kernel's traversal loop
    (ops/pallas/traverse_kernel.py _visit): union slab tests over the
    packet, ordered far/near pushes, per-ray t_best pruning with leaf
    Möller-Trumbore updates.  Returns dict of counters."""
    n = o.shape[0]
    inv = 1.0 / d
    t_best = np.full(n, VERY_FAR, np.float32)
    neg = d[0] < 0  # first-ray ordering heuristic, as in the kernel

    L_TAG, R_TAG, L_REF, R_REF, AXIS, L_TRI = 12, 13, 14, 15, 16, 17
    R_TRI = L_TRI + 9 * leaf_width

    stack = [0]
    visits = deep = leaf_passes = tri_tests = 0
    while stack:
        row_i = stack.pop()
        visits += 1
        if row_i >= treelet_rows:
            deep += 1
        row = rows[row_i]

        def slab(base):
            lo = row[base:base + 3]
            hi = row[base + 3:base + 6]
            nb = np.where(d < 0, hi[None], lo[None])
            fb = np.where(d < 0, lo[None], hi[None])
            t0 = ((nb - o) * inv).max(1)
            t1 = ((fb - o) * inv).min(1)
            return (t0 <= t1) & (t0 < t_best) & (t1 > 0)

        def leaf(tri_base, tag, box_hit):
            nonlocal leaf_passes, tri_tests, t_best
            leaf_passes += 1
            for j in range(int(tag)):
                tri_tests += 1
                b = tri_base + 9 * j
                v0, e1, e2 = row[b:b + 3], row[b + 3:b + 6], row[b + 6:b + 9]
                p = np.cross(d, e2[None])
                det = (e1[None] * p).sum(1)
                invd = 1.0 / np.where(np.abs(det) < 1e-30, 1.0, det)
                tv = o - v0[None]
                u = (tv * p).sum(1) * invd
                q = np.cross(tv, e1[None])
                v = (d * q).sum(1) * invd
                t = (e2[None] * q).sum(1) * invd
                ok = ((det >= 1e-7) & (u >= 0) & (u <= 1) & (v >= 0)
                      & (u + v <= 1) & box_hit & (t > EPSILON)
                      & ((t_best - t) > EPSILON))
                t_best = np.where(ok, t, t_best)

        box_l, box_r = slab(0), slab(6)
        tag_l, tag_r = row[L_TAG], row[R_TAG]
        ref_l, ref_r = int(row[L_REF]), int(row[R_REF])
        if box_l.any() and tag_l > 0:
            leaf(L_TRI, tag_l, box_l)
        if box_r.any() and tag_r > 0:
            leaf(R_TRI, tag_r, box_r)
        axis = int(row[AXIS])
        near_is_r = bool(neg[axis])
        first = (ref_l, box_l.any() and tag_l < 0) if near_is_r \
            else (ref_r, box_r.any() and tag_r < 0)
        second = (ref_r, box_r.any() and tag_r < 0) if near_is_r \
            else (ref_l, box_l.any() and tag_l < 0)
        if first[1]:
            stack.append(first[0])   # far
        if second[1]:
            stack.append(second[0])  # near (popped first)
    return dict(visits=visits, deep=deep, leaf_passes=leaf_passes,
                tri_tests=tri_tests,
                hit_frac=float((t_best < VERY_FAR).mean()),
                t_best=t_best)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=1_048_576)
    ap.add_argument("--packets", type=int, default=8)
    ap.add_argument("--scene", default="terrain")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401

    from tyrant_tpu.bench.harness import TEST_POSITIONS, _camera_for_pose
    from tyrant_tpu.config import RenderConfig
    from tyrant_tpu.ops.pallas.traverse_kernel import (TREELET_ROWS,
                                                       PacketTables)
    from tyrant_tpu.render import _raygen
    from tyrant_tpu.scene.scene import Scene

    if args.scene == "dragon":
        scene = Scene.load("/root/reference/PathTracer/Data/dragon.ply")
    else:
        from tyrant_tpu.scene.procgen import benchmark_scene
        v0, v1, v2 = benchmark_scene(args.tris)
        scene = Scene.from_triangles(v0, v1, v2)
    sd = scene.to_device()
    tables = PacketTables(sd.bvh)
    rows = np.asarray(tables.rows)
    print(f"scene={args.scene} rows={rows.shape[0]} "
          f"treelet={min(TREELET_ROWS, rows.shape[0])} "
          f"fits_vmem={tables.fits}")

    cfg = RenderConfig(width=1920, height=1080, num_rays=2 * 1_048_576)
    for pose in range(len(TEST_POSITIONS)):
        cam = _camera_for_pose(pose).to_device(cfg)
        # sample PACKETS 1024-ray packets from the tiled raygen wavefront
        gen = _raygen(cfg, cam, np.int32(0), np.uint32(1), cfg.height, 0)
        o_all = np.asarray(gen["origin"])
        d_all = np.asarray(gen["direction"])
        rng = np.random.default_rng(pose)
        starts = rng.integers(0, cfg.num_rays // 1024, args.packets) * 1024
        agg = None
        for s in starts:
            r = simulate_packet(rows, o_all[s:s + 1024], d_all[s:s + 1024],
                                TREELET_ROWS)
            agg = r if agg is None else {
                k: agg[k] + r[k] for k in r}
        k = args.packets
        print(f"pose {pose} {TEST_POSITIONS[pose]}: "
              f"visits/packet {agg['visits'] / k:.0f}  "
              f"deep(DMA)/packet {agg['deep'] / k:.0f} "
              f"({100 * agg['deep'] / max(agg['visits'], 1):.1f}%)  "
              f"leaf-passes/packet {agg['leaf_passes'] / k:.0f}  "
              f"tri-tests/packet {agg['tri_tests'] / k:.0f}  "
              f"hit {agg['hit_frac'] / k:.2f}")


if __name__ == "__main__":
    main()
