"""Host sim: is a 4-ary BVH (MBVH4) worth building? (round-3 traversal lever)

The measured mono-kernel cost model (docs/PERFORMANCE.md round 3) is
~430-460 cycles per WHILE-LOOP ITERATION, latency-bound on the serial
pop -> fetch -> slab -> any-reduce -> push chain, and every attempt to
overlap or slim the iteration (interleave, one-reduce, register carries,
prefetch) measured neutral-to-negative.  The remaining lever is therefore
FEWER ITERATIONS for the same geometry: a 4-wide node tests 4 child boxes
per iteration instead of 2, halving tree depth.

This sim collapses the production binary fat-row table into MBVH4 nodes
(children = grandchildren of the binary node, leaves kept in place) and
counts, on the same workloads the kernel A/Bs use:

  * iters4      — 4-ary union-packet while-loop iterations;
  * leaf_passes — Moller-Trumbore unrolls (same total tri work);
  * vs binary   — the production sim (pose_variance.simulate_packet logic).

Judgment rule of thumb: a 4-ary iteration costs ~1.3-1.7x a binary visit
(4 slab tests + 4 any-reduces + ~2x scalar push logic, same single row
fetch) — so the collapse only pays if iters4 <= ~0.55 x binary visits.

Runs on CPU.  Usage:
    python scripts/mbvh_study.py [--scene dragon|terrain1m] [--packets K]
                                 [--workload pri|mix]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

VERY_FAR = 1e20
EPSILON = 1e-3
L_TAG, R_TAG, L_REF, R_REF, AXIS, L_TRI = 12, 13, 14, 15, 16, 17
LEAF_W = 6
R_TRI = L_TRI + 9 * LEAF_W


def collapse4(rows):
    """Binary fat rows -> MBVH4: node4[i] covers binary row i; children are
    the binary node's grandchildren (interior child expanded once) or the
    leaf children in place.  Returns dict id -> list of child dicts:
      {box: (6,), axis_slot: int, leaf: tris array or None, ref: node4 id}
    Child order is (L-group, R-group), each group (near, far) by its own
    axis — so the scalar near-first ordering needs axes (root, L, R),
    returned as the 3-tuple per node.
    """
    nodes = {}
    seen = [0]
    while seen:
        i = seen.pop()
        if i in nodes:
            continue
        row = rows[i]

        def child(tag_i, ref_i, tri_base, box_base):
            tag = row[tag_i]
            box = row[box_base:box_base + 6].copy()
            if tag > 0:  # leaf: embedded payload
                tris = row[tri_base:tri_base + 9 * int(tag)].reshape(-1, 9)
                return dict(box=box, leaf=tris, ref=-1)
            return dict(box=box, leaf=None, ref=int(row[ref_i]))

        kids = []
        axes = [int(row[AXIS]), 0, 0]
        for slot, (tag_i, ref_i, tri_base, box_base) in enumerate(
                ((L_TAG, L_REF, L_TRI, 0), (R_TAG, R_REF, R_TRI, 6))):
            c = child(tag_i, ref_i, tri_base, box_base)
            if c["leaf"] is not None:
                kids.append((slot, c))
                continue
            # interior: pull up ITS two children (the grandchildren)
            sub = rows[c["ref"]]
            axes[1 + slot] = int(sub[AXIS])
            for tag_i2, ref_i2, tri_base2, box_base2 in (
                    (L_TAG, L_REF, L_TRI, 0), (R_TAG, R_REF, R_TRI, 6)):
                tag2 = sub[tag_i2]
                box2 = sub[box_base2:box_base2 + 6].copy()
                if tag2 > 0:
                    tris = sub[tri_base2:tri_base2 + 9 * int(tag2)]
                    kids.append((slot, dict(box=box2,
                                            leaf=tris.reshape(-1, 9),
                                            ref=-1)))
                else:
                    ref2 = int(sub[ref_i2])
                    kids.append((slot, dict(box=box2, leaf=None, ref=ref2)))
                    seen.append(ref2)
        nodes[i] = (kids, axes)
    return nodes


def simulate4(nodes, o, d, order_axes=True):
    n = o.shape[0]
    inv = 1.0 / d
    t_best = np.full(n, VERY_FAR, np.float64)
    neg = d[0] < 0
    stack = [0]
    iters = leaf_passes = tri_tests = 0
    max_depth = 0
    while stack:
        max_depth = max(max_depth, len(stack))
        i = stack.pop()
        iters += 1
        kids, axes = nodes[i]

        def slab(box):
            lo, hi = box[0:3], box[3:6]
            nb = np.where(d < 0, hi[None], lo[None])
            fb = np.where(d < 0, lo[None], hi[None])
            t0 = ((nb - o) * inv).max(1)
            t1 = ((fb - o) * inv).min(1)
            return (t0 <= t1) & (t0 < t_best) & (t1 > 0)

        pushes = []  # (group_slot, ref)
        for slot, c in kids:
            m = slab(c["box"])
            if not m.any():
                continue
            if c["leaf"] is not None:
                leaf_passes += 1
                for tri in c["leaf"]:
                    tri_tests += 1
                    v0, e1, e2 = tri[0:3], tri[3:6], tri[6:9]
                    p = np.cross(d, e2[None])
                    det = (e1[None] * p).sum(1)
                    invd = 1.0 / np.where(np.abs(det) < 1e-30, 1.0, det)
                    tv = o - v0[None]
                    u = (tv * p).sum(1) * invd
                    q = np.cross(tv, e1[None])
                    v = (d * q).sum(1) * invd
                    t = (e2[None] * q).sum(1) * invd
                    ok = ((det >= 1e-7) & (u >= 0) & (u <= 1) & (v >= 0)
                          & (u + v <= 1) & m & (t > EPSILON)
                          & ((t_best - t) > EPSILON))
                    t_best = np.where(ok, t, t_best)
            else:
                pushes.append((slot, c["ref"]))
        if pushes and order_axes:
            # near-first pop order: sort pushes far-to-near by the 3-axis
            # hierarchical rule (group by root axis, within group by the
            # group's axis); first-ray sign heuristic as in the kernel
            def near_key(sl_ref):
                slot, _ = sl_ref
                # group rank: L-group near if !neg[axes[0]]
                g_near = (slot == (1 if neg[axes[0]] else 0))
                return (0 if g_near else 1)
            pushes.sort(key=near_key, reverse=True)  # far pushed first
        for _, ref in pushes:
            stack.append(ref)
    return dict(iters=iters, leaf_passes=leaf_passes, tri_tests=tri_tests,
                depth=max_depth,
                hit_frac=float((t_best < VERY_FAR).mean()))


def simulate2(rows, o, d):
    """Binary production sim (pose_variance.simulate_packet, trimmed)."""
    n = o.shape[0]
    inv = 1.0 / d
    t_best = np.full(n, VERY_FAR, np.float64)
    neg = d[0] < 0
    stack = [0]
    visits = leaf_passes = tri_tests = 0
    while stack:
        row_i = stack.pop()
        visits += 1
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
        if box_l.any() and tag_l > 0:
            leaf(L_TRI, tag_l, box_l)
        if box_r.any() and tag_r > 0:
            leaf(R_TRI, tag_r, box_r)
        axis = int(row[AXIS])
        near_is_r = bool(neg[axis])
        lp = (int(row[L_REF]), box_l.any() and tag_l < 0)
        rp = (int(row[R_REF]), box_r.any() and tag_r < 0)
        first, second = (lp, rp) if near_is_r else (rp, lp)
        if first[1]:
            stack.append(first[0])
        if second[1]:
            stack.append(second[0])
    return dict(visits=visits, leaf_passes=leaf_passes, tri_tests=tri_tests,
                hit_frac=float((t_best < VERY_FAR).mean()))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="dragon")
    ap.add_argument("--packets", type=int, default=24)
    ap.add_argument("--workload", default="mix", choices=("pri", "mix"))
    ap.add_argument("--tris", type=int, default=1_048_576)
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")

    from tyrant_tpu.ops.pallas.traverse_kernel import PacketTables
    from tyrant_tpu.scene.scene import Scene

    if args.scene == "dragon":
        scene = Scene.load("/root/reference/PathTracer/Data/dragon.ply")
    else:
        from tyrant_tpu.scene.procgen import benchmark_scene
        v0, v1, v2 = benchmark_scene(args.tris)
        scene = Scene.from_triangles(v0, v1, v2)
    sd = scene.to_device()
    tables = PacketTables(sd.bvh)
    rows = np.asarray(tables.rows, np.float64)
    print(f"scene={args.scene} rows={rows.shape[0]}", flush=True)

    nodes4 = collapse4(rows)
    arity = np.array([len(k) for k, _ in nodes4.values()])
    n_leaf_kids = np.array([sum(1 for _, c in k if c['leaf'] is not None)
                            for k, _ in nodes4.values()])
    print(f"mbvh4 nodes={len(nodes4)} (binary interior rows used "
          f"{rows.shape[0]}), arity mean {arity.mean():.2f} "
          f"leaf-children/node mean {n_leaf_kids.mean():.2f} "
          f"max {n_leaf_kids.max()}", flush=True)

    if args.workload == "pri":
        from tyrant_tpu.bench.harness import _camera_for_pose
        from tyrant_tpu.config import RenderConfig
        from tyrant_tpu.render import _raygen
        cfg = RenderConfig(width=1920, height=1080, num_rays=2 * 1_048_576)
        cam = _camera_for_pose(0).to_device(cfg)
        gen = _raygen(cfg, cam, np.int32(0), np.uint32(1), cfg.height, 0)
        o_all = np.asarray(gen["origin"], np.float64)
        d_all = np.asarray(gen["direction"], np.float64)
        lo = 0
    else:
        path = f"/tmp/kernel_bench_{args.scene}_2097152.npz"
        data = np.load(path)
        o_all = data["mix_o"].astype(np.float64)
        d_all = data["mix_d"].astype(np.float64)
        lo = o_all.shape[0] - 786_432  # carried tail

    rng = np.random.default_rng(11)
    starts = rng.integers(lo // 1024, o_all.shape[0] // 1024,
                          args.packets) * 1024
    agg2 = agg4 = None
    for s in starts:
        o = o_all[s:s + 1024]
        d = d_all[s:s + 1024]
        r2 = simulate2(rows, o, d)
        r4 = simulate4(nodes4, o, d)
        assert abs(r2["hit_frac"] - r4["hit_frac"]) < 1e-9, (r2, r4)
        agg2 = r2 if agg2 is None else {k: agg2[k] + r2[k] for k in r2}
        agg4 = r4 if agg4 is None else {k: agg4[k] + r4[k] for k in r4}
    k = args.packets
    print(f"binary : visits/pkt {agg2['visits'] / k:7.1f}  leaf-passes "
          f"{agg2['leaf_passes'] / k:6.1f}  tri-tests "
          f"{agg2['tri_tests'] / k:7.1f}")
    print(f"mbvh4  : iters/pkt  {agg4['iters'] / k:7.1f}  leaf-passes "
          f"{agg4['leaf_passes'] / k:6.1f}  tri-tests "
          f"{agg4['tri_tests'] / k:7.1f}  stack-depth max "
          f"{agg4['depth']}")
    r = agg4['iters'] / max(agg2['visits'], 1)
    print(f"iters4 / visits2 = {r:.3f}  "
          f"(pays if < ~0.55-0.75 depending on per-iter cost growth)")


if __name__ == "__main__":
    main()
