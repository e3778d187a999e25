"""BVH-quality study: can tree rotations / SAH knobs cut union visits?

Traversal cost on this chip is (union visits/packet) x ~460 cycles — the
visit *count* is the one traversal lever no round has touched.  This script
measures, entirely on host:

  1. the SAH cost of the production tree (binned-14, leaf 6, Ct=4),
  2. the same tree after a Kensler-2008-style tree-rotation post-pass
     (greedy local rotations swapping a child with a grandchild when the
     rotated child box has lower surface area),
  3. optional builder knob variants (bucket count),

and evaluates each with scripts/pose_variance.py's exact host replica of
the packet kernel: union visits/packet on the three bench poses' primary
packets, plus per-ray visit counts on a synthetic bounce mix (cosine
bounces from pose-0 hit points, survivor-sorted by the production
(8^3 cell, octant-major) key).

Usage:
    python scripts/bvh_quality_study.py --scene dragon --packets 16
    python scripts/bvh_quality_study.py --scene terrain --tris 1048576
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from pose_variance import simulate_packet  # noqa: E402


def _sa(lo, hi):
    d = np.maximum(hi - lo, 0.0)
    return 2.0 * (d[..., 0] * d[..., 1] + d[..., 0] * d[..., 2]
                  + d[..., 1] * d[..., 2])


def decode(bvh):
    """BVHArrays -> mutable pointer topology (old node ids)."""
    from tyrant_tpu.scene.bvh import (META_AXIS_SHIFT, META_COUNT_MASK,
                                      META_OFFSET_SHIFT)
    meta = bvh.meta
    count = meta & META_COUNT_MASK
    is_leaf = count > 0
    n = bvh.n_nodes
    lch = np.where(is_leaf, -1, np.arange(n, dtype=np.int64) + 1)
    rch = np.where(is_leaf, -1, bvh.second_child.astype(np.int64))
    return dict(lch=lch, rch=rch, is_leaf=is_leaf,
                count=count.astype(np.int64),
                offset=(meta >> META_OFFSET_SHIFT).astype(np.int64),
                axis=((meta >> META_AXIS_SHIFT) & 3).astype(np.int64),
                lo=bvh.lo.copy(), hi=bvh.hi.copy())


def sah_cost(t, ct=4.0, ci=1.0):
    root_sa = _sa(t["lo"][0], t["hi"][0])
    sa = _sa(t["lo"], t["hi"])
    interior = ~t["is_leaf"]
    return float((ct * sa[interior].sum()
                  + ci * (sa * t["count"])[t["is_leaf"]].sum()) / root_sa)


def _depths(t):
    n = t["lch"].shape[0]
    depth = np.full(n, -1, np.int64)
    frontier = np.array([0], np.int64)
    d = 0
    while frontier.size:
        depth[frontier] = d
        kids = np.concatenate([t["lch"][frontier], t["rch"][frontier]])
        frontier = kids[kids >= 0]
        d += 1
    return depth


def refit(t):
    depth = _depths(t)
    for d in range(depth.max(), -1, -1):
        ns = np.nonzero((depth == d) & ~t["is_leaf"])[0]
        if not ns.size:
            continue
        l, r = t["lch"][ns], t["rch"][ns]
        t["lo"][ns] = np.minimum(t["lo"][l], t["lo"][r])
        t["hi"][ns] = np.maximum(t["hi"][l], t["hi"][r])


def rotation_pass(t, tol):
    """One greedy pass of the four child<->grandchild rotations.

    For node n with children (l, r): moving l down into r (swapping l with
    one of r's children) changes ONLY r's box; gain = SA(r) - SA(r').
    Applies a conflict-free subset, best-gain-first.  Returns (#applied,
    total SA gain)."""
    lch, rch, lo, hi, is_leaf = t["lch"], t["rch"], t["lo"], t["hi"], t["is_leaf"]
    ns = np.nonzero(~is_leaf)[0]
    l, r = lch[ns], rch[ns]
    r_int = ~is_leaf[r]
    l_int = ~is_leaf[l]

    def union_sa(a, b):
        return _sa(np.minimum(lo[a], lo[b]), np.maximum(hi[a], hi[b]))

    big = np.float32(np.inf)
    # candidate 0: l <-> r.l  (new r = union(l, r.r));  1: l <-> r.r
    rl = np.where(r_int, lch[r], 0)
    rr = np.where(r_int, rch[r], 0)
    sa_r = _sa(lo[r], hi[r])
    g0 = np.where(r_int, sa_r - union_sa(l, rr), -big)
    g1 = np.where(r_int, sa_r - union_sa(rl, l), -big)
    # candidate 2: r <-> l.l  (new l = union(r, l.r));  3: r <-> l.r
    ll = np.where(l_int, lch[l], 0)
    lr = np.where(l_int, rch[l], 0)
    sa_l = _sa(lo[l], hi[l])
    g2 = np.where(l_int, sa_l - union_sa(r, lr), -big)
    g3 = np.where(l_int, sa_l - union_sa(ll, r), -big)

    gains = np.stack([g0, g1, g2, g3], 1)
    kind = gains.argmax(1)
    gain = gains[np.arange(len(ns)), kind]
    cand = np.nonzero(gain > tol)[0]
    cand = cand[np.argsort(-gain[cand])]

    locked = np.zeros(lch.shape[0], bool)
    applied = 0
    total = 0.0
    for ci in cand:
        n = ns[ci]
        k = kind[ci]
        a, b = lch[n], rch[n]
        if k < 2:
            child, g1_, g2_ = b, lch[b], rch[b]
            moved = a  # l moves down
        else:
            child, g1_, g2_ = a, lch[a], rch[a]
            moved = b
        group = (n, a, b, g1_, g2_)
        if any(locked[x] for x in group):
            continue
        for x in group:
            locked[x] = True
        # perform: swap `moved` with one grandchild of `child`
        if k == 0:    # l <-> r.l
            lch[n], lch[child] = g1_, moved
        elif k == 1:  # l <-> r.r
            lch[n], rch[child] = g2_, moved
        elif k == 2:  # r <-> l.l
            rch[n], lch[child] = g1_, moved
        else:         # r <-> l.r
            rch[n], rch[child] = g2_, moved
        # refit the rotated child's box now (ancestors refit after the pass)
        c_l, c_r = lch[child], rch[child]
        lo[child] = np.minimum(lo[c_l], lo[c_r])
        hi[child] = np.maximum(hi[c_l], hi[c_r])
        applied += 1
        total += float(gain[ci])
    refit(t)
    return applied, total


def optimize(t, max_passes=40, rel_tol=1e-7, verbose=True):
    root_sa = float(_sa(t["lo"][0], t["hi"][0]))
    tol = rel_tol * root_sa
    for p in range(max_passes):
        n_app, gain = rotation_pass(t, tol)
        if verbose:
            print(f"  pass {p}: {n_app} rotations, SA gain {gain / root_sa:.4f} "
                  f"(SAH {sah_cost(t):.2f})")
        if n_app == 0 or gain < 1e-4 * root_sa:
            break
    # traversal-order heuristic: axis of greatest child-centroid separation
    interior = ~t["is_leaf"]
    l, r = t["lch"][interior], t["rch"][interior]
    c_l = (t["lo"][l] + t["hi"][l]) * 0.5
    c_r = (t["lo"][r] + t["hi"][r]) * 0.5
    t["axis"][interior] = np.abs(c_r - c_l).argmax(1)
    return t


def reemit(t, perm):
    """Topology -> BVHArrays in depth-first layout (left = current+1)."""
    from tyrant_tpu.scene.bvh import BVHArrays, pack_meta, thread_links
    n = t["lch"].shape[0]
    new_of_old = np.empty(n, np.int64)
    order = np.empty(n, np.int64)
    stack = [0]
    k = 0
    while stack:
        o = stack.pop()
        new_of_old[o] = k
        order[k] = o
        k += 1
        if t["lch"][o] >= 0:
            stack.append(t["rch"][o])
            stack.append(t["lch"][o])
    assert k == n
    lo = t["lo"][order].astype(np.float32)
    hi = t["hi"][order].astype(np.float32)
    count = t["count"][order]
    offset = t["offset"][order]
    axis = t["axis"][order]
    meta = pack_meta(offset, count, axis)
    second = np.full(n, -1, np.int32)
    interior_new = np.nonzero(count == 0)[0]
    second[interior_new] = new_of_old[
        t["rch"][order[interior_new]]].astype(np.int32)
    # depth-first invariant: left child is the next node
    assert (new_of_old[t["lch"][order[interior_new]]]
            == interior_new + 1).all()
    hit_link, miss_link = thread_links(meta, second)
    return BVHArrays(lo=lo, hi=hi, meta=meta, second_child=second,
                     hit_link=hit_link, miss_link=miss_link,
                     perm=perm, n_nodes=n)


def eval_tables(tag, bvh, scene, packets, seed_poses=(0, 1, 2)):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from tyrant_tpu.bench.harness import TEST_POSITIONS, _camera_for_pose
    from tyrant_tpu.config import RenderConfig
    from tyrant_tpu.ops.pallas.traverse_kernel import (TREELET_ROWS,
                                                       PacketTables)
    from tyrant_tpu.render import _raygen
    from tyrant_tpu.scene.scene import Scene  # noqa: F401

    sd = scene.to_device()
    tables = PacketTables(sd.bvh)
    rows = np.asarray(tables.rows)
    treelet = min(TREELET_ROWS, rows.shape[0])
    cfg = RenderConfig(width=1920, height=1080, num_rays=2 * 1_048_576)
    out = {}
    for pose in seed_poses:
        cam = _camera_for_pose(pose).to_device(cfg)
        gen = _raygen(cfg, cam, np.int32(0), np.uint32(1), cfg.height, 0)
        o_all = np.asarray(gen["origin"])
        d_all = np.asarray(gen["direction"])
        rng = np.random.default_rng(pose)
        starts = rng.integers(0, cfg.num_rays // 1024, packets) * 1024
        vis = deep = 0
        hits_o, hits_t, hits_d = [], [], []
        for s in starts:
            o, d = o_all[s:s + 1024], d_all[s:s + 1024]
            r = simulate_packet(rows, o, d, treelet)
            vis += r["visits"]
            deep += r["deep"]
            m = r["t_best"] < 1e19
            hits_o.append(o[m] + r["t_best"][m, None] * d[m])
            hits_d.append(d[m])
        out[pose] = (vis / packets, deep / packets)
        print(f"  [{tag}] pose {pose}: visits/packet {vis / packets:.0f}  "
              f"deep {deep / packets:.0f}")
        if pose == 0:
            # bounce-mix proxy: uniform-hemisphere bounces off the pose-0
            # hit points, survivor-sorted by the production
            # (octant-major, 8^3 origin cell) key (render.py
            # compaction_sort_key)
            ho = np.concatenate(hits_o)
            hd = np.concatenate(hits_d)
            n = (ho.shape[0] // 1024) * 1024
            if n == 0:
                continue
            br = np.random.default_rng(7)
            v = br.normal(size=(ho.shape[0], 3)).astype(np.float32)
            v /= np.linalg.norm(v, axis=1, keepdims=True) + 1e-12
            # flip into the hemisphere facing back toward the camera side
            flip = (v * hd).sum(1) > 0
            v[flip] = -v[flip]
            v = np.where(np.abs(v) < 1e-6, 1e-6, v)
            lo3 = np.minimum(rows[0, 0:3], rows[0, 6:9])
            hi3 = np.maximum(rows[0, 3:6], rows[0, 9:12])
            span = np.maximum(hi3 - lo3, 1e-3)
            g = 8
            q = np.clip(((ho - lo3) / span * g).astype(np.int64), 0, g - 1)
            cell = (q[:, 0] * g + q[:, 1]) * g + q[:, 2]
            octant = ((v[:, 0] < 0) + 2 * (v[:, 1] < 0)
                      + 4 * (v[:, 2] < 0)).astype(np.int64)
            order = np.argsort(octant * g ** 3 + cell, kind="stable")
            ho, v = ho[order], v[order]
            bvis = bdeep = 0
            npk = min(packets, n // 1024)
            sel = np.linspace(0, n // 1024 - 1, npk).astype(int)
            for p in sel:
                s = p * 1024
                r = simulate_packet(rows, ho[s:s + 1024] + 1e-3 * v[s:s + 1024],
                                    v[s:s + 1024], treelet)
                bvis += r["visits"]
                bdeep += r["deep"]
            out["mix"] = (bvis / npk, bdeep / npk)
            print(f"  [{tag}] bounce-mix: visits/packet {bvis / npk:.0f}  "
                  f"deep {bdeep / npk:.0f}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="dragon")
    ap.add_argument("--tris", type=int, default=1_048_576)
    ap.add_argument("--packets", type=int, default=16)
    ap.add_argument("--passes", type=int, default=40)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from tyrant_tpu.scene.scene import Scene

    if args.scene == "dragon":
        scene = Scene.load("/root/reference/PathTracer/Data/dragon.ply")
    else:
        from tyrant_tpu.scene.procgen import benchmark_scene
        v0, v1, v2 = benchmark_scene(args.tris)
        scene = Scene.from_triangles(v0, v1, v2)

    t0 = time.time()
    base = scene.bvh
    tb = decode(base)
    print(f"baseline SAH {sah_cost(tb):.2f}  nodes {base.n_nodes} "
          f"({time.time() - t0:.1f}s load+decode)")
    base_res = eval_tables("base", base, scene, args.packets)

    t0 = time.time()
    topt = optimize(decode(base), max_passes=args.passes)
    print(f"rotated SAH {sah_cost(topt):.2f} ({time.time() - t0:.1f}s)")
    opt = reemit(topt, base.perm)
    from tyrant_tpu.scene.bvh import validate_bvh
    tri_lo = np.minimum(np.minimum(scene.tri_vert,
                                   scene.tri_vert + scene.tri_e1),
                        scene.tri_vert + scene.tri_e2)
    tri_hi = np.maximum(np.maximum(scene.tri_vert,
                                   scene.tri_vert + scene.tri_e1),
                        scene.tri_vert + scene.tri_e2)
    validate_bvh(opt, tri_lo, tri_hi, scene.tri_vert.shape[0])
    print("rotated tree validates")
    scene.bvh = opt
    opt_res = eval_tables("rot", opt, scene, args.packets)

    for pose in base_res:
        b, o = base_res[pose][0], opt_res[pose][0]
        print(f"pose {pose}: union visits {b:.0f} -> {o:.0f} "
              f"({o / b:.3f}x)")


if __name__ == "__main__":
    main()
