"""Round-4 go/no-go study: breadth-first ray-streaming traversal
(VERDICT r3 item 2 — the one structural mapping the round-3 roofline named
and never simulated).

Design under test ("level-stream kernel"): the frontier is a flat HBM
queue of (ray record, fat-table row id) pairs, processed level-
synchronously in (8,128)-pair blocks kept SORTED BY ROW ID.  The single
sequential TPU tensorcore walks the blocks; within a block the K distinct
rows are visited one at a time: the row's 17 scalar header lanes load
once, both child boxes broadcast-test the row's lane span of rays, leaf
children run the Möller-Trumbore unroll inline, and surviving interior-
child pairs are compacted (MXU one-hot permutation, the accum-kernel
trick) and appended to the next level's queue through a VMEM staging tile
— parent-major emission keeps the child queue row-sorted for free because
the table's BFS numbering makes child row ids monotone in parent row ids.
Rays, not nodes, stream from HBM: each pair carries its full ray record
(origin, direction, lineage t_best, ray id = 8 f32), so the hot loop has
ZERO gathers and — unlike the packet kernel — ZERO union waste: a row is
only ever tested against rays whose own lineage reached it.

What packetization costs today (the quantity this design eliminates):
a 1024-ray carried-mix packet unions ~1638 row visits on the terrain
(scripts/rebin_study.py) where the mean RAY only needs ~40-80 — the
packet kernel pays ~460 cycles x union for everyone.  What streaming
costs instead (the quantities this sim measures on the REAL cached
wavefronts):

  * pair-visits: lineage-only t pruning loses the cross-subtree pruning
    that ordered depth-first traversal gets from its shared t_best —
    measured here as visits_A (lineage) vs visits_B (level-global min,
    an upper bound on fixable pruning) vs the per-ray DFS optimum;
  * node-instances: K distinct rows per 1024-pair block x blocks — each
    costs the ~17 serialized scalar header loads the packet visit pays;
  * queue traffic: 32 B/pair/level in + out, at HBM streaming bandwidth;
  * the final per-ray combine: leaf-hit pairs -> per-ray argmin (one
    2M-row sort or scatter-min, measured 44-45 ms at 2M).

Cost model constants are the measured round-3 numbers (docs/
PERFORMANCE.md): 460-cycle packet visit for the mono baseline, ~120-200
cycles for a 17-scalar-load header visit, 819 GB/s HBM, 1.73 GHz clock
(430 cycles == 260 ns).  The table prints the projected kernel time under
optimistic / expected / pessimistic constants vs the measured wave kernel
(396 ms closest-mix at 2M on the terrain).

Usage:
  python scripts/stream_study.py --scene terrain1m --workload mix \
      [--rays N] [--cache /tmp/kernel_bench_terrain1m_2097152.npz]
Runs on CPU (numpy); needs the cached wavefront from
scripts/kernel_bench.py --regen (TPU) or --gen-small (CPU fallback).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

VERY_FAR = 1e20
EPSILON = 1e-3

# fat-row lane map (ops/pallas/traverse_kernel.py)
L_TAG, R_TAG, L_REF, R_REF, AXIS, L_TRI = 12, 13, 14, 15, 16, 17
LEAF_WIDTH = 6
R_TRI = L_TRI + 9 * LEAF_WIDTH


def _slab(lo, hi, o, d, inv, t_prune):
    """Vectorised slab test: pair arrays [M,3] -> bool [M]."""
    nb = np.where(d < 0, hi, lo)
    fb = np.where(d < 0, lo, hi)
    t0 = ((nb - o) * inv).max(1)
    t1 = ((fb - o) * inv).min(1)
    return (t0 <= t1) & (t0 < t_prune) & (t1 > 0)


def _mt_leaf(tri, o, d, t_best, anyhit_maxd=None):
    """Vectorised Möller-Trumbore over the 6 leaf slots.
    tri: [M, 54] payload, o/d: [M,3].  Returns updated t_best [M] (and a
    hit flag for anyhit mode)."""
    hit_any = np.zeros(o.shape[0], bool)
    for j in range(LEAF_WIDTH):
        b = 9 * j
        v0, e1, e2 = tri[:, b:b + 3], tri[:, b + 3:b + 6], tri[:, b + 6:b + 9]
        p = np.cross(d, e2)
        det = (e1 * p).sum(1)
        invd = 1.0 / np.where(np.abs(det) < 1e-30, 1.0, det)
        tv = o - v0
        u = (tv * p).sum(1) * invd
        q = np.cross(tv, e1)
        v = (d * q).sum(1) * invd
        t = (e2 * q).sum(1) * invd
        ok = ((det >= 1e-7) & (u >= 0) & (u <= 1) & (v >= 0)
              & (u + v <= 1) & (t > EPSILON))
        if anyhit_maxd is not None:
            hit_any |= ok & ((t + EPSILON) < anyhit_maxd)
        else:
            ok &= (t_best - t) > EPSILON
            t_best = np.where(ok, t, t_best)
    return t_best, hit_any


def stream_traverse(rows, o, d, mode="closest",
                    maxd=None, pruning="lineage", block=1024):
    """Level-synchronous breadth-first traversal of the full wavefront.

    Returns per-level stats + totals.  ``pruning``:
      "lineage"  — each pair carries the t_best its own ancestors found
                   (the hardware-realisable model: no cross-pair traffic);
      "global"   — after each level every ray's t_best is min-combined
                   and next level prunes with it (upper bound; one
                   scatter-min per level on hardware).
    """
    n = o.shape[0]
    inv = np.where(d != 0, 1.0 / np.where(d == 0, 1.0, d), 1e30)
    tglob = np.full(n, VERY_FAR, np.float32)
    if maxd is None:
        maxd = np.full(n, VERY_FAR, np.float32)
    active0 = maxd > 2 * EPSILON if mode == "anyhit" else np.ones(n, bool)
    ray = np.nonzero(active0)[0].astype(np.int32)
    prow = np.zeros(ray.shape[0], np.int64)  # all start at root row 0
    tlin = np.full(ray.shape[0], VERY_FAR, np.float32)
    occl = np.zeros(n, bool)

    stats = []
    tot = dict(pairs=0, leaf_pairs=0, tri_tests=0, node_inst=0,
               leaf_inst=0, emit_bytes=0, levels=0)
    lvl = 0
    while ray.size:
        m = ray.size
        tot["pairs"] += m
        tot["levels"] += 1
        ro = o[ray]
        rd = d[ray]
        rinv = inv[ray]
        prune = tlin if pruning == "lineage" else tglob[ray]
        if mode == "anyhit":
            prune = maxd[ray]
        # header lanes only (the kernel's 17 scalar loads); leaf payload
        # rows are gathered per selected pair below — keeps peak sim
        # memory ~17/128 of a full-row gather at 2M-wavefront frontiers
        hdr = rows[:, :17][prow]
        box_l = _slab(hdr[:, 0:3], hdr[:, 3:6], ro, rd, rinv, prune)
        box_r = _slab(hdr[:, 6:9], hdr[:, 9:12], ro, rd, rinv, prune)
        tag_l, tag_r = hdr[:, L_TAG], hdr[:, R_TAG]
        ref_l = hdr[:, L_REF].astype(np.int64)
        ref_r = hdr[:, R_REF].astype(np.int64)

        # leaf passes (inline, both sides)
        pair_hit = np.zeros(m, bool)
        for tag, box, tri_b in ((tag_l, box_l, L_TRI), (tag_r, box_r, R_TRI)):
            sel = (tag > 0) & box
            if not sel.any():
                continue
            tot["leaf_pairs"] += int(sel.sum())
            tot["tri_tests"] += int(tag[sel].sum())
            tri = rows[prow[sel], tri_b:tri_b + 54]
            if mode == "anyhit":
                _, h = _mt_leaf(tri, ro[sel],
                                rd[sel], None, anyhit_maxd=maxd[ray[sel]])
                occl[ray[sel][h]] = True
                pair_hit[np.nonzero(sel)[0][h]] = True
            else:
                tnew, _ = _mt_leaf(tri, ro[sel],
                                   rd[sel], tlin[sel])
                tlin[sel] = tnew
                np.minimum.at(tglob, ray[sel], tnew)

        if mode == "anyhit":
            # a pair that just hit stops descending (lineage-local, free on
            # hardware); killing OTHER in-flight pairs of the same ray
            # needs cross-pair traffic — the "global" model's upper bound
            if pruning == "global":
                alive_ray = ~occl[ray]
            else:
                alive_ray = ~pair_hit
        else:
            alive_ray = np.ones(m, bool)

        # hardware cost units, per `block`-pair chunk (pairs are row-
        # sorted): node-instances = distinct rows in the chunk (each pays
        # the 17 scalar header loads + 2 broadcast slab tests + the
        # compacted emission), leaf-instances = distinct (row, side) in
        # the chunk where leaf work runs (each pays a full-width 6-slot
        # Möller-Trumbore unroll regardless of how many lanes want it)
        nb = (m + block - 1) // block
        inst = leaf_inst = 0
        leaf_l = (tag_l > 0) & box_l
        leaf_r = (tag_r > 0) & box_r
        for bi in range(nb):
            sl = slice(bi * block, (bi + 1) * block)
            seg = prow[sl]
            inst += np.unique(seg).size
            leaf_inst += np.unique(seg[leaf_l[sl]]).size
            leaf_inst += np.unique(seg[leaf_r[sl]]).size
        tot["node_inst"] += inst
        tot["leaf_inst"] += leaf_inst

        # emit interior children (left then right per parent keeps the
        # child queue row-sorted: BFS child ids are monotone in parent id)
        go_l = box_l & (tag_l < 0) & alive_ray
        go_r = box_r & (tag_r < 0) & alive_ray
        n_emit = int(go_l.sum()) + int(go_r.sum())
        tot["emit_bytes"] += n_emit * 32
        idx = np.nonzero(go_l | go_r)[0]
        # interleaved emission, parent-major
        reps = go_l[idx].astype(np.int64) + go_r[idx].astype(np.int64)
        new_ray = np.repeat(ray[idx], reps)
        rows_lr = np.where(go_l[idx], ref_l[idx], ref_r[idx])
        second = np.where(go_l[idx] & go_r[idx], ref_r[idx], -1)
        pair_rows = np.stack([rows_lr, second], 1).reshape(-1)
        new_prow = pair_rows[pair_rows >= 0]
        new_t = np.repeat(tlin[idx], reps)
        stats.append(dict(level=lvl, pairs=m, uniq=int(np.unique(prow).size),
                          inst=inst, emitted=new_ray.size))
        ray, prow, tlin = new_ray, new_prow, new_t
        # keep child queue sorted by row id (it nearly is; stable sort =
        # what block-sequential emission produces exactly)
        srt = np.argsort(prow, kind="stable")
        ray, prow, tlin = ray[srt], prow[srt], tlin[srt]
        lvl += 1
    return tglob, occl, stats, tot


def dfs_per_ray_visits(rows, o, d, sample=4096, seed=0):
    """Per-ray ordered DFS with global pruning — the per-ray optimum the
    packet kernel's union is measured against.  Sampled (python loop)."""
    rs = np.random.RandomState(seed)
    idx = rs.choice(o.shape[0], size=min(sample, o.shape[0]), replace=False)
    visits = np.zeros(idx.size, np.int64)
    for k, i in enumerate(idx):
        oi, di = o[i], d[i]
        inv = 1.0 / np.where(di == 0, 1e-30, di)
        neg = di < 0
        t_best = VERY_FAR
        stack = [0]
        v = 0
        while stack:
            ri = stack.pop()
            v += 1
            row = rows[ri]

            def slab1(base):
                lo, hi = row[base:base + 3], row[base + 3:base + 6]
                nb = np.where(neg, hi, lo)
                fb = np.where(neg, lo, hi)
                t0 = ((nb - oi) * inv).max()
                t1 = ((fb - oi) * inv).min()
                return (t0 <= t1) and (t0 < t_best) and (t1 > 0)

            bl, br = slab1(0), slab1(6)
            for tag, box, tri_b in ((row[L_TAG], bl, L_TRI),
                                    (row[R_TAG], br, R_TRI)):
                if box and tag > 0:
                    for j in range(int(tag)):
                        b = tri_b + 9 * j
                        v0 = row[b:b + 3]
                        e1, e2 = row[b + 3:b + 6], row[b + 6:b + 9]
                        p = np.cross(di, e2)
                        det = (e1 * p).sum()
                        if det < 1e-7:
                            continue
                        invd = 1.0 / det
                        tv = oi - v0
                        u = (tv * p).sum() * invd
                        if u < 0 or u > 1:
                            continue
                        q = np.cross(tv, e1)
                        vv = (di * q).sum() * invd
                        if vv < 0 or u + vv > 1:
                            continue
                        t = (e2 * q).sum() * invd
                        if t > EPSILON and (t_best - t) > EPSILON:
                            t_best = t
            ax = int(row[AXIS])
            near_r = bool(neg[ax])
            pair = [(row[L_REF], bl and row[L_TAG] < 0),
                    (row[R_REF], br and row[R_TAG] < 0)]
            first, second = (pair[0], pair[1]) if near_r else (pair[1],
                                                               pair[0])
            if first[1]:
                stack.append(int(first[0]))
            if second[1]:
                stack.append(int(second[0]))
        visits[k] = v
    return visits


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="terrain1m")
    ap.add_argument("--rays", type=int, default=2 * 1_048_576)
    ap.add_argument("--workload", default="mix",
                    choices=["mix", "pri", "shadow"])
    ap.add_argument("--cache", default=None)
    ap.add_argument("--gen-small", action="store_true",
                    help="generate a small CPU workload instead of using "
                         "the TPU-cached one")
    ap.add_argument("--dfs-sample", type=int, default=2048)
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
        v0, v1, v2 = benchmark_scene(1_048_496)
        scene = Scene.from_triangles(v0, v1, v2)
    tables = PacketTables(scene.to_device().bvh)
    rows = np.asarray(tables.rows)
    # level bands (BFS layout: level-contiguous rows)
    print(f"rows {rows.shape}", flush=True)

    cache = args.cache or f"/tmp/kernel_bench_{args.scene}_{args.rays}.npz"
    if not os.path.exists(cache) and args.gen_small:
        # CPU fallback: a small steady-state wavefront via the XLA path
        from tyrant_tpu.bench.harness import _camera_for_pose
        from tyrant_tpu.config import RenderConfig
        from tyrant_tpu.render import Renderer, _raygen
        import jax.numpy as jnp
        cfg = RenderConfig(width=640, height=360, num_rays=args.rays,
                           max_bounces=5, use_packet_kernel="off")
        r = Renderer(scene, cfg, donate=False)
        cam = _camera_for_pose(0)
        r.step(cam, 5)
        st = r.state
        gen = _raygen(cfg, cam.to_device(cfg), st.start_position, st.frame,
                      cfg.height, 0)
        keep = (jnp.arange(cfg.num_rays)
                >= (cfg.num_rays - st.n_carried))[:, None]
        np.savez(cache,
                 mix_o=np.where(np.asarray(keep), st.origin, gen["origin"]),
                 mix_d=np.where(np.asarray(keep), st.direction,
                                gen["direction"]),
                 pri_o=np.asarray(gen["origin"]),
                 pri_d=np.asarray(gen["direction"]))
    if args.workload != "shadow" and not os.path.exists(cache):
        sys.exit(f"workload cache {cache} missing — run "
                 f"scripts/kernel_bench.py --regen on TPU first")
    if args.workload == "shadow":
        # the REAL steady-state connect wavefront (~32% valid slots) from
        # scripts/connect_bench.py --regen
        cache = args.cache or f"/tmp/connect_bench_{args.scene}_{args.rays}.npz"
        if not os.path.exists(cache):
            sys.exit(f"{cache} missing — run connect_bench.py --regen")
        w = np.load(cache)
        o = w["o"].astype(np.float32)
        d = w["d"].astype(np.float32)
        maxd = w["maxd"].astype(np.float32) if "maxd" in w else \
            w[[k for k in w.files if "max" in k or "dist" in k][0]] \
            .astype(np.float32)
        mode = "anyhit"
    else:
        w = np.load(cache)
        o = w[f"{args.workload}_o"].astype(np.float32)
        d = w[f"{args.workload}_d"].astype(np.float32)
        maxd = None
        mode = "closest"
    print(f"workload {args.workload}: {o.shape[0]} rays", flush=True)

    t0 = time.time()
    tga, oca, stats_a, tot_a = stream_traverse(rows, o, d, mode=mode,
                                               maxd=maxd, pruning="lineage")
    print(f"lineage pruning done in {time.time() - t0:.0f}s", flush=True)
    t0 = time.time()
    tgb, ocb, stats_b, tot_b = stream_traverse(rows, o, d, mode=mode,
                                               maxd=maxd, pruning="global")
    print(f"global pruning done in {time.time() - t0:.0f}s", flush=True)
    if mode == "closest":
        assert np.allclose(tga, tgb), "pruning models must agree on t_best"
    else:
        assert (oca == ocb).all(), "pruning models must agree on occlusion"
    t0 = time.time()
    dfs = dfs_per_ray_visits(rows, o, d, sample=args.dfs_sample)
    print(f"DFS sample done in {time.time() - t0:.0f}s", flush=True)

    n = o.shape[0]
    print("\nper-level (lineage):")
    print("  lvl     pairs    uniq-rows  node-inst   emitted")
    for s in stats_a:
        print(f"  {s['level']:3d} {s['pairs']:10d} {s['uniq']:10d} "
              f"{s['inst']:10d} {s['emitted']:10d}")

    def cost(tot, c_inst, c_leaf, c_pair, c_block, label):
        """Projected kernel ms at 1.73 GHz + HBM streaming terms."""
        blocks = sum((s["pairs"] + 1023) // 1024 for s in
                     (stats_a if tot is tot_a else stats_b))
        cyc = (tot["node_inst"] * c_inst + tot["leaf_inst"] * c_leaf
               + tot["pairs"] * c_pair + blocks * c_block)
        ms_compute = cyc / 1.73e9 * 1e3
        bytes_total = tot["pairs"] * 32 + tot["emit_bytes"]
        ms_dma = bytes_total / 819e9 * 1e3
        ms_combine = 45.0 * n / (2 * 1048576)   # final per-ray sort/min
        total = max(ms_compute, ms_dma) + ms_combine
        print(f"  {label:12s} inst={c_inst:4d} leaf={c_leaf:4d} "
              f"pair={c_pair:2d} block={c_block:5d}cy -> "
              f"compute {ms_compute:7.1f} dma {ms_dma:5.1f} "
              f"combine {ms_combine:4.1f} => {total:8.1f} ms")
        return total

    for tot, name in ((tot_a, "lineage"), (tot_b, "global-prune")):
        print(f"\n{name}: pairs {tot['pairs'] / n:.1f}/ray "
              f"({tot['pairs']:,} total), node-inst {tot['node_inst']:,}, "
              f"leaf inst {tot['leaf_inst']:,}, tri tests "
              f"{tot['tri_tests']:,}, levels {tot['levels']}, "
              f"emit {tot['emit_bytes'] / 1e6:.0f} MB")
        print(f"  DFS per-ray optimum (sampled): "
              f"mean {dfs.mean():.1f} visits/ray -> overhead "
              f"{tot['pairs'] / n / dfs.mean():.2f}x")
        print("  projected kernel cost:")
        cost(tot, 80, 150, 2, 500, "optimistic")
        cost(tot, 160, 280, 4, 1500, "expected")
        cost(tot, 280, 450, 8, 3000, "pessimistic")
    print("\nbaselines (measured, docs/PERFORMANCE.md): terrain mono "
          "closest-mix 515 ms, wave 396 ms at 2M; dragon mono 177 ms.")


if __name__ == "__main__":
    main()
