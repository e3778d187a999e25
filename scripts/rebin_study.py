"""Host sim: is subtree re-binning worth building? (VERDICT r2 item 3)

Compares three traversal strategies on the REAL carried-bounce wavefront
(the sorted survivor tail cached by scripts/kernel_bench.py), counting the
cost units of the Pallas kernels:

  * mono      — current production: 1024-ray union packets over the full
                tree (cost = union visits/packet);
  * wave      — 8 independent 128-ray sublane packets per block (cost =
                per-block while-loop iterations = max over the 8 sublanes'
                visit counts, since idle sublanes re-test until the block
                drains);
  * rebin(T)  — two-phase: (1) union-traverse only the top-T-row treelet,
                recording per-ray frontier entry points and treelet-leaf
                t_best; (2) re-group the (ray, subtree) pairs by subtree
                and union-traverse each subtree with packets coherent by
                construction.  Cost = phase-1 visits + phase-2 visits,
                plus the reported duplication factor (the lax.sort the
                real implementation would pay scales with it).

Runs on CPU.  Usage:
    python scripts/rebin_study.py [--scene dragon|terrain1m] [--packets K]
                                  [--treelet T] [--tris N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

VERY_FAR = 1e20
EPSILON = 1e-3

L_TAG, R_TAG, L_REF, R_REF, AXIS, L_TRI = 12, 13, 14, 15, 16, 17


def union_traverse(rows, o, d, t_best, start_row=0, frontier=None,
                   skip_rows=None):
    """Union packet traversal (host replica of traverse_kernel._visit).

    ``frontier``: if given (row count T), rows >= T are NOT visited;
    instead each push of such a row records (row, per-ray wanted mask) in
    pop order.  ``skip_rows``: set of row indices never pushed (used by
    scripts/prime_study.py's phase B to skip the already-resolved phase-A
    subtree).  Returns (visits, entries, t_best).
    """
    n = o.shape[0]
    inv = 1.0 / d
    neg = d[0] < 0
    leaf_width = 6
    R_TRI = L_TRI + 9 * leaf_width

    stack = [start_row]
    visits = 0
    entries = []  # (frontier_row, wanted_mask) in pop order
    while stack:
        row_i = stack.pop()
        if frontier is not None and row_i >= frontier:
            # shouldn't happen: filtered at push time
            raise AssertionError
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
            nonlocal t_best
            for j in range(int(tag)):
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
        lpush = (ref_l, box_l.any() and tag_l < 0, box_l)
        rpush = (ref_r, box_r.any() and tag_r < 0, box_r)
        first, second = (lpush, rpush) if near_is_r else (rpush, lpush)
        for ref, ok, mask in (first, second):  # far first; near popped first
            if not ok:
                continue
            if skip_rows is not None and ref in skip_rows:
                continue
            if frontier is not None and ref >= frontier:
                entries.append((ref, mask.copy()))
            else:
                stack.append(ref)
    return visits, entries, t_best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="dragon")
    ap.add_argument("--packets", type=int, default=64)
    ap.add_argument("--treelet", type=int, default=None,
                    help="re-bin frontier T (rows); default: rows//16")
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
    rows = np.asarray(tables.rows)
    n_rows = rows.shape[0]
    T = args.treelet if args.treelet is not None else max(64, n_rows // 16)
    print(f"scene={args.scene} rows={n_rows} rebin-frontier T={T}")

    path = f"/tmp/kernel_bench_{args.scene}_2097152.npz"
    data = np.load(path)
    o_all, d_all = data["mix_o"], data["mix_d"]
    N = o_all.shape[0]
    # carried survivors live in the TAIL (render_step layout); study those
    tail0 = N - 786_432
    rng = np.random.default_rng(7)
    starts = np.sort(rng.integers(tail0 // 1024, N // 1024,
                                  args.packets) * 1024)

    mono = wave = 0
    ph1 = ph2 = 0
    dup_total = 0
    subtree_packets = 0
    by_root = {}   # GLOBAL pooling: the real lax.sort groups across 2M rays
    all_o, all_d, all_tb1 = [], [], []
    for pi, s in enumerate(starts):
        o = o_all[s:s + 1024].astype(np.float64)
        d = d_all[s:s + 1024].astype(np.float64)
        tb0 = np.full(1024, VERY_FAR)

        v, _, _ = union_traverse(rows, o, d, tb0.copy())
        mono += v

        # 8 sublanes of 128 rays; block cost = max sublane visits
        sub_visits = []
        for g in range(8):
            sl = slice(g * 128, (g + 1) * 128)
            v_s, _, _ = union_traverse(rows, o[sl], d[sl], tb0[sl].copy())
            sub_visits.append(v_s)
        wave += max(sub_visits)

        # --- re-binned: phase 1 over the treelet ---
        v1_, entries, tb1 = union_traverse(rows, o, d, tb0.copy(),
                                           frontier=T)
        ph1 += v1_
        all_o.append(o)
        all_d.append(d)
        all_tb1.append(tb1)
        for ref, mask in entries:
            idx = np.nonzero(mask)[0]
            if idx.size:
                by_root.setdefault(ref, []).append(idx + 1024 * pi)
    o_pool = np.concatenate(all_o)
    d_pool = np.concatenate(all_d)
    tb1_pool = np.concatenate(all_tb1)
    for ref, idx_lists in sorted(by_root.items()):
        idx = np.concatenate(idx_lists)
        dup_total += idx.size
        for c in range(0, idx.size, 1024):
            chunk = idx[c:c + 1024]
            v2_, _, _ = union_traverse(
                rows, o_pool[chunk], d_pool[chunk], tb1_pool[chunk].copy(),
                start_row=ref)
            ph2 += v2_
            subtree_packets += 1

    k = args.packets
    print(f"mono  union visits/packet: {mono / k:7.0f}")
    print(f"wave  block iterations   : {wave / k:7.0f} "
          f"(= max-sublane visits; {mono / max(wave, 1):.2f}x fewer than mono)")
    print(f"rebin phase1 visits/packet: {ph1 / k:6.0f}  "
          f"phase2 visits/packet: {ph2 / k:6.0f}  "
          f"total {(ph1 + ph2) / k:6.0f} "
          f"({mono / max(ph1 + ph2, 1):.2f}x fewer than mono)")
    print(f"rebin duplication: {dup_total / (1024 * k):.2f} entries/ray, "
          f"{subtree_packets / k:.1f} subtree-chunks/packet")


if __name__ == "__main__":
    main()
