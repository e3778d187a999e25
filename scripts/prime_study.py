"""Host sim: does a primed-t two-phase traversal pay for incoherent packets?

Hypothesis (round 3, post-rebin-refutation): the carried-bounce packet's
~355 union visits (vs ~30 coherent) are mostly breadth — rays entering many
subtrees because each ray's t_best is still VERY_FAR when the packet walks
the top of the tree, so nothing prunes.  Most bounce rays hit *locally*
(the survivor sort already groups them by origin cell), so a cheap phase A
that traverses only the small subtree around the packet's origin cell can
discover tight per-ray t_best values first; phase B then walks the full
tree with those primes and the slab test `t0 < t_best` kills the far
descends that make up the union blowup.

Correctness is phase B's: it traverses the whole tree (optionally skipping
the phase-A subtree, which is already fully resolved), and a prime is only
ever a *real* hit distance, so pruning with it is exact.

Cost model = union visits (the mono kernel's while-loop trip count), same
as scripts/rebin_study.py, whose `union_traverse` this reuses.

Needs the cached steady-state workload from scripts/kernel_bench.py
(run it once with --regen on the TPU first).

Usage:
    python scripts/prime_study.py [--scene dragon|terrain1m] [--packets K]
                                  [--grid G]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from rebin_study import union_traverse, L_TAG, R_TAG, L_REF, R_REF

VERY_FAR = 1e20


def cell_to_row(rows, root_lo, root_hi, grid):
    """For every cell of the survivor-sort spatial grid, the deepest fat-row
    (interior node) whose box contains the cell's AABB.  Descent: follow the
    single interior child that contains the cell box; stop when neither or
    both do, or the containing child is a leaf."""
    g = grid
    span = np.maximum(root_hi - root_lo, 1e-3)
    out = np.zeros(g * g * g, np.int64)
    for cx in range(g):
        for cy in range(g):
            for cz in range(g):
                lo = root_lo + span * (np.array([cx, cy, cz]) / g)
                hi = root_lo + span * (np.array([cx + 1, cy + 1, cz + 1]) / g)
                row_i = 0
                while True:
                    row = rows[row_i]
                    cand = None
                    n_contain = 0
                    for base, tag_l, ref_l in ((0, L_TAG, L_REF),
                                               (6, R_TAG, R_REF)):
                        blo, bhi = row[base:base + 3], row[base + 3:base + 6]
                        if (blo <= lo).all() and (bhi >= hi).all():
                            n_contain += 1
                            if row[tag_l] < 0:  # interior child
                                cand = int(row[ref_l])
                    if n_contain == 1 and cand is not None:
                        row_i = cand
                    else:
                        break
                out[(cx * g + cy) * g + cz] = row_i
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="dragon")
    ap.add_argument("--packets", type=int, default=48)
    ap.add_argument("--grid", type=int, default=8)
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
    root_lo = np.asarray(sd.bvh.node_packed[0, 0:3])
    root_hi = np.asarray(sd.bvh.node_packed[0, 3:6])

    path = f"/tmp/kernel_bench_{args.scene}_2097152.npz"
    data = np.load(path)
    o_all, d_all = data["mix_o"], data["mix_d"]
    N = o_all.shape[0]
    tail0 = N - 786_432
    rng = np.random.default_rng(7)
    starts = np.sort(rng.integers(tail0 // 1024, N // 1024,
                                  args.packets) * 1024)

    g = args.grid
    c2r = cell_to_row(rows, root_lo, root_hi, g)
    depth_hist = {}
    span = np.maximum(root_hi - root_lo, 1e-3)

    mono = primed_a = primed_b = 0
    trivial = 0  # packets whose cell maps to the root (no phase A possible)
    for s in starts:
        o = o_all[s:s + 1024].astype(np.float64)
        d = d_all[s:s + 1024].astype(np.float64)
        tb0 = np.full(1024, VERY_FAR)

        v, _, _ = union_traverse(rows, o, d, tb0.copy())
        mono += v

        q = np.clip(((o[0] - root_lo) / span * g).astype(int), 0, g - 1)
        cell = (q[0] * g + q[1]) * g + q[2]
        start = int(c2r[cell])
        depth_hist[start == 0] = depth_hist.get(start == 0, 0) + 1
        if start == 0:
            trivial += 1
            primed_a += 0
            primed_b += v
            continue
        va, _, tbA = union_traverse(rows, o, d, tb0.copy(), start_row=start)
        vb, _, _ = union_traverse(rows, o, d, tbA.copy(),
                                  skip_rows={start})
        primed_a += va
        primed_b += vb

    k = args.packets
    print(f"scene={args.scene} rows={rows.shape[0]} grid={g}^3 "
          f"trivial-cells(root)={trivial}/{k}")
    print(f"mono   union visits/packet: {mono / k:7.0f}")
    print(f"primed phaseA: {primed_a / k:6.0f}  phaseB: {primed_b / k:6.0f}  "
          f"total {(primed_a + primed_b) / k:6.0f} "
          f"({mono / max(primed_a + primed_b, 1):.2f}x fewer than mono)")


if __name__ == "__main__":
    main()
