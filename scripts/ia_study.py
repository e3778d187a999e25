"""Host sim: can interval-arithmetic (frustum) descend replace the per-visit
vector->scalar any-reduce pair?

Round-3 cost decomposition (docs/PERFORMANCE.md): a mono-kernel visit costs
~460 cycles, ~55% of which is the two any-reduces that turn the per-ray slab
masks into the scalar descend decision (the quad probe pinned the pair at
~250 cycles, and every cheaper Mosaic spelling faults).  Classic IA packet
traversal (Wald et al. 2006 style) sidesteps the reduce entirely: keep
conservative per-packet interval bounds (origin box, 1/d interval per
component, scalar t_max) in SCALAR registers and make the descend decision
with pure scalar interval slab tests — zero vector->scalar syncs on interior
visits.  Per-ray work happens only at leaves (Moller-Trumbore without the
per-ray box mask, which is conservative-only and safe to drop).

The price is frustum looseness: the interval test admits every box the
packet HULL touches, not just boxes some actual ray touches, and per-ray
t_best pruning degrades to a packet-scalar t_max.  Survivor packets are
already (8^3 cell, octant)-sorted, so the hull should be tight-ish; this
script measures exactly how loose, on the real cached workloads
(scripts/kernel_bench.py --regen), before any kernel work.

Variants measured per packet:
  union    — the shipping kernel's union traversal (baseline visit count)
  ia-none  — IA descend, t_max stays VERY_FAR (geometric pruning only)
  ia-ladder— IA descend + halving t_max ladder (one any-reduce per leaf
             pass at most: halve while all t_best <= t_max/2 — the
             Mosaic-safe spelling of "shrink t_max toward max(t_best)")
  ia-max   — IA descend + exact t_max = max(t_best) after every leaf pass
             (value upper bound; an exact max->scalar reduce is in the
             untested-fault-risk class on hw)

For any-hit the packet t_max is max(maxd) over VALID rays (scalar known
before the loop; no ladder needed) and rays drop out via the early-exit
any-reduce the kernel already pays per leaf pass.

Usage:
    python scripts/ia_study.py [--scene dragon|terrain1m] [--packets K]
                               [--rays N] [--anyhit]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

VERY_FAR = 1e20
EPSILON = 1e-3
L_TAG, R_TAG, L_REF, R_REF, AXIS, L_TRI = 12, 13, 14, 15, 16, 17
LEAF_WIDTH = 6
R_TRI = L_TRI + 9 * LEAF_WIDTH


def packet_bounds(o, d, valid=None):
    """Per-packet conservative scalars the kernel would read from a
    precomputed XLA-side table: origin box, inv-direction interval and a
    per-component sign (+1/-1) or 0 = mixed (component unconstrained)."""
    if valid is None:
        valid = np.ones(o.shape[0], bool)
    ov = o[valid]
    dv = d[valid]
    o_lo, o_hi = ov.min(0), ov.max(0)
    sign = np.zeros(3, np.int32)
    inv_lo = np.zeros(3)
    inv_hi = np.zeros(3)
    for c in range(3):
        dc = dv[:, c]
        if (dc > 0).all():
            sign[c] = 1
        elif (dc < 0).all():
            sign[c] = -1
        else:
            continue  # mixed: unconstrained
        with np.errstate(divide="ignore"):
            ic = 1.0 / dc
        inv_lo[c], inv_hi[c] = ic.min(), ic.max()
    return o_lo, o_hi, sign, inv_lo, inv_hi


def _imin_prod(a0, a1, b0, b1):
    return min(a0 * b0, a0 * b1, a1 * b0, a1 * b1)


def _imax_prod(a0, a1, b0, b1):
    return max(a0 * b0, a0 * b1, a1 * b0, a1 * b1)


def ia_slab(row, base, o_lo, o_hi, sign, inv_lo, inv_hi, t_max):
    """Scalar interval slab test: True iff some point of the packet hull may
    hit box row[base:base+6] before t_max.  ~40 scalar flops — the thing
    that replaces the (8,128) slab + 2 any-reduces."""
    t0 = -np.inf
    t1 = np.inf
    for c in range(3):
        if sign[c] == 0:
            continue
        lo, hi = row[base + c], row[base + 3 + c]
        nb, fb = (lo, hi) if sign[c] > 0 else (hi, lo)
        # (nb - o_c) interval x inv_c interval
        a0, a1 = nb - o_hi[c], nb - o_lo[c]
        b0, b1 = fb - o_hi[c], fb - o_lo[c]
        t0 = max(t0, _imin_prod(a0, a1, inv_lo[c], inv_hi[c]))
        t1 = min(t1, _imax_prod(b0, b1, inv_lo[c], inv_hi[c]))
    return (t0 <= t1) and (t1 > 0) and (t0 < t_max)


def mt_leaf(row, tri_base, tag, o, d, t_best, maxd=None, hit=None):
    """Leaf Moller-Trumbore WITHOUT the per-ray box mask (conservative-only,
    dropped under IA).  Closest-hit updates t_best; any-hit sets hit."""
    tri_tests = 0
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
              & (u + v <= 1) & (t > EPSILON))
        if maxd is None:
            ok &= (t_best - t) > EPSILON
            t_best[:] = np.where(ok, t, t_best)
        else:
            ok &= ((maxd - t) > EPSILON) & (hit == 0)
            hit[:] = np.where(ok, 1, hit)
    return tri_tests


def ia_traverse(rows, o, d, ladder, maxd=None):
    """IA packet traversal.  Returns counters dict.

    ladder: 'none' | 'ladder' | 'max' (closest-hit t_max policy).
    maxd:   per-ray max distance -> any-hit mode (t_max = max over valid).
    """
    n = o.shape[0]
    anyhit = maxd is not None
    if anyhit:
        valid = maxd > 2.0 * EPSILON
        if not valid.any():
            return dict(visits=0, leaf_passes=0, tri_tests=0, reduces=0,
                        t_best=np.full(n, VERY_FAR, np.float32),
                        hit=np.zeros(n, np.int32))
        t_max = float(maxd[valid].max())
    else:
        valid = np.ones(n, bool)
        t_max = VERY_FAR
    o_lo, o_hi, sign, inv_lo, inv_hi = packet_bounds(o, d, valid)
    t_best = np.full(n, VERY_FAR, np.float32)
    hit = np.zeros(n, np.int32)
    neg = d[0] < 0

    stack = [0]
    visits = leaf_passes = tri_tests = reduces = 0
    while stack:
        row_i = stack.pop()
        visits += 1
        row = rows[row_i]
        box_l = ia_slab(row, 0, o_lo, o_hi, sign, inv_lo, inv_hi, t_max)
        box_r = ia_slab(row, 6, o_lo, o_hi, sign, inv_lo, inv_hi, t_max)
        tag_l, tag_r = row[L_TAG], row[R_TAG]
        ref_l, ref_r = int(row[L_REF]), int(row[R_REF])
        did_leaf = False
        if box_l and tag_l > 0:
            leaf_passes += 1
            did_leaf = True
            tri_tests += mt_leaf(row, L_TRI, tag_l, o, d, t_best,
                                 maxd, hit if anyhit else None)
        if box_r and tag_r > 0:
            leaf_passes += 1
            did_leaf = True
            tri_tests += mt_leaf(row, R_TRI, tag_r, o, d, t_best,
                                 maxd, hit if anyhit else None)
        if did_leaf:
            if anyhit:
                reduces += 1  # early-exit check (the kernel already pays it)
                if not ((hit == 0) & valid).any():
                    break
            elif ladder == "max":
                reduces += 1
                live = t_best[valid]
                t_max = float(live.max()) if live.size else t_max
            elif ladder == "ladder":
                reduces += 1  # first check is paid even when nothing halves
                while t_max > 10 * EPSILON and \
                        not (t_best[valid] > t_max / 2).any():
                    t_max /= 2
                    reduces += 1
        axis = int(row[AXIS])
        near_is_r = bool(neg[axis])
        first = (ref_l, box_l and tag_l < 0) if near_is_r \
            else (ref_r, box_r and tag_r < 0)
        second = (ref_r, box_r and tag_r < 0) if near_is_r \
            else (ref_l, box_l and tag_l < 0)
        if first[1]:
            stack.append(first[0])   # far
        if second[1]:
            stack.append(second[0])  # near (popped first)
    return dict(visits=visits, leaf_passes=leaf_passes, tri_tests=tri_tests,
                reduces=reduces, t_best=t_best, hit=hit)


def union_traverse(rows, o, d, maxd=None):
    """The shipping kernel's union traversal (baseline), incl. the any-hit
    invalid/occluded union drop + early exit."""
    n = o.shape[0]
    anyhit = maxd is not None
    inv = np.where(d != 0, 1.0 / np.where(d == 0, 1.0, d), np.inf * np.sign(d + 0.5))
    t_best = np.full(n, VERY_FAR, np.float32)
    hit = np.zeros(n, np.int32)
    neg = d[0] < 0
    if anyhit:
        valid = maxd > 2.0 * EPSILON
        if not valid.any():
            return dict(visits=0, leaf_passes=0, tri_tests=0, t_best=t_best,
                        hit=hit)

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
            m = (t0 <= t1) & (t1 > 0)
            if anyhit:
                m &= (t0 < maxd) & valid & (hit == 0)
            else:
                m &= t0 < t_best
            return m

        box_l, box_r = slab(0), slab(6)
        tag_l, tag_r = row[L_TAG], row[R_TAG]
        ref_l, ref_r = int(row[L_REF]), int(row[R_REF])
        if box_l.any() and tag_l > 0:
            leaf_passes += 1
            tri_tests += mt_leaf(row, L_TRI, tag_l, o, d, t_best,
                                 maxd, hit if anyhit else None)
        if box_r.any() and tag_r > 0:
            leaf_passes += 1
            tri_tests += mt_leaf(row, R_TRI, tag_r, o, d, t_best,
                                 maxd, hit if anyhit else None)
        if anyhit and not ((hit == 0) & valid).any():
            break
        axis = int(row[AXIS])
        near_is_r = bool(neg[axis])
        first = (ref_l, box_l.any() and tag_l < 0) if near_is_r \
            else (ref_r, box_r.any() and tag_r < 0)
        second = (ref_r, box_r.any() and tag_r < 0) if near_is_r \
            else (ref_l, box_l.any() and tag_l < 0)
        if first[1]:
            stack.append(first[0])
        if second[1]:
            stack.append(second[0])
    return dict(visits=visits, leaf_passes=leaf_passes, tri_tests=tri_tests,
                t_best=t_best, hit=hit)


# measured constants (docs/PERFORMANCE.md round-3 decomposition + quad probe)
CYC_VISIT_MONO = 460       # full union visit
CYC_REDUCE = 125           # one vector->scalar any-reduce
CYC_IA_INTERIOR = 250      # ~15 scalar loads + ~40 scalar flops + stack (est)
CYC_LEAF_VPU = 300         # M-T vector work per leaf pass (est, amortized)


def predict_ms(visits, leaf_passes, reduces, n_packets, clock=0.94e9):
    """Rough wall estimate at the measured constants, for the simulated
    packets only — the caller scales to the full wavefront."""
    cyc = (visits * CYC_IA_INTERIOR + leaf_passes * CYC_LEAF_VPU
           + reduces * CYC_REDUCE + n_packets * 8000)
    return cyc / clock * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="dragon")
    ap.add_argument("--packets", type=int, default=48)
    ap.add_argument("--rays", type=int, default=2 * 1_048_576)
    ap.add_argument("--anyhit", action="store_true")
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
        v0, v1, v2 = benchmark_scene(1_048_576)
        scene = Scene.from_triangles(v0, v1, v2)
    rows = np.asarray(PacketTables(scene.to_device().bvh).rows)

    path = f"/tmp/kernel_bench_{args.scene}_{args.rays}.npz"
    if not os.path.exists(path):
        sys.exit(f"missing {path}: run scripts/kernel_bench.py --regen first")
    data = np.load(path)

    rng = np.random.default_rng(7)
    for label in ("pri", "mix"):
        o_all, d_all = data[f"{label}_o"], data[f"{label}_d"]
        starts = rng.integers(0, len(o_all) // 1024, args.packets) * 1024
        agg = {}
        for s in starts:
            o = o_all[s:s + 1024].astype(np.float64)
            d = d_all[s:s + 1024].astype(np.float64)
            runs = {"union": union_traverse(rows, o, d)}
            base_t = runs["union"]["t_best"]
            for lad in ("none", "ladder", "max"):
                runs[f"ia-{lad}"] = ia_traverse(rows, o, d, lad)
                np.testing.assert_allclose(
                    runs[f"ia-{lad}"]["t_best"], base_t, rtol=1e-5,
                    err_msg=f"IA({lad}) diverged from union at slot {s}")
            if args.anyhit:
                # any-hit shaped like connect: max distance from the hits,
                # invalid (miss) slots get maxd=0 like the real shadow queue
                maxd = np.where(base_t < 1e19, base_t * 0.999, 0.0)
                runs["union-any"] = union_traverse(rows, o, d, maxd=maxd)
                runs["ia-any"] = ia_traverse(rows, o, d, "none", maxd=maxd)
            for k, r in runs.items():
                a = agg.setdefault(k, dict(visits=0, leaf_passes=0,
                                           tri_tests=0, reduces=0))
                for f in ("visits", "leaf_passes", "tri_tests"):
                    a[f] += r[f]
                a["reduces"] += r.get("reduces", 0)
        k = args.packets
        print(f"\n== {args.scene} {label} ({k} packets) ==")
        u = agg["union"]
        mono_ms = (u["visits"] * CYC_VISIT_MONO + k * 8000) / 0.94e9 * 1e3 \
            * (args.rays / (k * 1024))
        scale = args.rays / (k * 1024)
        for name, a in agg.items():
            pred = ""
            if name.startswith("ia"):
                base = agg["union-any" if name == "ia-any" else "union"]
                ms = predict_ms(a["visits"], a["leaf_passes"], a["reduces"],
                                k) * scale
                pred = (f"  visits x{a['visits'] / max(base['visits'], 1):.2f}"
                        f"  tri x{a['tri_tests'] / max(base['tri_tests'], 1):.2f}"
                        f"  pred {ms:7.1f} ms @2M")
            elif name == "union":
                pred = f"  (mono model {mono_ms:7.1f} ms @2M)"
            print(f"  {name:10s} visits/pkt {a['visits'] / k:7.1f}  "
                  f"leaf/pkt {a['leaf_passes'] / k:6.1f}  "
                  f"tri/pkt {a['tri_tests'] / k:7.1f}{pred}")


if __name__ == "__main__":
    main()
