"""Pallas TPU packet-traversal kernels (closest-hit + any-hit).

The reference hides SIMT divergence with atomic work-stealing over persistent
threads (kernel.cu:211-224, README "work stealing").  The TPU has no per-lane
gather into big tables (Mosaic vector gathers only reach one 8x128 tile), so
a GPU-style per-ray traversal cannot be expressed efficiently.  Instead this
kernel uses classic *packet tracing* (Wald-style SIMD packets), which maps
1:1 onto the TPU's split scalar/vector architecture:

  * the SCALAR core walks the BVH with an explicit stack in SMEM (the
    64-entry per-thread stack of bvh.h:124 becomes one per-packet stack) and
    reads node fields as scalar VMEM loads — arbitrary indices are free for
    the scalar unit;
  * the VPU tests ALL 8x128 = 1024 packet rays against the current node box
    with broadcast compares (zero gathers in the hot loop);
  * a node is descended if ANY ray in the packet wants it; per-ray
    ``t_best`` keeps the reference's early-out pruning (Bbox.h:61).

Table layout ("fat rows").  Mosaic scalar loads only allow dynamic indices
on the SUBLANE dimension, and VMEM pads every row to 128 lanes (512 B), so
the layout packs everything about one INTERIOR node into a single f32 row:

  lanes  0-5   left child AABB (lo.xyz, hi.xyz)
  lanes  6-11  right child AABB
  lane   12    left child tag:  >0 leaf prim count, <0 interior, 0 empty
  lane   13    right child tag
  lane   14    left ref:  fat-row index (interior) / global prim offset (leaf)
  lane   15    right ref
  lane   16    this node's split axis (traversal ordering, bvh.h:146-152)
  lanes  17..  left leaf payload: LEAF_WIDTH x (v0,e1,e2) triangles
  lanes  ..    right leaf payload (2 x 6 x 9 + 17 = 125 lanes used)

Integers are stored as exact f32 values (all < 2^24) so the kernel needs no
bitcasts.  One row per interior node: visits halve vs a node-at-a-time walk
and VMEM capacity is ~n_tris/2 rows (~20k-triangle scenes; two-level treelet
streaming is the planned extension for larger scenes).

Semantics (hit acceptance, epsilon rules) match ops/traverse.py bit-for-bit
except for floating-point association differences in Möller-Trumbore.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Diagnostic ablations for cost-model measurement (scripts/kernel_bench.py
# A/Bs; docs/PERFORMANCE.md round-3 log).  Traversal control flow (pushes,
# visit counts) is preserved; only the indicated work is dropped, so the
# timing delta isolates that component.  RESULTS ARE WRONG under ablation —
# never set in production.
#   TYRANT_ABLATE=noleaf  -> skip all leaf Möller-Trumbore work
#   TYRANT_ABLATE=leaf2   -> test only 2 of LEAF_WIDTH slots per leaf
#   TYRANT_ABLATE=xreduce -> ADD two dummy any-reduces per visit (control
#                            flow unchanged): the time delta over baseline
#                            divided by 2x visits measures the per-sync
#                            cost directly
_ABLATE = os.environ.get("TYRANT_ABLATE", "")
# ONE vector->scalar reduce per visit instead of two: descend/leaf gating
# uses any(box_l | box_r) for both children, trading dead-sibling visits
# (x1.27-1.39 visit count, host sim) for one fewer ~150-cycle sync on the
# critical path.  Results are bit-identical (a dead visit's slab masks
# reject every accept).  A/B knob; measured on chip before promotion.
_ONE_REDUCE = os.environ.get("TYRANT_ONE_REDUCE", "0") == "1"
# WAVE variant of the same experiment: per sublane, ONE any-reduce over
# (pushable_l | pushable_r) decides pushes for BOTH children (each still
# gated by its own scalar interior-tag test), cutting 8 of the ~18
# per-iteration vector->scalar reduces at the price of dead-sibling
# visits.  Results stay bit-identical (a dead visit accepts nothing).
_WAVE_ONE_REDUCE = os.environ.get("TYRANT_WAVE_ONE_REDUCE", "0") == "1"
# Round-4 micro-lever A/Bs (VERDICT r3 item 7 — the last open in-kernel
# levers; the cost model predicts both are neutral on a latency-bound
# visit, these knobs measure it):
#   TYRANT_LEAF_BUCKET=1 -> leaf slots 4-5 run under a nested lax.cond on
#       (tag > slot): leaves with <= 4 triangles (the vast majority; mean
#       leaf size ~4.2) skip a third of the Möller-Trumbore unroll at the
#       price of one extra scalar branch per leaf pass.  Bit-identical
#       results (skipped slots could never accept).
#   TYRANT_BF16_SLAB=1 -> child slab tests computed in bfloat16 with a
#       tmax-relative dilation on the compares, halving the slab VPU word
#       width.  TIMING A/B ONLY, results are approximate: bf16's (n - o)
#       cancellation error scales with (|n|+|o|)*2^-8*|inv|, which no
#       output-relative pad can bound (measured: ~0.05% of rays lose
#       their hit on the dragon) — an exactly conservative version needs
#       per-axis error-bound arithmetic that costs more than the halved
#       word width saves.  Never set in production.
_LEAF_BUCKET = os.environ.get("TYRANT_LEAF_BUCKET", "0") == "1"
_BF16_SLAB = os.environ.get("TYRANT_BF16_SLAB", "0") == "1"

from ...config import EPSILON, VERY_FAR
from ...scene.bvh import META_AXIS_SHIFT, META_COUNT_MASK, META_OFFSET_SHIFT

# rays per packet (sublanes x 128 lanes).  Default 8 sublanes = 1024 rays;
# overridable for A/B studies (scripts/kernel_bench.py) — a bigger packet
# amortizes the per-visit scalar/sync latency and the per-packet while-loop
# overhead over more rays at the price of wider union-of-visits.
PACKET = int(os.environ.get("TYRANT_PACKET", "1024"))
assert PACKET % 128 == 0
_SUB = PACKET // 128
# packets per grid step: amortizes the per-grid-step overhead (the fat-row
# table DMA) over many packets
PACKETS_PER_BLOCK = int(os.environ.get("TYRANT_PPB",
                                       str(max(1, 16384 // PACKET))))
STACK_DEPTH = 128      # cf. reference's 64-entry stack (bvh.h:124)
ROW_WIDTH = 128
# VMEM budget for the fat-row table; beyond this the caller falls back
VMEM_TABLE_BUDGET = 10 * 1024 * 1024
# HBM mode: rows are BFS-ordered so this VMEM-resident prefix holds the TOP
# of the tree (the levels every ray crosses); only deep-tail visits DMA.
# Bigger is faster (32768 measured ~5% over 16384 on the 1M-tri terrain)
# but v5e's scoped-vmem limit is 16.0 MB for the whole kernel: 32768 rows
# x 512 B = 16.78 MB alone OOMs inside the full render-step jit (it
# happened to fit in a standalone kernel benchmark).  24576 rows
# (12.6 MB) keeps ~3.4 MB of headroom for the ray blocks and scratch.
TREELET_ROWS = int(os.environ.get("TYRANT_TREELET", "24576"))

LEAF_WIDTH = 6  # must match ops.traverse.LEAF_WIDTH / BVHConfig
_L_TAG, _R_TAG, _L_REF, _R_REF, _AXIS = 12, 13, 14, 15, 16
_L_TRI = 17
_R_TRI = _L_TRI + 9 * LEAF_WIDTH
assert _R_TRI + 9 * LEAF_WIDTH <= ROW_WIDTH


def tables_fit_vmem(n_interior_rows: int) -> bool:
    return n_interior_rows * ROW_WIDTH * 4 <= VMEM_TABLE_BUDGET


def _mt_packet(ox, oy, oz, dx, dy, dz, v0x, v0y, v0z, e1x, e1y, e1z,
               e2x, e2y, e2z):
    """Möller-Trumbore, scalar triangle vs vector rays.
    Reference: loader.h:21-46 (backface culling via det >= 1e-7)."""
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1.0, det)
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    valid = (det >= 1e-7) & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
    return jnp.where(valid, t, 0.0)


# Packets advanced per while-loop iteration.  Measured on v5e (dragon, 2M
# rays): K=4 is a 30% REGRESSION over K=1 — the group's while loop runs to
# the max of K packet depths while every iteration pays K packets of VPU
# work, and that tail waste beats the latency-hiding win.  Keep 1.
# (env-overridable for A/B re-tests of that result)
INTERLEAVE = int(os.environ.get("TYRANT_INTERLEAVE", "1"))


def _traverse_kernel(*refs, closest: bool, hbm: bool = False,
                     n_top: int = TREELET_ROWS, normals: bool = False):
    """PACKETS_PER_BLOCK packets per grid step, traversed in groups of
    INTERLEAVE: each group shares ONE while loop advancing 4 independent
    1024-ray packets per iteration (4 private SMEM stacks, 4 row
    scratches).  A single packet's visit is a long dependent chain
    (pop -> row fetch -> broadcast -> slab -> any-reduce -> push); running
    four such chains per iteration lets Mosaic fill each chain's latency
    bubbles with another packet's work.  Each packet's own DFS order is
    unchanged, so results are bit-identical to one-packet-at-a-time.

    rows_ref: [I, 128] f32 fat-row table (VMEM; in ``hbm`` mode the full
    table lives in HBM with its BFS prefix rows[:n_top] — the top of the
    tree — replicated in a VMEM ``top_ref``: treelet visits are plain VMEM
    copies, only deep-tail visits DMA, INTERLEAVE in flight)."""
    nrm = 3 if normals else 0
    if hbm:
        (rows_ref, top_ref, ox_ref, oy_ref, oz_ref, dxr_ref, dyr_ref,
         dzr_ref, t0_ref, tout_ref, hit_ref) = refs[:11]
        nrm_refs = refs[11:11 + nrm]
        rest = refs[11 + nrm:]
        stacks = rest[0:INTERLEAVE]
        row8s = rest[INTERLEAVE:2 * INTERLEAVE]
        row_bufs = rest[2 * INTERLEAVE:3 * INTERLEAVE]
        sems = rest[3 * INTERLEAVE]
        pair_buf, pair_sem = (rest[3 * INTERLEAVE + 1],
                              rest[3 * INTERLEAVE + 2]) \
            if INTERLEAVE == 1 else (None, None)
    else:
        (rows_ref, ox_ref, oy_ref, oz_ref, dxr_ref, dyr_ref,
         dzr_ref, t0_ref, tout_ref, hit_ref) = refs[:10]
        nrm_refs = refs[10:10 + nrm]
        rest = refs[10 + nrm:]
        stacks = rest[0:INTERLEAVE]
        row8s = rest[INTERLEAVE:2 * INTERLEAVE]
        row_bufs, sems, top_ref = None, None, None
        pair_buf, pair_sem = None, None

    sub = PACKET // 128
    for g in range(PACKETS_PER_BLOCK // INTERLEAVE):
        packs = []
        for i in range(INTERLEAVE):
            k = g * INTERLEAVE + i
            s = slice(sub * k, sub * (k + 1))
            packs.append((s, dxr_ref[sub * k, 0], dyr_ref[sub * k, 0],
                          dzr_ref[sub * k, 0]))
        _traverse_group(rows_ref, top_ref, ox_ref, oy_ref, oz_ref,
                        dxr_ref, dyr_ref, dzr_ref, t0_ref, tout_ref,
                        hit_ref, packs, stacks, row8s, row_bufs, sems,
                        closest, n_top, pair_buf, pair_sem,
                        nrm_refs=nrm_refs if normals else None)


def _traverse_group(rows_ref, top_ref, ox_ref, oy_ref, oz_ref, dxr_ref,
                    dyr_ref, dzr_ref, t0_ref, tout_ref, hit_ref, packs,
                    stacks, row8s, row_bufs, sems, closest: bool,
                    n_top: int, pair_buf=None, pair_sem=None,
                    nrm_refs=None):
    """Per-packet hit state (``t_best``/``hit``) is REGISTER-CARRIED through
    the while loop (round-3 item: the previous design round-tripped both
    through the output refs every visit — one (8,128) load per slab prune
    plus load+store pairs in every leaf pass).  The refs are written once,
    after the loop.

    HBM mode adds SIBLING-PAIR PREFETCH (round-3, terrain lever): during a
    deep visit, the 2-row block holding the node's interior children
    (adjacent by PacketTables' BFS pair numbering) is DMA'd in the
    background; whenever anything was pushed, the next pop lands in that
    pair, so the ~per-visit HBM DMA latency hides behind the previous
    visit's VPU/sync work.  Backtrack pops (nothing pushed) fall back to
    the serial per-row DMA."""
    K = len(packs)
    pair = pair_buf is not None
    normals = nrm_refs is not None
    # carry stride per packet: sp, t_best, hit [, nx, ny, nz]
    ST = 6 if normals else 3
    ctxs = []
    init = []
    for i, (s, dx0, dy0, dz0) in enumerate(packs):
        ox, oy, oz = ox_ref[s, :], oy_ref[s, :], oz_ref[s, :]
        dx, dy, dz = dxr_ref[s, :], dyr_ref[s, :], dzr_ref[s, :]
        t_init = t0_ref[s, :]
        inv_x, inv_y, inv_z = 1.0 / dx, 1.0 / dy, 1.0 / dz
        # per-axis sign masks, hoisted out of the visit loop (pure
        # hoisting — no numeric change)
        negm = (dx < 0, dy < 0, dz < 0)
        rays = (ox, oy, oz, dx, dy, dz, inv_x, inv_y, inv_z, negm)
        # packet traversal-order heuristic: first ray's direction signs
        negs = ((dx0 < 0).astype(jnp.int32), (dy0 < 0).astype(jnp.int32),
                (dz0 < 0).astype(jnp.int32))
        # derived from t_init (not a literal) so the leaf lax.cond branches
        # agree on varying manual axes under shard_map check_vma in
        # interpret mode (same fix as ops/traverse.py carries)
        izero = (t_init * 0.0).astype(jnp.int32)
        hit0 = izero - 1 if closest else izero
        stacks[i][0] = 0
        ctxs.append((s, rays, t_init, negs))
        # anyhit never updates t_best: carry a scalar dummy in its slot
        init += [jnp.int32(0), t_init if closest else jnp.int32(0), hit0]
        if normals:
            # unnormalised geometric normal (cross(e1,e2)) of the winning
            # triangle, register-carried like t_best — shade consumes it
            # instead of a ~12 ms/2M tri-table gather
            z = t_init * 0.0
            init += [z, z, z]
    if pair:
        init.append(jnp.int32(-1))  # pair_base: -1 = no prefetch in flight

    def cond(carry):
        alive = carry[0] >= 0
        for i in range(1, K):
            alive = alive | (carry[ST * i] >= 0)
        return alive

    n_rows = rows_ref.shape[0]

    def body(carry):
        sps = [carry[ST * i] for i in range(K)]
        pair_base = carry[ST * K] if pair else None
        if pair:
            # resolve the in-flight sibling-pair DMA before touching the
            # buffer (started at the end of the previous iteration)
            @pl.when(pair_base >= 0)
            def _():
                pltpu.make_async_copy(
                    rows_ref.at[pl.ds(jnp.maximum(pair_base, 0), 2), :],
                    pair_buf, pair_sem.at[0]).wait()
        rows, alives, p_hits = [], [], []
        for i in range(K):
            alive = (sps[i] >= 0).astype(jnp.int32)
            # clamp: a drained packet (sp=-1) idling in an interleave group
            # must never address outside the table (ADVICE r2: an OOB row
            # is a worker-killing DMA in HBM mode)
            row = jnp.clip(stacks[i][jnp.maximum(sps[i], 0)], 0, n_rows - 1)
            rows.append(row)
            alives.append(alive)
            if row_bufs is None:
                rowv = rows_ref[pl.ds(row, 1), :]
                row8s[i][:] = jnp.broadcast_to(rowv, (_SUB, 128))
            else:
                # two-level treelet: BFS top of the tree is a VMEM copy,
                # only deep-tail rows DMA from HBM (K DMAs overlap) — and
                # with pair prefetch, a deep row already sitting in the
                # prefetched sibling pair skips the DMA entirely
                in_top = row < n_top
                if pair:
                    p_hit = ((pair_base >= 0) & (row >= pair_base)
                             & (row < pair_base + 2))
                else:
                    p_hit = jnp.bool_(False)
                p_hits.append(p_hit)

                @pl.when(in_top)
                def _(i=i, row=row):
                    row_bufs[i][:] = top_ref[pl.ds(row, 1), :]

                @pl.when(jnp.logical_not(in_top) & jnp.logical_not(p_hit))
                def _(i=i, row=row):
                    pltpu.make_async_copy(rows_ref.at[pl.ds(row, 1), :],
                                          row_bufs[i], sems.at[i]).start()
        if row_bufs is not None:
            for i in range(K):
                @pl.when((rows[i] >= n_top) & jnp.logical_not(p_hits[i]))
                def _(i=i, row=rows[i]):
                    pltpu.make_async_copy(rows_ref.at[pl.ds(row, 1), :],
                                          row_bufs[i], sems.at[i]).wait()
            for i in range(K):
                @pl.when(jnp.logical_not(p_hits[i]))
                def _(i=i):
                    row8s[i][:] = jnp.broadcast_to(row_bufs[i][0:1, :],
                                                   (_SUB, 128))
                if pair:
                    @pl.when(p_hits[i] & (rows[i] >= n_top))
                    def _(i=i, row=rows[i]):
                        off = jnp.clip(row - pair_base, 0, 1)
                        row8s[i][:] = jnp.broadcast_to(
                            pair_buf[pl.ds(off, 1), :], (_SUB, 128))

        out = []
        for i in range(K):
            s, rays, t_init, negs = ctxs[i]
            row = rows[i]
            rowv8 = row8s[i][:]

            if row_bufs is None:
                def rd(lane, row=row):
                    return rows_ref[row, lane]
            else:
                # scalar reads from the top TABLE or a DMA-LANDED buffer
                # (pair_buf / row_bufs) — never from a vector-written
                # scratch (that staging faults at runtime,
                # docs/PERFORMANCE.md crash list)
                def rd(lane, row=row, i=i):
                    v_top = top_ref[jnp.minimum(row, n_top - 1), lane]
                    v_deep = row_bufs[i][0, lane]
                    if pair:
                        v_pair = pair_buf[
                            jnp.clip(row - jnp.maximum(pair_base, 0), 0, 1),
                            lane]
                        v_deep = jnp.where(p_hits[i], v_pair, v_deep)
                    return jnp.where(row < n_top, v_top, v_deep)

            sp = sps[i] - alives[i]  # pop (no-op when already empty)
            out += list(_visit(rd, rowv8, rays, t_init,
                               tuple(carry[ST * i + 1:ST * i + ST]),
                               stacks[i], sp, alives[i], closest, negs,
                               pair_info=(n_top, n_rows) if pair else None))
        if pair:
            pair_next = out.pop()  # appended by _visit for K == 1

            @pl.when(pair_next >= 0)
            def _():
                pltpu.make_async_copy(
                    rows_ref.at[pl.ds(jnp.maximum(pair_next, 0), 2), :],
                    pair_buf, pair_sem.at[0]).start()
            out.append(pair_next)
        return tuple(out)

    final = jax.lax.while_loop(cond, body, tuple(init))
    for i in range(K):
        s, _, t_init, _ = ctxs[i]
        tout_ref[s, :] = final[ST * i + 1] if closest else t_init
        hit_ref[s, :] = final[ST * i + 2]
        if normals:
            for c in range(3):
                nrm_refs[c][s, :] = final[ST * i + 3 + c]


def _visit(rd, rowv8, rays, t_init, hstate, stack_ref,
           sp, alive, closest: bool, negs, pair_info=None):
    """One node visit for one packet: ordered slab tests, scalar-predicated
    leaf work via value-returning ``lax.cond`` (register-carried
    ``t_best``/``hit``), far-then-near pushes.  ``sp`` is the stack top
    AFTER the pop; ``alive`` (i32 0/1) gates all side effects so a drained
    packet can idle-retest its stale top node (idempotent under the strict
    accept rules) while siblings in the interleave group finish.
    ``hstate`` is (t_best, hit) or (t_best, hit, nx, ny, nz) — the optional
    trailing entries carry the winning triangle's unnormalised geometric
    normal so shade can skip its tri-table gather.
    Returns (sp, *hstate)."""
    t_best, hit = hstate[0], hstate[1]
    nrm = list(hstate[2:])  # [] or [nx, ny, nz]
    (ox, oy, oz, dx, dy, dz, inv_x, inv_y, inv_z, negm) = rays
    negm_x, negm_y, negm_z = negm
    negx, negy, negz = negs

    def rv(i):
        return rowv8[:, i:i + 1]

    axis = rd(_AXIS).astype(jnp.int32)
    neg_axis = jnp.where(axis == 0, negx,
                         jnp.where(axis == 1, negy, negz))
    prune = t_best if closest else t_init

    def slab(base):
        lox, loy, loz = rv(base + 0), rv(base + 1), rv(base + 2)
        hix, hiy, hiz = rv(base + 3), rv(base + 4), rv(base + 5)
        n_x = jnp.where(negm_x, hix, lox)
        f_x = jnp.where(negm_x, lox, hix)
        n_y = jnp.where(negm_y, hiy, loy)
        f_y = jnp.where(negm_y, loy, hiy)
        n_z = jnp.where(negm_z, hiz, loz)
        f_z = jnp.where(negm_z, loz, hiz)
        if _BF16_SLAB:
            # A/B knob: half-width slab arithmetic + conservatively
            # DILATED compares (bf16 rounding is < 2^-8 relative; the
            # 1 +- 2^-6 factors over-cover it, so a wanted box is never
            # culled — only ~1-2% extra boundary visits)
            bf = jnp.bfloat16
            obx, oby, obz = ox.astype(bf), oy.astype(bf), oz.astype(bf)
            ibx, iby, ibz = (inv_x.astype(bf), inv_y.astype(bf),
                             inv_z.astype(bf))
            tmin = jnp.maximum(
                jnp.maximum((n_x.astype(bf) - obx) * ibx,
                            (n_y.astype(bf) - oby) * iby),
                (n_z.astype(bf) - obz) * ibz).astype(jnp.float32)
            tmax = jnp.minimum(
                jnp.minimum((f_x.astype(bf) - obx) * ibx,
                            (f_y.astype(bf) - oby) * iby),
                (f_z.astype(bf) - obz) * ibz).astype(jnp.float32)
            pad = jnp.abs(tmax) * 0.015625 + 1e-3
            bh = (tmin <= tmax + pad) & (tmin < prune * 1.015625 + 1e-3) \
                & (tmax > -pad)
            del pad
        else:
            # NB keep (b - o) * inv association: the XLA oracle computes
            # the same expression, and the equivalence gate requires exact
            # id agreement (an FMA-form rewrite here measurably changes
            # boundary visits)
            tmin = jnp.maximum(
                jnp.maximum((n_x - ox) * inv_x, (n_y - oy) * inv_y),
                (n_z - oz) * inv_z)
            tmax = jnp.minimum(
                jnp.minimum((f_x - ox) * inv_x, (f_y - oy) * inv_y),
                (f_z - oz) * inv_z)
            bh = (tmin <= tmax) & (tmin < prune) & (tmax > 0)
        if not closest:
            # done rays drop out of the union; so do rays that can never
            # accept a hit (maxd <= 2eps, e.g. INVALID shadow slots whose
            # max distance was zeroed): an origin inside the box gives
            # tmin < 0 < prune, so without this term every invalid slot
            # still forced full-depth descends on its packet
            bh = bh & (hit == 0) & (t_init > 2.0 * EPSILON)
        return bh

    box_l = slab(0)
    box_r = slab(6)
    if _ONE_REDUCE:
        any_l = any_r = jnp.any(box_l | box_r)
    else:
        any_l = jnp.any(box_l)
        any_r = jnp.any(box_r)

    tag_l = rd(_L_TAG).astype(jnp.int32)
    tag_r = rd(_R_TAG).astype(jnp.int32)
    ref_l = rd(_L_REF).astype(jnp.int32)
    ref_r = rd(_R_REF).astype(jnp.int32)
    alive_b = alive > 0

    # --- leaf children: lax.cond value returns keep t_best/hit in
    # registers (no ref round-trips per leaf pass) ---
    n_slots = {"noleaf": 0, "leaf2": 2}.get(_ABLATE, LEAF_WIDTH)

    def leaf_child(tri_base, tag, ref, box_hit):
        def slot_block(lo_slot, hi_slot):
            """Unrolled MT over slots [lo_slot, hi_slot) as a
            value-carried function (composable under lax.cond)."""
            def run(tb, h, *nn):
                nn = list(nn)
                for j in range(lo_slot, hi_slot):
                    slot_ok = box_hit & (j < tag)
                    b = tri_base + 9 * j
                    e1x, e1y, e1z = rv(b + 3), rv(b + 4), rv(b + 5)
                    e2x, e2y, e2z = rv(b + 6), rv(b + 7), rv(b + 8)
                    t = _mt_packet(
                        ox, oy, oz, dx, dy, dz,
                        rv(b + 0), rv(b + 1), rv(b + 2),
                        e1x, e1y, e1z, e2x, e2y, e2z)
                    if closest:
                        # accept rule bvh.h:134
                        ok = slot_ok & (t > EPSILON) & ((tb - t) > EPSILON)
                        tb = jnp.where(ok, t, tb)
                        h = jnp.where(ok, ref + j, h)
                        if nn:
                            # cross(e1, e2): per-triangle (sub, 1) scalars,
                            # selected into the carried normal on accept
                            nn[0] = jnp.where(ok, e1y * e2z - e1z * e2y,
                                              nn[0])
                            nn[1] = jnp.where(ok, e1z * e2x - e1x * e2z,
                                              nn[1])
                            nn[2] = jnp.where(ok, e1x * e2y - e1y * e2x,
                                              nn[2])
                    else:
                        # accept rule bvh.h:229 vs max dist in t_init
                        ok = slot_ok & (t > EPSILON) \
                            & ((t_init - t) > EPSILON)
                        h = jnp.where(ok, 1, h)
                return (tb, h, *nn)
            return run

        if _LEAF_BUCKET and n_slots > 4:
            # A/B knob: slots 4.. only run when the leaf actually holds
            # more than 4 triangles (mean leaf size ~4.2 — most leaf
            # passes skip a third of the MT unroll for one extra scalar
            # branch).  Bit-identical: skipped slots have j >= tag and
            # could never accept.
            head = slot_block(0, 4)
            tail = slot_block(4, n_slots)

            def run(tb, h, *nn):
                out = head(tb, h, *nn)
                return jax.lax.cond(tag > 4, tail,
                                    lambda tb, h, *nn: (tb, h, *nn), *out)
            return run
        return slot_block(0, n_slots)

    passthru = lambda tb, h, *nn: (tb, h, *nn)
    t_best, hit, *nrm = jax.lax.cond(
        any_l & (tag_l > 0) & alive_b,
        leaf_child(_L_TRI, tag_l, ref_l, box_l),
        passthru, t_best, hit, *nrm)
    t_best, hit, *nrm = jax.lax.cond(
        any_r & (tag_r > 0) & alive_b,
        leaf_child(_R_TRI, tag_r, ref_r, box_r),
        passthru, t_best, hit, *nrm)

    # --- interior children: push far then near (near popped first);
    # dead writes above sp are harmless when predicated off ---
    push_l = any_l & (tag_l < 0) & alive_b
    push_r = any_r & (tag_r < 0) & alive_b
    near_is_r = neg_axis == 1
    first_ref = jnp.where(near_is_r, ref_l, ref_r)   # far
    first_ok = jnp.where(near_is_r, push_l, push_r)
    second_ref = jnp.where(near_is_r, ref_r, ref_l)  # near
    second_ok = jnp.where(near_is_r, push_r, push_l)
    # a dead lane's unconditional store at stacks[0] must keep pointing at
    # the root ROW, never a stale leaf's triangle offset (ADVICE r2 high:
    # that offset is only bounded by 2^24 and the next idle fetch of it
    # would be an out-of-table read / OOB DMA)
    first_ref = jnp.where(alive_b, first_ref, 0)
    second_ref = jnp.where(alive_b, second_ref, 0)
    stack_ref[jnp.maximum(sp + 1, 0)] = first_ref
    sp = sp + first_ok.astype(jnp.int32)
    stack_ref[jnp.maximum(sp + 1, 0)] = second_ref
    sp = sp + second_ok.astype(jnp.int32)
    if _ABLATE == "xreduce":
        # two extra vector->scalar reduces that can never change sp
        # (sp >= -1 always; the max argument is <= -2); defeats DCE
        e1 = jnp.any(box_l ^ box_r).astype(jnp.int32)
        e2 = jnp.any(box_l & box_r).astype(jnp.int32)
        sp = jnp.maximum(sp, e1 + e2 - 4)
    if _ABLATE in ("quad", "quadns"):  # quadns: no dummy stack stores
        # MARGINAL cost of an MBVH4 visit over this binary visit
        # (scripts/mbvh_study.py decides if 4-ary pays): +2 slab tests on
        # garbage boxes (overlapping lanes — cost only), +2 any-reduces,
        # +6 scalar lane loads, +2 ordering selects, +2 predicated stack
        # stores.  Behavior-neutral: the stores land strictly ABOVE the
        # stack top (sp+1+{0,1,2} is only readable after a real push
        # rewrites it) and the sp fold is clamped <= -2 so max() is a
        # no-op; all folded values are data-dependent so nothing DCEs.
        box_3 = slab(3)
        box_4 = slab(17)
        e3 = jnp.any(box_3).astype(jnp.int32)
        e4 = jnp.any(box_4).astype(jnp.int32)
        xs = [rd(_L_TRI + 30 + j).astype(jnp.int32) for j in range(6)]
        y1 = jnp.where(e3 > e4, xs[0], xs[1])
        y2 = jnp.where(e3 < e4, xs[2], xs[3])
        y3 = jnp.where(neg_axis == 1, y1, y2)
        if _ABLATE == "quad":
            stack_ref[jnp.maximum(sp + 1 + e3, 0)] = \
                jnp.where(alive_b, first_ref, 0)
            stack_ref[jnp.maximum(sp + 2 - e4, 0)] = \
                jnp.where(alive_b, second_ref, 0)
        sp = jnp.maximum(sp, jnp.minimum(xs[4] + xs[5] + y3 + e3 + e4, -2))
    if not closest:
        # early exit once every ray is either occluded or can never accept
        # a hit (dead slots would otherwise keep hit == 0 forever and the
        # exit would never fire on partially-valid shadow packets)
        done = (hit > 0) | (t_init <= 2.0 * EPSILON)
        sp = jnp.where(jnp.all(done), -1, sp)
    if pair_info is not None:
        # sibling-pair prefetch target: whenever anything was pushed, the
        # next pop is one of this node's interior children, which occupy
        # the adjacent rows [base, base+1] (PacketTables pair numbering);
        # only deep pairs (>= treelet) need the DMA
        n_top_, n_rows_ = pair_info
        base = jnp.minimum(jnp.where(tag_l < 0, ref_l, ref_r), n_rows_ - 2)
        pushed = first_ok | second_ok
        # (sp >= 0) guard: the anyhit early exit may end the loop right
        # after a push — a prefetch started then would never be waited
        pair_next = jnp.where(pushed & (base >= n_top_) & (sp >= 0),
                              base, -1)
        return (sp, t_best, hit, *nrm, pair_next)
    return (sp, t_best, hit, *nrm)


# --------------------------------------------------------------------------
# wave kernel: 8 independent 128-ray subpackets per (8, 128) block
# --------------------------------------------------------------------------
#
# The mono packet above unions box tests over 1024 rays: every union visit
# runs full-width VPU ops, so an incoherent wavefront tests ~1700 nodes per
# 1k rays x 1024 rays each = ~56x more ray-node tests than the per-ray
# optimum (scripts/coherence_study.py).  Splitting the block into 8
# SUBLANE-sized packets with independent stacks cuts the per-ray waste
# ~4.5x: each sublane walks its own node, the VPU still runs full (8, 128)
# ops, and the scalar core maintains 8 stacks.  Per-sublane descend/push
# decisions are computed VECTORIZED as (8, 1) columns, staged through a
# VMEM flags scratch, and read back as scalars (Mosaic cannot feed vector
# reduces into addressing/control directly).

_F_ANYLEAF_L, _F_ANYLEAF_R = 0, 1
_F_ALIVE = 2
_F_FIRST_REF, _F_FIRST_OK, _F_SECOND_REF, _F_SECOND_OK = 3, 4, 5, 6
_F_OCC_ALL = 7


# unrolled waves per grid step (env-overridable: CI shrinks it — interpret
# mode traces every unrolled packet body, which dominates test time)
WAVE_PACKETS_PER_BLOCK = int(os.environ.get("TYRANT_WAVE_PPB", "4"))


def _wave_kernel(*refs, closest: bool, hbm: bool = False,
                 n_top: int = TREELET_ROWS, normals: bool = False):
    """Args: rows_ref [, top_ref when hbm], 7 ray refs, 2 out refs, then
    scratch: 8 SMEM (STACK_DEPTH,) i32 stacks (one per sublane), 8 VMEM
    (1,128) f32 row buffers, [+ 8 DMA semaphores when ``hbm``].

    Every memory-access pattern here is one the mono kernel already proves
    on this chip (docs/PERFORMANCE.md catalogues the Mosaic patterns that
    fault at runtime): 1-D SMEM stacks, dynamic-sublane vector loads from
    input tables, full-ref scratch stores, scalar loads from input tables /
    DMA-landed buffers, and full vector->scalar reduces.  The (8,128)
    working tensor is assembled by concatenating the 8 row buffers.

    HBM mode is a TWO-LEVEL treelet scheme: ``top_ref`` holds the BFS
    prefix rows[:n_top] in VMEM (the upper levels, where most visits
    land); only deeper rows are DMA'd from HBM, up to eight in flight."""
    nrm = 3 if normals else 0
    if hbm:
        (rows_ref, top_ref, ox_ref, oy_ref, oz_ref, dxr_ref, dyr_ref,
         dzr_ref, t0_ref, tout_ref, hit_ref) = refs[:11]
        nrm_refs = refs[11:11 + nrm]
        rest = refs[11 + nrm:]
        stacks, bufs, sems = rest[0:8], rest[8:16], rest[16]
    else:
        (rows_ref, ox_ref, oy_ref, oz_ref, dxr_ref, dyr_ref,
         dzr_ref, t0_ref, tout_ref, hit_ref) = refs[:10]
        nrm_refs = refs[10:10 + nrm]
        rest = refs[10 + nrm:]
        stacks, bufs, sems = rest[0:8], rest[8:16], None
        top_ref = None

    for k in range(WAVE_PACKETS_PER_BLOCK):
        s = slice(8 * k, 8 * (k + 1))
        # per-sublane traversal-order heuristic: each sublane's FIRST ray's
        # direction signs, loaded once as scalars (static indices) and
        # passed into the loop — replaces 8 per-iteration vector->scalar
        # any-reduces over broadcast sign columns
        sub_negs = tuple(
            ((dxr_ref[8 * k + j, 0] < 0).astype(jnp.int32),
             (dyr_ref[8 * k + j, 0] < 0).astype(jnp.int32),
             (dzr_ref[8 * k + j, 0] < 0).astype(jnp.int32))
            for j in range(8))
        _wave_packet(rows_ref, top_ref, ox_ref[s, :], oy_ref[s, :],
                     oz_ref[s, :], dxr_ref[s, :], dyr_ref[s, :],
                     dzr_ref[s, :], t0_ref[s, :], tout_ref, hit_ref, s,
                     stacks, bufs, sems, closest, n_top, sub_negs,
                     nrm_refs=nrm_refs if normals else None)


def _wave_packet(rows_ref, top_ref, ox, oy, oz, dx, dy, dz, t_init,
                 tout_ref, hit_ref, out_slice, stacks, bufs, sems,
                 closest: bool, n_top: int, sub_negs=None, nrm_refs=None):
    """Round-3 rewrite: ``t_best``/``hit`` are REGISTER-CARRIED through the
    while loop (the round-2 version round-tripped both through the output
    refs every iteration and in every leaf pass — same change as the mono
    kernel's _visit), and the near-child traversal order is decided in the
    SCALAR domain from per-sublane direction signs (``sub_negs``, 8x3
    scalars hoisted by the caller) instead of 8 per-iteration
    vector->scalar any-reduces over broadcast sign columns."""
    inv_x = 1.0 / dx
    inv_y = 1.0 / dy
    inv_z = 1.0 / dz

    for s in range(8):
        stacks[s][0] = 0

    def cond(carry):
        sps = carry[0:8]
        alive = sps[0] >= 0
        for s in range(1, 8):
            alive = alive | (sps[s] >= 0)
        return alive

    n_rows = rows_ref.shape[0]
    # derive init from t_init so varying manual axes agree under shard_map
    # check_vma in interpret mode (same trick as the mono kernel)
    izero = (t_init * 0.0).astype(jnp.int32)
    hit0 = izero - 1 if closest else izero
    # anyhit never reads t_best: a scalar dummy rides in its carry slot
    tb0 = t_init if closest else jnp.int32(0)
    normals = nrm_refs is not None
    nrm0 = (t_init * 0.0,) * 3 if normals else ()

    def body(carry):
        sps = carry[0:8]
        t_best = carry[8]
        hit = carry[9]
        nrm = list(carry[10:13]) if normals else []
        # --- pop one node per sublane; land its fat row in buffer s ---
        # clamp: a drained sublane idles while siblings finish; its row must
        # stay inside the table (OOB DMA = worker crash, ADVICE r2 high)
        rows_s = []
        for s in range(8):
            row_s = jnp.clip(stacks[s][jnp.maximum(sps[s], 0)], 0, n_rows - 1)
            rows_s.append(row_s)
            if sems is None:
                bufs[s][:] = rows_ref[pl.ds(row_s, 1), :]
            else:
                @pl.when(row_s < n_top)
                def _(s=s, row_s=row_s):
                    bufs[s][:] = top_ref[pl.ds(row_s, 1), :]

                @pl.when(row_s >= n_top)
                def _(s=s, row_s=row_s):
                    pltpu.make_async_copy(rows_ref.at[pl.ds(row_s, 1), :],
                                          bufs[s], sems.at[s]).start()
        if sems is not None:
            for s in range(8):
                @pl.when(rows_s[s] >= n_top)
                def _(s=s, row_s=rows_s[s]):
                    pltpu.make_async_copy(rows_ref.at[pl.ds(row_s, 1), :],
                                          bufs[s], sems.at[s]).wait()

        # scalar node fields.  VMEM mode reads the input table (the mono
        # kernel's proven pattern); HBM mode reads the DMA-landed buffer
        # for deep rows and the top table for treelet rows.
        def rd(s, lane):
            if sems is None:
                return rows_ref[rows_s[s], lane]
            v_top = top_ref[jnp.minimum(rows_s[s], n_top - 1), lane]
            return jnp.where(rows_s[s] < n_top, v_top, bufs[s][0, lane])

        R = jnp.concatenate([bufs[s][:] for s in range(8)], axis=0)

        def rv(i):
            return R[:, i:i + 1]

        prune = t_best if closest else t_init

        def slab(base):
            lox, loy, loz = rv(base + 0), rv(base + 1), rv(base + 2)
            hix, hiy, hiz = rv(base + 3), rv(base + 4), rv(base + 5)
            n_x = jnp.where(dx < 0, hix, lox)
            f_x = jnp.where(dx < 0, lox, hix)
            n_y = jnp.where(dy < 0, hiy, loy)
            f_y = jnp.where(dy < 0, loy, hiy)
            n_z = jnp.where(dz < 0, hiz, loz)
            f_z = jnp.where(dz < 0, loz, hiz)
            tmin = jnp.maximum(
                jnp.maximum((n_x - ox) * inv_x, (n_y - oy) * inv_y),
                (n_z - oz) * inv_z)
            tmax = jnp.minimum(
                jnp.minimum((f_x - ox) * inv_x, (f_y - oy) * inv_y),
                (f_z - oz) * inv_z)
            bh = (tmin <= tmax) & (tmin < prune) & (tmax > 0)
            if not closest:
                # see _visit: drop done rays AND never-acceptable rays
                # (maxd <= 2eps) from the union
                bh = bh & (hit == 0) & (t_init > 2.0 * EPSILON)
            return bh

        box_l = slab(0)
        box_r = slab(6)

        tag_l_v = rv(_L_TAG)
        tag_r_v = rv(_R_TAG)
        pushable_l = box_l & (tag_l_v < 0)
        pushable_r = box_r & (tag_r_v < 0)
        leafy_l = box_l & (tag_l_v > 0)
        leafy_r = box_r & (tag_r_v > 0)

        # --- leaf passes: vector-masked per sublane, gated by scalar ORs;
        # value-returning lax.cond keeps t_best/hit in registers (no ref
        # round-trips — same structure as the mono kernel's _visit).
        # A sublane whose stack already drained retests its stale top node;
        # the strict accept rules make that idempotent, so no alive mask is
        # threaded into the vector side.
        def leaf_child(tri_base, box_hit, tag_v, ref_v):
            ref_i = ref_v.astype(jnp.int32)

            def run(tb, h, *nn):
                nn = list(nn)
                for j in range(LEAF_WIDTH):
                    slot_ok = box_hit & (float(j) < tag_v)
                    b = tri_base + 9 * j
                    e1x, e1y, e1z = rv(b + 3), rv(b + 4), rv(b + 5)
                    e2x, e2y, e2z = rv(b + 6), rv(b + 7), rv(b + 8)
                    t = _mt_packet(
                        ox, oy, oz, dx, dy, dz,
                        rv(b + 0), rv(b + 1), rv(b + 2),
                        e1x, e1y, e1z, e2x, e2y, e2z)
                    if closest:
                        ok = slot_ok & (t > EPSILON) & ((tb - t) > EPSILON)
                        tb = jnp.where(ok, t, tb)
                        h = jnp.where(ok, ref_i + j, h)
                        if nn:
                            nn[0] = jnp.where(ok, e1y * e2z - e1z * e2y,
                                              nn[0])
                            nn[1] = jnp.where(ok, e1z * e2x - e1x * e2z,
                                              nn[1])
                            nn[2] = jnp.where(ok, e1x * e2y - e1y * e2x,
                                              nn[2])
                    else:
                        ok = slot_ok & (t > EPSILON) & ((t_init - t) > EPSILON)
                        h = jnp.where(ok, 1, h)
                return (tb, h, *nn)
            return run

        passthru = lambda tb, h, *nn: (tb, h, *nn)
        t_best, hit, *nrm = jax.lax.cond(
            jnp.any(leafy_l), leaf_child(_L_TRI, box_l, tag_l_v, rv(_L_REF)),
            passthru, t_best, hit, *nrm)
        t_best, hit, *nrm = jax.lax.cond(
            jnp.any(leafy_r), leaf_child(_R_TRI, box_r, tag_r_v, rv(_R_REF)),
            passthru, t_best, hit, *nrm)

        # --- per-sublane descend/push planning + scalar stack maintenance.
        # Constraint (learned the hard way — three worker crashes): only
        # `jnp.any`-style reduces of vector values feeding scalar control
        # are safe on this chip; SUM-reduce -> scalar -> addressing faults
        # at scale, as do (8,1) axis-reduces (this also explains round 1's
        # "majority vote" crash, docs/PERFORMANCE.md).  So each per-sublane
        # flag is its own any-reduce over a (1,128) slice, with the tag
        # test merged into the mask so no scalar tag loads are needed.
        if _WAVE_ONE_REDUCE:
            pushable_b = pushable_l | pushable_r
        new_sps = []
        for s in range(8):
            sp_s = sps[s]
            alive_s = (sp_s >= 0).astype(jnp.int32)
            ref_l = rd(s, _L_REF).astype(jnp.int32)
            ref_r = rd(s, _R_REF).astype(jnp.int32)
            if _WAVE_ONE_REDUCE:
                push_b = jnp.any(pushable_b[s:s + 1, :]).astype(jnp.int32) \
                    * alive_s
                push_l = push_b * (rd(s, _L_TAG) < 0).astype(jnp.int32)
                push_r = push_b * (rd(s, _R_TAG) < 0).astype(jnp.int32)
            else:
                push_l = jnp.any(pushable_l[s:s + 1, :]).astype(jnp.int32) \
                    * alive_s
                push_r = jnp.any(pushable_r[s:s + 1, :]).astype(jnp.int32) \
                    * alive_s
            # near-child order from the hoisted per-sublane sign scalars +
            # one scalar axis load — replaces a per-sublane vector->scalar
            # any-reduce (~70 cycles each, 8 per iteration)
            axis_s = rd(s, _AXIS).astype(jnp.int32)
            negx_s, negy_s, negz_s = sub_negs[s]
            near_is_r = jnp.where(axis_s == 0, negx_s,
                                  jnp.where(axis_s == 1, negy_s,
                                            negz_s)) == 1
            first_ref = jnp.where(near_is_r, ref_l, ref_r)   # far child
            first_ok = jnp.where(near_is_r, push_l, push_r)
            second_ref = jnp.where(near_is_r, ref_r, ref_l)  # near child
            second_ok = jnp.where(near_is_r, push_r, push_l)
            # dead sublane: keep stacks[s][0] pointing at the root row, not
            # a stale child ref that may be a leaf's triangle offset
            # (ADVICE r2 high — OOB row fetch / DMA on the next idle pop)
            first_ref = jnp.where(alive_s > 0, first_ref, 0)
            second_ref = jnp.where(alive_s > 0, second_ref, 0)
            spn = sp_s - alive_s  # pop (no-op when already empty)
            stacks[s][jnp.maximum(spn + 1, 0)] = first_ref
            spn = spn + first_ok
            stacks[s][jnp.maximum(spn + 1, 0)] = second_ref
            spn = spn + second_ok
            if not closest:
                # early exit once every subpacket ray is occluded or dead
                # (dead = maxd <= 2eps, can never accept a hit)
                live = (hit[s:s + 1, :] == 0) \
                    & (t_init[s:s + 1, :] > 2.0 * EPSILON)
                spn = jnp.where(jnp.any(live), spn, jnp.int32(-1))
            new_sps.append(spn)
        return tuple(new_sps) + (t_best, hit, *nrm)

    final = jax.lax.while_loop(cond, body,
                               (jnp.int32(0),) * 8 + (tb0, hit0) + nrm0)
    tout_ref[out_slice, :] = final[8] if closest else t_init
    hit_ref[out_slice, :] = final[9]
    if normals:
        for c in range(3):
            nrm_refs[c][out_slice, :] = final[10 + c]


def _pad_to_packets(x, n, fill):
    pad = (-n) % PACKET
    if pad:
        x = jnp.concatenate([x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)])
    return x


@functools.partial(jax.jit,
                   static_argnames=("closest", "interpret", "hbm", "wave",
                                    "treelet_rows", "normals"))
def _run(rows, origin, direction, t_init, closest: bool,
         interpret: bool = False, hbm: bool = False, wave: bool = False,
         treelet_rows: int | None = None, normals: bool = False):
    assert not normals or closest, "normals only exist for closest-hit"
    n = origin.shape[0]
    comps = [
        _pad_to_packets(origin[:, 0], n, 0.0),
        _pad_to_packets(origin[:, 1], n, 0.0),
        _pad_to_packets(origin[:, 2], n, 0.0),
        _pad_to_packets(direction[:, 0], n, 1.0),
        _pad_to_packets(direction[:, 1], n, 1.0),
        _pad_to_packets(direction[:, 2], n, 1.0),
        _pad_to_packets(t_init, n, 0.0 if not closest else VERY_FAR),
    ]
    # round packets up to a whole number of blocks
    if wave:
        assert PACKET == 1024, "wave kernel assumes 1024-ray packets"
    ppb = WAVE_PACKETS_PER_BLOCK if wave else PACKETS_PER_BLOCK
    block_rays = PACKET * ppb
    npad = comps[0].shape[0]
    if npad % block_rays:
        extra = block_rays - npad % block_rays
        comps = [jnp.concatenate(
            [c, jnp.broadcast_to(c[-1:], (extra,) + c.shape[1:])])
            for c in comps]
        npad += extra
    n_blocks = npad // block_rays
    rows_per_block = (PACKET // 128) * ppb
    comps = [c.reshape(n_blocks * rows_per_block, 128) for c in comps]

    ray_spec = pl.BlockSpec((rows_per_block, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    sub = PACKET // 128
    table_spec = (pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY) if hbm
                  else pl.BlockSpec(memory_space=pltpu.VMEM))
    tables_in = [rows]
    table_specs = [table_spec]
    n_top = treelet_rows if treelet_rows is not None else TREELET_ROWS
    if wave:
        if hbm:
            # BFS-ordered prefix = top of the tree, VMEM-resident treelet
            tables_in.append(rows[:n_top])
            table_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        scratch = [pltpu.SMEM((STACK_DEPTH,), jnp.int32)] * 8 \
            + [pltpu.VMEM((1, 128), jnp.float32)] * 8
        if hbm:
            scratch.append(pltpu.SemaphoreType.DMA((8,)))
        kernel = functools.partial(_wave_kernel, closest=closest, hbm=hbm,
                                   n_top=n_top, normals=normals)
    elif hbm:
        tables_in.append(rows[:n_top])
        table_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        scratch = [pltpu.SMEM((STACK_DEPTH,), jnp.int32)] * INTERLEAVE \
            + [pltpu.VMEM((sub, 128), jnp.float32)] * INTERLEAVE \
            + [pltpu.VMEM((1, 128), jnp.float32)] * INTERLEAVE \
            + [pltpu.SemaphoreType.DMA((INTERLEAVE,))]
        if INTERLEAVE == 1:
            # sibling-pair prefetch buffer + its semaphore
            scratch += [pltpu.VMEM((2, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((1,))]
        kernel = functools.partial(_traverse_kernel, closest=closest, hbm=hbm,
                                   n_top=n_top, normals=normals)
    else:
        scratch = [pltpu.SMEM((STACK_DEPTH,), jnp.int32)] * INTERLEAVE \
            + [pltpu.VMEM((sub, 128), jnp.float32)] * INTERLEAVE
        kernel = functools.partial(_traverse_kernel, closest=closest, hbm=hbm,
                                   normals=normals)
    def _sds(shape, dtype):
        # under shard_map with check_vma, pallas outputs must declare their
        # varying manual axes; inherit them from the (sharded) ray inputs
        try:
            vma = jax.typeof(origin).vma
            if vma:
                return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
        except (AttributeError, TypeError):
            pass
        return jax.ShapeDtypeStruct(shape, dtype)

    n_out = 2 + (3 if normals else 0)
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=table_specs + [ray_spec] * 7,
        out_specs=[ray_spec] * n_out,
        out_shape=[
            _sds((n_blocks * rows_per_block, 128), jnp.float32),
            _sds((n_blocks * rows_per_block, 128), jnp.int32)]
        + [_sds((n_blocks * rows_per_block, 128), jnp.float32)] * (n_out - 2),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*tables_in, *comps)
    t_out, hit_out = out[0], out[1]
    if normals:
        nrm = jnp.stack([c.reshape(-1)[:n] for c in out[2:5]], axis=1)
        return t_out.reshape(-1)[:n], hit_out.reshape(-1)[:n], nrm
    return t_out.reshape(-1)[:n], hit_out.reshape(-1)[:n]


class PacketTables:
    """Fat-row table derived from a BVHDevice (built once per scene).

    ``supported`` is False when the scene exceeds the kernel's exact-f32
    integer range (2^24 primitive offsets / row indices) or the tree is
    deeper than the SMEM stack; callers must fall back to the XLA path.
    """

    def __init__(self, bvh_device):
        node = np.asarray(bvh_device.node_packed)  # [Nn, 8]
        leaf_packed = np.asarray(bvh_device.leaf_packed)  # [L, 36]
        meta = node[:, 6].copy().view(np.int32)
        lane7 = node[:, 7].copy().view(np.int32)  # second child / leaf row
        count = meta & META_COUNT_MASK
        axis = (meta >> META_AXIS_SHIFT) & 3
        offset = meta >> META_OFFSET_SHIFT
        is_leaf = count > 0
        nn = node.shape[0]

        if nn == 1:
            # single-node tree (or spheres-only stub): pseudo-root with the
            # lone leaf on the left and an empty right child
            rows = np.zeros((1, ROW_WIDTH), np.float32)
            rows[0, 0:6] = node[0, 0:6]
            rows[0, 6:9] = 1e10   # inverted box: never hit
            rows[0, 9:12] = -1e10
            rows[0, _L_TAG] = float(count[0])
            rows[0, _L_REF] = float(offset[0])
            if is_leaf[0]:
                rows[0, _L_TRI:_L_TRI + 9 * LEAF_WIDTH] = leaf_packed[lane7[0]]
            self.rows = jnp.asarray(rows)
            self.fits = True
            self.supported = True
            return

        interior = np.nonzero(~is_leaf)[0]
        n_rows = len(interior)
        # BFS (level-order) row numbering with SIBLING-PAIR ADJACENCY:
        # children of one parent are enqueued together (left then right),
        # so (a) rows[:TREELET_ROWS] is exactly the top of the tree — the
        # HBM kernel keeps that prefix VMEM-resident — and (b) a node's two
        # interior children always occupy ADJACENT rows, which lets the
        # kernel DMA the child PAIR as one 2-row fetch during the parent's
        # visit (sibling-pair prefetch; the next pop is one of the pair
        # whenever anything was pushed).  The root stays row 0.
        levels = []
        frontier = np.asarray([0] if not is_leaf[0] else [], np.int64)
        dep = 0
        while frontier.size:
            levels.append(frontier)
            dep += 1
            # interleave (left, right) per parent to keep siblings adjacent
            kids = np.stack([frontier + 1, lane7[frontier]],
                            axis=1).reshape(-1)
            frontier = kids[~is_leaf[kids]]
        order_seq = np.concatenate(levels) if levels else \
            np.zeros((0,), np.int64)
        row_of = np.full(nn, -1, np.int64)
        row_of[order_seq] = np.arange(n_rows)
        # pair-adjacency invariant consumed by the prefetch path
        both_int = ~is_leaf[interior + 1] & ~is_leaf[lane7[interior]]
        assert (row_of[lane7[interior[both_int]]]
                == row_of[interior[both_int] + 1] + 1).all()

        rr = row_of[interior]
        rows = np.zeros((n_rows, ROW_WIDTH), np.float32)
        rows[rr, _AXIS] = axis[interior].astype(np.float32)
        for side, child, tag_c, ref_c, tri_c in (
                ("L", interior + 1, _L_TAG, _L_REF, _L_TRI),
                ("R", lane7[interior], _R_TAG, _R_REF, _R_TRI)):
            base = 0 if side == "L" else 6
            rows[rr, base:base + 6] = node[child, 0:6]
            child_leaf = is_leaf[child]
            rows[rr, tag_c] = np.where(child_leaf, count[child],
                                       -1).astype(np.float32)
            rows[rr, ref_c] = np.where(child_leaf, offset[child],
                                       row_of[child]).astype(np.float32)
            lp = np.where(child_leaf, lane7[child], 0)
            payload = leaf_packed[lp]
            payload[~child_leaf] = 0.0
            rows[rr, tri_c:tri_c + 9 * LEAF_WIDTH] = payload

        self.rows = jnp.asarray(rows)
        self.fits = tables_fit_vmem(n_rows)

        # ints ride in f32 lanes, exact only below 2^24; deeper trees than
        # the SMEM stack would silently corrupt traversal.  Refuse instead.
        max_ref = int(offset.max()) + LEAF_WIDTH if is_leaf.any() else 0
        self.max_depth = dep + 1  # interior levels + leaf level + root
        self.supported = (max(n_rows, max_ref) < 2 ** 24
                          and self.max_depth + 2 <= STACK_DEPTH)


def closest_hit_packets(origin, direction, tables: PacketTables,
                        t_init=None, interpret: bool = False,
                        wave: bool = False, treelet_rows: int | None = None,
                        normals: bool = False):
    """Packet closest-hit.  Same contract as ops.traverse.closest_hit.

    ``normals=True`` additionally returns the winning triangle's
    UNNORMALISED geometric normal (cross(e1,e2), the kernel.cu:380-383
    quantity) as a third [N,3] output — carried out of the leaf passes so
    shade can skip its per-ray triangle-table gather (~12 ms/2M on v5e)."""
    n = origin.shape[0]
    if t_init is None:
        t_init = jnp.full((n,), VERY_FAR, jnp.float32)
    return _run(tables.rows, origin, direction, t_init, closest=True,
                interpret=interpret, hbm=not tables.fits, wave=wave,
                treelet_rows=treelet_rows, normals=normals)


def any_hit_packets(origin, direction, max_dist, tables: PacketTables,
                    active=None, interpret: bool = False, wave: bool = False,
                    treelet_rows: int | None = None):
    """Packet any-hit.  Same contract as ops.traverse.any_hit."""
    if active is not None:
        max_dist = jnp.where(active, max_dist, 0.0)
    _, occ = _run(tables.rows, origin, direction, max_dist, closest=False,
                  interpret=interpret, hbm=not tables.fits, wave=wave,
                  treelet_rows=treelet_rows)
    return occ > 0
