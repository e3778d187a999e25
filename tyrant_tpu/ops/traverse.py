"""Stackless threaded-BVH traversal (pure jnp, dense ray batches).

TPU-native replacement for the reference's 64-entry per-thread stack
traversal (bvh.h:118-161 ``CachedBVH::intersect``, bvh.h:213-256
``intersectSimple``).  Per-ray state is a single node index; the next node is
a table lookup into precomputed per-octant hit/miss links
(:func:`tyrant_tpu.scene.bvh.thread_links`), so the whole batch advances in
lock-step ``lax.while_loop`` iterations of dense gathers + slab tests —
no per-lane stack.

Performance design (measured on v5e):
  * One 32-byte packed node row per visit ([Nn, 8] f32 with meta/child
    bitcast into lanes) — the same cache-line layout as the reference's
    ``static_assert(sizeof(BVHNode)==32)`` (bvh.h:68) — instead of five
    separate gathers.
  * Leaf intersection runs under ``lax.cond`` so iterations where no ray in
    the batch sits at a leaf skip the triangle gathers entirely.
  * Gather cost on TPU is latency-bound below ~100k rows and
    bandwidth-bound above, while a lock-step loop stalls the whole batch on
    its worst ray (a terrain-grazing ray can visit 1000+ nodes).  The
    traversal therefore runs a **shrinking cascade**: start with the full
    batch, loop until fewer than half the rays remain active, compact the
    survivors into a half-size batch, repeat.  Total work approaches
    sum-of-visits (the reference's work-stealing achieves the same via
    atomic queue claims, kernel.cu:211-224) while every iteration stays in
    the bandwidth-friendly large-batch regime.

Ordered near-child-first traversal (the reference's ``dirIsNeg[splitAxis]``
trick, bvh.h:146-152) is preserved exactly: links are indexed by the ray's
direction octant.  Early-out pruning against the current closest hit
(Bbox.h:61) carries over unchanged.

This is also the semantic oracle for the Pallas kernel
(ops/pallas/traverse_kernel.py); both must agree bit-for-bit.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..config import EPSILON, VERY_FAR
from ..scene.bvh import META_AXIS_MASK, META_AXIS_SHIFT, META_COUNT_MASK, META_OFFSET_SHIFT
from .intersect import moller_trumbore

LEAF_WIDTH = 4  # == BVHConfig.max_prims_per_leaf == reference bvh.h:78
# cascade floor: below this, compaction overhead beats the win
MIN_STAGE = 8192


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BVHDevice:
    """Device-resident BVH + triangle SoA (all jnp arrays).

    Mirrors the reference's ``CachedBVH`` (bvh.h:111-116): raw node and
    primitive buffers uploaded once at scene load (Scene.cpp:55-65).

    node_packed: [Nn, 8] f32 — lo.xyz, hi.xyz, meta (bitcast i32),
        second_child (bitcast i32).  32 bytes, like the reference node.
    miss_flat: [8 * Nn] i32 — per-octant escape links, octant-major.
    tri_packed: [T + 3, 12] f32 — v0.xyz, e1.xyz, e2.xyz, pad.  Leaf order,
        padded with degenerate rows so every leaf reads 4 slots.
    """

    node_packed: jnp.ndarray
    miss_flat: jnp.ndarray
    tri_packed: jnp.ndarray

    def tree_flatten(self):
        return ((self.node_packed, self.miss_flat, self.tri_packed), None)

    @classmethod
    def tree_unflatten(cls, aux, fields):
        return cls(*fields)

    @property
    def n_nodes(self):
        return self.node_packed.shape[0]

    # triangle SoA views (leaf order) for shading
    @property
    def tri_vert(self):
        return self.tri_packed[:, 0:3]

    @property
    def tri_e1(self):
        return self.tri_packed[:, 3:6]

    @property
    def tri_e2(self):
        return self.tri_packed[:, 6:9]

    @classmethod
    def from_host(cls, bvh, tri_vert, tri_e1, tri_e2):
        """bvh: scene.bvh.BVHArrays; tri_*: [T,3] in ORIGINAL order (will be
        permuted to leaf order and padded here)."""
        import numpy as np
        nn = bvh.n_nodes
        node = np.zeros((nn, 8), np.float32)
        node[:, 0:3] = bvh.lo
        node[:, 3:6] = bvh.hi
        node[:, 6] = bvh.meta.view(np.float32)
        node[:, 7] = bvh.second_child.astype(np.int32).view(np.float32)
        perm = bvh.perm
        t = perm.shape[0]
        tri = np.zeros((t + LEAF_WIDTH - 1, 12), np.float32)
        tri[:t, 0:3] = tri_vert[perm]
        tri[:t, 3:6] = tri_e1[perm]
        tri[:t, 6:9] = tri_e2[perm]
        return cls(node_packed=jnp.asarray(node),
                   miss_flat=jnp.asarray(bvh.miss_link.reshape(-1)),
                   tri_packed=jnp.asarray(tri))


def _ray_setup(direction):
    inv_dir = 1.0 / direction
    neg = direction < 0.0
    octant = (neg[:, 0].astype(jnp.int32)
              + 2 * neg[:, 1].astype(jnp.int32)
              + 4 * neg[:, 2].astype(jnp.int32))
    return inv_dir, neg, octant


def _visit(bvh: BVHDevice, node, origin, inv_dir, neg, octant, t_prune):
    """One traversal step shared by closest/any-hit: box test + next node.

    Returns (box_hit, is_leaf, offset, count, next_node) for active rays
    (callers mask).  t_prune is the early-out distance (Bbox.h:61).
    """
    ni = jnp.maximum(node, 0)
    active = node >= 0
    row = bvh.node_packed[ni]
    lo, hi = row[:, 0:3], row[:, 3:6]
    meta = jax.lax.bitcast_convert_type(row[:, 6], jnp.int32)
    second = jax.lax.bitcast_convert_type(row[:, 7], jnp.int32)
    count = meta & META_COUNT_MASK
    axis = (meta >> META_AXIS_SHIFT) & META_AXIS_MASK
    offset = meta >> META_OFFSET_SHIFT

    near_b = jnp.where(neg, hi, lo)
    far_b = jnp.where(neg, lo, hi)
    t0 = jnp.max((near_b - origin) * inv_dir, axis=-1)
    t1 = jnp.min((far_b - origin) * inv_dir, axis=-1)
    box_hit = (t0 <= t1) & (t0 < t_prune) & (t1 > 0) & active

    is_leaf = count > 0
    axis_neg = jnp.take_along_axis(neg.astype(jnp.int32), axis[:, None],
                                   axis=1)[:, 0]
    near = jnp.where(axis_neg == 1, second, ni + 1)
    miss = bvh.miss_flat[octant * bvh.n_nodes + ni]
    nxt = jnp.where(box_hit & ~is_leaf, near, miss)
    nxt = jnp.where(active, nxt, node)
    return box_hit, is_leaf, offset, count, nxt


def _leaf_closest(bvh, origin, direction, do_leaf, offset, count, t_best,
                  hit_id):
    idx4 = offset[:, None] + jnp.arange(LEAF_WIDTH, dtype=jnp.int32)[None]
    tri = bvh.tri_packed[idx4]
    t4 = moller_trumbore(origin[:, None, :], direction[:, None, :],
                         tri[..., 0:3], tri[..., 3:6], tri[..., 6:9])
    # acceptance matches bvh.h:134: t > eps and strictly closer by > eps
    ok = (t4 > EPSILON) & ((t_best[:, None] - t4) > EPSILON) \
        & (jnp.arange(LEAF_WIDTH, dtype=jnp.int32)[None] < count[:, None]) \
        & do_leaf[:, None]
    t4m = jnp.where(ok, t4, VERY_FAR)
    j = jnp.argmin(t4m, axis=1)
    t_min = jnp.min(t4m, axis=1)
    upd = t_min < t_best
    t_best = jnp.where(upd, t_min, t_best)
    hit_id = jnp.where(upd, jnp.take_along_axis(idx4, j[:, None], 1)[:, 0],
                       hit_id)
    return t_best, hit_id


def _stage_sizes(n: int, min_stage: int):
    sizes = []
    s = n
    while s > min_stage and s % 2 == 0:
        sizes.append(s)
        s //= 2
    sizes.append(s)
    return sizes


def _compact(active, arrays, new_size):
    """Scatter active entries (in order) into new arrays of new_size.
    Caller guarantees active_count <= new_size."""
    pos = jnp.cumsum(active.astype(jnp.int32)) - 1
    dest = jnp.where(active, pos, new_size)  # inactive -> dropped
    out = []
    for a in arrays:
        shape = (new_size,) + a.shape[1:]
        out.append(jnp.zeros(shape, a.dtype).at[dest].set(a, mode="drop"))
    return out


@partial(jax.jit, static_argnames=("min_stage",))
def closest_hit(origin, direction, bvh: BVHDevice, t_init=None,
                min_stage: int = MIN_STAGE):
    """Closest-hit traversal.  Reference: bvh.h:118-161.

    origin/direction: [N, 3].  t_init: optional [N] initial closest distance
    (the reference seeds traversal with the sphere-pass result,
    kernel.cu:125-141).  Returns (t [N], prim_id [N]) with t == t_init (or
    VERY_FAR) and prim_id == -1 on miss.
    """
    n = origin.shape[0]
    if t_init is None:
        t_init = jnp.full((n,), VERY_FAR, jnp.float32)

    out_t = t_init
    out_id = jnp.full((n,), -1, jnp.int32)

    # cascade state (size shrinks by half per stage)
    origin_s, dir_s = origin, direction
    node = jnp.zeros((n,), jnp.int32)
    t_best = t_init
    hit_id = jnp.full((n,), -1, jnp.int32)
    ridx = jnp.arange(n, dtype=jnp.int32)

    sizes = _stage_sizes(n, min_stage)
    for si, size in enumerate(sizes):
        last = si == len(sizes) - 1
        limit = 0 if last else size // 2
        inv_dir, neg, octant = _ray_setup(dir_s)

        def cond(s):
            node, _, _ = s
            active = jnp.sum((node >= 0).astype(jnp.int32))
            return active > limit

        def body(s):
            node, t_best, hit_id = s
            box_hit, is_leaf, offset, count, nxt = _visit(
                bvh, node, origin_s, inv_dir, neg, octant, t_best)
            do_leaf = box_hit & is_leaf
            t_best, hit_id = jax.lax.cond(
                jnp.any(do_leaf),
                lambda a: _leaf_closest(bvh, origin_s, dir_s, do_leaf,
                                        offset, count, *a),
                lambda a: a, (t_best, hit_id))
            return nxt, t_best, hit_id

        node, t_best, hit_id = jax.lax.while_loop(
            cond, body, (node, t_best, hit_id))

        # bank finished rays into the output buffers
        done = node < 0
        dest = jnp.where(done, ridx, n)
        out_t = out_t.at[dest].set(t_best, mode="drop")
        out_id = out_id.at[dest].set(hit_id, mode="drop")

        if last:
            break
        active = ~done
        origin_s, dir_s, node, t_best, hit_id, ridx = _compact(
            active, (origin_s, dir_s, node, t_best, hit_id, ridx), size // 2)
        # compacted padding slots are inactive (node == 0 from zeros -> must
        # be -1); _compact zero-fills, so mark pad slots done explicitly
        pad = jnp.arange(size // 2, dtype=jnp.int32) \
            >= jnp.sum(active.astype(jnp.int32))
        node = jnp.where(pad, -1, node)
        ridx = jnp.where(pad, n, ridx)  # pad results dropped on scatter

    return out_t, out_id


@partial(jax.jit, static_argnames=("min_stage",))
def any_hit(origin, direction, max_dist, bvh: BVHDevice, active=None,
            min_stage: int = MIN_STAGE):
    """Shadow-ray occlusion test.  Reference: bvh.h:213-256
    ``intersectSimple`` — accepts any t > eps with (maxDist - t) > eps and
    terminates that ray immediately.

    ``active``: optional [N] bool — inactive rays skip traversal entirely
    (the dense-batch stand-in for the reference's shadow_ray_cnt-bounded
    loop, kernel.cu:634).  Returns occluded [N] bool.
    """
    n = origin.shape[0]
    out_occ = jnp.zeros((n,), bool)

    origin_s, dir_s, maxd_s = origin, direction, max_dist
    if active is None:
        node = jnp.zeros((n,), jnp.int32)
    else:
        node = jnp.where(active, 0, -1).astype(jnp.int32)
    occ = jnp.zeros((n,), bool)
    ridx = jnp.arange(n, dtype=jnp.int32)

    sizes = _stage_sizes(n, min_stage)
    for si, size in enumerate(sizes):
        last = si == len(sizes) - 1
        limit = 0 if last else size // 2
        inv_dir, neg, octant = _ray_setup(dir_s)

        def cond(s):
            node, _ = s
            return jnp.sum((node >= 0).astype(jnp.int32)) > limit

        def body(s):
            node, occ = s
            box_hit, is_leaf, offset, count, nxt = _visit(
                bvh, node, origin_s, inv_dir, neg, octant, maxd_s)
            do_leaf = box_hit & is_leaf

            def leaf(occ):
                idx4 = offset[:, None] \
                    + jnp.arange(LEAF_WIDTH, dtype=jnp.int32)[None]
                tri = bvh.tri_packed[idx4]
                t4 = moller_trumbore(origin_s[:, None, :], dir_s[:, None, :],
                                     tri[..., 0:3], tri[..., 3:6],
                                     tri[..., 6:9])
                ok = (t4 > EPSILON) & ((maxd_s[:, None] - t4) > EPSILON) \
                    & (jnp.arange(LEAF_WIDTH, dtype=jnp.int32)[None]
                       < count[:, None]) & do_leaf[:, None]
                return occ | jnp.any(ok, axis=1)

            occ = jax.lax.cond(jnp.any(do_leaf), leaf, lambda o: o, occ)
            nxt = jnp.where(occ, -1, nxt)  # early exit on first hit
            return nxt, occ

        node, occ = jax.lax.while_loop(cond, body, (node, occ))

        done = node < 0
        dest = jnp.where(done, ridx, n)
        out_occ = out_occ.at[dest].set(occ, mode="drop")

        if last:
            break
        act = ~done
        origin_s, dir_s, maxd_s, node, occ, ridx = _compact(
            act, (origin_s, dir_s, maxd_s, node, occ, ridx), size // 2)
        pad = jnp.arange(size // 2, dtype=jnp.int32) \
            >= jnp.sum(act.astype(jnp.int32))
        node = jnp.where(pad, -1, node)
        ridx = jnp.where(pad, n, ridx)

    return out_occ


def traversal_depth_map(origin, direction, bvh: BVHDevice):
    """BVH-quality heatmap: node visits per ray (the reference's BVH_DEBUG
    mode, kernel.cu:300-328 / bvh.h:164-209).  Lock-step (diagnostics only).
    Returns (t, prim_id, visits)."""
    n = origin.shape[0]
    inv_dir, neg, octant = _ray_setup(direction)

    def cond(s):
        return jnp.any(s[0] >= 0)

    def body(s):
        node, t_best, hit_id, visits = s
        visits = visits + (node >= 0).astype(jnp.int32)
        box_hit, is_leaf, offset, count, nxt = _visit(
            bvh, node, origin, inv_dir, neg, octant, t_best)
        do_leaf = box_hit & is_leaf
        t_best, hit_id = _leaf_closest(bvh, origin, direction, do_leaf,
                                       offset, count, t_best, hit_id)
        return nxt, t_best, hit_id, visits

    state = (jnp.zeros((n,), jnp.int32),
             jnp.full((n,), VERY_FAR, jnp.float32),
             jnp.full((n,), -1, jnp.int32),
             jnp.zeros((n,), jnp.int32))
    _, t, hit_id, visits = jax.lax.while_loop(cond, body, state)
    return t, hit_id, visits
