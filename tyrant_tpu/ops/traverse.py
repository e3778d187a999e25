"""Stackless threaded-BVH traversal (pure jnp, dense ray batches).

TPU-native replacement for the reference's 64-entry per-thread stack
traversal (bvh.h:118-161 ``CachedBVH::intersect``, bvh.h:213-256
``intersectSimple``).  Per-ray state is a single node index; the next node is
a table lookup into precomputed per-octant hit/miss links
(:func:`tyrant_tpu.scene.bvh.thread_links`), so the whole batch advances in
lock-step ``lax.while_loop`` iterations of dense gathers + slab tests —
no divergence, no scatter, no per-lane stack.

Near-child-first ordering (the reference's ``dirIsNeg[splitAxis]`` trick,
bvh.h:146-152) is preserved exactly: the links are indexed by the ray's
direction octant.  Early-out pruning against the current closest hit
(Bbox.h:61 ``tMin < lowestIntersect``) carries over unchanged.

Leaves hold at most 4 primitives (scene/bvh.py caps this), and the triangle
array is padded with 3 degenerate triangles, so every leaf visit intersects
exactly 4 consecutive slots.  Slots beyond ``prim_count`` belong to *other
leaves* — intersecting them is harmless (they are real scene triangles and
closest-hit keeps the min) but we mask them to keep traversal counts
comparable with the reference.

This is also the semantic oracle for the Pallas kernel
(ops/pallas/traverse_kernel.py); both must agree bit-for-bit.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..config import EPSILON, VERY_FAR
from ..scene.bvh import (META_AXIS_MASK, META_AXIS_SHIFT, META_COUNT_MASK,
                         META_OFFSET_SHIFT)
from .intersect import moller_trumbore

LEAF_WIDTH = 4  # == BVHConfig.max_prims_per_leaf == reference bvh.h:78


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BVHDevice:
    """Device-resident BVH + triangle SoA (all jnp arrays).

    Mirrors the reference's ``CachedBVH`` (bvh.h:111-116): raw node and
    primitive buffers uploaded once at scene load (Scene.cpp:55-65).
    """

    lo: jnp.ndarray         # [Nn, 3] f32
    hi: jnp.ndarray         # [Nn, 3] f32
    meta: jnp.ndarray       # [Nn] i32 packed offset/axis/count
    hit_link: jnp.ndarray   # [2, Nn] i32
    miss_link: jnp.ndarray  # [8, Nn] i32
    tri_vert: jnp.ndarray   # [T + pad, 3] f32 (reordered, leaf-contiguous)
    tri_e1: jnp.ndarray     # [T + pad, 3] f32
    tri_e2: jnp.ndarray     # [T + pad, 3] f32

    def tree_flatten(self):
        fields = (self.lo, self.hi, self.meta, self.hit_link, self.miss_link,
                  self.tri_vert, self.tri_e1, self.tri_e2)
        return fields, None

    @classmethod
    def tree_unflatten(cls, aux, fields):
        return cls(*fields)

    @classmethod
    def from_host(cls, bvh, tri_vert, tri_e1, tri_e2):
        """bvh: scene.bvh.BVHArrays; tri_*: [T,3] in ORIGINAL order (will be
        permuted to leaf order and padded here)."""
        import numpy as np
        perm = bvh.perm
        pad = np.zeros((LEAF_WIDTH - 1, 3), np.float32)  # degenerate tris
        return cls(
            lo=jnp.asarray(bvh.lo), hi=jnp.asarray(bvh.hi),
            meta=jnp.asarray(bvh.meta),
            hit_link=jnp.asarray(bvh.hit_link),
            miss_link=jnp.asarray(bvh.miss_link),
            tri_vert=jnp.asarray(np.concatenate([tri_vert[perm], pad])),
            tri_e1=jnp.asarray(np.concatenate([tri_e1[perm], pad])),
            tri_e2=jnp.asarray(np.concatenate([tri_e2[perm], pad])),
        )


def _ray_setup(direction):
    inv_dir = 1.0 / direction
    neg = direction < 0.0
    octant = (neg[:, 0].astype(jnp.int32)
              + 2 * neg[:, 1].astype(jnp.int32)
              + 4 * neg[:, 2].astype(jnp.int32))
    return inv_dir, neg, octant


def _slab(origin, inv_dir, neg, lo, hi, t_max):
    near = jnp.where(neg, hi, lo)
    far = jnp.where(neg, lo, hi)
    t0 = jnp.max((near - origin) * inv_dir, axis=-1)
    t1 = jnp.min((far - origin) * inv_dir, axis=-1)
    return (t0 <= t1) & (t0 < t_max) & (t1 > 0)


def _leaf_slots(bvh: BVHDevice, node, offset, count):
    idx4 = offset[:, None] + jnp.arange(LEAF_WIDTH, dtype=jnp.int32)[None, :]
    v0 = bvh.tri_vert[idx4]
    e1 = bvh.tri_e1[idx4]
    e2 = bvh.tri_e2[idx4]
    slot_valid = jnp.arange(LEAF_WIDTH, dtype=jnp.int32)[None, :] < count[:, None]
    return idx4, v0, e1, e2, slot_valid


@partial(jax.jit, static_argnames=())
def closest_hit(origin, direction, bvh: BVHDevice,
                t_init=None):
    """Closest-hit traversal.  Reference: bvh.h:118-161.

    origin/direction: [N, 3].  t_init: optional [N] initial closest distance
    (the reference seeds with the sphere-pass result, kernel.cu:125-141).
    Returns (t [N], prim_id [N]) — t == t_init (or VERY_FAR) / prim_id == -1
    when no triangle is hit.
    """
    n = origin.shape[0]
    if t_init is None:
        t_init = jnp.full((n,), VERY_FAR, jnp.float32)
    inv_dir, neg, octant = _ray_setup(direction)

    def cond(state):
        node, _, _ = state
        return jnp.any(node >= 0)

    def body(state):
        node, t_best, hit_id = state
        active = node >= 0
        ni = jnp.maximum(node, 0)

        lo = bvh.lo[ni]
        hi = bvh.hi[ni]
        meta = bvh.meta[ni]
        count = meta & META_COUNT_MASK
        axis = (meta >> META_AXIS_SHIFT) & META_AXIS_MASK
        offset = meta >> META_OFFSET_SHIFT

        box_hit = _slab(origin, inv_dir, neg, lo, hi, t_best) & active
        is_leaf = count > 0

        # --- leaf: intersect 4 consecutive slots (masked) ---
        do_leaf = box_hit & is_leaf
        idx4, v0, e1, e2, slot_valid = _leaf_slots(bvh, ni, offset, count)
        t4 = moller_trumbore(origin[:, None, :], direction[:, None, :],
                             v0, e1, e2)
        # acceptance matches bvh.h:134: t > eps and strictly closer by > eps
        ok = (t4 > EPSILON) & ((t_best[:, None] - t4) > EPSILON) \
            & slot_valid & do_leaf[:, None]
        t4m = jnp.where(ok, t4, VERY_FAR)
        j = jnp.argmin(t4m, axis=1)
        t_min4 = jnp.min(t4m, axis=1)
        upd = t_min4 < t_best
        t_best = jnp.where(upd, t_min4, t_best)
        hit_id = jnp.where(upd, jnp.take_along_axis(idx4, j[:, None], 1)[:, 0],
                           hit_id)

        # --- next node ---
        axis_neg = jnp.take_along_axis(neg.astype(jnp.int32),
                                       axis[:, None], axis=1)[:, 0]
        near = bvh.hit_link[axis_neg, ni]
        miss = bvh.miss_link[octant, ni]
        nxt = jnp.where(box_hit & ~is_leaf, near, miss)
        node = jnp.where(active, nxt, node)
        return node, t_best, hit_id

    node0 = jnp.zeros((n,), jnp.int32)
    hit0 = jnp.full((n,), -1, jnp.int32)
    _, t, hit_id = jax.lax.while_loop(cond, body, (node0, t_init, hit0))
    return t, hit_id


@partial(jax.jit, static_argnames=())
def any_hit(origin, direction, max_dist, bvh: BVHDevice, active=None):
    """Shadow-ray occlusion test.  Reference: bvh.h:213-256
    ``intersectSimple`` — accepts any t > eps with (maxDist - t) > eps and
    terminates that ray immediately.

    ``active``: optional [N] bool — inactive rays skip traversal entirely
    (the dense-batch stand-in for the reference's shadow_ray_cnt-bounded
    loop, kernel.cu:634).  Returns occluded [N] bool.
    """
    n = origin.shape[0]
    inv_dir, neg, octant = _ray_setup(direction)

    def cond(state):
        node, _ = state
        return jnp.any(node >= 0)

    def body(state):
        node, occluded = state
        active = node >= 0
        ni = jnp.maximum(node, 0)

        lo = bvh.lo[ni]
        hi = bvh.hi[ni]
        meta = bvh.meta[ni]
        count = meta & META_COUNT_MASK
        axis = (meta >> META_AXIS_SHIFT) & META_AXIS_MASK
        offset = meta >> META_OFFSET_SHIFT

        box_hit = _slab(origin, inv_dir, neg, lo, hi, max_dist) & active
        is_leaf = count > 0

        do_leaf = box_hit & is_leaf
        idx4, v0, e1, e2, slot_valid = _leaf_slots(bvh, ni, offset, count)
        t4 = moller_trumbore(origin[:, None, :], direction[:, None, :],
                             v0, e1, e2)
        ok = (t4 > EPSILON) & ((max_dist[:, None] - t4) > EPSILON) \
            & slot_valid & do_leaf[:, None]
        found = jnp.any(ok, axis=1)
        occluded = occluded | found

        axis_neg = jnp.take_along_axis(neg.astype(jnp.int32),
                                       axis[:, None], axis=1)[:, 0]
        near = bvh.hit_link[axis_neg, ni]
        miss = bvh.miss_link[octant, ni]
        nxt = jnp.where(box_hit & ~is_leaf, near, miss)
        nxt = jnp.where(found, -1, nxt)  # early exit on first hit
        node = jnp.where(active, nxt, node)
        return node, occluded

    if active is None:
        node0 = jnp.zeros((n,), jnp.int32)
    else:
        node0 = jnp.where(active, 0, -1).astype(jnp.int32)
    occ0 = jnp.zeros((n,), bool)
    _, occluded = jax.lax.while_loop(cond, body, (node0, occ0))
    return occluded


def traversal_depth_map(origin, direction, bvh: BVHDevice, max_iter=512):
    """BVH-quality heatmap: node visits per ray (the reference's BVH_DEBUG
    mode, kernel.cu:300-328 / bvh.h:164-209).  Returns (t, prim_id, visits)."""
    n = origin.shape[0]
    inv_dir, neg, octant = _ray_setup(direction)

    def body(state):
        node, t_best, hit_id, visits = state
        active = node >= 0
        ni = jnp.maximum(node, 0)
        visits = visits + active.astype(jnp.int32)

        lo, hi = bvh.lo[ni], bvh.hi[ni]
        meta = bvh.meta[ni]
        count = meta & META_COUNT_MASK
        axis = (meta >> META_AXIS_SHIFT) & META_AXIS_MASK
        offset = meta >> META_OFFSET_SHIFT
        box_hit = _slab(origin, inv_dir, neg, lo, hi, t_best) & active
        is_leaf = count > 0
        do_leaf = box_hit & is_leaf
        idx4, v0, e1, e2, slot_valid = _leaf_slots(bvh, ni, offset, count)
        t4 = moller_trumbore(origin[:, None, :], direction[:, None, :], v0, e1, e2)
        ok = (t4 > EPSILON) & ((t_best[:, None] - t4) > EPSILON) & slot_valid & do_leaf[:, None]
        t4m = jnp.where(ok, t4, VERY_FAR)
        j = jnp.argmin(t4m, axis=1)
        t_min4 = jnp.min(t4m, axis=1)
        upd = t_min4 < t_best
        t_best = jnp.where(upd, t_min4, t_best)
        hit_id = jnp.where(upd, jnp.take_along_axis(idx4, j[:, None], 1)[:, 0], hit_id)
        axis_neg = jnp.take_along_axis(neg.astype(jnp.int32), axis[:, None], 1)[:, 0]
        near = bvh.hit_link[axis_neg, ni]
        miss = bvh.miss_link[octant, ni]
        node = jnp.where(active, jnp.where(box_hit & ~is_leaf, near, miss), node)
        return node, t_best, hit_id, visits

    def cond(state):
        return jnp.any(state[0] >= 0)

    state = (jnp.zeros((n,), jnp.int32), jnp.full((n,), VERY_FAR, jnp.float32),
             jnp.full((n,), -1, jnp.int32), jnp.zeros((n,), jnp.int32))
    _, t, hit_id, visits = jax.lax.while_loop(cond, body, state)
    return t, hit_id, visits
