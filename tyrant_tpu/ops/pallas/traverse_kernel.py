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

Node and triangle tables are VMEM-resident (fits ~<=150k triangles; larger
scenes fall back to the XLA gather cascade in ops/traverse.py — a two-level
treelet scheme is the planned extension).  Traversal order is per-packet:
near-child-first by the packet's majority direction sign along the split
axis — same front-to-back heuristic as bvh.h:146-152, voted per packet.

Semantics (hit acceptance, epsilon rules) match ops/traverse.py bit-for-bit
except for floating-point association differences in Möller-Trumbore.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import EPSILON, VERY_FAR
from ...scene.bvh import META_AXIS_SHIFT, META_COUNT_MASK, META_OFFSET_SHIFT

PACKET = 1024          # rays per packet (8 sublanes x 128 lanes)
STACK_DEPTH = 96       # cf. reference's 64-entry stack (bvh.h:124)
# VMEM budget for node+tri tables; beyond this the caller should fall back
VMEM_TABLE_BUDGET = 10 * 1024 * 1024


def tables_fit_vmem(n_nodes: int, n_tris: int) -> bool:
    # every table row costs a full 512-byte padded lane row in VMEM
    bytes_needed = (2 * n_nodes + n_tris + 3) * 512
    return bytes_needed <= VMEM_TABLE_BUDGET


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


def _traverse_kernel(node_ref, nodei_ref, tri_ref,
                     ox_ref, oy_ref, oz_ref, dxr_ref, dyr_ref, dzr_ref,
                     t0_ref, tout_ref, hit_ref, stack_ref, *, closest: bool):
    """One packet per grid step.

    node_ref:  [Nn, 8] f32 (lo3, hi3, pad2).  Mosaic only proves dynamic
               indices on the SUBLANE dim, so rows are (node, static-lane);
               VMEM pads each row to 128 lanes (512 B/node) — the table
               budget accounts for that
    nodei_ref: [Nn, 2] i32 (meta, second_child) — separate table so scalar
               loads need no bitcasts
    tri_ref:   [T+3, 9] f32 leaf-ordered triangles (v0, e1, e2)
    rays:      [8, 128] components
    t0_ref:    [8, 128] initial t (sphere-pass seed / shadow max dist)
    tout/hit:  [8, 128] outputs (closest: t + prim id; any: t untouched +
               occluded mask as i32)
    stack_ref: SMEM [STACK_DEPTH] i32
    """
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dxr_ref[:], dyr_ref[:], dzr_ref[:]
    inv_x = 1.0 / dx
    inv_y = 1.0 / dy
    inv_z = 1.0 / dz
    t_init = t0_ref[:]

    # packet traversal-order heuristic: first ray's direction signs (scalar
    # loads — vector-reduce-to-scalar feeding addressing is avoided; for
    # coherent packets the first ray is representative, and order only
    # affects pruning efficiency, never correctness)
    negx = (dxr_ref[0, 0] < 0).astype(jnp.int32)
    negy = (dyr_ref[0, 0] < 0).astype(jnp.int32)
    negz = (dzr_ref[0, 0] < 0).astype(jnp.int32)

    stack_ref[0] = 0  # push root

    def cond(state):
        sp = state[0]
        if closest:
            return sp >= 0
        occ = state[2]
        return (sp >= 0) & jnp.logical_not(jnp.all(occ > 0))

    def body(state):
        # Fully predicated body (no lax.cond/switch): leaf intersection is
        # masked, stack pushes write dead slots when not descending.
        sp, t_best, hit = state
        node = stack_ref[sp]
        sp = sp - 1

        lox = node_ref[node, 0]
        loy = node_ref[node, 1]
        loz = node_ref[node, 2]
        hix = node_ref[node, 3]
        hiy = node_ref[node, 4]
        hiz = node_ref[node, 5]
        meta = nodei_ref[node, 0]
        second = nodei_ref[node, 1]
        count = meta & META_COUNT_MASK
        axis = (meta >> META_AXIS_SHIFT) & 3
        offset = meta >> META_OFFSET_SHIFT

        # vector slab test (Bbox.h:38-62); per-ray sign select
        n_x = jnp.where(dx < 0, hix, lox)
        f_x = jnp.where(dx < 0, lox, hix)
        n_y = jnp.where(dy < 0, hiy, loy)
        f_y = jnp.where(dy < 0, loy, hiy)
        n_z = jnp.where(dz < 0, hiz, loz)
        f_z = jnp.where(dz < 0, loz, hiz)
        tmin = jnp.maximum(jnp.maximum((n_x - ox) * inv_x, (n_y - oy) * inv_y),
                           (n_z - oz) * inv_z)
        tmax = jnp.minimum(jnp.minimum((f_x - ox) * inv_x, (f_y - oy) * inv_y),
                           (f_z - oz) * inv_z)
        prune = t_best if closest else t_init
        box_hit = (tmin <= tmax) & (tmin < prune) & (tmax > 0)
        if not closest:
            box_hit = box_hit & (hit == 0)
        any_ray = jnp.any(box_hit)

        is_leaf = count > 0
        do_leaf = any_ray & is_leaf

        # --- leaf: 4 masked triangle tests, trace-time unrolled (scalar
        # loads feeding vector M-T; masked row 0 reads when interior) ---
        for j in range(4):
            slot_ok = do_leaf & (j < count)
            ti = jnp.where(slot_ok, offset + j, 0)
            v0x = tri_ref[ti, 0]
            v0y = tri_ref[ti, 1]
            v0z = tri_ref[ti, 2]
            e1x = tri_ref[ti, 3]
            e1y = tri_ref[ti, 4]
            e1z = tri_ref[ti, 5]
            e2x = tri_ref[ti, 6]
            e2y = tri_ref[ti, 7]
            e2z = tri_ref[ti, 8]
            t = _mt_packet(ox, oy, oz, dx, dy, dz, v0x, v0y, v0z,
                           e1x, e1y, e1z, e2x, e2y, e2z)
            if closest:
                # accept rule bvh.h:134
                ok = slot_ok & (t > EPSILON) & ((t_best - t) > EPSILON) & box_hit
                t_best = jnp.where(ok, t, t_best)
                hit = jnp.where(ok, ti, hit)
            else:
                # accept rule bvh.h:229 vs max dist in t_init
                ok = slot_ok & (t > EPSILON) & ((t_init - t) > EPSILON) & box_hit
                hit = jnp.where(ok, 1, hit)

        # --- interior descent: push far then near (near popped first) ---
        neg_axis = jnp.where(axis == 0, negx,
                             jnp.where(axis == 1, negy, negz))
        first = node + 1
        near = jnp.where(neg_axis == 1, second, first)
        far = jnp.where(neg_axis == 1, first, second)
        descend = any_ray & jnp.logical_not(is_leaf)
        # dead writes above sp are harmless when not descending
        stack_ref[sp + 1] = far
        stack_ref[sp + 2] = near
        sp = sp + 2 * descend.astype(jnp.int32)
        return sp, t_best, hit

    if closest:
        state = (jnp.int32(0), t_init, jnp.full((8, 128), -1, jnp.int32))
    else:
        state = (jnp.int32(0), t_init, jnp.zeros((8, 128), jnp.int32))
    _, t_out, hit_out = jax.lax.while_loop(cond, body, state)
    tout_ref[:] = t_out
    hit_ref[:] = hit_out


def _pad_to_packets(x, n, fill):
    pad = (-n) % PACKET
    if pad:
        x = jnp.concatenate([x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)])
    return x


@functools.partial(jax.jit, static_argnames=("closest", "interpret"))
def _run(node_f32, node_i32, tri_flat, origin, direction, t_init,
         closest: bool, interpret: bool = False):
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
    npad = comps[0].shape[0]
    n_packets = npad // PACKET
    comps = [c.reshape(n_packets * 8, 128) for c in comps]

    ray_spec = pl.BlockSpec((8, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    kernel = functools.partial(_traverse_kernel, closest=closest)
    t_out, hit_out = pl.pallas_call(
        kernel,
        grid=(n_packets,),
        in_specs=[table_spec, table_spec, table_spec] + [ray_spec] * 7,
        out_specs=[ray_spec, ray_spec],
        out_shape=[jax.ShapeDtypeStruct((n_packets * 8, 128), jnp.float32),
                   jax.ShapeDtypeStruct((n_packets * 8, 128), jnp.int32)],
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
        interpret=interpret,
    )(node_f32, node_i32, tri_flat, *comps)
    return t_out.reshape(-1)[:n], hit_out.reshape(-1)[:n]


class PacketTables:
    """Kernel-side flat tables derived from a BVHDevice (built per scene).

    Note node lane 7 of BVHDevice carries the leaf-row index for leaves; the
    packet kernel only reads it for interiors (second child), so the shared
    layout is safe.
    """

    def __init__(self, bvh_device):
        node = bvh_device.node_packed  # [Nn, 8] f32 (meta/second in lanes 6,7)
        self.node_f32 = node
        meta = jax.lax.bitcast_convert_type(node[:, 6], jnp.int32)
        second = jax.lax.bitcast_convert_type(node[:, 7], jnp.int32)
        self.node_i32 = jnp.stack([meta, second], axis=1)
        self.tri_flat = bvh_device.tri_packed[:, 0:9]
        self.fits = tables_fit_vmem(node.shape[0],
                                    bvh_device.tri_packed.shape[0])


def closest_hit_packets(origin, direction, tables: PacketTables,
                        t_init=None, interpret: bool = False):
    """Packet closest-hit.  Same contract as ops.traverse.closest_hit."""
    n = origin.shape[0]
    if t_init is None:
        t_init = jnp.full((n,), VERY_FAR, jnp.float32)
    return _run(tables.node_f32, tables.node_i32, tables.tri_flat,
                origin, direction, t_init, closest=True, interpret=interpret)


def any_hit_packets(origin, direction, max_dist, tables: PacketTables,
                    active=None, interpret: bool = False):
    """Packet any-hit.  Same contract as ops.traverse.any_hit."""
    if active is not None:
        max_dist = jnp.where(active, max_dist, 0.0)
    _, occ = _run(tables.node_f32, tables.node_i32, tables.tri_flat,
                  origin, direction, max_dist, closest=False,
                  interpret=interpret)
    return occ > 0
