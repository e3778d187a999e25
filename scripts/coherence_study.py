"""Union-visit statistics for packet traversal vs packet size and sort key.

The packet kernel's cost is proportional to the number of BVH nodes visited
by the UNION of rays in a packet (a node is descended if ANY ray wants it).
This script renders a few wavefront steps on CPU to obtain a realistic
bounce-heavy survivor set, then replays traversal in numpy counting union
visits per contiguous ray group, for several group sizes and sort keys.

Decides (docs/PERFORMANCE.md round 2): is per-sublane sub-packet walking
(128-ray groups) worth a kernel rewrite, and which compaction sort key
minimises union visits?
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from tyrant_tpu import sky as skymod
from tyrant_tpu.camera import Camera
from tyrant_tpu.config import small_config
from tyrant_tpu.render import init_state, render_step
from tyrant_tpu.scene.scene import Scene


def union_visits(scene, origin, direction, groups):
    """For each group (list of index arrays), BFS the BVH descending any node
    hit by >= 1 ray in the group (ordered traversal irrelevant for counts —
    no t pruning, conservative upper bound).  Returns visits per group."""
    node = np.asarray(scene.bvh.node_packed)  # [Nn, 8]
    lo, hi = node[:, 0:3], node[:, 3:6]
    meta = node[:, 6].view(np.int32)
    lane7 = node[:, 7].view(np.int32)
    from tyrant_tpu.scene.bvh import META_COUNT_MASK
    count = meta & META_COUNT_MASK
    is_leaf = count > 0

    out = []
    for g in groups:
        o = origin[g]
        inv = 1.0 / direction[g]
        visits = 0
        stack = [0]
        while stack:
            ni = stack.pop()
            visits += 1
            if is_leaf[ni]:
                continue
            for child in (ni + 1, lane7[ni]):
                t0 = (lo[child][None] - o) * inv
                t1 = (hi[child][None] - o) * inv
                tmin = np.minimum(t0, t1).max(axis=1)
                tmax = np.maximum(t0, t1).min(axis=1)
                if np.any((tmin <= tmax) & (tmax > 0)):
                    stack.append(child)
        out.append(visits)
    return np.asarray(out)


def keys_for(origin, direction, root_lo, root_hi, grid, dir_bits):
    span = np.maximum(root_hi - root_lo, 1e-3)
    q = np.clip(((origin - root_lo) / span * grid).astype(np.int64), 0,
                grid - 1)
    cell = (q[:, 0] * grid + q[:, 1]) * grid + q[:, 2]
    if dir_bits == 3:  # octant
        neg = direction < 0
        d = neg[:, 0] * 1 + neg[:, 1] * 2 + neg[:, 2] * 4
        return cell * 8 + d
    if dir_bits == 6:  # 2 bits per axis of a normalized dir quadrant
        d = np.clip(((direction + 1) * 2).astype(np.int64), 0, 3)
        dd = (d[:, 0] * 4 + d[:, 1]) * 4 + d[:, 2]
        return cell * 64 + dd
    return cell


def main():
    mesh = "/root/reference/PathTracer/Data/dragon.ply"
    scene_host = Scene.load(mesh if os.path.exists(mesh) else None)
    scene = scene_host.to_device()
    cfg = small_config(width=256, height=256, num_rays=1 << 16)
    cam = Camera()
    cam.position = np.array([-0.119, -26.116, 32.537], np.float32)
    cam.horizontal_angle, cam.vertical_angle = 12.576, -0.518204
    camd = cam.to_device(cfg)
    sun = skymod.sun_direction_from_position(jnp.asarray([0.05, 0.3]))

    st = init_state(cfg)
    for _ in range(5):
        st = render_step(st, scene, camd, sun, cfg=cfg)
    nc = int(st.n_carried)
    print(f"survivors: {nc} of {cfg.num_rays}")
    # survivors live at the tail, already sorted by (8^3 cell, octant)
    o = np.asarray(st.origin)[-nc:]
    d = np.asarray(st.direction)[-nc:]

    node0 = np.asarray(scene.bvh.node_packed)[0]
    root_lo, root_hi = node0[0:3], node0[3:6]

    n = (min(nc, 48 * 1024) // 1024) * 1024
    o, d = o[:n], d[:n]

    for label, grid, dbits in [("8^3+oct (current)", 8, 3),
                               ("oct-major+64^3 morton", -164, 3)]:
        if grid > 0:
            k = keys_for(o, d, root_lo, root_hi, grid, dbits)
        else:
            oct_major = -grid >= 100
            g = (-grid) % 100
            span = np.maximum(root_hi - root_lo, 1e-3)
            q = np.clip(((o - root_lo) / span * g).astype(np.int64), 0, g - 1)
            # interleave bits (morton) for locality
            def part(x):
                x = (x | (x << 8)) & 0x0300F00F
                x = (x | (x << 4)) & 0x030C30C3
                x = (x | (x << 2)) & 0x09249249
                return x
            cell = part(q[:, 0]) | (part(q[:, 1]) << 1) | (part(q[:, 2]) << 2)
            neg = d < 0
            oct_ = neg[:, 0] * 1 + neg[:, 1] * 2 + neg[:, 2] * 4
            if oct_major:
                k = oct_ * (1 << 20) + cell
            else:
                k = cell * 8 + oct_
        order = np.argsort(k, kind="stable")
        oo, dd = o[order], d[order]
        row = [label]
        for gs in (128, 1024):
            groups = [np.arange(i, i + gs) for i in range(0, n, gs)]
            v = union_visits(scene, oo, dd, groups)
            # cost model: packet kernel time ~ sum of group visits / groups
            # per 1024 rays
            per1024 = v.sum() / (n / 1024)
            row.append(f"{gs}: {per1024:7.0f}/1k")
        print("  ".join(str(x) for x in row))

    # coherent baseline: primary rays from raygen order
    from tyrant_tpu.render import _raygen
    gen = _raygen(cfg, camd, jnp.asarray(0), jnp.asarray(1, jnp.uint32),
                  cfg.height, 0)
    og = np.asarray(gen["origin"])[:n]
    dg = np.asarray(gen["direction"])[:n]
    for gs in (128, 1024):
        groups = [np.arange(i, i + gs) for i in range(0, n, gs)]
        v = union_visits(scene, og, dg, groups)
        print(f"coherent primaries {gs}: {v.sum() / (n / 1024):7.0f}/1k")


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"({time.time() - t0:.0f}s)")
