"""Geometric intersection primitives (pure jnp, batched).

These are the dense-batch equivalents of the reference's per-thread device
functions: the AABB slab test (Bbox.h:38-62), Möller-Trumbore
(loader.h:21-46) and the analytic sphere quadratic (kernel.cu:83-93).
All return "misses" as 0.0 / False exactly like the reference so downstream
comparisons compose identically.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import EPSILON, VERY_FAR
from .sampling import cross, dot


def ray_aabb(origin, inv_dir, dir_is_neg, lo, hi, t_max):
    """Slab test.  Reference: Bbox.h:38-62 ``BBox::intersect``.

    origin/inv_dir: [..., 3]; dir_is_neg: [..., 3] bool; lo/hi: [..., 3]
    (already gathered per-ray); t_max: [...] current closest hit used for
    early rejection.  Returns bool [...].
    """
    near = jnp.where(dir_is_neg, hi, lo)
    far = jnp.where(dir_is_neg, lo, hi)
    t0 = (near - origin) * inv_dir
    t1 = (far - origin) * inv_dir
    t_min_v = jnp.max(t0, axis=-1)
    t_max_v = jnp.min(t1, axis=-1)
    return (t_min_v <= t_max_v) & (t_min_v < t_max) & (t_max_v > 0)


def moller_trumbore(origin, direction, vert, e1, e2):
    """Möller-Trumbore with backface culling.

    Reference: loader.h:21-46 ``Triangle::intersect`` — rejects when
    det < 1e-7 (backfacing or parallel), returns 0 on miss, t otherwise
    (t may be negative; callers filter with t > epsilon like kernel.cu /
    bvh.h:134 do).
    """
    pvec = cross(direction, e2)
    det = dot(e1, pvec)
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1.0, det)
    tvec = origin - vert
    u = dot(tvec, pvec) * inv_det
    qvec = cross(tvec, e1)
    v = dot(direction, qvec) * inv_det
    t = dot(e2, qvec) * inv_det
    valid = (det >= 1e-7) & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
    return jnp.where(valid, t, 0.0)


def ray_sphere(origin, direction, center, radius):
    """Analytic sphere intersection.

    Reference: kernel.cu:83-93 ``Sphere::intersect`` — returns the nearest
    root > epsilon, else the far root if > epsilon, else 0.
    """
    op = center - origin
    b = dot(op, direction)
    disc = b * b - dot(op, op) + radius * radius
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_near = b - sq
    t_far = b + sq
    t = jnp.where(t_near > EPSILON, t_near,
                  jnp.where(t_far > EPSILON, t_far, 0.0))
    return jnp.where(disc < 0, 0.0, t)


def intersect_spheres(origin, direction, centers, radii):
    """Closest hit against a small sphere list (the reference's 7
    ``__constant__`` spheres, kernel.cu:123-142).

    origin/direction: [N, 3]; centers: [S, 3]; radii: [S].
    Returns (t [N], idx [N]) with t == VERY_FAR / idx == -1 on miss.

    The reference iterates ``for (i = NUM_SPHERES; i--;)`` keeping strictly
    closer hits, so the LOWEST index wins ties; argmin on jnp matches that.
    """
    t_all = ray_sphere(origin[:, None, :], direction[:, None, :],
                       centers[None, :, :], radii[None, :])  # [N, S]
    t_all = jnp.where(t_all > 0.0, t_all, VERY_FAR)
    idx = jnp.argmin(t_all, axis=1)
    t = jnp.take_along_axis(t_all, idx[:, None], axis=1)[:, 0]
    idx = jnp.where(t < VERY_FAR, idx, -1)
    return t, idx


def intersect_triangles_brute(origin, direction, vert, e1, e2, t_max=None):
    """Brute-force closest hit over all triangles — the no-BVH oracle used
    by golden tests (the reference has no such path; SURVEY.md §4 item 3).

    origin/direction: [N, 3]; vert/e1/e2: [T, 3].
    Returns (t [N], tri_idx [N]): VERY_FAR / -1 on miss.
    Matches BVH leaf filtering (bvh.h:134): accept t > epsilon and strictly
    closer than the current best by more than epsilon.
    """
    t_all = moller_trumbore(origin[:, None, :], direction[:, None, :],
                            vert[None], e1[None], e2[None])  # [N, T]
    t_all = jnp.where(t_all > EPSILON, t_all, VERY_FAR)
    idx = jnp.argmin(t_all, axis=1)
    t = jnp.take_along_axis(t_all, idx[:, None], axis=1)[:, 0]
    if t_max is not None:
        miss = t >= t_max
    else:
        miss = t >= VERY_FAR
    return jnp.where(miss, VERY_FAR, t), jnp.where(miss, -1, idx)
