"""Sampling primitives (pure jnp, batched over leading dims).

Vectors are ``[..., 3]`` float32 arrays.  Each routine is the dense-batch
equivalent of a per-thread device function in the reference.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import PI
from . import rng


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def normalize(v, eps: float = 1e-20):
    return v / jnp.sqrt(jnp.maximum(dot(v, v), eps))[..., None]


def cross(a, b):
    return jnp.cross(a, b)


def reflect(d, n):
    """GLM-style reflect: d - 2*dot(d,n)*n (used at kernel.cu:473)."""
    return d - 2.0 * dot(d, n)[..., None] * n


def orthonormal_basis(w):
    """Build (u, v) completing ``w`` to an orthonormal basis.

    Reference: kernel.cu:181-189 ``computeOrthonormalBasisNaive`` — picks the
    Y axis when |w.x| > 0.9, else the X axis, then Gram-Schmidts.
    """
    pick_y = jnp.abs(w[..., 0]) > 0.9
    a = jnp.where(pick_y[..., None],
                  jnp.array([0.0, 1.0, 0.0], w.dtype),
                  jnp.array([1.0, 0.0, 0.0], w.dtype))
    u = normalize(cross(a, w))
    v = cross(w, u)
    return u, v


def ortho(v):
    """Any vector orthogonal-ish to v.  Reference: sunsky.cu:163-166."""
    use_x = jnp.abs(v[..., 0]) > jnp.abs(v[..., 2])
    o_a = jnp.stack([-v[..., 1], v[..., 0], jnp.zeros_like(v[..., 0])], -1)
    o_b = jnp.stack([jnp.zeros_like(v[..., 0]), -v[..., 2], v[..., 1]], -1)
    return jnp.where(use_x[..., None], o_a, o_b)


def concentric_sample_disk(u):
    """Map [0,1]^2 -> unit disk, concentric (lens sampling for DoF).

    Reference: kernel.cu:190-208 ``ConcentricSampleDisk``.
    """
    off = 2.0 * u - 1.0
    ox, oy = off[..., 0], off[..., 1]
    degenerate = (ox == 0) & (oy == 0)
    x_major = jnp.abs(ox) > jnp.abs(oy)
    # avoid 0/0: substitute safe denominators; result masked out anyway
    safe_ox = jnp.where(ox == 0, 1.0, ox)
    safe_oy = jnp.where(oy == 0, 1.0, oy)
    r = jnp.where(x_major, ox, oy)
    theta = jnp.where(x_major,
                      (PI / 4) * (oy / safe_ox),
                      (PI / 2) - (PI / 4) * (ox / safe_oy))
    pt = r[..., None] * jnp.stack([jnp.cos(theta), jnp.sin(theta)], -1)
    return jnp.where(degenerate[..., None], jnp.zeros_like(pt), pt)


def polygon_sample_disk(u, blades: int, rotation: float = 0.0):
    """Map [0,1]^2 uniformly onto a regular ``blades``-gon inscribed in
    the unit disk (polygonal bokeh for DoF; blades >= 3).  The sector
    comes from u0's high bits, the in-triangle sample from (u0 remainder,
    u1) via the standard fold; ``rotation`` (radians) spins the aperture.
    """
    nb = float(blades)
    u0, u1 = u[..., 0], u[..., 1]
    k = jnp.minimum((u0 * nb).astype(jnp.int32), blades - 1)
    a = u0 * nb - k.astype(jnp.float32)
    b = u1
    flip = a + b > 1.0
    a = jnp.where(flip, 1.0 - a, a)
    b = jnp.where(flip, 1.0 - b, b)
    t0 = (2.0 * PI / nb) * k.astype(jnp.float32) + rotation
    t1 = t0 + 2.0 * PI / nb
    v0 = jnp.stack([jnp.cos(t0), jnp.sin(t0)], -1)
    v1 = jnp.stack([jnp.cos(t1), jnp.sin(t1)], -1)
    return a[..., None] * v0 + b[..., None] * v1


def cone_sample(direction, extent, seed):
    """Uniform sample inside a cone around ``direction`` (sun NEE).

    Reference: sunsky.cu:170-185 ``getConeSample`` (uses RandomFloat2).
    Returns (new_seed, sample_direction).
    """
    seed, rx = rng.random_float2(seed)
    seed, ry = rng.random_float2(seed)
    return seed, cone_sample_from_uniforms(direction, extent, rx, ry)


def cone_sample_from_uniforms(direction, extent, rx, ry):
    """Deterministic half of :func:`cone_sample` — same uniform->cone
    mapping, for low-discrepancy call sites (ops/sobol.py draws)."""
    d = normalize(direction)
    o1 = normalize(ortho(d))
    o2 = normalize(cross(d, o1))
    phi = rx * 2.0 * PI
    z = 1.0 - ry * extent
    oneminus = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    return (jnp.cos(phi) * oneminus)[..., None] * o1 \
        + (jnp.sin(phi) * oneminus)[..., None] * o2 \
        + z[..., None] * d


def hg_phase(cos_theta, g: float):
    """Henyey-Greenstein phase function value == its solid-angle pdf
    (normalised so the integral over the sphere is 1).  ``g`` is a static
    config float (beyond-reference: volumetric fog, render._shade); the
    atmosphere model's own HG lives in sky.py with the reference's 1/4pi
    convention (sunsky.cu:20)."""
    if abs(g) < 1e-4:
        return jnp.full_like(cos_theta, 1.0 / (4.0 * PI))
    denom = jnp.maximum(1.0 + g * g - 2.0 * g * cos_theta, 1e-12)
    return (1.0 - g * g) / (4.0 * PI * denom * jnp.sqrt(denom))


def hg_sample_from_uniforms(direction, g: float, u1, u2):
    """Sample a direction from the HG phase function around ``direction``
    (exact inverse-CDF in cos(theta); pdf == :func:`hg_phase`).  ``g`` is
    static, so the isotropic branch is a Python-time specialisation."""
    d = normalize(direction)
    if abs(g) < 1e-4:
        cos_t = 1.0 - 2.0 * u1
    else:
        sq = (1.0 - g * g) / (1.0 - g + 2.0 * g * u1)
        cos_t = (1.0 + g * g - sq * sq) / (2.0 * g)
    cos_t = jnp.clip(cos_t, -1.0, 1.0)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = 2.0 * PI * u2
    u, v = orthonormal_basis(d)
    return u * (jnp.cos(phi) * sin_t)[..., None] \
        + v * (jnp.sin(phi) * sin_t)[..., None] \
        + d * cos_t[..., None]


def sphere_surface_sample(center, radius, seed):
    """Uniform point on a sphere surface (area light sampling).

    Reference: kernel.cu:107-120 ``Sphere::random_point`` and the inlined
    copies at kernel.cu:423-429 / 563-569.  Note the reference's axis
    convention: y gets cosPhi, x/z get the sin terms.
    Returns (new_seed, point).
    """
    seed, u = rng.random_float(seed)
    seed, v = rng.random_float(seed)
    return seed, sphere_surface_from_uniforms(center, radius, u, v)


def sphere_surface_from_uniforms(center, radius, u, v):
    """Deterministic half of :func:`sphere_surface_sample` — same mapping
    from two uniforms, for call sites that share one draw pair across
    several candidate light shapes (render._shade mixed NEE)."""
    cos_phi = 2.0 * u - 1.0
    sin_phi = jnp.sqrt(jnp.maximum(1.0 - cos_phi * cos_phi, 0.0))
    theta = 2.0 * PI * v
    offset = jnp.stack([sin_phi * jnp.sin(theta),
                        cos_phi,
                        sin_phi * jnp.cos(theta)], axis=-1)
    return center + radius * offset


def triangle_sample_from_uniforms(v0, e1, e2, u, v):
    """Uniform point on a triangle (sqrt warp): p = v0 + b1 e1 + b2 e2
    with b1 = 1 - sqrt(u), b2 = v * sqrt(u).  For emissive-triangle NEE
    (beyond-reference: the reference samples only spheres[6])."""
    su = jnp.sqrt(jnp.maximum(u, 0.0))
    b1 = 1.0 - su
    b2 = v * su
    return v0 + b1[..., None] * e1 + b2[..., None] * e2


def cosine_hemisphere_sample(normal, seed):
    """Cosine-weighted hemisphere direction around ``normal``.

    Reference: kernel.cu:456-466 (diffuse bounce: r1 = 2*pi*rand,
    r2 = rand, d = u*cos(r1)*sqrt(r2) + v*sin(r1)*sqrt(r2) + n*sqrt(1-r2)).
    Returns (new_seed, direction).
    """
    seed, r1u = rng.random_float(seed)
    seed, r2 = rng.random_float(seed)
    return seed, cosine_hemisphere_from_uniforms(normal, r1u, r2)


def cosine_hemisphere_from_uniforms(normal, r1u, r2):
    """Deterministic half of :func:`cosine_hemisphere_sample` — same
    uniform->direction mapping, for low-discrepancy call sites."""
    r1 = 2.0 * PI * r1u
    r2s = jnp.sqrt(r2)
    u, v = orthonormal_basis(normal)
    d = u * (jnp.cos(r1) * r2s)[..., None] \
        + v * (jnp.sin(r1) * r2s)[..., None] \
        + normal * jnp.sqrt(jnp.maximum(1.0 - r2, 0.0))[..., None]
    return normalize(d)


def ggx_d(n_dot_h, alpha):
    """GGX / Trowbridge-Reitz normal distribution D(h).

    Beyond-reference material model (the reference's glossy lobe is the
    normalised Phong of kernel.cu:516-596); standard single-scatter
    microfacet formulation, alpha = roughness^2 (perceptual mapping)."""
    a2 = alpha * alpha
    c = n_dot_h * n_dot_h * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(PI * c * c, 1e-12)


def ggx_d_vec(normal, h, alpha):
    """D(h) evaluated from the vectors, f32-stable at low roughness.

    The scalar form's ``(n.h)^2 (a^2 - 1) + 1`` cancels catastrophically
    when n.h -> 1 (the lobe peak, exactly where D is largest); computing
    sin^2 via the cross product instead keeps full precision there:
    c = sin^2 + a^2 cos^2."""
    cr = cross(normal, h)
    sin2 = dot(cr, cr)
    a2 = alpha * alpha
    c = sin2 + a2 * jnp.maximum(1.0 - sin2, 0.0)
    return a2 / jnp.maximum(PI * c * c, 1e-12)


def ggx_g1(n_dot_x, alpha):
    """Smith GGX masking/shadowing term G1 for one direction.

    Separable Smith: G2(v, l) = G1(v) * G1(l).  Clamps below-horizon
    directions to 0."""
    a2 = alpha * alpha
    nx = jnp.maximum(n_dot_x, 0.0)
    return 2.0 * nx / jnp.maximum(
        nx + jnp.sqrt(a2 + (1.0 - a2) * nx * nx), 1e-12)


def ggx_vndf_sample_from_uniforms(view, normal, alpha, u1, u2):
    """Sample a GGX half-vector from the visible-normal distribution.

    Heitz, "Sampling the GGX Distribution of Visible Normals" (JCGT 2018).
    ``view`` points AWAY from the surface (``-ray_direction``), ``normal``
    is the face-forwarded shading normal, ``alpha`` the squared perceptual
    roughness; ``u1``/``u2`` are uniforms in [0, 1).  Returns the sampled
    half-vector in WORLD space.  With this sampler the estimator weight for
    the reflected direction l is F(h.v) * G1(n.l) (separable Smith), since
    pdf(l) = G1(n.v) * D(h) * (v.h) / (4 (n.v) (v.h))."""
    tu, tv = orthonormal_basis(normal)
    vx = dot(view, tu)
    vy = dot(view, tv)
    vz = dot(view, normal)
    # stretch the view vector into the hemisphere configuration
    h = jnp.stack([alpha * vx, alpha * vy, vz], -1)
    h = h / jnp.sqrt(jnp.maximum(dot(h, h), 1e-20))[..., None]
    # orthonormal frame around the stretched view
    lensq = h[..., 0] * h[..., 0] + h[..., 1] * h[..., 1]
    inv_len = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-20))
    t1 = jnp.where((lensq > 1e-16)[..., None],
                   jnp.stack([-h[..., 1] * inv_len, h[..., 0] * inv_len,
                              jnp.zeros_like(inv_len)], -1),
                   jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], h.dtype),
                                    h.shape))
    t2 = cross(h, t1)
    # disk sample warped toward the configuration's visible half
    r = jnp.sqrt(jnp.maximum(u1, 0.0))
    phi = 2.0 * PI * u2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + h[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) + s * p2
    pz = jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))
    nh = p1[..., None] * t1 + p2[..., None] * t2 + pz[..., None] * h
    # unstretch back to the ellipsoid
    m = jnp.stack([alpha * nh[..., 0], alpha * nh[..., 1],
                   jnp.maximum(nh[..., 2], 0.0)], -1)
    m = m / jnp.sqrt(jnp.maximum(dot(m, m), 1e-20))[..., None]
    # local -> world
    return (m[..., 0:1] * tu + m[..., 1:2] * tv
            + m[..., 2:3] * normal)


def phong_lobe_sample(w, phong_exponent, seed):
    """Sample around the ideal reflection vector ``w`` with a cos^n lobe.

    Reference: kernel.cu:516-544 (PHONG case): cosTheta =
    (1-r2)^(1/(n+1)).  The reference rejects-and-resamples until the sampled
    direction is above the surface (do/while at kernel.cu:521-544); the caller
    handles that with a masked resampling loop.
    Returns (new_seed, direction).
    """
    seed, phi_u = rng.random_float(seed)
    seed, r2 = rng.random_float(seed)
    phi = 2.0 * PI * phi_u
    cos_theta = jnp.power(jnp.maximum(1.0 - r2, 0.0), 1.0 / (phong_exponent + 1.0))
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    u, v = orthonormal_basis(w)
    d = u * (jnp.cos(phi) * sin_theta)[..., None] \
        + v * (jnp.sin(phi) * sin_theta)[..., None] \
        + w * cos_theta[..., None]
    return seed, normalize(d)
