"""Analytic Rayleigh + Mie sun/sky environment light (pure jnp, batched).

Reference: sunsky.cu / sunsky.cuh — a GLSL-derived atmosphere model (see the
provenance notes at sunsky.cuh:1-21).  Three entry points mirror the
reference: :func:`sun` (solar radiance used by NEE, sunsky.cu:32-74),
:func:`sky` (sky-only, sunsky.cu:76-114) and :func:`sunsky` (combined with a
smoothstep solar disc, sunsky.cu:116-161).

Deliberate fix vs the reference: ``sun()``'s solar-disc factor has an
operator-precedence bug (sunsky.cu:70 parses as
``sunAngularDiameterCos < (cosViewSunAngle ? 1.0 : 0.0)`` which is ~always 1).
We implement the intended disc test ``cosViewSunAngle >= sunAngularDiameterCos``.
For NEE this is equivalent (cone samples lie inside the disc by construction,
sunsky.cu:170-185) — SURVEY.md §7 lists this bug as not-to-copy.

All directions are [..., 3]; "up" is +Z (sunsky.cu:5).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from .config import PI, SkyConfig
from .ops.sampling import dot, normalize

# Reference: sunsky.cu:4
K = (0.686, 0.678, 0.666)
UP = (0.0, 0.0, 1.0)
# Reference: sunsky.cu:41 / 85 / 127
RAYLEIGH_AT_X = (5.176821e-6, 1.2785348e-5, 2.8530756e-5)


@dataclasses.dataclass(frozen=True)
class SkyParams:
    """Scalars precomputed on the host once per config (the reference uploads
    these as __constant__/__device__ globals, kernel.cu:683-684, sunsky.cu:4-8)."""

    cfg: SkyConfig = dataclasses.field(default_factory=SkyConfig)

    @property
    def sun_angular_diameter_cos(self) -> float:
        # kernel.cu:683: cos(sunSize * pi / 180)
        import math
        return math.cos(self.cfg.sun_size_degrees * PI / 180.0)

    @property
    def total_mie(self):
        # sunsky.cu:14-18 totalMie(primaryWavelengths, K, turbidity) * mieCoefficient
        c = (0.2 * self.cfg.turbidity) * 10e-18
        wl = jnp.asarray(self.cfg.primary_wavelengths, jnp.float32)
        k = jnp.asarray(K, jnp.float32)
        mie = 0.434 * c * PI * jnp.power((2.0 * PI) / wl, self.cfg.v - 2.0) * k
        return mie * self.cfg.mie_coefficient


def from_spherical(p):
    """Spherical (azimuth, inclination) -> cartesian.  Reference: sunsky.cu:28-30."""
    return jnp.stack([jnp.cos(p[..., 0]) * jnp.sin(p[..., 1]),
                      jnp.sin(p[..., 0]) * jnp.sin(p[..., 1]),
                      jnp.cos(p[..., 1])], axis=-1)


def sun_direction_from_position(sun_position):
    """Map the UI's 2-D sun position to a world direction.
    Reference: kernel.cu:708 — ``fromSpherical((pos - (0, 0.5)) * (6.28, 3.14))``."""
    sun_position = jnp.asarray(sun_position, jnp.float32)
    p = (sun_position - jnp.asarray([0.0, 0.5], jnp.float32)) \
        * jnp.asarray([6.28, 3.14], jnp.float32)
    return normalize(from_spherical(p))


def _rayleigh_phase(cos_angle):
    """Reference: sunsky.cu:10-12."""
    return (3.0 / (16.0 * PI)) * (1.0 + cos_angle * cos_angle)


def _hg_phase(cos_angle, g):
    """Henyey-Greenstein.  Reference: sunsky.cu:20-22."""
    return (1.0 / (4.0 * PI)) * ((1.0 - g * g) /
                                 jnp.power(1.0 - 2.0 * g * cos_angle + g * g, 1.5))


def _sun_intensity(zenith_angle_cos, cfg: SkyConfig):
    """Reference: sunsky.cu:24-26."""
    return cfg.sun_intensity * jnp.maximum(
        0.0,
        1.0 - jnp.exp(-((cfg.cutoff_angle - jnp.arccos(jnp.clip(zenith_angle_cos, -1.0, 1.0)))
                        / cfg.steepness)))


def _atmosphere_common(view_dir, sun_dir, params: SkyParams):
    """Shared body of sun()/sky()/sunsky() (sunsky.cu:34-67, 78-111, 118-153).

    Returns (sun_e, fex, sky_term, cos_view_sun).
    """
    cfg = params.cfg
    up = jnp.asarray(UP, jnp.float32)
    cos_view_sun = dot(view_dir, sun_dir)
    cos_sun_up = dot(sun_dir, up)
    cos_up_view = dot(up, view_dir)

    sun_e = _sun_intensity(cos_sun_up, cfg)
    rayleigh = jnp.asarray(RAYLEIGH_AT_X, jnp.float32)
    mie = params.total_mie

    zenith = jnp.maximum(0.0, cos_up_view)
    # Division by zero at the horizon yields +inf optical length -> Fex = 0,
    # exactly the reference's IEEE behaviour (sunsky.cu:50-51).
    rayleigh_len = cfg.rayleigh_zenith_length / zenith[..., None]
    mie_len = cfg.mie_zenith_length / zenith[..., None]

    fex = jnp.exp(-(rayleigh * rayleigh_len + mie * mie_len))

    rayleigh_to_eye = rayleigh * _rayleigh_phase(cos_view_sun)[..., None]
    mie_to_eye = mie * _hg_phase(cos_view_sun, cfg.mie_directional_g)[..., None]

    light_frac = (rayleigh_to_eye + mie_to_eye) / (rayleigh + mie)
    something = sun_e[..., None] * light_frac

    sky_term = something * (1.0 - fex)
    mix_t = jnp.clip(jnp.power(1.0 - dot(up, sun_dir), 5.0), 0.0, 1.0)
    low_sun = jnp.power(jnp.maximum(something * fex, 0.0), 0.5)
    sky_term = sky_term * ((1.0 - mix_t) + mix_t * low_sun)

    return sun_e, fex, sky_term, cos_view_sun


def sun(view_dir, sun_dir, params: SkyParams):
    """Solar-disc radiance (used by sun NEE at kernel.cu:417/556).
    Reference: sunsky.cu:32-74 with the disc test fixed (see module doc)."""
    sun_e, fex, _, cos_view_sun = _atmosphere_common(view_dir, sun_dir, params)
    sundisk = (cos_view_sun >= params.sun_angular_diameter_cos).astype(jnp.float32)
    return 0.01 * (sun_e[..., None] * 19000.0 * fex) * sundisk[..., None]


def sky(view_dir, sun_dir, params: SkyParams):
    """Sky-only radiance (diffuse-born miss, kernel.cu:615).
    Reference: sunsky.cu:76-114."""
    _, _, sky_term, _ = _atmosphere_common(view_dir, sun_dir, params)
    return params.cfg.sky_factor * 0.01 * sky_term


def sunsky(view_dir, sun_dir, params: SkyParams):
    """Sky + smoothstep solar disc (specular-born miss, kernel.cu:615).
    Reference: sunsky.cu:116-161."""
    sun_e, fex, sky_term, cos_view_sun = _atmosphere_common(view_dir, sun_dir, params)
    a = params.sun_angular_diameter_cos
    t = jnp.clip((cos_view_sun - a) / 0.00002, 0.0, 1.0)
    sundisk = t * t * (3.0 - 2.0 * t)  # glm::smoothstep, sunsky.cu:156-157
    sun_term = (sun_e[..., None] * 19000.0 * fex) * sundisk[..., None] * 1e-5
    return 0.01 * (sun_term + sky_term)


def sky_and_sunsky(view_dir, sun_dir, params: SkyParams):
    """Both miss radiances from one shared atmosphere evaluation (the shade
    step needs sky() for diffuse-born misses and sunsky() for specular-born
    ones, kernel.cu:615)."""
    sun_e, fex, sky_term, cos_view_sun = _atmosphere_common(view_dir, sun_dir,
                                                            params)
    sky_v = params.cfg.sky_factor * 0.01 * sky_term
    a = params.sun_angular_diameter_cos
    t = jnp.clip((cos_view_sun - a) / 0.00002, 0.0, 1.0)
    sundisk = t * t * (3.0 - 2.0 * t)
    sun_term = (sun_e[..., None] * 19000.0 * fex) * sundisk[..., None] * 1e-5
    return sky_v, 0.01 * (sun_term + sky_term)
