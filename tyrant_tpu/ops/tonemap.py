"""Tone mapping / framebuffer resolve.

Reference: kernel.cu:648-662 ``blit_onto_framebuffer`` — per pixel:
``cl = rgb / a`` (a = completed-path count), Reinhard ``cl / (cl + 1)``,
gamma 1/2.2, written to the GL surface.  On TPU the resolve is a pure
function from the accumulation buffer to a display/PNG image.
"""

from __future__ import annotations

import jax.numpy as jnp


def resolve(accum: jnp.ndarray, width: int, height: int,
            operator: str = "reinhard",
            exposure: float = 1.0) -> jnp.ndarray:
    """accum: [H*W, 4] (rgb = radiance sum, a = completed path count).
    Returns [H, W, 3] float32 in [0, 1].

    operator: "reinhard" (the reference's cl/(cl+1), kernel.cu:655) or
    "aces" (Narkowicz's ACES filmic fit — beyond-reference production
    option).  ``exposure`` scales radiance before the curve."""
    counts = jnp.maximum(accum[:, 3:4], 1e-8)
    cl = accum[:, :3] / counts
    return tonemap_image(cl, operator, exposure).reshape(height, width, 3)


def tonemap_image(cl: jnp.ndarray, operator: str = "reinhard",
                  exposure: float = 1.0) -> jnp.ndarray:
    """Linear radiance [..., 3] -> display [0, 1] (curve + gamma 1/2.2)."""
    cl = cl * exposure
    if operator == "aces":
        a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
        cl = (cl * (a * cl + b)) / (cl * (c * cl + d) + e)
    else:
        cl = cl / (cl + 1.0)
    return jnp.power(jnp.clip(cl, 0.0, 1.0), 1.0 / 2.2)


def to_uint8(img: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(img * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
