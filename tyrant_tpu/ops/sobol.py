"""Shuffled, Owen-scrambled 2-D Sobol sampling (beyond-reference).

The reference draws every sample from a per-ray xorshift stream
(kernel.cu:23-65); Monte-Carlo error then decays as 1/sqrt(N).  A
low-discrepancy sequence decorrelates samples *within* each pixel's
integration dimensions, cutting low-sample noise substantially for the
same ray budget — the standard production-tracer upgrade.

Design (Burley, "Practical Hash-based Owen Scrambling", JCGT 2020):
every draw is a point of the classic 2-D Sobol sequence (dim 0 = van der
Corput bit reversal, dim 1 = the x+1 primitive-polynomial recurrence),
made unique per (pixel, purpose) by

  * a nested-uniform *shuffle* of the sample index (decorrelates point
    ORDER across pixels/purposes without disturbing each sequence's
    prefix stratification), and
  * a nested-uniform *scramble* of each output axis (Owen scrambling:
    preserves the (0,2)-sequence elementary-interval property, breaks
    the lattice structure that plain Sobol shows as banding).

Both transforms are the Laine-Karras style hash permutation on reversed
bits, so everything here is ~a dozen u32 VPU ops per draw — no tables,
no gathers, vectorises over the 2M-ray wavefront.

Consumed by render.py when ``RenderConfig.sampler == "sobol"``: the
per-pixel sample index is derived arithmetically from the round-robin
raygen counter (``sample_base`` + scan wrap count — zero gathers) and
carried per ray through the compaction sort for the bounce dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32


def _u32(x):
    return jnp.asarray(x, _U32)


def reverse_bits32(x: jnp.ndarray) -> jnp.ndarray:
    x = x.astype(_U32)
    x = ((x >> 1) & _u32(0x55555555)) | ((x & _u32(0x55555555)) << 1)
    x = ((x >> 2) & _u32(0x33333333)) | ((x & _u32(0x33333333)) << 2)
    x = ((x >> 4) & _u32(0x0F0F0F0F)) | ((x & _u32(0x0F0F0F0F)) << 4)
    x = ((x >> 8) & _u32(0x00FF00FF)) | ((x & _u32(0x00FF00FF)) << 8)
    return (x >> 16) | (x << 16)


def laine_karras(x: jnp.ndarray, seed) -> jnp.ndarray:
    """Hash-based permutation of the unit interval's HIGH bits: for any
    two inputs agreeing in their top k bits, the outputs do too — the
    hash property that makes nested-uniform scrambling valid.  Constants
    from Burley 2020 (the improved-avalanche variant)."""
    x = x.astype(_U32) + jnp.asarray(seed).astype(_U32)
    x = x ^ (x * _u32(0x6C50B47C))
    x = x ^ (x * _u32(0xB82F1E52))
    x = x ^ (x * _u32(0xC7AFE638))
    x = x ^ (x * _u32(0x8D22F6E6))
    return x


def nested_uniform_scramble(x: jnp.ndarray, seed) -> jnp.ndarray:
    """Owen scramble of a [0,1) value encoded in u32 (low bits finest)."""
    return reverse_bits32(laine_karras(reverse_bits32(x), seed))


# dim-1 direction numbers: v_0 = 1<<31, v_{j+1} = v_j ^ (v_j >> 1)
# (primitive polynomial x + 1 — the classic second Sobol dimension)
_V1 = []
_v = 1 << 31
for _ in range(32):
    _V1.append(_v)
    _v ^= _v >> 1
del _v


def sobol_dim0(index: jnp.ndarray) -> jnp.ndarray:
    """First Sobol dimension == van der Corput radical inverse base 2."""
    return reverse_bits32(index.astype(_U32))


def sobol_dim1(index: jnp.ndarray) -> jnp.ndarray:
    """Second Sobol dimension, XOR-fold of the direction numbers selected
    by the index bits (unrolled at trace time; 32 select+xor VPU ops)."""
    index = index.astype(_U32)
    out = jnp.zeros_like(index)
    for j in range(32):
        bit = (index >> j) & _u32(1)
        out = out ^ jnp.where(bit != 0, _u32(_V1[j]), _u32(0))
    return out


def _to_unit_float(u: jnp.ndarray) -> jnp.ndarray:
    """Top 24 bits -> f32 in [0, 1)."""
    return (u >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def _key_mix(key: jnp.ndarray, salt: int) -> jnp.ndarray:
    """Derive an independent stream seed from a draw key (finalizer-style
    integer mix; full avalanche so axis/shuffle seeds decorrelate)."""
    h = key.astype(_U32) ^ _u32(salt)
    h = h ^ (h >> 16)
    h = h * _u32(0x7FEB352D)
    h = h ^ (h >> 15)
    h = h * _u32(0x846CA68B)
    h = h ^ (h >> 16)
    return h


def sample_2d(sample_index: jnp.ndarray, key: jnp.ndarray):
    """Point ``sample_index`` of the (pixel, purpose)-keyed shuffled
    scrambled 2-D Sobol sequence.  Returns (u, v) f32 in [0, 1)."""
    idx = nested_uniform_scramble(sample_index.astype(_U32),
                                  _key_mix(key, 0xA511E9B3))
    u = _to_unit_float(nested_uniform_scramble(sobol_dim0(idx),
                                               _key_mix(key, 0x1D8E4464)))
    v = _to_unit_float(nested_uniform_scramble(sobol_dim1(idx),
                                               _key_mix(key, 0x8C7F1A2B)))
    return u, v


def sample_1d(sample_index: jnp.ndarray, key: jnp.ndarray) -> jnp.ndarray:
    """1-D variant: the van der Corput dimension only."""
    idx = nested_uniform_scramble(sample_index.astype(_U32),
                                  _key_mix(key, 0xA511E9B3))
    return _to_unit_float(nested_uniform_scramble(sobol_dim0(idx),
                                                  _key_mix(key, 0x1D8E4464)))
