"""accumulate_sorted (MXU one-hot tiled accumulation) vs the scatter-add
oracle, in interpret mode on CPU.

The kernel replaces the reference's atomicAdd framebuffer accumulation
(kernel.cu:622-625, 641-644) for pixel-SORTED terminated-ray updates.
Compiled-mode equivalence on real TPU is implied by the bench equivalence
gate + golden accumulation invariants; these tests pin the update semantics
(tile straddling, sentinel tail, bf16 value rounding) on every CI run."""

import jax.numpy as jnp
import numpy as np
import pytest

from tyrant_tpu.ops.pallas.accum_kernel import (CHUNK, TILE_PIX,
                                                accumulate_sorted, sentinel)


def _oracle(accum, pix, vals, p):
    out = np.asarray(accum, np.float64).copy()
    pixn = np.asarray(pix)
    # bf16 rounding of the update values (the kernel's matmul operand
    # dtype); the one-hot factor and f32 accumulation are exact
    v = np.asarray(jnp.asarray(vals).astype(jnp.bfloat16).astype(jnp.float32))
    for i in range(pixn.shape[0]):
        if pixn[i] < p:
            out[pixn[i]] += v[i]
    return out.astype(np.float32)


def _run_case(p, n, rng, frac_sentinel=0.3, dense_pixel_span=None):
    accum = jnp.asarray(rng.normal(size=(p, 4)).astype(np.float32))
    span = dense_pixel_span or p
    pix = rng.integers(0, span, size=n).astype(np.int32)
    sent = sentinel(p)
    kill = rng.random(n) < frac_sentinel
    pix = np.where(kill, sent, pix)
    pix = np.sort(pix).astype(np.int32)
    vals = rng.normal(size=(n, 4)).astype(np.float32)
    # sentinel entries must not accumulate regardless of their values
    got = accumulate_sorted(jnp.asarray(accum), jnp.asarray(pix),
                            jnp.asarray(vals), interpret=True)
    want = _oracle(accum, pix, vals, p)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-5)


def test_matches_scatter_oracle_uniform():
    rng = np.random.default_rng(0)
    _run_case(p=4 * TILE_PIX, n=4 * CHUNK, rng=rng)


def test_tile_straddling_and_hot_pixels():
    """Many updates collapsing onto few pixels near tile boundaries: the
    straddling-chunk re-fetch path and one-hot column saturation."""
    rng = np.random.default_rng(1)
    p = 2 * TILE_PIX
    n = 2 * CHUNK
    edges = np.array([TILE_PIX - 1, TILE_PIX, TILE_PIX + 1, 0, p - 1],
                     np.int32)
    pix = np.sort(np.concatenate(
        [np.repeat(edges, n // 10),
         rng.integers(0, p, n - (n // 10) * 5).astype(np.int32)]))
    vals = rng.normal(size=(n, 4)).astype(np.float32)
    accum = jnp.zeros((p, 4), jnp.float32)
    got = accumulate_sorted(accum, jnp.asarray(pix.astype(np.int32)),
                            jnp.asarray(vals), interpret=True)
    want = _oracle(accum, pix, vals, p)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-5)


def test_all_sentinel_is_identity():
    rng = np.random.default_rng(2)
    p = TILE_PIX
    accum = jnp.asarray(rng.normal(size=(p, 4)).astype(np.float32))
    pix = jnp.full((CHUNK,), sentinel(p), jnp.int32)
    vals = jnp.asarray(rng.normal(size=(CHUNK, 4)).astype(np.float32))
    got = accumulate_sorted(accum, pix, vals, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(accum))


def test_alpha_path_counts_exact():
    """0/1 alpha counts are exact in bf16; the column must sum exactly."""
    rng = np.random.default_rng(3)
    p = 2 * TILE_PIX
    n = 2 * CHUNK
    pix = np.sort(rng.integers(0, p, n).astype(np.int32))
    vals = np.zeros((n, 4), np.float32)
    vals[:, 3] = 1.0
    got = accumulate_sorted(jnp.zeros((p, 4), jnp.float32),
                            jnp.asarray(pix), jnp.asarray(vals),
                            interpret=True)
    assert float(jnp.sum(got[:, 3])) == n
    counts = np.bincount(pix, minlength=p)
    np.testing.assert_array_equal(np.asarray(got)[:, 3], counts)


def test_ragged_last_tile():
    """P not a multiple of TILE_PIX (1080p: 1920*1080 = 1012.5 tiles)."""
    rng = np.random.default_rng(4)
    _run_case(p=TILE_PIX + 777, n=2 * CHUNK, rng=rng,
              dense_pixel_span=TILE_PIX + 777)
