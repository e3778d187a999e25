"""Pallas TPU framebuffer accumulation over pixel-sorted updates.

The reference accumulates radiance with global-memory ``atomicAdd`` per
path/shadow hit (kernel.cu:622-625, 641-644).  XLA's deterministic
scatter-add replacement turned out to be the single most expensive op of a
wavefront step at the 2M queue size: ~197 ms for a [2M -> 2M, 4] f32
scatter on v5e (~50 M updates/s/column; sorted-index hints don't help —
measured in docs/PERFORMANCE.md round 2).

This kernel exploits what the atomic-free pipeline already guarantees: the
wavefront's survivor-compaction sort can emit *terminated* rays sorted by
pixel at no extra cost.  Pixel-sorted updates turn accumulation into a
tiled, dense problem:

  * grid over framebuffer tiles of TILE_PIX pixels (one [TILE_PIX, 4]
    accum block per step, aliased in/out);
  * per tile, the update range [lo, hi) comes from a host-side
    ``searchsorted`` over the sorted pixel column (tiny: n_tiles+1 binary
    searches), delivered through SMEM;
  * updates stream through VMEM in CHUNK-aligned windows (straddling
    chunks are re-fetched by both neighbouring tiles and masked, so no
    alignment games are needed);
  * the per-lane scatter the VPU cannot do becomes a ONE-HOT MATMUL on the
    MXU: contrib[r, c] = sum_k onehot[r, k] * vals[k, c] with
    onehot[r, k] = (pix[k] == tile_base + r).  128 updates per matmul,
    [TILE_PIX, 128] x [128, 4].

Updates are cast to bf16 for the matmul (the one-hot factor is exact, the
f32 accumulation is exact; only the update mantissa rounds — ~2^-8
relative, far below Monte-Carlo noise).  The alpha column holds 0/1 path
counts, exact in bf16.

Untouched pixels cost one block copy; the whole pass is ~15 ms at 2M
updates vs ~197 ms for the XLA scatter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_PIX = 2048   # framebuffer pixels per grid step (block sublane dim)
CHUNK = 1024      # updates fetched per DMA (8 rows of 128)


def _accum_kernel(bounds_ref, pix_hbm, vals_hbm, acc_ref, out_ref,
                  pix_buf, vals_buf, sem_p, sem_v):
    i = pl.program_id(0)
    lo = bounds_ref[i]
    hi = bounds_ref[i + 1]
    base = i * TILE_PIX

    out_ref[:] = acc_ref[:]

    def cond(c):
        return c * CHUNK < hi

    def body(c):
        pltpu.make_async_copy(pix_hbm.at[pl.ds(c * 8, 8), :], pix_buf,
                              sem_p).start()
        pltpu.make_async_copy(vals_hbm.at[:, pl.ds(c * CHUNK, CHUNK)],
                              vals_buf, sem_v).start()
        pltpu.make_async_copy(pix_hbm.at[pl.ds(c * 8, 8), :], pix_buf,
                              sem_p).wait()
        pltpu.make_async_copy(vals_hbm.at[:, pl.ds(c * CHUNK, CHUNK)],
                              vals_buf, sem_v).wait()

        # mask updates outside this tile's [lo, hi) range (straddling
        # chunks are visited by both neighbours) and localise pixels
        gidx = (c * CHUNK
                + jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) * 128
                + jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1))
        pix = pix_buf[:]
        valid = (gidx >= lo) & (gidx < hi) & (pix >= base) \
            & (pix < base + TILE_PIX)
        local = jnp.where(valid, pix - base, -1)

        total = jnp.zeros((TILE_PIX, 4), jnp.float32)
        rows = jax.lax.broadcasted_iota(jnp.int32, (TILE_PIX, 128), 0)
        for k in range(8):
            onehot = (rows == local[k:k + 1, :]).astype(jnp.bfloat16)
            # channels ride planar [4, 128]; the dot contracts both LANE
            # dims (update index) so no in-kernel transpose is needed
            vrow = vals_buf[:, k * 128:(k + 1) * 128].astype(jnp.bfloat16)
            total = total + jax.lax.dot_general(
                onehot, vrow, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[:] = out_ref[:] + total
        return c + 1

    jax.lax.while_loop(cond, body, lo // CHUNK)


@functools.partial(jax.jit, static_argnames=("interpret",))
def accumulate_sorted(accum, upd_pix, upd_vals, interpret: bool = False):
    """accum [P, 4] f32 + pixel-sorted updates -> new accum.

    upd_pix: [N] i32, sorted ascending; entries that must not accumulate
    (e.g. surviving rays) carry a sentinel >= n_tiles * TILE_PIX.
    upd_vals: [N, 4] f32.  N must be a multiple of CHUNK.
    """
    p, _ = accum.shape
    n = upd_pix.shape[0]
    assert n % CHUNK == 0, n
    n_tiles = pl.cdiv(p, TILE_PIX)

    starts = jnp.arange(n_tiles + 1, dtype=jnp.int32) * TILE_PIX
    bounds = jnp.searchsorted(upd_pix, starts, side="left").astype(jnp.int32)

    acc_spec = pl.BlockSpec((TILE_PIX, 4), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _accum_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            acc_spec,
        ],
        out_specs=acc_spec,
        out_shape=jax.ShapeDtypeStruct((p, 4), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.int32),
            pltpu.VMEM((4, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={3: 0},
        interpret=interpret,
    )(bounds, upd_pix.reshape(n // 128, 128), upd_vals.T, accum)


def sentinel(p: int) -> int:
    """Pixel value that is ignored by accumulate_sorted for a [P,·] buffer
    (lands past the last tile's range)."""
    return pl.cdiv(p, TILE_PIX) * TILE_PIX
