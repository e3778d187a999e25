"""Adaptive sampling: priority-ordered raygen allocation (beyond-reference).

The reference samples every pixel uniformly forever (kernel.cu:263 scans
rows linearly).  A production progressive renderer converges faster by
directing the ray budget at the pixels that still carry Monte-Carlo error.
The wavefront-native spelling here keeps everything dense and fixed-shape:

  * the accumulation pass already tracks per-pixel completed-path counts in
    ``accum[:, 3]``; with ``RenderConfig.adaptive_sampling="on"`` the same
    pixel-sorted flush also accumulates per-channel SQUARED radiance into a
    second buffer ``moment2`` (one extra accumulate_sorted call — the sort
    keys are shared, render.py step 7);
  * every ``adaptive_interval`` steps the host rebuilds a pixel-visit
    permutation from the running relative-error estimate (one P-element
    sort, amortised to ~2-3 ms/step at 1080p);
  * raygen walks that permutation instead of the raster scan, so the
    wavefront machinery (top-off, carry, compaction) is untouched.

Allocation is a power law over error rank: visit slot ``i`` samples the
pixel ranked ``floor(P * (i/P)**gamma)``, so with gamma=2 the top-ranked
pixel receives ~sqrt(P/ rank) visits per cycle while the bottom half
receives ~0.7x uniform.  A golden-ratio phase jitter per rebuild shifts
which low-priority ranks are skipped, so coverage holes rotate instead of
persisting.  The per-pixel estimator (radiance sum / path count, resolved
in ops/tonemap.py) is unbiased under ANY visit schedule, so adaptive
sampling changes variance distribution, never the converged image.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# error levels for the visit-order key: pixels of equal level are visited
# in raster order, which keeps primary packets spatially coherent (the
# raygen analog of the compaction sort's spatial keys)
_LEVELS = 64
# error floor added to the mean luminance: avoids near-black pixels with
# tiny absolute noise dominating the relative-error ranking
_LUM_FLOOR = 0.05


@partial(jax.jit, static_argnames=("gamma",))
def build_perm(accum: jnp.ndarray, moment2: jnp.ndarray, phase: jnp.ndarray,
               gamma: float = 2.0) -> jnp.ndarray:
    """accum/moment2 [P, 4] -> visit permutation [P] i32 (with repetition).

    Priority = relative standard error of the per-pixel mean, from the
    running first/second moments (per-channel variances summed — a ranking
    heuristic, not an exact luminance variance).  Unsampled pixels rank
    first.  ``phase`` in [0, 1) rotates which ranks the power-law visit
    curve lands on between rebuilds.
    """
    p = accum.shape[0]
    cnt = accum[:, 3]
    n = jnp.maximum(cnt, 1.0)
    mean = accum[:, :3] / n[:, None]
    m2 = moment2[:, :3] / n[:, None]
    var = jnp.maximum(m2 - mean * mean, 0.0).sum(axis=1)
    lum = mean @ jnp.asarray([0.299, 0.587, 0.114], jnp.float32)
    err = jnp.sqrt(var / n) / (lum + _LUM_FLOOR)

    emax = jnp.max(jnp.where(cnt >= 1.0, err, 0.0))
    level = jnp.clip((err / (emax + 1e-20) * (_LEVELS - 1)).astype(jnp.int32),
                     0, _LEVELS - 1)
    level = jnp.where(cnt < 1.0, _LEVELS - 1, level)

    # descending level, ascending pixel id within a level (raster coherence)
    key = (_LEVELS - 1 - level) * p + jnp.arange(p, dtype=jnp.int32)
    _, ranked = jax.lax.sort((key, jnp.arange(p, dtype=jnp.int32)),
                             num_keys=1)

    i = jnp.arange(p, dtype=jnp.float32)
    u = (i + phase.astype(jnp.float32)) / p
    r = jnp.minimum((jnp.power(u, gamma) * p).astype(jnp.int32), p - 1)
    return ranked[r]


def identity_perm(p: int) -> jnp.ndarray:
    return jnp.arange(p, dtype=jnp.int32)
