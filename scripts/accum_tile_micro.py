"""Accum-kernel tile/chunk A/B (round-4 lead 3: 'accum-kernel tile
tuning').  Times accumulate_sorted at the production shape (2M-pixel
framebuffer, 2M sorted updates, ~55% terminated) for a grid of TILE_PIX /
CHUNK values.  Patches the module constants and clears jit caches between
configs.

Usage: python scripts/accum_tile_micro.py [--rays N] [--pixels N]
"""

import argparse
import functools
import os
import sys
import time

print = functools.partial(print, flush=True)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=2 * 1_048_576)
    ap.add_argument("--pixels", type=int, default=1920 * 1080)
    args = ap.parse_args()
    n, p = args.rays, args.pixels

    from tyrant_tpu.ops.pallas import accum_kernel as ak

    r = np.random.default_rng(11)
    frac_term = 0.55
    n_term = int(n * frac_term)
    pix = np.sort(r.integers(0, p, n_term))
    upd_vals = r.random((n, 4)).astype(np.float32)
    accum = jnp.zeros((p, 4), jnp.float32)
    upd_vals_j = jnp.asarray(upd_vals)

    def timeit(fn, reps=5):
        fn()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            float(jnp.sum(out))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2] * 1e3

    base = None
    for tile in (1024, 2048, 4096, 8192):
        for chunk in (1024, 2048):
            ak.TILE_PIX = tile
            ak.CHUNK = chunk
            jax.clear_caches()
            # sentinel must land past the last tile for THIS tile size
            sent = (p + tile - 1) // tile * tile
            upd_pix_j = jnp.asarray(np.concatenate(
                [pix, np.full(n - n_term, sent)]).astype(np.int32))
            try:
                ms = timeit(lambda: ak.accumulate_sorted(
                    accum, upd_pix_j, upd_vals_j))
            except Exception as e:
                print(f"TILE {tile:5d} CHUNK {chunk:5d}: "
                      f"FAIL {type(e).__name__}: {str(e)[:90]}")
                continue
            tag = ""
            if tile == 2048 and chunk == 1024:
                base = ms
                tag = "  <- production"
            print(f"TILE {tile:5d} CHUNK {chunk:5d}: {ms:7.2f} ms{tag}")
    if base is not None:
        print(f"baseline (2048/1024): {base:.2f} ms")


if __name__ == "__main__":
    main()
