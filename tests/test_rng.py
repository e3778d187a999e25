import jax.numpy as jnp
import numpy as np

from tyrant_tpu.ops import rng


def _np_xorshift(s):
    s = np.uint32(s)
    s ^= np.uint32((int(s) << 13) & 0xFFFFFFFF)
    s ^= np.uint32(int(s) >> 17)
    s ^= np.uint32((int(s) << 5) & 0xFFFFFFFF)
    return s


def test_xorshift_matches_numpy_oracle():
    seeds = np.array([1, 2, 12345, 0xDEADBEEF, 0x7FFFFFFF], dtype=np.uint32)
    got = np.asarray(rng.xorshift(jnp.asarray(seeds)))
    want = np.array([_np_xorshift(s) for s in seeds], dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


def test_random_float_range_and_mean():
    seeds = rng.seed_from(jnp.arange(20000), 7)
    out = []
    s = seeds
    for _ in range(4):
        s, f = rng.random_float(s)
        out.append(np.asarray(f))
    f = np.concatenate(out)
    assert f.min() >= 0.0 and f.max() < 1.0
    assert abs(f.mean() - 0.5) < 0.01
    assert abs(f.var() - 1 / 12) < 0.01


def test_random_float2_range():
    s = rng.seed_from(jnp.arange(10000), 3)
    s, f = rng.random_float2(s)
    f = np.asarray(f)
    assert f.min() >= 0.0 and f.max() <= 1.0
    assert abs(f.mean() - 0.5) < 0.02


def test_seed_from_never_zero_and_decorrelated():
    s = np.asarray(rng.seed_from(jnp.arange(100000), 0))
    assert (s != 0).all()
    # near-unique
    assert len(np.unique(s)) > 99000


def test_stratified_sample_covers_strata():
    s = rng.seed_from(jnp.arange(8000), 11)
    s, uv = rng.random_2d_stratified(s)
    uv = np.asarray(uv)
    assert uv.min() >= 0.0 and uv.max() <= 1.0
    # every 4x4 stratum should receive samples
    bins = (np.floor(uv[:, 0] * 4).clip(0, 3).astype(int) * 4
            + np.floor(uv[:, 1] * 4).clip(0, 3).astype(int))
    assert len(np.unique(bins)) == 16


def test_random_int_between_inclusive():
    s = rng.seed_from(jnp.arange(5000), 5)
    s, v = rng.random_int_between_0_and_max(s, 15)
    v = np.asarray(v)
    assert v.min() >= 0 and v.max() <= 15
    assert len(np.unique(v)) == 16
