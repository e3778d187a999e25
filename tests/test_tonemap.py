"""Tone-mapping operators (reinhard = reference kernel.cu:648-662;
aces + exposure are beyond-reference production options)."""

import jax.numpy as jnp
import numpy as np

from tyrant_tpu.ops.tonemap import resolve


def _accum(vals):
    v = np.asarray(vals, np.float32)
    acc = np.concatenate([v, np.ones((v.shape[0], 1), np.float32)], axis=1)
    return jnp.asarray(acc)


def test_reinhard_matches_reference_formula():
    acc = _accum([[0.5, 1.0, 4.0]])
    img = np.asarray(resolve(acc, 1, 1)).reshape(3)
    want = (np.asarray([0.5, 1.0, 4.0]) / np.asarray([1.5, 2.0, 5.0])) \
        ** (1 / 2.2)
    np.testing.assert_allclose(img, want, rtol=1e-6)


def test_aces_brighter_midtones_and_bounded():
    acc = _accum([[0.18, 0.18, 0.18], [50.0, 50.0, 50.0]])
    rein = np.asarray(resolve(acc, 1, 2))
    aces = np.asarray(resolve(acc, 1, 2, operator="aces"))
    assert (aces >= 0).all() and (aces <= 1).all()
    # the filmic curve lifts midtones relative to reinhard
    assert aces[0, 0, 0] > rein[0, 0, 0]


def test_exposure_scales_before_curve():
    acc = _accum([[1.0, 1.0, 1.0]])
    doubled = np.asarray(resolve(acc, 1, 1, exposure=2.0))
    want = (2.0 / 3.0) ** (1 / 2.2)
    np.testing.assert_allclose(doubled, want, rtol=1e-6)


def test_zero_count_pixels_resolve_black():
    acc = jnp.zeros((4, 4), jnp.float32)
    img = np.asarray(resolve(acc, 2, 2))
    np.testing.assert_array_equal(img, 0.0)
