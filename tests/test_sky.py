import jax.numpy as jnp
import numpy as np

from tyrant_tpu import sky as skymod
from tyrant_tpu.ops.sampling import normalize


PARAMS = skymod.SkyParams()
SUN = skymod.sun_direction_from_position([0.05, 0.3])


def test_sun_direction_default():
    # kernel.cu:708 with sun_position = (0.05, 0.3) (variables.cpp:3)
    d = np.asarray(SUN)
    np.testing.assert_allclose(np.linalg.norm(d), 1.0, atol=1e-6)
    assert d[2] > 0.7  # sun well above horizon
    assert d[0] < 0    # azimuth 0.314 rad, inclination negative -> -x


def test_sky_radiance_finite_and_positive():
    r = np.random.default_rng(0)
    dirs = normalize(jnp.asarray(r.normal(size=(1000, 3)).astype(np.float32)))
    out = np.asarray(skymod.sky(dirs, SUN, PARAMS))
    assert np.isfinite(out).all()
    assert (out >= 0).all()
    # sky is blue-ish away from the sun: b channel dominates on average
    up_mask = np.asarray(dirs)[:, 2] > 0.2
    mean = out[up_mask].mean(0)
    assert mean[2] > mean[0]


def test_sky_horizon_no_nan():
    dirs = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
                        [0.0, 0.0, -1.0]], dtype=jnp.float32)
    for fn in (skymod.sky, skymod.sunsky, skymod.sun):
        out = np.asarray(fn(dirs, SUN, PARAMS))
        assert np.isfinite(out).all(), fn.__name__


def test_sun_disc_localised():
    # inside the disc: bright; outside: zero
    inside = np.asarray(skymod.sun(SUN[None], SUN, PARAMS))
    away = normalize(SUN + jnp.asarray([0.3, 0.0, 0.0]))
    outside = np.asarray(skymod.sun(away[None], SUN, PARAMS))
    assert inside.max() > 1.0
    assert outside.max() == 0.0


def test_sunsky_peaks_at_sun():
    at_sun = np.asarray(skymod.sunsky(SUN[None], SUN, PARAMS)).sum()
    away = normalize(SUN + jnp.asarray([0.5, 0.5, 0.0]))
    off_sun = np.asarray(skymod.sunsky(away[None], SUN, PARAMS)).sum()
    assert at_sun > off_sun * 10


def test_sunsky_equals_sky_away_from_disc():
    r = np.random.default_rng(3)
    dirs = normalize(jnp.asarray(r.normal(size=(200, 3)).astype(np.float32)))
    cosang = np.asarray(jnp.sum(dirs * SUN, axis=-1))
    far = cosang < PARAMS.sun_angular_diameter_cos - 0.01
    s1 = np.asarray(skymod.sunsky(dirs, SUN, PARAMS))[far]
    s2 = np.asarray(skymod.sky(dirs, SUN, PARAMS))[far]
    np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-8)
