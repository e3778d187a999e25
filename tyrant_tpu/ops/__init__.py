from . import intersect, rng, sampling, tonemap  # noqa: F401
