from . import bvh, ply  # noqa: F401
