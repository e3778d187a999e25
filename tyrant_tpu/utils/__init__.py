from . import metrics, profiling  # noqa: F401
