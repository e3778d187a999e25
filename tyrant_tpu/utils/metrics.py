"""Render metrics & structured logging.

The reference's observability is printf + an ImGui frame-time histogram
(SURVEY.md §5: main.cpp:178-198, bvh.cpp:27-42).  Here: a lightweight
counter/timer registry with JSON-lines output, used by the CLI, bench
harness and viewer.
"""

from __future__ import annotations

import json
import sys
import time
from collections import defaultdict


class Metrics:
    def __init__(self, sink=None):
        self.counters = defaultdict(float)
        self.timings = defaultdict(list)
        self.sink = sink or sys.stderr

    def count(self, name: str, value: float = 1.0):
        self.counters[name] += value

    def time(self, name: str):
        return _Timer(self, name)

    def observe(self, name: str, seconds: float):
        self.timings[name].append(seconds)

    def snapshot(self) -> dict:
        out = dict(self.counters)
        for name, vals in self.timings.items():
            if not vals:
                continue
            out[f"{name}_ms_avg"] = 1e3 * sum(vals) / len(vals)
            out[f"{name}_ms_min"] = 1e3 * min(vals)
            out[f"{name}_ms_max"] = 1e3 * max(vals)
            out[f"{name}_count"] = len(vals)
        return out

    def emit(self, **extra):
        rec = {"ts": time.time(), **self.snapshot(), **extra}
        print(json.dumps(rec), file=self.sink, flush=True)
        return rec


class _Timer:
    def __init__(self, metrics: Metrics, name: str):
        self.metrics = metrics
        self.name = name

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.metrics.observe(self.name, time.perf_counter() - self.t0)


def render_stats(state, cfg) -> dict:
    """Wavefront-occupancy stats the reference never reported (SURVEY.md §5
    'Mrays/s counters derived from queue occupancy')."""
    import numpy as np
    acc = np.asarray(state.accum)
    return {
        "frame": int(state.frame),
        "carried_rays": int(state.n_carried),
        "carry_fraction": float(int(state.n_carried)) / cfg.num_rays,
        "paths_per_pixel_mean": float(acc[:, 3].mean()),
        "paths_per_pixel_min": float(acc[:, 3].min()),
    }
