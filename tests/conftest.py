"""Test config: force an 8-virtual-device CPU mesh before JAX initialises.

This is the "mesh without a cluster" strategy from SURVEY.md §4 item 4: all
multi-chip sharding tests run against fake CPU devices; real-TPU execution is
covered by bench.py / __graft_entry__.py on the driver side.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
