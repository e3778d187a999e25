"""Test config: force an 8-virtual-device CPU mesh before JAX backends
initialise.

This is the "mesh without a cluster" strategy from SURVEY.md §4 item 4: all
multi-chip sharding tests run against fake CPU devices; real-TPU execution is
covered by bench.py / __graft_entry__.py on the driver side.

The container's sitecustomize registers the axon TPU backend and pins
``jax_platforms="axon,cpu"`` via jax.config (overriding JAX_PLATFORMS), so we
must override through jax.config as well — before any backend is created.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")
# interpret-mode Pallas traces every packet body unrolled per grid step;
# shrinking the per-block packet counts cuts packet-kernel test time ~3-4x
# with identical coverage (the multi-packet loop still runs, >= 2 per block)
os.environ.setdefault("TYRANT_PPB", "2")
os.environ.setdefault("TYRANT_WAVE_PPB", "2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 8, jax.devices()
