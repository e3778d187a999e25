"""Checkpoint / resume for progressive renders.

The reference has none (SURVEY.md §5): its "state" is the GPU-resident
blit_buffer + carried ray queue, lost on exit.  Here RenderState is an
explicit pytree, so checkpointing a long render is exact: save the
accumulation buffer, in-flight rays, RNG/frame counters and the camera/sun
pose; resume bit-for-bit.

Two backends: portable .npz (always available) and orbax (if installed) for
large multi-host states.
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax.numpy as jnp
import numpy as np

from .render import RenderState

_FIELDS = ["accum", "origin", "direction", "direct", "pending", "pixel",
           "bounces", "last_specular", "n_carried", "start_position",
           "frame", "shadow_rays", "moment2", "pixel_perm", "bsdf_pdf",
           "sample_base", "sample_idx"]
# fields added after round 1; absent from old checkpoints — default on load
_OPTIONAL = {"shadow_rays": np.asarray(0, np.uint32),
             "moment2": np.zeros((1, 4), np.float32),
             "pixel_perm": np.zeros((1,), np.int32),
             "bsdf_pdf": np.ones((1,), np.float32),
             "sample_base": np.asarray(0, np.uint32),
             "sample_idx": np.zeros((1,), np.uint32)}


def save_state(path: str, state: RenderState, metadata: dict | None = None):
    """Write state (+ JSON-serialisable metadata, e.g. camera pose / sun
    position / config) to a single .npz file."""
    arrays = {f: np.asarray(getattr(state, f)) for f in _FIELDS}
    arrays["__metadata__"] = np.frombuffer(
        json.dumps(metadata or {}).encode(), dtype=np.uint8)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **arrays)
    os.replace(tmp, path)  # atomic


def load_state(path: str):
    """Returns (RenderState, metadata dict)."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["__metadata__"]).decode() or "{}")
        state = RenderState(**{
            f: jnp.asarray(z[f] if f in z else _OPTIONAL[f])
            for f in _FIELDS})
    return state, meta


def save_orbax(path: str, state: RenderState):
    """Orbax backend (async-capable, multi-host) — optional."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path),
               {f: getattr(state, f) for f in _FIELDS}, force=True)
    ckptr.wait_until_finished()


def load_orbax(path: str) -> RenderState:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path))
    return RenderState(**{
        f: jnp.asarray(restored[f] if f in restored else _OPTIONAL[f])
        for f in _FIELDS})
