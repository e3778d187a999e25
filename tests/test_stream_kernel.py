"""Level-stream (breadth-first ray-streaming) kernel vs the XLA cascade
oracle, interpret mode (round 4; VERDICT r3 item 2 'if go, a kernel')."""

import numpy as np
import pytest

import jax.numpy as jnp

from tyrant_tpu.ops.pallas.stream_kernel import closest_hit_stream
from tyrant_tpu.ops.pallas.traverse_kernel import PacketTables
from tyrant_tpu.ops.traverse import closest_hit


def _rays(sd, n, seed, hit_heavy=True):
    r = np.random.default_rng(seed)
    lo = np.asarray(sd.bvh.node_packed)[0, 0:3]
    hi = np.asarray(sd.bvh.node_packed)[0, 3:6]
    o = (lo + (hi - lo) * r.uniform(-0.2, 1.2, (n, 3))).astype(np.float32)
    d = r.normal(size=(n, 3)).astype(np.float32)
    if hit_heavy:
        half = n // 2
        tgt = lo + (hi - lo) * r.uniform(0.2, 0.8, (half, 3))
        d[half:] = (tgt - o[half:])[:n - half]
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _check(sd, o, d, t0=None, cap_mult=8):
    tables = PacketTables(sd.bvh)
    t_ref, id_ref = closest_hit(o, d, sd.bvh, t_init=t0)
    t_s, id_s = closest_hit_stream(o, d, tables, t_init=t0,
                                   interpret=True, cap_mult=cap_mult)
    # Tie-aware comparison, same rule as bench.check_equivalence: the
    # accept rule (t_best - t) > EPSILON is order-dependent for
    # near-equal hits, and breadth-first lineage order legitimately
    # differs from the DFS oracle — an id mismatch whose distances agree
    # within the accept epsilon is a tie, not an error (ADVICE r4).
    t_ref_np, t_s_np = np.asarray(t_ref), np.asarray(t_s)
    id_bad = (np.asarray(id_ref) != np.asarray(id_s)) \
        & (np.abs(t_ref_np - t_s_np) > 1e-3)
    assert not id_bad.any(), f"non-tie id mismatch on {id_bad.sum()}"
    hits = np.asarray(id_ref) >= 0
    if hits.any():
        np.testing.assert_allclose(t_ref_np[hits], t_s_np[hits],
                                   rtol=1e-4, atol=1e-3)
    return hits.mean()


def test_stream_terrain_random_rays():
    from tyrant_tpu.scene.procgen import terrain
    from tyrant_tpu.scene.scene import Scene
    v0, v1, v2 = terrain(n_quads=16, towers=2)
    sd = Scene.from_triangles(v0, v1, v2, builder="numpy").to_device()
    o, d = _rays(sd, 1024, 7, hit_heavy=False)
    _check(sd, o, d)


def test_stream_dragon_hit_heavy_with_t_init():
    from tyrant_tpu.scene.scene import Scene
    sd = Scene.load("/root/reference/PathTracer/Data/dragon.ply").to_device()
    n = 1000  # deliberately not a multiple of 128 (pad-lane path)
    o, d = _rays(sd, n, 11)
    r = np.random.default_rng(3)
    t0 = np.full(n, 1e20, np.float32)
    t0[::3] = r.uniform(5.0, 200.0, (n + 2) // 3).astype(np.float32)
    frac = _check(sd, o, d, t0=jnp.asarray(t0))
    assert frac > 0.15  # the workload actually exercises leaf accepts


def test_stream_all_miss():
    from tyrant_tpu.scene.procgen import terrain
    from tyrant_tpu.scene.scene import Scene
    v0, v1, v2 = terrain(n_quads=8, towers=1)
    sd = Scene.from_triangles(v0, v1, v2, builder="numpy").to_device()
    n = 256
    o = jnp.full((n, 3), 1e6, jnp.float32)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
    t_s, id_s = closest_hit_stream(o, d, PacketTables(sd.bvh),
                                   interpret=True)
    assert (np.asarray(id_s) == -1).all()


def test_stream_overflow_flag():
    """An undersized frontier capacity drops pairs BOUNDEDLY and reports
    it through the overflow flag instead of failing silently."""
    from tyrant_tpu.scene.scene import Scene
    sd = Scene.load("/root/reference/PathTracer/Data/dragon.ply").to_device()
    o, d = _rays(sd, 2048, 13)
    tables = PacketTables(sd.bvh)
    t_s, id_s, ovf = closest_hit_stream(o, d, tables, interpret=True,
                                        cap_mult=1, return_overflow=True)
    assert int(ovf) == 1
    assert np.isfinite(np.asarray(t_s)).all()
    # a sufficient capacity clears the flag and matches the oracle
    t2, id2, ovf2 = closest_hit_stream(o, d, tables, interpret=True,
                                       cap_mult=16, return_overflow=True)
    assert int(ovf2) == 0
    t_ref, id_ref = closest_hit(o, d, sd.bvh)
    id_bad = (np.asarray(id_ref) != np.asarray(id2)) \
        & (np.abs(np.asarray(t_ref) - np.asarray(t2)) > 1e-3)
    assert not id_bad.any()
    # the overflow-raising default path (ADVICE r4 medium): incomplete
    # results must never come back silently
    import pytest
    with pytest.raises(RuntimeError, match="frontier overflow"):
        closest_hit_stream(o, d, tables, interpret=True, cap_mult=1)


def test_stream_runid_capacity_bound():
    """cap_mult x rays beyond f32's exact-integer range must refuse up
    front (run ids would quantize and corrupt span keys — ADVICE r4)."""
    import jax.numpy as jnp
    import pytest

    from tyrant_tpu.ops.pallas.stream_kernel import _stream_impl

    n = 1 << 20
    o = jnp.zeros((n, 3), jnp.float32)
    d = jnp.ones((n, 3), jnp.float32)
    with pytest.raises(ValueError, match="exact integer range"):
        _stream_impl(jnp.zeros((8, 128), jnp.float32), o, d, None,
                     cap_mult=9)
