"""Wavefront state-machine invariants: carry, compaction, determinism,
accumulation reset (reference semantics: kernel.cu:227-244, 599-611,
702-718)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tyrant_tpu.camera import Camera
from tyrant_tpu.config import small_config
from tyrant_tpu.render import Renderer, init_state, render_step, reset_accumulation
from tyrant_tpu.scene.scene import Scene
from tyrant_tpu import sky as skymod

CFG = small_config(width=16, height=16, num_rays=1 << 10)
SUN = skymod.sun_direction_from_position(jnp.asarray([0.05, 0.3]))


def _setup():
    scene = Scene.load(None).to_device()
    cam = Camera()
    cam.position = np.array([0.0, -170.0, 40.0], np.float32)
    cam.vertical_angle = -0.10
    return scene, cam.to_device(CFG)


def test_determinism_bitwise():
    scene, cam = _setup()
    outs = []
    for _ in range(2):
        st = init_state(CFG)
        for _ in range(5):
            st = render_step(st, scene, cam, SUN, cfg=CFG)
        outs.append(np.asarray(st.accum))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_carry_and_start_position():
    scene, cam = _setup()
    st = init_state(CFG)
    total = CFG.width * CFG.height
    prev_start = 0
    for i in range(6):
        st2 = render_step(st, scene, cam, SUN, cfg=CFG)
        generated = CFG.num_rays - int(st.n_carried)
        assert int(st2.start_position) == (prev_start + generated) % total
        prev_start = int(st2.start_position)
        # carried count bounded and plausible
        assert 0 <= int(st2.n_carried) <= CFG.num_rays
        st = st2
    # after several steps some paths carry over (bounces > 0 exist)
    assert int(st.n_carried) > 0
    # carried slots are the compacted survivors at the TAIL (the front is
    # refilled by raygen): bounces of carried > 0
    b = np.asarray(st.bounces)[-int(st.n_carried):]
    assert (b > 0).all()
    # pixel indices in range
    assert np.asarray(st.pixel).min() >= 0
    assert np.asarray(st.pixel).max() < total


def test_alpha_monotonic_and_conserved():
    scene, cam = _setup()
    st = init_state(CFG)
    prev_alpha = 0.0
    terminated_sum = 0.0
    for i in range(5):
        st_next = render_step(st, scene, cam, SUN, cfg=CFG)
        a = float(np.asarray(st_next.accum)[:, 3].sum())
        assert a >= prev_alpha
        # terminated paths this step = N - carried_next
        terminated_sum += CFG.num_rays - int(st_next.n_carried)
        assert abs(a - terminated_sum) < 1e-3
        prev_alpha = a
        st = st_next


def test_reset_accumulation():
    scene, cam = _setup()
    st = init_state(CFG)
    st = render_step(st, scene, cam, SUN, cfg=CFG)
    st2 = reset_accumulation(st)
    assert float(np.asarray(st2.accum).sum()) == 0.0
    assert int(st2.n_carried) == 0
    assert int(st2.frame) == int(st.frame)  # frame counter survives


def test_renderer_resets_on_camera_move():
    scene = Scene.load(None)
    r = Renderer(scene, CFG, donate=False)
    cam = Camera()
    r.step(cam, 2)
    alpha_before = float(np.asarray(r.state.accum)[:, 3].sum())
    assert alpha_before > 0
    cam.position = cam.position + np.array([1.0, 0, 0], np.float32)
    r.step(cam, 1)
    # accumulation restarted: alpha equals exactly one step's terminations
    a = float(np.asarray(r.state.accum)[:, 3].sum())
    assert a <= CFG.num_rays


def test_renderer_resets_on_sun_move():
    scene = Scene.load(None)
    r = Renderer(scene, CFG, donate=False)
    cam = Camera()
    r.step(cam, 2)
    r.set_sun((0.10, 0.3))
    assert float(np.asarray(r.state.accum).sum()) == 0.0


def test_jit_once_per_shape():
    scene, cam = _setup()
    step = jax.jit(lambda s: render_step(s, scene, cam, SUN, cfg=CFG))
    st = init_state(CFG)
    st = step(st)
    n0 = step._cache_size() if hasattr(step, "_cache_size") else None
    st = step(st)
    if n0 is not None:
        assert step._cache_size() == n0


def test_fused_chain_matches_loop():
    """Renderer with fuse_step_chains='on' (one lax.scan jit per k) must
    match the per-step dispatch loop on every RenderState leaf."""
    scene = Scene.load(None)
    cfg = dataclasses.replace(CFG, fuse_step_chains="on")
    cam = Camera()
    cam.position = np.array([0.0, -170.0, 40.0], np.float32)
    cam.vertical_angle = -0.10

    r_loop = Renderer(scene, CFG, donate=False)
    assert not r_loop._fuse  # auto stays off on CPU
    r_fuse = Renderer(scene, cfg, donate=False)
    assert r_fuse._fuse
    # 6 = one canonical 4-chain + 2 single-step dispatches (step counts
    # decompose so a session compiles at most two programs; CLAUDE.md)
    r_loop.step(cam, 6)
    r_fuse.step(cam, 6)
    assert 4 in r_fuse._chain_cache and len(r_fuse._chain_cache) == 1
    for leaf_a, leaf_b in zip(jax.tree.leaves(r_loop.state),
                              jax.tree.leaves(r_fuse.state)):
        np.testing.assert_allclose(np.asarray(leaf_a), np.asarray(leaf_b),
                                   rtol=1e-6, atol=1e-6)
    # exact invariants regardless of float assoc differences
    assert int(r_loop.state.n_carried) == int(r_fuse.state.n_carried)
    assert int(r_loop.state.frame) == int(r_fuse.state.frame)


def test_radiance_clamp():
    """radiance_clamp=0 keeps exact semantics; a small clamp bounds every
    per-bounce contribution and lowers (or keeps) total radiance."""
    scene, cam = _setup()
    cfg_off = CFG
    cfg_on = dataclasses.replace(CFG, radiance_clamp=0.05)
    st_off = init_state(cfg_off)
    st_on = init_state(cfg_on)
    for _ in range(3):
        st_off = render_step(st_off, scene, cam, SUN, cfg=cfg_off)
        st_on = render_step(st_on, scene, cam, SUN, cfg=cfg_on)
    a_off = np.asarray(st_off.accum)
    a_on = np.asarray(st_on.accum)
    # identical path counts (clamp changes radiance, not control flow)
    np.testing.assert_array_equal(a_off[:, 3], a_on[:, 3])
    assert a_on[:, 0:3].sum() <= a_off[:, 0:3].sum() + 1e-4
    assert a_on[:, 0:3].sum() > 0


def test_run_seed_decorrelates():
    """cfg.seed=0 is bitwise the default program; non-zero seeds give
    statistically independent renders converging to the same mean."""
    scene = Scene.load(None)
    cam = Camera()
    cam.position = np.array([0.0, -170.0, 40.0], np.float32)
    cam.vertical_angle = -0.10

    def rend(seed, steps=60):
        cfg = dataclasses.replace(CFG, seed=seed)
        r = Renderer(scene, cfg, donate=False)
        r.step(cam, steps)
        acc = np.asarray(r.state.accum)
        return acc[:, :3] / np.maximum(acc[:, 3:4], 1e-9)

    a0 = rend(0, steps=4)
    r_def = Renderer(scene, CFG, donate=False)
    r_def.step(cam, 4)
    accd = np.asarray(r_def.state.accum)
    np.testing.assert_array_equal(
        a0, accd[:, :3] / np.maximum(accd[:, 3:4], 1e-9))

    i1, i2 = rend(1), rend(2)
    assert np.abs(i1 - i2).max() > 1e-6  # different streams
    # same integrand: means agree within MC tolerance
    m1, m2 = i1.mean(), i2.mean()
    assert abs(m1 - m2) / max(m1, 1e-9) < 0.03
