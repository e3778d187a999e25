"""Benchmark entry point for the driver.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N/BASELINE}

Config matches the reference's PERFORMANCE_TEST (performance_measure.cpp,
BASELINE.md): 1920x1080, 2,097,152-entry wavefront, MAX_BOUNCES=5, three
fixed camera poses.  Two scenes are measured:

  * the ~1M-triangle procgen terrain — the BASELINE.md target is defined at
    ~1M tris / 1080p, so this is the METRIC OF RECORD ("value");
  * the bundled dragon.ply (38k tris) — kept for round-over-round
    continuity ("dragon_mrays_per_s").

Before timing, an on-hardware EQUIVALENCE GATE compares the compiled Pallas
packet kernels (closest + any hit) against the XLA cascade oracle on random
rays; the result ships in the JSON ("equivalence") so every recorded BENCH
number also certifies kernel correctness on the chip (VERDICT r1 item 5 /
SURVEY §4 test-pyramid item 3).

Baseline: the reference's derived total-ray throughput ~100 Mrays/s
(80-120 incl. NEE shadow rays, BASELINE.md) on its unspecified GPU.
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_MRAYS = 100.0
DRAGON = "/root/reference/PathTracer/Data/dragon.ply"


def check_equivalence(scene, n_rays: int = 65_536) -> str:
    """Compiled packet kernel vs the XLA cascade, in BOTH table modes:
    "vmem" (fat rows resident) and "hbm" (rows in HBM behind a small forced
    VMEM treelet — the per-visit-DMA code path the 1M-tri metric-of-record
    scene actually compiles, previously certified only in interpret mode).
    Rays are half box-random (bounce-mix-shaped: incoherent origins AND
    directions) and half aimed into the mesh (hit-heavy, leaf-dominated —
    the regime where kernels historically diverged at runtime).  Ids must
    agree exactly; hit distances within Möller-Trumbore re-association
    tolerance.  The closest calls request the kernel-carried geometric
    normal (the production render-step configuration for default-material
    scenes) and verify it against the host tri_shade table.  Returns "ok"
    or per-mode mismatch descriptions."""
    import numpy as np

    import jax.numpy as jnp

    from tyrant_tpu.ops.pallas.traverse_kernel import (PacketTables,
                                                       any_hit_packets,
                                                       closest_hit_packets)
    from tyrant_tpu.ops.traverse import any_hit, closest_hit

    sd = scene.to_device()
    dev = sd.bvh
    tri_shade = np.asarray(sd.tri_shade)
    tables = PacketTables(dev)
    if not tables.supported:
        return "skipped (tables unsupported)"
    r = np.random.default_rng(2024)
    lo = np.asarray(dev.node_packed)[0, 0:3]
    hi = np.asarray(dev.node_packed)[0, 3:6]
    o = (lo + (hi - lo) * r.uniform(-0.2, 1.2, (n_rays, 3))).astype(np.float32)
    d = r.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    half = n_rays // 2
    tgt = (lo + (hi - lo) * r.uniform(0.2, 0.8, (half, 3)))
    d2 = (tgt - o[half:]).astype(np.float32)
    d[half:] = d2 / np.linalg.norm(d2, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)

    t_ref, id_ref = closest_hit(o, d, dev)
    t_ref, id_ref = np.asarray(t_ref), np.asarray(id_ref)
    hits = id_ref >= 0
    maxd = jnp.asarray(np.where(hits, t_ref * 0.999,
                                (hi - lo).max()).astype(np.float32))
    occ_ref = np.asarray(any_hit(o, d, maxd, dev))

    msgs = []
    for mode in ("vmem", "hbm", "vmem-wave", "hbm-wave"):
        wave = mode.endswith("-wave")
        if mode.startswith("hbm"):
            tables.fits = False  # force the HBM row path on this scene
            tr = 256  # tiny treelet: most visits exercise the DMA path
        else:
            tables.fits = True
            tr = None
        t_pk, id_pk, nrm = closest_hit_packets(o, d, tables, treelet_rows=tr,
                                               wave=wave, normals=True)
        t_pk, id_pk = np.asarray(t_pk), np.asarray(id_pk)
        if (id_ref != id_pk).any():
            n_bad = int((id_ref != id_pk).sum())
            msgs.append(f"{mode}:closest-id mismatch on {n_bad}/{n_rays}")
            continue
        if hits.any() and not np.allclose(t_ref[hits], t_pk[hits],
                                          rtol=1e-4):
            msgs.append(f"{mode}:closest-t mismatch")
            continue
        nk = np.asarray(nrm)[hits]
        nk /= np.maximum(np.linalg.norm(nk, axis=1, keepdims=True), 1e-30)
        if hits.any() and not np.allclose(
                nk, tri_shade[id_ref[hits], 0:3], atol=1e-5):
            msgs.append(f"{mode}:normal mismatch")
            continue
        occ_pk = np.asarray(any_hit_packets(o, d, maxd, tables,
                                            treelet_rows=tr, wave=wave))
        if (occ_ref != occ_pk).any():
            n_bad = int((occ_ref != occ_pk).sum())
            msgs.append(f"{mode}:anyhit mismatch on {n_bad}/{n_rays}")
            continue
        msgs.append(f"{mode}:ok")
    # round-4 prototype: the breadth-first ray-streaming kernel is
    # certified by the same gate (closest-hit only; its own hit-queue +
    # min-combine path) so the BENCH json also vouches for it on chip
    try:
        from tyrant_tpu.ops.pallas.stream_kernel import closest_hit_stream
        tables.fits = True
        t_st, id_st = closest_hit_stream(o, d, tables, cap_mult=8)
        t_st, id_st = np.asarray(t_st), np.asarray(id_st)
        # id disagreements whose hit distances agree within EPSILON are
        # legitimate TIES: the accept rule (t_best - t) > EPSILON is
        # order-dependent for near-equal hits, and breadth-first
        # lineage order differs from the packet kernel's DFS (measured:
        # 4/2M on the terrain, every one with |dt| <= 3e-5; the stream
        # side held the marginally CLOSER hit each time)
        id_bad = (id_ref != id_st) & (np.abs(t_ref - t_st) > 1e-3)
        if id_bad.any():
            msgs.append(f"stream:closest-id mismatch on "
                        f"{int(id_bad.sum())}/{n_rays}")
        elif hits.any() and not np.allclose(t_ref[hits], t_st[hits],
                                            rtol=1e-4, atol=1e-3):
            msgs.append("stream:closest-t mismatch")
        else:
            msgs.append("stream:ok")
    except Exception as e:  # prototype: report, don't block the bench
        msgs.append(f"stream:error {type(e).__name__}"[:60])
    out = ";".join(msgs)
    return "ok" if all(m.endswith(":ok") for m in msgs) else out


def bench_scene(scene, seconds_per_pose: float):
    from tyrant_tpu.bench import results_to_dict, run_benchmark
    from tyrant_tpu.config import RenderConfig

    # 1080p, 2M-ray wavefront, MAX_BOUNCES=5 — the reference harness's
    # exact configuration (variables.h:44, kernel.cu:16)
    cfg = RenderConfig(width=1920, height=1080, num_rays=2 * 1_048_576,
                       max_bounces=5, use_packet_kernel="on")
    # warmup_steps=4 matches steps_per_sample so the fused step chain
    # compiles exactly once (scan_fuse_bench: fused k=4 is ~1% faster)
    results = run_benchmark(scene, cfg, seconds_per_pose=seconds_per_pose,
                            warmup_steps=4)
    d = results_to_dict(results)
    for r in d["poses"]:
        flap = (f" [dropped {r['outliers_dropped']} flap samples,"
                f" {r['retries']} retries]"
                if r["outliers_dropped"] or r["retries"] else "")
        print(f"#   pose {r['pose']}: {r['avg_ms']:.2f} ms "
              f"({r['fps']:.1f} FPS) {r['total_mrays_per_s']:.1f} Mrays/s "
              f"spread {r['spread_pct']}%{flap}",
              file=sys.stderr)
    return d, cfg


def _load_dragon():
    import os

    from tyrant_tpu.scene.scene import Scene

    if os.path.exists(DRAGON):
        return Scene.load(DRAGON)
    from tyrant_tpu.scene.procgen import benchmark_scene
    v0, v1, v2 = benchmark_scene(65_536)
    return Scene.from_triangles(v0, v1, v2)


def run_equivalence_gate() -> str:
    """Run the gate in a SUBPROCESS: a hard native abort (axon-tunnel
    instability can SIGABRT the client without a Python traceback) then
    costs only the gate, never the timing numbers."""
    import subprocess

    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--equivalence-only"],
            capture_output=True, text=True, timeout=900)
        for line in reversed(out.stdout.splitlines()):
            if line.startswith("EQUIVALENCE::"):
                return line.split("::", 1)[1]
        return (f"error: gate subprocess exit {out.returncode}: "
                + out.stderr.strip().splitlines()[-1][:160]
                if out.stderr.strip() else
                f"error: gate subprocess exit {out.returncode}")
    except Exception as e:
        return f"error: {type(e).__name__}: {e}"[:200]


def _terrain_scene():
    from tyrant_tpu.scene.procgen import benchmark_scene
    from tyrant_tpu.scene.scene import Scene
    try:
        from tyrant_tpu.native import bvh_native  # noqa: F401  (probe)
        n_tris = 1_048_576
    except Exception:
        n_tris = 65_536
    v0, v1, v2 = benchmark_scene(n_tris)
    return Scene.from_triangles(v0, v1, v2)


def _wait_for_tpu(budget_s: float = 2400.0) -> None:
    """The tunneled TPU worker flaps after kernel faults / terminal
    restarts (outages of 15-60 min were common; round 5 observed a
    no-fault sustained-load outage past 70 min, hence the 40 min
    budget).  Probe in a subprocess (a probe against a dead worker
    HANGS rather than erroring) and give the worker a chance to come
    back before starting the timed run — proceeding into a dead tunnel
    hangs the first compile with no timeout at all."""
    import subprocess

    probe = ("import jax, jax.numpy as jnp; "
             "jnp.sum(jnp.ones((8,128))).block_until_ready()")
    deadline = time.time() + budget_s
    while True:
        try:
            r = subprocess.run([sys.executable, "-c", probe], timeout=45,
                               capture_output=True)
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.time() > deadline:
            print("# warning: TPU probe still failing; proceeding anyway",
                  file=sys.stderr)
            return
        print("# TPU worker unavailable; retrying...", file=sys.stderr)
        time.sleep(20)


def main():
    # phase flags (dev use; the driver runs the full bench):
    #   --scene dragon|terrain  bench one scene, print its dict as JSON
    _wait_for_tpu()
    if "--scene" in sys.argv:
        which = sys.argv[sys.argv.index("--scene") + 1]
        scene = _load_dragon() if which == "dragon" else _terrain_scene()
        print(f"# {which} scene: {scene.stats}", file=sys.stderr)
        d, cfg = bench_scene(scene, seconds_per_pose=6.0)
        print(json.dumps({"scene": which, **{k: v for k, v in d.items()
                                             if k != "poses"}}))
        return

    t0 = time.time()
    dragon = _load_dragon()

    print(f"# equivalence gate (compiled packet vs XLA cascade)...",
          file=sys.stderr)
    equivalence = run_equivalence_gate()
    if equivalence.startswith("error"):
        # one retry after a flap-probe: the gate's most common failure is
        # an axon worker outage mid-subprocess (a 900 s timeout), not a
        # real mismatch — don't let a flap stamp an error into the
        # recorded JSON if the worker comes back
        print(f"# equivalence errored ({equivalence[:80]}); waiting for "
              "the worker and retrying once", file=sys.stderr)
        _wait_for_tpu()
        equivalence = run_equivalence_gate()
    print(f"# equivalence: {equivalence}", file=sys.stderr)

    print(f"# dragon scene: {dragon.stats} ({time.time() - t0:.1f}s)",
          file=sys.stderr)
    dragon_tris = dragon.stats.get("triangles", 0)
    d_dragon, _ = bench_scene(dragon, seconds_per_pose=6.0)
    del dragon

    # metric of record: ~1M-triangle scene (BASELINE.md target definition).
    # Falls back to 64k tris (numpy builder) if the native builder is
    # unavailable — flagged in the detail block either way.
    _wait_for_tpu()   # probe worker health between scenes (VERDICT r3 #4)
    t0 = time.time()
    terrain = _terrain_scene()
    print(f"# terrain scene: {terrain.stats} ({time.time() - t0:.1f}s build)",
          file=sys.stderr)
    try:
        d_terr, cfg = bench_scene(terrain, seconds_per_pose=6.0)
        metric = "total_ray_throughput_1080p_1m_tri"
        tri_count = terrain.stats.get("triangles", 0)
    except Exception as e:  # fall back to the dragon number rather than die
        print(f"# terrain bench failed: {e}", file=sys.stderr)
        from tyrant_tpu.config import RenderConfig
        d_terr = d_dragon
        cfg = RenderConfig(num_rays=2 * 1_048_576)
        metric = "total_ray_throughput_1080p_bundled_mesh"
        tri_count = dragon_tris

    value = d_terr["total_mrays_per_s"]
    print(json.dumps({
        "metric": metric,
        "value": round(value, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(value / BASELINE_MRAYS, 3),
        "equivalence": equivalence,
        "detail": {
            "avg_frame_ms": round(d_terr["avg_frame_ms"], 2),
            "avg_fps": round(d_terr["avg_fps"], 2),
            "segments_per_s": round(d_terr["segments_per_s"] / 1e6, 2),
            "triangles": tri_count,
            "wavefront": cfg.num_rays,
            "dragon_mrays_per_s": round(d_dragon["total_mrays_per_s"], 2),
            "dragon_avg_frame_ms": round(d_dragon["avg_frame_ms"], 2),
            # what "dragon_mrays_per_s" actually measured: the reference
            # dragon.ply, or the 64k-tri procgen fallback when the
            # reference tree is absent (VERDICT r4 weak item 6)
            "dragon_source": ("dragon.ply" if os.path.exists(DRAGON)
                              else "procgen_fallback_65k"),
            "pose_ms": [round(r["avg_ms"], 1) for r in d_terr["poses"]],
            "pose_spread_pct": [r["spread_pct"] for r in d_terr["poses"]],
            "flap_samples_dropped": sum(r["outliers_dropped"]
                                        for r in d_terr["poses"]
                                        + d_dragon["poses"]),
        },
    }))


if __name__ == "__main__":
    if "--equivalence-only" in sys.argv:
        try:
            print("EQUIVALENCE::" + check_equivalence(_load_dragon()))
        except Exception as e:
            print("EQUIVALENCE::" + f"error: {type(e).__name__}: {e}"[:200])
    else:
        main()
