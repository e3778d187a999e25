"""Breadth-first ray-streaming traversal ("level-stream" kernel).

Round-4 prototype of the structural mapping the round-3 roofline named
and scripts/stream_study.py costed (GO: projected 145-280 ms on the 2M
terrain carried mix vs the wave packet kernel's measured 396 ms): RAYS,
not nodes, stream from HBM.  Where the packet kernel pays a ~460-cycle
visit for the UNION of 1024 rays' node sets (incoherent bounce packets
union ~1638 visits where the mean ray needs ~28), this kernel never
tests a node against a ray whose own lineage did not reach it — it is
divergence-INSENSITIVE, the property the reference buys with atomic
work-stealing (kernel.cu:211-224, README "work stealing").

Design (constants and counts from scripts/stream_study.py on the real
cached 2M wavefronts):

  * The frontier is a flat queue of (ray record, fat-row id) PAIRS in
    HBM tiles of 128 ([tiles, 16 fields, 128 lanes]), processed
    level-synchronously in 1024-pair blocks, kept row-id-RUN-structured:
    every (source instance, child side) emits one contiguous
    constant-row run, keyed by a globally unique run id (2*instance +
    side) so the next level's span bisection has a prefix-monotone
    predicate even though raw row ids interleave across batches.
  * Each pair carries its full ray record (o, d, lineage t_best, ray
    id, row id = 9 of 16 f32 lanes) — ZERO gathers anywhere.
  * A block's rows span a narrow id range (run structure), so the
    block's slice of the fat-row TABLE arrives as ONE bulk DMA into a
    VMEM window — the table streams too, replacing the packet kernel's
    latency-bound per-visit row DMA; rows outside the window fall back
    to a per-instance DMA.
  * Per distinct row ("instance"): header scalar loads from DMA-landed
    buffers, lane-span masks from a dynamic-sublane binary search over
    a transposed row-id array, full-width slab tests with lineage-t
    pruning, leaf Möller-Trumbore gated by SCALAR tags only — there is
    NO vector->scalar reduce anywhere in the visit path (the any-reduce
    pair is ~55% of the packet kernel's 460-cycle visit,
    docs/PERFORMANCE.md quad probe).
  * Emission is vectorised per source sub-row: exclusive-prefix ranks
    via a strictly-lower-triangular ones-matmul (MXU), sub-row totals
    extracted through a VMEM->VMEM DMA round-trip (scalar loads from
    DMA-LANDED buffers are the proven-safe class; direct scalar loads
    of vector-written scratch fault at runtime — round-2 crash list),
    lanes placed into a sublane-major staging tile by the accum-kernel
    one-hot-matmul pattern at precision=HIGHEST (the MXU's default bf16
    truncation quantizes transported payloads), and full 128-pair tiles
    flushed through 2-slot deferred-wait DMA rings.

Measured status (docs/PERFORMANCE.md round-4 log): bit-exact vs the XLA
cascade ON CHIP and certified by the bench equivalence gate, but slower
than the packet kernels (3.48 s vs wave's 396 ms on the 2M terrain
carried mix) — the per-block floor is scalar-vector pipeline crossings
in the emission bookkeeping (probe: the one-hot/matmul/transpose work is
only ~5.5 of ~34 us), the round-5 redesign target.
  * Results leave through a HIT QUEUE: one record per block for every
    lane whose lineage t improved (ray, t, tri), min-combined per ray
    on the XLA side afterwards — breadth-first traversal has no
    per-ray output slot the kernel could scatter into.

Semantics match ops/traverse.py closest_hit (EPSILON accept rules,
det >= 1e-7 culling): lineage-local pruning visits a superset of the
ordered-DFS node set but accepts an identical hit set, so the combined
result is exact (equivalence-tested in interpret mode vs the XLA
cascade; sim cross-check in scripts/stream_study.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import EPSILON, VERY_FAR
from .traverse_kernel import (LEAF_WIDTH, _L_TAG, _R_TAG, _L_REF, _R_REF,
                              _L_TRI, _R_TRI, _mt_packet)

# queue-entry field lanes (16-lane tile slots; spares for future use)
F_OX, F_OY, F_OZ, F_DX, F_DY, F_DZ, F_T, F_RAY, F_ROW, F_RUN = range(10)
NFIELD = 16
BLOCK = 1024            # pairs per grid step (8 sub-rows x 128 lanes)
STAGE_ROWS = 256        # staging capacity: 127 residue + 128 batch max
ROW_WINDOW = 512        # bulk table window (256 KB VMEM)
H_RAY, H_T, H_ID = 0, 1, 2

# cnt_smem slots (3/4 hold the tiles-flushed counters for slots 0/1)
_C_FILL, _C_HFILL, _C_OVF, _C_RUN = 0, 1, 2, 5


def _level_kernel(np_ref, hbase_ref, rows_hbm, qin, rtin,
                  _qspare, _rtspare, _hqin,
                  qout, rtout, hq, nout_ref, hout_ref, ovf_ref,
                  qbuf, rbuf, rowwin, rowone, rowv8s, stage, hstage,
                  flushb, rtflushb, pfx, pfxdma, cnt_smem,
                  sem_q, sem_r, sem_row, sem_one, sem_cnt, sem_fq,
                  sem_fr, *, n_rows, cap_tiles, hcap_tiles, row_window):
    """One frontier level over a sequential block grid.  SMEM/VMEM
    scratch persists across grid steps and carries the output fills."""
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    n_pairs = np_ref[0]
    active = b * BLOCK < n_pairs

    @pl.when(b == 0)
    def _():
        cnt_smem[_C_FILL] = 0
        cnt_smem[_C_HFILL] = hbase_ref[0]
        cnt_smem[_C_OVF] = 0
        cnt_smem[_C_RUN] = 0
        stage[...] = jnp.zeros_like(stage)
        hstage[...] = jnp.zeros_like(hstage)

    def _wait_slot(slot_g, tile, q_hbm, with_rt):
        pltpu.make_async_copy(flushb.at[pl.ds(slot_g, 1)],
                              q_hbm.at[pl.ds(tile, 1)],
                              sem_fq.at[slot_g]).wait()
        if with_rt:
            pltpu.make_async_copy(rtflushb.at[pl.ds(slot_g, 1)],
                                  rtout.at[pl.ds(tile, 1)],
                                  sem_fr.at[slot_g]).wait()

    def flush_tiles(stage_ref, fill_slot, q_hbm, rt_hbm, cap, with_rt):
        """Flush one staged 128-pair tile if full (callers invoke up to
        twice per batch).  Staging holds absolute pairs
        [tiles_flushed*128, fill); a flush writes the first 128 and
        shifts.  Flush DMAs ride a 2-slot ring per queue: the wait is
        DEFERRED until the slot's buffer is next reused (the serialized
        start();wait() per tile was the prototype's dominant cost —
        ~8-12 exposed DMA latencies per block)."""
        fill = cnt_smem[fill_slot]
        tiles_done = cnt_smem[fill_slot + 3]

        @pl.when(fill - tiles_done * 128 >= 128)
        def _():
            @pl.when(tiles_done < cap)
            def _():
                k = cnt_smem[6 + fill_slot]     # DMAs issued on this ring
                slot_g = 2 * fill_slot + (k & 1)

                @pl.when(k >= 2)
                def _():
                    _wait_slot(slot_g, cnt_smem[8 + slot_g], q_hbm,
                               with_rt)
                flushb[slot_g] = stage_ref[pl.ds(0, 128), :].T
                pltpu.make_async_copy(
                    flushb.at[pl.ds(slot_g, 1)],
                    q_hbm.at[pl.ds(tiles_done, 1)],
                    sem_fq.at[slot_g]).start()
                if with_rt:
                    rtflushb[slot_g] = stage_ref[pl.ds(0, 128),
                                                 F_ROW:F_ROW + 2].T
                    pltpu.make_async_copy(
                        rtflushb.at[pl.ds(slot_g, 1)],
                        rt_hbm.at[pl.ds(tiles_done, 1)],
                        sem_fr.at[slot_g]).start()
                cnt_smem[8 + slot_g] = tiles_done
                cnt_smem[6 + fill_slot] = k + 1

            @pl.when(tiles_done >= cap)
            def _():
                cnt_smem[_C_OVF] = 1
            stage_ref[...] = jnp.concatenate(
                [stage_ref[pl.ds(128, STAGE_ROWS - 128), :],
                 jnp.zeros((128, NFIELD), jnp.float32)], axis=0)
            cnt_smem[fill_slot + 3] = tiles_done + 1

    def drain_ring(fill_slot, q_hbm, with_rt):
        """Wait the ring's (up to two) in-flight flush DMAs."""
        k = cnt_smem[6 + fill_slot]

        @pl.when(k >= 1)
        def _():
            s = 2 * fill_slot + ((k - 1) & 1)
            _wait_slot(s, cnt_smem[8 + s], q_hbm, with_rt)

        @pl.when(k >= 2)
        def _():
            s = 2 * fill_slot + (k & 1)
            _wait_slot(s, cnt_smem[8 + s], q_hbm, with_rt)

    @pl.when(b == 0)
    def _():
        cnt_smem[_C_FILL + 3] = 0   # pair tiles flushed this level
        cnt_smem[_C_HFILL + 3] = hbase_ref[0] // 128  # hit tiles flushed
        cnt_smem[6] = 0             # pair flush-ring DMA count
        cnt_smem[7] = 0             # hit flush-ring DMA count

    # ---- double-buffered block fetches (prefetch b+1 during b) ----
    cur = b & 1
    nxt = cur ^ 1

    def start_fetch(blk, slot):
        pltpu.make_async_copy(qin.at[pl.ds(blk * 8, 8)],
                              qbuf.at[slot],
                              sem_q.at[slot]).start()
        pltpu.make_async_copy(rtin.at[pl.ds(blk * 8, 8)],
                              rbuf.at[slot],
                              sem_r.at[slot]).start()

    def wait_q(blk, slot):
        pltpu.make_async_copy(qin.at[pl.ds(blk * 8, 8)],
                              qbuf.at[slot],
                              sem_q.at[slot]).wait()

    def wait_r(blk, slot):
        pltpu.make_async_copy(rtin.at[pl.ds(blk * 8, 8)],
                              rbuf.at[slot],
                              sem_r.at[slot]).wait()

    def rt_at_s(slot, p, f):
        # SMEM is scalar memory: arbitrary scalar indexing, no lane
        # constraints (the whole reason the side tiles land here)
        return rbuf[slot, p // 128, f, p % 128].astype(jnp.int32)

    def win_lo(slot):
        return jnp.clip(rt_at_s(slot, 0, 0), 0,
                        jnp.maximum(n_rows - row_window, 0))

    def start_win(slot):
        pltpu.make_async_copy(
            rows_hbm.at[pl.ds(win_lo(slot), row_window)],
            rowwin.at[slot], sem_row.at[slot]).start()

    def wait_win(slot):
        pltpu.make_async_copy(
            rows_hbm.at[pl.ds(win_lo(slot), row_window)],
            rowwin.at[slot], sem_row.at[slot]).wait()

    @pl.when(active & (b == 0))
    def _():
        # prelude: block 0 fetches its own inputs (no overlap available)
        start_fetch(0, 0)
        wait_r(0, 0)
        start_win(0)

    @pl.when(active)
    def _process():
        block_n = jnp.minimum(n_pairs - b * BLOCK, BLOCK)
        # kick b+1's queue/side fetch first so it flies during our work
        nxt_active = (b + 1) * BLOCK < n_pairs

        @pl.when(nxt_active)
        def _():
            start_fetch(b + 1, nxt)
        wait_q(b, cur)       # started by b-1's tail (b=0: the prelude)
        wait_win(cur)        # likewise

        def rt_at(p, f):
            return rt_at_s(cur, p, f)

        wlo = win_lo(cur)

        ox = qbuf[cur, :, F_OX, :]
        oy = qbuf[cur, :, F_OY, :]
        oz = qbuf[cur, :, F_OZ, :]
        dxv = qbuf[cur, :, F_DX, :]
        dyv = qbuf[cur, :, F_DY, :]
        dzv = qbuf[cur, :, F_DZ, :]
        tl_in = qbuf[cur, :, F_T, :]
        rayv = qbuf[cur, :, F_RAY, :]
        inv_x = 1.0 / dxv
        inv_y = 1.0 / dyv
        inv_z = 1.0 / dzv
        iota = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) * 128
                + jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1))
        lane_ok = iota < block_n

        def span_end(pos, cur_run, cur_row):
            """Smallest idx in (pos, block_n] whose (run, row) pair
            differs — a dynamic-SUBLANE binary search over the landed
            rbuf.  Emission stamps every batch with a globally fresh,
            strictly increasing run id, so the predicate "same (run,
            row)" is prefix-monotone even though row ids alone are only
            monotone WITHIN a run (a row can reappear in a later run
            when its parents span source blocks)."""
            def step(_, lohi):
                lo, hi = lohi
                mid = (lo + hi) // 2
                mc = jnp.clip(mid, 0, BLOCK - 1)
                # rt plane order: 0 = row id (F_ROW), 1 = run id (F_RUN)
                same = (rt_at(mc, 1) == cur_run) \
                    & (rt_at(mc, 0) == cur_row)
                return (jnp.where(same, mid + 1, lo),
                        jnp.where(same, hi, mid))
            lo, _ = jax.lax.fori_loop(0, 11, step, (pos + 1, block_n))
            return lo

        inst_base = cnt_smem[_C_RUN]

        def visit(carry):
            (pos, k, tlv, hitid, golv, gorv, rowlv, rowrv, instp) = carry
            pc = jnp.clip(pos, 0, BLOCK - 1)
            cur_run = rt_at(pc, 1)
            curow = jnp.clip(rt_at(pc, 0), 0, n_rows - 1)
            end = span_end(pos, cur_run, curow)
            mask = (iota >= pos) & (iota < end) & lane_ok

            in_win = (curow >= wlo) & (curow < wlo + row_window)

            @pl.when(jnp.logical_not(in_win))
            def _():
                c1 = pltpu.make_async_copy(rows_hbm.at[pl.ds(curow, 1)],
                                           rowone, sem_one)
                c1.start()
                c1.wait()

            # ONE dynamic-sublane VECTOR row load (packet-kernel rv()
            # pattern) — the per-LANE scalar rd() this replaces cost
            # ~125 serial scalar loads per leaf instance (~11 us/inst
            # measured at the deep levels, the kernel's dominant term).
            # Staged through a scratch ref: slicing a broadcast VALUE
            # lets XLA re-fold the chain into the unsupported
            # both-dims broadcast (round-1 Mosaic list) — the ref
            # boundary stops the fusion, exactly like the packet
            # kernel's row8s staging.
            row_v = jnp.where(
                in_win,
                rowwin[cur, pl.ds(jnp.clip(curow - wlo, 0,
                                           row_window - 1), 1), :],
                rowone[0:1, :])
            rowv8s[...] = jnp.broadcast_to(row_v, (8, 128))

            def rv(i):
                return rowv8s[:, i:i + 1]

            def rd(lane):
                # scalar header fields (4 per instance)
                return jnp.where(
                    in_win,
                    rowwin[cur, jnp.clip(curow - wlo, 0, row_window - 1),
                           lane],
                    rowone[0, lane])

            tag_l = rd(_L_TAG).astype(jnp.int32)
            tag_r = rd(_R_TAG).astype(jnp.int32)
            ref_l = rd(_L_REF).astype(jnp.int32)
            ref_r = rd(_R_REF).astype(jnp.int32)

            def slab(base):
                lox, loy, loz = rv(base), rv(base + 1), rv(base + 2)
                hix, hiy, hiz = rv(base + 3), rv(base + 4), rv(base + 5)
                n_x = jnp.where(dxv < 0, hix, lox)
                f_x = jnp.where(dxv < 0, lox, hix)
                n_y = jnp.where(dyv < 0, hiy, loy)
                f_y = jnp.where(dyv < 0, loy, hiy)
                n_z = jnp.where(dzv < 0, hiz, loz)
                f_z = jnp.where(dzv < 0, loz, hiz)
                tmin = jnp.maximum(
                    jnp.maximum((n_x - ox) * inv_x, (n_y - oy) * inv_y),
                    (n_z - oz) * inv_z)
                tmax = jnp.minimum(
                    jnp.minimum((f_x - ox) * inv_x, (f_y - oy) * inv_y),
                    (f_z - oz) * inv_z)
                return (tmin <= tmax) & (tmin < tlv) & (tmax > 0) & mask

            box_l = slab(0)
            box_r = slab(6)

            def leaf(tri_b, tag, ref, box, tlv, hitid):
                def run(tlv, hitid):
                    for j in range(LEAF_WIDTH):
                        bq = tri_b + 9 * j
                        t = _mt_packet(
                            ox, oy, oz, dxv, dyv, dzv,
                            rv(bq + 0), rv(bq + 1), rv(bq + 2),
                            rv(bq + 3), rv(bq + 4), rv(bq + 5),
                            rv(bq + 6), rv(bq + 7), rv(bq + 8))
                        ok = box & (j < tag) & (t > EPSILON) \
                            & ((tlv - t) > EPSILON)
                        tlv = jnp.where(ok, t, tlv)
                        hitid = jnp.where(ok, jnp.float32(ref + j), hitid)
                    return tlv, hitid
                # SCALAR gate: no vector->scalar reduce on the visit path
                return jax.lax.cond(tag > 0, run,
                                    lambda a, c: (a, c), tlv, hitid)

            tlv, hitid = leaf(_L_TRI, tag_l, ref_l, box_l, tlv, hitid)
            tlv, hitid = leaf(_R_TRI, tag_r, ref_r, box_r, tlv, hitid)

            go_l = box_l & (tag_l < 0)
            go_r = box_r & (tag_r < 0)
            # carried masks ride as f32 0/1: Mosaic cannot legalize i1
            # vectors through while-loop yields (round-2 crash list)
            golv = jnp.maximum(golv, go_l.astype(jnp.float32))
            gorv = jnp.maximum(gorv, go_r.astype(jnp.float32))
            rowlv = jnp.where(go_l, jnp.float32(ref_l), rowlv)
            rowrv = jnp.where(go_r, jnp.float32(ref_r), rowrv)
            # per-lane SOURCE-instance id: the emission run key.  One
            # instance's children per side are constant-row and land
            # contiguously across sub-row batches, so (2*inst + side) is
            # a globally-unique, never-recurring run id — the property
            # the next level's span bisection needs.
            instp = jnp.where(mask, jnp.float32(inst_base) + k, instp)
            return (end, k + 1, tlv, hitid, golv, gorv, rowlv, rowrv,
                    instp)

        init = (jnp.int32(0), jnp.float32(0), tl_in,
                jnp.full((8, 128), -1.0, jnp.float32),
                jnp.zeros((8, 128), jnp.float32),
                jnp.zeros((8, 128), jnp.float32),
                jnp.zeros((8, 128), jnp.float32),
                jnp.zeros((8, 128), jnp.float32),
                jnp.zeros((8, 128), jnp.float32))
        _, k_fin, tlv, hitid, go_lf, go_rf, row_l, row_r, instp = \
            jax.lax.while_loop(lambda c: c[0] < block_n, visit, init)
        cnt_smem[_C_RUN] = inst_base + k_fin.astype(jnp.int32)
        go_l = go_lf > 0.5
        go_r = go_rf > 0.5

        improved = ((tl_in - tlv) > 0.0) & lane_ok

        # ---- exclusive-prefix ranks per sub-row (MXU) + safe counts ----
        lt = (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
              < jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)) \
            .astype(jnp.float32)
        wl = go_l.astype(jnp.float32)
        wr = go_r.astype(jnp.float32)
        wh = improved.astype(jnp.float32)

        def pref(w):
            return jax.lax.dot_general(w, lt, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        pl_x, pr_x, ph_x = pref(wl), pref(wr), pref(wh)
        pfx[0:8, :] = pl_x + wl
        pfx[8:16, :] = pr_x + wr
        pfx[16:24, :] = ph_x + wh
        cc = pltpu.make_async_copy(pfx, pfxdma, sem_cnt)
        cc.start()
        cc.wait()
        counts = [pfxdma[r, 127].astype(jnp.int32) for r in range(24)]

        # ---- emission batches: L sub-rows, R sub-rows, hit sub-rows ----
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (STAGE_ROWS, 128), 0)

        def batch(r, m8, rank8, fields, stage_ref, fill_slot, q_hbm,
                  rt_hbm, cap, count, run8=None):
            with_rt = run8 is not None
            m = m8[r:r + 1, :]
            base = cnt_smem[fill_slot]
            win0 = cnt_smem[fill_slot + 3] * 128
            local = jnp.where(m, base - win0
                              + rank8[r:r + 1, :].astype(jnp.int32), -1)
            planes = [f[r:r + 1, :] for f in fields]
            if with_rt:
                planes.append(run8[r:r + 1, :])
            stack = jnp.concatenate(
                planes
                + [jnp.zeros((NFIELD - len(planes), 128), jnp.float32)],
                axis=0)
            onehot = (rows_i == local).astype(jnp.float32)
            # precision=HIGHEST: the MXU truncates f32 inputs to bf16 by
            # default, which QUANTIZES the transported payload (row ids
            # above 256 round — found on-chip).  With a 0/1 one-hot the
            # bf16x3 decomposition reconstructs each payload f32 exactly.
            stage_ref[...] = stage_ref[...] + jax.lax.dot_general(
                onehot, stack.T, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            cnt_smem[fill_slot] = base + count
            flush_tiles(stage_ref, fill_slot, q_hbm, rt_hbm, cap, with_rt)

        pair_fields_l = [ox, oy, oz, dxv, dyv, dzv, tlv, rayv, row_l]
        pair_fields_r = [ox, oy, oz, dxv, dyv, dzv, tlv, rayv, row_r]
        hit_fields = [rayv, tlv, hitid]
        run_l = instp * 2.0
        run_r = instp * 2.0 + 1.0
        # empty batches skip their onehot/matmul/transpose entirely (the
        # unconditional 16-batch chain was ~half of the measured ~25 us
        # per-block floor; deep levels have many empty sub-row batches)
        for r in range(8):
            @pl.when(counts[r] > 0)
            def _(r=r):
                batch(r, go_l, pl_x, pair_fields_l, stage, _C_FILL, qout,
                      rtout, cap_tiles, counts[r], run8=run_l)
        for r in range(8):
            @pl.when(counts[8 + r] > 0)
            def _(r=r):
                batch(r, go_r, pr_x, pair_fields_r, stage, _C_FILL, qout,
                      rtout, cap_tiles, counts[8 + r], run8=run_r)
        for r in range(8):
            @pl.when(counts[16 + r] > 0)
            def _(r=r):
                batch(r, improved, ph_x, hit_fields, hstage, _C_HFILL,
                      hq, None, hcap_tiles, counts[16 + r])

        # tail: b+1's side tiles have had the whole block to land; read
        # its first row id and launch its bulk row window now so it
        # flies during the grid turnover
        @pl.when(nxt_active)
        def _():
            wait_r(b + 1, nxt)
            start_win(nxt)

    # ---- level close: drain flush rings, flush residues, publish ----
    @pl.when(b == nb - 1)
    def _close():
        drain_ring(_C_FILL, qout, True)
        drain_ring(_C_HFILL, hq, False)
        # pair residue (tail lanes of the last tile are garbage; the next
        # level masks by the exact count)
        fillp = cnt_smem[_C_FILL]
        tilesp = cnt_smem[_C_FILL + 3]

        @pl.when((fillp - tilesp * 128 > 0) & (tilesp < cap_tiles))
        def _():
            flushb[0] = stage[pl.ds(0, 128), :].T
            c = pltpu.make_async_copy(flushb.at[pl.ds(0, 1)],
                                      qout.at[pl.ds(tilesp, 1)],
                                      sem_fq.at[0])
            c.start()
            c.wait()
            rtflushb[0] = stage[pl.ds(0, 128), F_ROW:F_ROW + 2].T
            c2 = pltpu.make_async_copy(
                rtflushb.at[pl.ds(0, 1)], rtout.at[pl.ds(tilesp, 1)],
                sem_fr.at[0])
            c2.start()
            c2.wait()

        # hit residue: pad to a 128 boundary with ray = -1 so stale slots
        # are ignored by the combine; hfill advances to the boundary
        fillh = cnt_smem[_C_HFILL]
        tilesh = cnt_smem[_C_HFILL + 3]

        @pl.when((fillh - tilesh * 128 > 0) & (tilesh < hcap_tiles))
        def _():
            # stale lanes (count..127) hold zeros from staging init —
            # rewrite their ray lane to -1 via the mask trick
            n_res = fillh - tilesh * 128
            lane_i = jax.lax.broadcasted_iota(jnp.int32,
                                              (STAGE_ROWS, 1), 0)
            rayc = hstage[:, H_RAY:H_RAY + 1]
            hstage[:, H_RAY:H_RAY + 1] = jnp.where(lane_i < n_res, rayc,
                                                   -1.0)
            flushb[0] = hstage[pl.ds(0, 128), :].T
            c = pltpu.make_async_copy(flushb.at[pl.ds(0, 1)],
                                      hq.at[pl.ds(tilesh, 1)],
                                      sem_fq.at[0])
            c.start()
            c.wait()

        nout_ref[0] = jnp.minimum(fillp, cap_tiles * 128)
        hout_ref[0] = jnp.minimum(
            jnp.where(fillh - tilesh * 128 > 0, (tilesh + 1) * 128, fillh),
            hcap_tiles * 128)
        ovf_ref[0] = cnt_smem[_C_OVF]


def _run_level(rows, q, rt, qspare, rtspare, hq, n_pairs, hbase,
               cap_tiles, hcap_tiles, interpret, grid=None):
    n_rows = rows.shape[0]
    row_window = min(ROW_WINDOW, n_rows)
    # ``grid`` < cap_tiles//8 compiles a SMALL-GRID variant for tail
    # levels: idle grid steps cost ~2-3 us each (measured — a 1-block
    # level burned 30-57 ms walking 16384 dead steps)
    grid = cap_tiles // 8 if grid is None else grid
    kern = functools.partial(_level_kernel, n_rows=n_rows,
                             cap_tiles=cap_tiles, hcap_tiles=hcap_tiles,
                             row_window=row_window)
    out_shape = [
        jax.ShapeDtypeStruct(q.shape, q.dtype),        # qout (<- qspare)
        jax.ShapeDtypeStruct(rt.shape, rt.dtype),      # rtout (<- rtspare)
        jax.ShapeDtypeStruct(hq.shape, hq.dtype),      # hq (aliased)
        jax.ShapeDtypeStruct((1,), jnp.int32),         # nout
        jax.ShapeDtypeStruct((1,), jnp.int32),         # hout
        jax.ShapeDtypeStruct((1,), jnp.int32),         # ovf
    ]
    any_spec = pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[smem_spec, smem_spec] + [any_spec] * 6,
        out_specs=[any_spec, any_spec, any_spec, smem_spec, smem_spec,
                   smem_spec],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, 8, NFIELD, 128), jnp.float32),  # qbuf (x2)
            pltpu.SMEM((2, 8, 2, 128), jnp.float32),     # rbuf (x2)
            pltpu.VMEM((2, row_window, 128), jnp.float32),  # rowwin (x2)
            pltpu.VMEM((1, 128), jnp.float32),           # rowone
            pltpu.VMEM((8, 128), jnp.float32),           # rowv8s
            pltpu.VMEM((STAGE_ROWS, NFIELD), jnp.float32),  # stage
            pltpu.VMEM((STAGE_ROWS, NFIELD), jnp.float32),  # hstage
            pltpu.VMEM((4, NFIELD, 128), jnp.float32),   # flushb (rings)
            pltpu.VMEM((2, 2, 128), jnp.float32),        # rtflushb
            pltpu.VMEM((24, 128), jnp.float32),          # pfx
            pltpu.VMEM((24, 128), jnp.float32),          # pfxdma
            pltpu.SMEM((12,), jnp.int32),                # cnt_smem
            pltpu.SemaphoreType.DMA((2,)),               # sem_q
            pltpu.SemaphoreType.DMA((2,)),               # sem_r
            pltpu.SemaphoreType.DMA((2,)),               # sem_row
            pltpu.SemaphoreType.DMA,                     # sem_one
            pltpu.SemaphoreType.DMA,                     # sem_cnt
            pltpu.SemaphoreType.DMA((4,)),               # sem_fq (rings)
            pltpu.SemaphoreType.DMA((2,)),               # sem_fr
        ],
        input_output_aliases={5: 0, 6: 1, 7: 2},
        interpret=interpret,
    )(jnp.asarray([n_pairs], jnp.int32).reshape(1),
      jnp.asarray([hbase], jnp.int32).reshape(1),
      rows, q, rt, qspare, rtspare, hq)


def closest_hit_stream(origin, direction, tables, t_init=None,
                       interpret: bool = False, cap_mult: int = 3,
                       return_overflow: bool = False):
    """Closest-hit via breadth-first ray streaming.  Same contract as
    closest_hit_packets: (t, tri_id) with tri_id = -1 where nothing beat
    ``t_init``.  ``tables``: PacketTables (same fat-row layout).

    ``cap_mult``: frontier capacity as a multiple of the ray count (the
    2M terrain mix peaks at ~2.05x; hit-heavy small batches can run
    higher).  On overflow the kernel DROPS pairs (bounded, never OOB)
    and sets a flag — pass ``return_overflow=True`` to receive it as a
    third output and treat non-zero as "results incomplete, re-run with
    a larger cap_mult"."""
    t, hit, ovf = _stream_impl(tables.rows, origin, direction, t_init,
                               interpret=interpret, cap_mult=cap_mult)
    if return_overflow:
        return t, hit, ovf
    return t, hit


@functools.partial(jax.jit, static_argnames=("interpret", "cap_mult"))
def _stream_impl(rows, origin, direction, t_init,
                 interpret: bool = False, cap_mult: int = 3):
    n = origin.shape[0]
    if t_init is None:
        t_init = jnp.full((n,), VERY_FAR, jnp.float32)
    pad = (-n) % 128
    npad = n + pad
    # pad rays: origin far outside every box along +x with t_init = 0 —
    # the slab test rejects them (tmax < 0) so they traverse nothing
    o = jnp.pad(origin, ((0, pad), (0, 0)), constant_values=1e18)
    d = jnp.pad(direction, ((0, pad), (0, 0)), constant_values=1.0)
    t0 = jnp.pad(t_init, (0, pad))

    cap_pairs = cap_mult * npad
    cap_tiles = pl.cdiv(cap_pairs, 128)
    cap_tiles = ((cap_tiles + 7) // 8) * 8
    hcap_tiles = ((pl.cdiv(cap_mult * npad, 128) + 7) // 8) * 8

    def tiles_of(*fields):
        planes = []
        for f in fields:
            planes.append(f.reshape(npad // 128, 128))
        z = jnp.zeros((npad // 128, 128), jnp.float32)
        planes += [z] * (NFIELD - len(fields))
        t = jnp.stack(planes, axis=1)  # [tiles, NFIELD, 128]
        padt = cap_tiles - t.shape[0]
        return jnp.concatenate(
            [t, jnp.zeros((padt, NFIELD, 128), jnp.float32)], axis=0)

    ray_id = jnp.arange(npad, dtype=jnp.float32)
    q0 = tiles_of(o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
                  t0, ray_id, jnp.zeros((npad,), jnp.float32))
    rt0 = jnp.zeros((cap_tiles, 2, 128), jnp.float32)
    qspare = jnp.zeros_like(q0)
    rtspare = jnp.zeros_like(rt0)
    hq0 = jnp.full((hcap_tiles, NFIELD, 128), -1.0, jnp.float32)

    max_levels = 64  # >> any real tree depth; bounds a runaway frontier

    def cond(c):
        return (c[6] > 0) & (c[8] < max_levels)

    small_grid = max(cap_tiles // 128, 8)

    def body(c):
        q, rt, qs, rts, hq, hbase, np_, ovf, lvl = c

        def big(args):
            return _run_level(rows, *args, cap_tiles, hcap_tiles,
                              interpret)

        def small(args):
            return _run_level(rows, *args, cap_tiles, hcap_tiles,
                              interpret, grid=small_grid)

        qo, rto, hqo, nout, hout, ovf1 = jax.lax.cond(
            np_ > small_grid * BLOCK, big, small,
            (q, rt, qs, rts, hq, np_, hbase))
        return (qo, rto, q, rt, hqo, hout[0], nout[0],
                ovf | ovf1[0], lvl + 1)

    init = (q0, rt0, qspare, rtspare, hq0, jnp.int32(0), jnp.int32(npad),
            jnp.int32(0), jnp.int32(0))
    _, _, _, _, hq, hfill, _, ovf, _ = jax.lax.while_loop(cond, body, init)
    del hfill

    # ---- per-ray min-combine of the hit records ----
    h_ray = hq[:, H_RAY, :].reshape(-1).astype(jnp.int32)
    h_t = hq[:, H_T, :].reshape(-1)
    h_id = hq[:, H_ID, :].reshape(-1).astype(jnp.int32)
    valid = h_ray >= 0
    idx = jnp.where(valid, h_ray, npad)
    t_best = jnp.concatenate([t0, jnp.asarray([VERY_FAR], jnp.float32)])
    t_best = t_best.at[idx].min(jnp.where(valid, h_t, VERY_FAR))
    # winning tri id: records matching the per-ray minimum
    is_min = valid & (h_t <= t_best[idx])
    ids = jnp.full((npad + 1,), 0x7FFFFFFF, jnp.int32)
    ids = ids.at[jnp.where(is_min, idx, npad)].min(
        jnp.where(is_min, h_id, 0x7FFFFFFF))
    hit_id = jnp.where(ids[:npad] == 0x7FFFFFFF, -1, ids[:npad])
    return t_best[:npad][:n], hit_id[:n], ovf
