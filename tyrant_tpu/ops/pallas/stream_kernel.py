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
  * Emission (round-5 redesign) is fully VECTOR-domain: destinations
    for the whole block come from exclusive-prefix chains (triangular
    ones-matmul lane prefixes + a Hillis-Steele sublane scan), staged
    into a circular field-major (NFIELD, 512) buffer addressed mod 512
    whose four 128-lane flush slots are STATIC slices (tiles & 3
    unrolled), placed by one-hot matmuls at precision=HIGHEST (the
    MXU's default bf16 truncation quantizes transported payloads) and
    flushed through a 4-slot deferred-wait DMA ring.  Per block, the
    scalar operands entering vector compute shrink to the three
    staging bases (L/R/hit; the R base folds in the tot_l counts-DMA
    scalar, so it is two scalar reads but one broadcast) — was ~24
    crossings; the per-block counts arrive through ONE VMEM->VMEM DMA
    round-trip
    (scalar loads from DMA-LANDED buffers are the proven-safe class;
    direct scalar loads of vector-written scratch fault at runtime —
    round-2 crash list).

Measured status (docs/PERFORMANCE.md round-5 log): bit-exact vs the XLA
cascade and the packet kernels ON CHIP (modulo 4 known epsilon-ties at
2M) and certified by the bench equivalence gate.  The round-5 emission
redesign took the per-block floor from ~26 to ~15 us as costed, but the
2M terrain mix only moved 3.48 -> 3.40 s: the cost lives in per-INSTANCE
serial work at the deep levels, whose run-fragmented instance count is
structural to the mapping — the closing decomposition (PERFORMANCE.md)
shows every remaining lever composed still loses to the wave packet
kernel by >= 5x, so the mapping is CLOSED and the packet kernels remain
the production traversal on this hardware generation.
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
STAGE_P = 512           # circular staging lanes (4 x 128-pair tile slots)
ROW_WINDOW = 512        # bulk table window (256 KB VMEM)
H_RAY, H_T, H_ID = 0, 1, 2

# cnt_smem slots (round-5 layout; see _level_kernel init)
(_C_FILLP, _C_TILESP, _C_KRP, _C_OVF, _C_RUN,
 _C_FILLH, _C_TILESH, _C_KRH) = range(8)
_C_RTP = 8     # ..11: HBM tile index per in-flight pair flush slot (ring 4)
_C_RTH = 12    # ..13: HBM tile index per in-flight hit flush slot (ring 2)


def _level_kernel(np_ref, hbase_ref, rows_hbm, qin, rtin,
                  _qspare, _rtspare, _hqin,
                  qout, rtout, hq, nout_ref, hout_ref, ovf_ref,
                  qbuf, rbuf, rowwin, rowone, rowv8s, stage, hstage,
                  flushb, rtflushb, pfx, pfxdma, cnt_smem,
                  sem_q, sem_r, sem_row, sem_one, sem_cnt, sem_fq,
                  sem_fr, *, n_rows, cap_tiles, hcap_tiles, row_window):
    """One frontier level over a sequential block grid.  SMEM/VMEM
    scratch persists across grid steps and carries the output fills.

    Round-5 emission design (the round-4 batch-machinery probe pinned
    ~28 of the ~34 us/block floor on per-batch scalar->vector pipeline
    crossings — SMEM fill reads feeding each batch's vector ``local``):
    destinations are now computed ONCE per block as full-block vector
    prefix chains (triangular-matmul lane prefixes + a Hillis-Steele
    sublane scan), staged into a small CIRCULAR field-major buffer
    (NFIELD, 512) addressed mod 512 — so per batch only a scalar-read
    gate and pure-SMEM flush bookkeeping remain; the scalar->vector
    crossings drop to three per block (the L/R/hit staging bases)."""
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    n_pairs = np_ref[0]
    active = b * BLOCK < n_pairs

    @pl.when(b == 0)
    def _():
        cnt_smem[_C_FILLP] = 0
        cnt_smem[_C_TILESP] = 0
        cnt_smem[_C_KRP] = 0
        cnt_smem[_C_OVF] = 0
        cnt_smem[_C_RUN] = 0
        cnt_smem[_C_FILLH] = hbase_ref[0]
        cnt_smem[_C_TILESH] = hbase_ref[0] // 128
        cnt_smem[_C_KRH] = 0
        stage[...] = jnp.zeros_like(stage)
        hstage[...] = jnp.zeros_like(hstage)

    def _wait_pair_slot(slot):
        t = cnt_smem[_C_RTP + slot]
        pltpu.make_async_copy(flushb.at[pl.ds(slot, 1)],
                              qout.at[pl.ds(t, 1)],
                              sem_fq.at[slot]).wait()
        pltpu.make_async_copy(rtflushb.at[pl.ds(slot, 1)],
                              rtout.at[pl.ds(t, 1)],
                              sem_fr.at[slot]).wait()

    def _wait_hit_slot(h):  # h in {0, 1} -> flushb slots 4/5
        t = cnt_smem[_C_RTH + h]
        pltpu.make_async_copy(flushb.at[pl.ds(4 + h, 1)],
                              hq.at[pl.ds(t, 1)],
                              sem_fq.at[4 + h]).wait()

    def flush_pair():
        """Flush the oldest staged pair tile if one is complete (each
        batch adds <= 128 pairs, so at most one).  The circular staging
        makes the flush PURE scalar bookkeeping + a (16,128) lane-slice
        copy from a STATIC slot (4-way unrolled on tiles&3) — no vector
        shift, no scalar->vector crossing.  Flush DMAs ride a 4-slot
        ring with deferred waits."""
        fill = cnt_smem[_C_FILLP]
        tiles = cnt_smem[_C_TILESP]

        @pl.when(fill - tiles * 128 >= 128)
        def _():
            @pl.when(tiles < cap_tiles)
            def _():
                k = cnt_smem[_C_KRP]
                slot = k & 3

                @pl.when(k >= 4)
                def _():
                    _wait_pair_slot(slot)
                for s in range(4):
                    @pl.when((tiles & 3) == s)
                    def _(s=s):
                        flushb[slot] = stage[:, s * 128:(s + 1) * 128]
                        rtflushb[slot] = stage[F_ROW:F_RUN + 1,
                                               s * 128:(s + 1) * 128]
                        stage[:, s * 128:(s + 1) * 128] = jnp.zeros(
                            (NFIELD, 128), jnp.float32)
                pltpu.make_async_copy(flushb.at[pl.ds(slot, 1)],
                                      qout.at[pl.ds(tiles, 1)],
                                      sem_fq.at[slot]).start()
                pltpu.make_async_copy(rtflushb.at[pl.ds(slot, 1)],
                                      rtout.at[pl.ds(tiles, 1)],
                                      sem_fr.at[slot]).start()
                cnt_smem[_C_RTP + slot] = tiles
                cnt_smem[_C_KRP] = k + 1

            @pl.when(tiles >= cap_tiles)
            def _():
                # overflow: the tile is dropped, but the staging slot
                # must still be zeroed — placements accumulate (+=), so
                # a stale slot would corrupt any future policy that
                # resumes flushing (invariant: staged lanes are zero
                # before write)
                cnt_smem[_C_OVF] = 1
                for s in range(4):
                    @pl.when((tiles & 3) == s)
                    def _(s=s):
                        stage[:, s * 128:(s + 1) * 128] = jnp.zeros(
                            (NFIELD, 128), jnp.float32)
            cnt_smem[_C_TILESP] = tiles + 1

    def flush_hit():
        fill = cnt_smem[_C_FILLH]
        tiles = cnt_smem[_C_TILESH]

        @pl.when(fill - tiles * 128 >= 128)
        def _():
            @pl.when(tiles < hcap_tiles)
            def _():
                k = cnt_smem[_C_KRH]
                h = k & 1

                @pl.when(k >= 2)
                def _():
                    _wait_hit_slot(h)
                for s in range(4):
                    @pl.when((tiles & 3) == s)
                    def _(s=s):
                        flushb[4 + h] = hstage[:, s * 128:(s + 1) * 128]
                        hstage[:, s * 128:(s + 1) * 128] = jnp.zeros(
                            (NFIELD, 128), jnp.float32)
                pltpu.make_async_copy(flushb.at[pl.ds(4 + h, 1)],
                                      hq.at[pl.ds(tiles, 1)],
                                      sem_fq.at[4 + h]).start()
                cnt_smem[_C_RTH + h] = tiles
                cnt_smem[_C_KRH] = k + 1

            @pl.when(tiles >= hcap_tiles)
            def _():
                cnt_smem[_C_OVF] = 1
                for s in range(4):
                    @pl.when((tiles & 3) == s)
                    def _(s=s):
                        hstage[:, s * 128:(s + 1) * 128] = jnp.zeros(
                            (NFIELD, 128), jnp.float32)
            cnt_smem[_C_TILESH] = tiles + 1

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

        # ---- full-block emission destinations, all in the VECTOR domain
        # (round-5 redesign; see kernel docstring).  Exclusive prefix of
        # each emission mask over the WHOLE 1024-lane block: a
        # strictly-lower-triangular ones-matmul gives within-sub-row
        # lane prefixes (exact: 0/1 operands, f32 accumulate), and a
        # 3-step Hillis-Steele scan over sublane row-totals (static
        # concats, no tiny matmuls) adds the cross-sub-row offsets.
        lt = (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
              < jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)) \
            .astype(jnp.float32)
        wl = go_l.astype(jnp.float32)
        wr = go_r.astype(jnp.float32)
        wh = improved.astype(jnp.float32)

        def excl_prefix(w):
            px = jax.lax.dot_general(w, lt, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            incl = px + w
            rt_b = jnp.broadcast_to(incl[:, 127:128], (8, 128))
            v = rt_b
            for sh in (1, 2, 4):
                v = v + jnp.concatenate(
                    [jnp.zeros((sh, 128), jnp.float32), v[:-sh]], axis=0)
            cross = jnp.concatenate(
                [jnp.zeros((1, 128), jnp.float32), v[:-1]], axis=0)
            # (full-block exclusive prefix, per-sub-row inclusive
            #  prefixes for the scalar batch counts, total broadcast)
            return px + cross, incl, v[7:8, :]

        e_l, incl_l, tot_l = excl_prefix(wl)
        e_r, incl_r, _ = excl_prefix(wr)
        e_h, incl_h, _ = excl_prefix(wh)
        pfx[0:8, :] = incl_l
        pfx[8:16, :] = incl_r
        pfx[16:24, :] = incl_h
        pfx[24:25, :] = tot_l
        cc = pltpu.make_async_copy(pfx, pfxdma, sem_cnt)
        cc.start()
        cc.wait()
        counts = [pfxdma[r, 127].astype(jnp.int32) for r in range(24)]
        tot_l_s = pfxdma[24, 127]          # f32 scalar (landed buffer)

        # staging destinations mod STAGE_P, one scalar crossing per
        # queue: base = fill % 512 (exact f32 arithmetic: all values
        # < 2^23).  Non-emitting lanes get -1 (matches no staging lane).
        def wrap(v):
            return v - float(STAGE_P) * jnp.floor(v * (1.0 / STAGE_P))

        base_p = (cnt_smem[_C_FILLP] & (STAGE_P - 1)).astype(jnp.float32)
        base_h = (cnt_smem[_C_FILLH] & (STAGE_P - 1)).astype(jnp.float32)
        local_l = jnp.where(go_l, wrap(base_p + e_l), -1.0)
        local_r = jnp.where(go_r, wrap(base_p + tot_l_s + e_r), -1.0)
        local_h = jnp.where(improved, wrap(base_h + e_h), -1.0)
        # ONE transpose per queue -> (128, 8): batch r's destination
        # column is then a static lane slice (no per-batch transposes)
        lt_l = local_l.T
        lt_r = local_r.T
        lt_h = local_h.T

        # ---- emission batches: L sub-rows, R sub-rows, hit sub-rows.
        # Placement into the FIELD-MAJOR staging (NFIELD, 512): 32 KB
        # read-modify-write per batch (the old row-major staging paid 4x
        # that in lane padding), one-hot built from a (128,1) lane
        # broadcast.  No scalar enters any vector computation here.
        # (Mosaic iota must be integer-typed; convert for the f32 compare)
        cols_i = jax.lax.broadcasted_iota(
            jnp.int32, (128, STAGE_P), 1).astype(jnp.float32)

        def batch(r, lt_q, fields, stage_ref, run8=None):
            planes = [f[r:r + 1, :] for f in fields]
            if run8 is not None:
                planes.append(run8[r:r + 1, :])
            stack = jnp.concatenate(
                planes
                + [jnp.zeros((NFIELD - len(planes), 128), jnp.float32)],
                axis=0)
            onehot = (cols_i == lt_q[:, r:r + 1]).astype(jnp.float32)
            # precision=HIGHEST: the MXU truncates f32 inputs to bf16 by
            # default, which QUANTIZES the transported payload (row ids
            # above 256 round — found on-chip).  With a 0/1 one-hot the
            # bf16x3 decomposition reconstructs each payload f32 exactly.
            stage_ref[...] = stage_ref[...] + jax.lax.dot_general(
                stack, onehot, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

        pair_fields_l = [ox, oy, oz, dxv, dyv, dzv, tlv, rayv, row_l]
        pair_fields_r = [ox, oy, oz, dxv, dyv, dzv, tlv, rayv, row_r]
        hit_fields = [rayv, tlv, hitid]
        run_l = instp * 2.0
        run_r = instp * 2.0 + 1.0
        # empty batches skip their onehot/matmul entirely; non-empty
        # ones do placement + a pure-scalar fill/flush update
        for r in range(8):
            @pl.when(counts[r] > 0)
            def _(r=r):
                batch(r, lt_l, pair_fields_l, stage, run8=run_l)
                cnt_smem[_C_FILLP] = cnt_smem[_C_FILLP] + counts[r]
                flush_pair()
        for r in range(8):
            @pl.when(counts[8 + r] > 0)
            def _(r=r):
                batch(r, lt_r, pair_fields_r, stage, run8=run_r)
                cnt_smem[_C_FILLP] = cnt_smem[_C_FILLP] + counts[8 + r]
                flush_pair()
        for r in range(8):
            @pl.when(counts[16 + r] > 0)
            def _(r=r):
                batch(r, lt_h, hit_fields, hstage)
                cnt_smem[_C_FILLH] = cnt_smem[_C_FILLH] + counts[16 + r]
                flush_hit()

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
        # drain: slots are assigned in order 0,1,2,... so with k DMAs
        # issued, slots 0..min(k,ring)-1 each have exactly one
        # outstanding transfer (older ones on the same slot were waited
        # at reuse time)
        kp = cnt_smem[_C_KRP]
        for s in range(4):
            @pl.when(kp > s)
            def _(s=s):
                _wait_pair_slot(s)
        kh = cnt_smem[_C_KRH]
        for s in range(2):
            @pl.when(kh > s)
            def _(s=s):
                _wait_hit_slot(s)

        # pair residue (tail lanes of the last tile are garbage; the next
        # level masks by the exact count)
        fillp = cnt_smem[_C_FILLP]
        tilesp = cnt_smem[_C_TILESP]

        @pl.when((fillp - tilesp * 128 > 0) & (tilesp < cap_tiles))
        def _():
            for s in range(4):
                @pl.when((tilesp & 3) == s)
                def _(s=s):
                    flushb[0] = stage[:, s * 128:(s + 1) * 128]
                    rtflushb[0] = stage[F_ROW:F_RUN + 1,
                                        s * 128:(s + 1) * 128]
            c = pltpu.make_async_copy(flushb.at[pl.ds(0, 1)],
                                      qout.at[pl.ds(tilesp, 1)],
                                      sem_fq.at[0])
            c.start()
            c.wait()
            c2 = pltpu.make_async_copy(
                rtflushb.at[pl.ds(0, 1)], rtout.at[pl.ds(tilesp, 1)],
                sem_fr.at[0])
            c2.start()
            c2.wait()

        # hit residue: pad to a 128 boundary with ray = -1 so stale slots
        # are ignored by the combine; hfill advances to the boundary
        fillh = cnt_smem[_C_FILLH]
        tilesh = cnt_smem[_C_TILESH]

        @pl.when((fillh - tilesh * 128 > 0) & (tilesh < hcap_tiles))
        def _():
            # stale lanes (count..127) hold zeros from staging init —
            # rewrite their ray lane to -1 via the mask trick
            n_res = fillh - tilesh * 128
            lane_i = jax.lax.broadcasted_iota(
                jnp.int32, (1, 128), 1).astype(jnp.float32)
            for s in range(4):
                @pl.when((tilesh & 3) == s)
                def _(s=s):
                    rayc = hstage[H_RAY:H_RAY + 1,
                                  s * 128:(s + 1) * 128]
                    hstage[H_RAY:H_RAY + 1, s * 128:(s + 1) * 128] = \
                        jnp.where(lane_i < n_res.astype(jnp.float32),
                                  rayc, -1.0)
                    flushb[4] = hstage[:, s * 128:(s + 1) * 128]
            c = pltpu.make_async_copy(flushb.at[pl.ds(4, 1)],
                                      hq.at[pl.ds(tilesh, 1)],
                                      sem_fq.at[4])
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
            pltpu.VMEM((NFIELD, STAGE_P), jnp.float32),  # stage (circular)
            pltpu.VMEM((NFIELD, STAGE_P), jnp.float32),  # hstage
            pltpu.VMEM((6, NFIELD, 128), jnp.float32),   # flushb (rings)
            pltpu.VMEM((4, 2, 128), jnp.float32),        # rtflushb
            pltpu.VMEM((32, 128), jnp.float32),          # pfx
            pltpu.VMEM((32, 128), jnp.float32),          # pfxdma
            pltpu.SMEM((16,), jnp.int32),                # cnt_smem
            pltpu.SemaphoreType.DMA((2,)),               # sem_q
            pltpu.SemaphoreType.DMA((2,)),               # sem_r
            pltpu.SemaphoreType.DMA((2,)),               # sem_row
            pltpu.SemaphoreType.DMA,                     # sem_one
            pltpu.SemaphoreType.DMA,                     # sem_cnt
            pltpu.SemaphoreType.DMA((6,)),               # sem_fq (rings)
            pltpu.SemaphoreType.DMA((4,)),               # sem_fr
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
    and sets a flag.  Pass ``return_overflow=True`` to receive the flag
    as a third output and handle it yourself; otherwise the wrapper
    checks it HOST-SIDE (one sync) and raises — incomplete closest-hit
    results can never be returned silently (ADVICE r4)."""
    t, hit, ovf = _stream_impl(tables.rows, origin, direction, t_init,
                               interpret=interpret, cap_mult=cap_mult)
    if return_overflow:
        return t, hit, ovf
    if isinstance(ovf, jax.core.Tracer):
        raise TypeError(
            "closest_hit_stream is being traced (jit/vmap): pass "
            "return_overflow=True and handle the overflow flag in the "
            "traced program — the implicit host-side overflow check "
            "cannot run under tracing.")
    if int(ovf) != 0:
        raise RuntimeError(
            f"stream-kernel frontier overflow at cap_mult={cap_mult}: "
            "pairs were dropped and the closest-hit results are "
            "incomplete.  Re-run with a larger cap_mult (the 2M terrain "
            "carried mix peaks ~2.05x; hit-heavy batches can exceed 3x) "
            "or pass return_overflow=True to handle the flag yourself.")
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
    # Run ids (2*instance + side) ride f32 queue lanes; integers are
    # exact only below 2^24.  Per-level instance ids are bounded by the
    # pairs processed that level (<= cap_pairs), so cap the capacity
    # rather than silently quantize span keys (ADVICE r4).
    if 2 * cap_pairs + 1 >= (1 << 24):
        raise ValueError(
            f"cap_mult={cap_mult} x {npad} rays = {cap_pairs} frontier "
            "pairs: run ids (2*instance+side) would exceed f32's exact "
            "integer range (2^24).  Reduce cap_mult or the batch size "
            f"(bound: cap_mult*rays < {(1 << 23)}).")
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
