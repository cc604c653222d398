"""Pallas TPU packet-traversal kernels over the unified record BVH.

The hot op of the whole framework: closest-hit and any-hit ray/BVH
traversal.  The XLA formulation in ``traverse.py`` (vmapped per-ray
while_loop) spends ~5 ms per lock-step iteration on a 65k-ray batch because
every tiny slice/sort/stack op is its own HBM-roundtrip HLO; here the whole
loop body lives in VMEM/SMEM inside ONE kernel.

Design (classic SIMD *packet tracing*, mapped to the TPU memory system —
replaces /root/reference/shapes/BVHAccelerator.h:62-121's per-ray recursion):

* A packet = 1024 rays shaped [8,128] (one VPU f32 tile); `grid = packets`.
* The packet shares ONE traversal stack, held in SMEM and driven by the
  scalar core — real dynamic indexing, no one-hot select chains.
* Each visit DMAs exactly one 512-byte node/leaf row HBM→VMEM, then tests
  its 8 child boxes (or 12 Shirley triangles, Triangle.h:97-162) against
  all 1024 rays on the VPU: per-visit cost is a few hundred VPU cycles
  instead of a 65k-wide HLO chain.
* Children are pushed far-to-near by the packet's min tnear (an 8-element
  scalar sorting network), so nearer subtrees are popped first and the
  per-ray best-t front culls the rest — same ordered-descent semantics as
  BVHAccelerator.h:62-77, but amortized across the packet.
* Rays padded to the packet grid carry t_min=+inf / t_max=-inf and can
  never hit anything.
* INTERLEAVE independent packets per grid step (default 2), each with its
  own stack and double-buffered row DMA: the pop→DMA→test chain of a single
  packet is SERIAL (the next row index is only known after the current
  visit), so its DMA latency is otherwise exposed; with two packets in
  flight, packet A's row fetch rides under packet B's VPU work and vice
  versa.  Results are identical to the single-packet form — packets never
  interact.

Numerics match ``traverse._visit_internal`` / ``_visit_leaf`` exactly (same
slab and Shirley arithmetic), so the Pallas and XLA paths agree to fp
reassociation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["packet_closest", "packet_anyhit", "PACKET"]

from ..scene.bvh import (LEAF_ROWS as R, LEAF_SIZE as K, RECORD_WIDTH as REC,
                         WIDTH as W)
from .traverse import batcher_pairs

SUB, LANES = 8, 128
PACKET = SUB * LANES            # rays per packet
MAX_STACK = 96                  # capacity; pack_records asserts the tree fits
                                # (depth*(W-1)+1 <= min(MAX_STACK, STACK_DEPTH))
INF = float("inf")
NEG_INF = float("-inf")

# Batcher odd-even mergesort network (19 compare-exchanges at W=8)
_SORTW = batcher_pairs(W)


def _row_dma(records, rows, sem, buf, ref):
    """Descriptor for the record-row DMA |ref|-1 → rows[buf*R : buf*R+R].

    R = LEAF_ROWS rows per fetch (512 B each): multi-row leaves need them
    all; internal visits then carry one junk trailing row — harmless (they
    read only the first 7W floats) and in-bounds (every leaf owns R rows
    and internal rows always precede them)."""
    row_idx = jnp.abs(ref).astype(jnp.int32) - 1
    return pltpu.make_async_copy(records.at[pl.ds(row_idx, R), :],
                                 rows.at[pl.ds(buf * R, R), :], sem.at[buf])


def _internal_visit(rows, buf, rep, rox, roy, roz, ivx, ivy, ivz,
                    tmn, limit):
    """Slab-test the 8 children against the packet (math/BBox.h:122-146).

    Returns (refs[8], keys[8]) scalars: child refs with packet-min-tnear
    keys, sorted descending (far first) so the LIFO stack pops near first;
    invalid children carry key=-inf.  All reductions collapse [8,128]→scalar.
    (``rep`` — a representative ray for approximate ordering — was measured
    slower than the exact min-reduction form and is unused.)
    """
    base = buf * R
    refs, keys = [], []
    for c in range(W):
        lox, loy, loz = (rows[base, c], rows[base, W + c],
                         rows[base, 2 * W + c])
        hix, hiy, hiz = (rows[base, 3 * W + c], rows[base, 4 * W + c],
                         rows[base, 5 * W + c])
        cref = rows[base, 6 * W + c]
        t0x = (lox - rox) * ivx
        t1x = (hix - rox) * ivx
        t0y = (loy - roy) * ivy
        t1y = (hiy - roy) * ivy
        t0z = (loz - roz) * ivz
        t1z = (hiz - roz) * ivz
        tnear = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                        jnp.minimum(t0y, t1y)),
                            jnp.maximum(jnp.minimum(t0z, t1z), tmn))
        tfar = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                       jnp.maximum(t0y, t1y)),
                           jnp.minimum(jnp.maximum(t0z, t1z), limit))
        hit = tnear <= tfar                       # [8,128]
        pnear = jnp.min(jnp.where(hit, tnear, INF))
        valid = (pnear < INF) & (cref != 0.0)
        keys.append(jnp.where(valid, pnear, NEG_INF))
        refs.append(cref)
    for a, b in _SORTW:
        swap = keys[a] < keys[b]
        keys[a], keys[b] = (jnp.where(swap, keys[b], keys[a]),
                            jnp.where(swap, keys[a], keys[b]))
        refs[a], refs[b] = (jnp.where(swap, refs[b], refs[a]),
                            jnp.where(swap, refs[a], refs[b]))
    return refs, keys


def _lr(rows, buf, j):
    """Flat scalar read at offset j of slot ``buf``'s R fetched rows
    (j is a Python constant → static SMEM address)."""
    return rows[buf * R + j // REC, j % REC]


def _leaf_meta(rows, buf):
    """Leaf row metadata: (base tri index i32, count i32).

    Triangle indices are base + lane (contiguous reordered range); the base
    is stored split into two small exact floats so scenes past 2^24
    triangles (lucy-class) index correctly — see scene/bvh.py."""
    base = (_lr(rows, buf, 9 * K + 1).astype(jnp.int32) << 12) \
        + _lr(rows, buf, 9 * K).astype(jnp.int32)
    count = _lr(rows, buf, 9 * K + 2).astype(jnp.int32)
    return base, count


def _leaf_tri(rows, buf, k, count, rdx, rdy, rdz, rox, roy, roz, tmn, limit):
    """Shirley test of leaf triangle k against the packet (Triangle.h:97-162).

    Returns (t, beta, gamma, hit [8,128])."""
    v0x, v0y, v0z = (_lr(rows, buf, k), _lr(rows, buf, K + k),
                     _lr(rows, buf, 2 * K + k))
    A, B, C = (_lr(rows, buf, 3 * K + k), _lr(rows, buf, 4 * K + k),
               _lr(rows, buf, 5 * K + k))
    D, E, F = (_lr(rows, buf, 6 * K + k), _lr(rows, buf, 7 * K + k),
               _lr(rows, buf, 8 * K + k))
    G, H, I = rdx, rdy, rdz
    J = v0x - rox
    Kk = v0y - roy
    L = v0z - roz
    EIHF = E * I - H * F
    GFDI = G * F - D * I
    DHEG = D * H - E * G
    denom = A * EIHF + B * GFDI + C * DHEG
    # one reciprocal + 3 multiplies instead of 3 VPU divides; matches
    # traverse.py's _visit_leaf so the Pallas and XLA paths stay bit-identical
    inv = 1.0 / jnp.where(denom == 0.0, 1.0, denom)
    beta = (J * EIHF + Kk * GFDI + L * DHEG) * inv
    AKJB = A * Kk - J * B
    JCAL = J * C - A * L
    BLKC = B * L - Kk * C
    gamma = (I * AKJB + H * JCAL + G * BLKC) * inv
    t = -(F * AKJB + E * JCAL + D * BLKC) * inv
    hit = ((denom != 0.0) & (k < count)
           & (beta > 0.0) & (beta < 1.0)
           & (gamma > 0.0) & (beta + gamma < 1.0)
           & (t >= tmn) & (t <= limit))
    return t, beta, gamma, hit


def _safe_inv(d):
    # IEEE: 1/0 = inf is fine for slab tests (matches traverse.py)
    return 1.0 / d


def _visit_closest(p, sp, buf, ref, rays, records, outs,
                   rows, stack, scl, nref_ref, sem):
    """One software-pipelined closest-hit visit for packet ``p``.

    The node row for the NEXT visit is always DMA'd while the current visit's
    VPU work runs: a leaf pops (and starts fetching) its successor BEFORE
    testing its 12 triangles; an internal node starts fetching its nearest
    hit child as soon as the box tests pick it, overlapping the stack writes
    and loop bookkeeping.  Semantics are identical to the unpipelined form —
    rows are only fetched earlier, never differently.  Writes the packet's
    next (sp, ref) into scl[p] / nref_ref[p].
    """
    rox, roy, roz, rdx, rdy, rdz, tmn, _, ivx, ivy, ivz = rays
    t_out, i_out, b_out, g_out = outs
    gbuf = 2 * p + buf
    ngbuf = 2 * p + (1 - buf)
    _row_dma(records, rows, sem, gbuf, ref).wait()
    is_leaf = ref < 0.0

    @pl.when(is_leaf)
    def _():
        # pop + prefetch FIRST so the DMA flies under the triangle math
        nref = jnp.where(sp > 0, stack[p, jnp.maximum(sp - 1, 0)], 0.0)
        scl[p] = sp - (sp > 0).astype(jnp.int32)
        nref_ref[p] = nref

        @pl.when(nref != 0.0)
        def _():
            _row_dma(records, rows, sem, ngbuf, nref).start()

        base, count = _leaf_meta(rows, gbuf)
        best_t, best_i = t_out[p], i_out[p]
        best_b, best_g = b_out[p], g_out[p]
        for k in range(K):
            t, beta, gamma, hit = _leaf_tri(
                rows, gbuf, k, count, rdx, rdy, rdz, rox, roy, roz,
                tmn, best_t)
            best_i = jnp.where(hit, base + k, best_i)
            best_b = jnp.where(hit, beta, best_b)
            best_g = jnp.where(hit, gamma, best_g)
            best_t = jnp.where(hit, t, best_t)
        t_out[p], i_out[p] = best_t, best_i
        b_out[p], g_out[p] = best_b, best_g

    @pl.when(jnp.logical_not(is_leaf))
    def _():
        limit = t_out[p]
        refs, keys = _internal_visit(rows, gbuf, None, rox, roy, roz,
                                     ivx, ivy, ivz, tmn, limit)
        n_push = jnp.zeros((), jnp.int32)
        for j in range(W):
            n_push = n_push + (keys[j] > NEG_INF).astype(jnp.int32)
        # nearest hit child (= last valid in the descending sort) is
        # visited next: fetch it now, push only the other n_push-1
        nref = jnp.float32(0.0)
        for j in range(W):
            nref = jnp.where(n_push == j + 1, refs[j], nref)
        no_push = n_push == 0
        nref = jnp.where(no_push & (sp > 0), stack[p, jnp.maximum(sp - 1, 0)],
                         nref)
        nref = jnp.where(no_push & (sp <= 0), 0.0, nref)

        @pl.when(nref != 0.0)
        def _():
            _row_dma(records, rows, sem, ngbuf, nref).start()

        for j in range(W - 1):     # refs[n_push-1] goes straight to nref
            stack[p, sp + j] = refs[j]
        scl[p] = jnp.where(no_push, sp - (sp > 0).astype(jnp.int32),
                           sp + n_push - 1)
        nref_ref[p] = nref


def _visit_anyhit(p, sp, buf, ref, rays, records, occ_out,
                  rows, stack, scl, nref_ref, sem):
    """One any-hit visit for packet ``p`` (see _visit_closest).

    Early exit when every lane is occluded: the prefetched row's DMA is
    drained (wait) before terminating so no semaphore signal leaks."""
    rox, roy, roz, rdx, rdy, rdz, tmn, tmx, ivx, ivy, ivz = rays
    gbuf = 2 * p + buf
    ngbuf = 2 * p + (1 - buf)
    _row_dma(records, rows, sem, gbuf, ref).wait()
    is_leaf = ref < 0.0
    # only unoccluded lanes keep driving traversal
    live_limit = jnp.where(occ_out[p] > 0.5, NEG_INF, tmx)

    @pl.when(is_leaf)
    def _():
        nref = jnp.where(sp > 0, stack[p, jnp.maximum(sp - 1, 0)], 0.0)
        scl[p] = sp - (sp > 0).astype(jnp.int32)

        @pl.when(nref != 0.0)
        def _():
            _row_dma(records, rows, sem, ngbuf, nref).start()

        _, count = _leaf_meta(rows, gbuf)
        occ = occ_out[p]
        for k in range(K):
            _, _, _, hit = _leaf_tri(rows, gbuf, k, count, rdx, rdy, rdz,
                                     rox, roy, roz, tmn, live_limit)
            occ = jnp.where(hit, 1.0, occ)
        occ_out[p] = occ

        done = jnp.all(occ > 0.5)

        @pl.when(done & (nref != 0.0))
        def _():
            _row_dma(records, rows, sem, ngbuf, nref).wait()

        nref_ref[p] = jnp.where(done, 0.0, nref)

    @pl.when(jnp.logical_not(is_leaf))
    def _():
        refs, keys = _internal_visit(rows, gbuf, None, rox, roy, roz,
                                     ivx, ivy, ivz, tmn, live_limit)
        n_push = jnp.zeros((), jnp.int32)
        for j in range(W):
            n_push = n_push + (keys[j] > NEG_INF).astype(jnp.int32)
        nref = jnp.float32(0.0)
        for j in range(W):
            nref = jnp.where(n_push == j + 1, refs[j], nref)
        no_push = n_push == 0
        nref = jnp.where(no_push & (sp > 0), stack[p, jnp.maximum(sp - 1, 0)],
                         nref)
        nref = jnp.where(no_push & (sp <= 0), 0.0, nref)

        @pl.when(nref != 0.0)
        def _():
            _row_dma(records, rows, sem, ngbuf, nref).start()

        for j in range(W - 1):
            stack[p, sp + j] = refs[j]
        scl[p] = jnp.where(no_push, sp - (sp > 0).astype(jnp.int32),
                           sp + n_push - 1)
        nref_ref[p] = nref


def _read_rays(in_refs, p):
    rox, roy, roz = in_refs[0][p], in_refs[1][p], in_refs[2][p]
    rdx, rdy, rdz = in_refs[3][p], in_refs[4][p], in_refs[5][p]
    tmn, tmx = in_refs[6][p], in_refs[7][p]
    return (rox, roy, roz, rdx, rdy, rdz, tmn, tmx,
            _safe_inv(rdx), _safe_inv(rdy), _safe_inv(rdz))


def _interleaved_loop(P, visit):
    """Drive P independent packet traversals in one while_loop: each
    iteration advances every live packet by TWO visits, so packet p's row
    DMA (started at the end of its visit) flies under the OTHER packets' VPU
    work.  State is (sp, ref) per packet; a packet with ref == 0 is done and
    skipped.

    The 2-visit unroll keeps the double-buffer index ``buf`` a PYTHON
    constant at every call site (visit 1 reads buffer 0, visit 2 buffer 1;
    a live packet always retires visits in pairs, so the parity never goes
    dynamic).  That makes every ``rows[gbuf, c]`` scalar read a
    static-address SMEM load — the scalar core pays a measurable premium
    for dynamically-based SMEM reads (PERF.md round-3: the per-octant
    ordering attempt died on exactly this) and the visit body does 56–108
    of them — and it halves the while-loop condition/state bookkeeping."""
    def cond(state):
        alive = state[1] != 0.0
        for p in range(1, P):
            alive = alive | (state[2 * p + 1] != 0.0)
        return alive

    def body(state, scl, nref_ref):
        sps = [state[2 * p] for p in range(P)]
        refs = [state[2 * p + 1] for p in range(P)]
        # visit order stays interleaved ACROSS packets (A1 B1 A2 B2): packet
        # p's end-of-visit DMA must fly under the other packets' VPU work,
        # not under its own semaphore wait
        for buf in (0, 1):
            for p in range(P):
                sp, ref = sps[p], refs[p]

                @pl.when(ref != 0.0)
                def _():
                    visit(p, sp, buf, ref)

                live = ref != 0.0
                sps[p] = jnp.where(live, scl[p], sp)
                refs[p] = jnp.where(live, nref_ref[p], ref)
        out = []
        for p in range(P):
            out.append(sps[p])
            out.append(refs[p])
        return tuple(out)

    return cond, body


def _make_closest_kernel(P):
    def kernel(rox_r, roy_r, roz_r, rdx_r, rdy_r, rdz_r, tmn_r, tmx_r,
               records, t_out, i_out, b_out, g_out,
               rows, stack, scl, nref_ref, sem):
        in_refs = (rox_r, roy_r, roz_r, rdx_r, rdy_r, rdz_r, tmn_r, tmx_r)
        rays = [_read_rays(in_refs, p) for p in range(P)]
        for p in range(P):
            t_out[p] = rays[p][7]      # best-t front, seeded with t_max
            i_out[p] = jnp.full((SUB, LANES), -1, jnp.int32)
            b_out[p] = jnp.zeros((SUB, LANES), jnp.float32)
            g_out[p] = jnp.zeros((SUB, LANES), jnp.float32)
            _row_dma(records, rows, sem, 2 * p, jnp.float32(1.0)).start()

        def visit(p, sp, buf, ref):
            _visit_closest(p, sp, buf, ref, rays[p], records,
                           (t_out, i_out, b_out, g_out),
                           rows, stack, scl, nref_ref, sem)

        cond, body = _interleaved_loop(P, visit)
        state0 = (jnp.zeros((), jnp.int32), jnp.float32(1.0)) * P
        jax.lax.while_loop(cond, lambda s: body(s, scl, nref_ref), state0)

    return kernel


def _make_anyhit_kernel(P):
    def kernel(rox_r, roy_r, roz_r, rdx_r, rdy_r, rdz_r, tmn_r, tmx_r,
               occ0_r, records, occ_out,
               rows, stack, scl, nref_ref, sem):
        in_refs = (rox_r, roy_r, roz_r, rdx_r, rdy_r, rdz_r, tmn_r, tmx_r)
        rays = [_read_rays(in_refs, p) for p in range(P)]
        for p in range(P):
            occ_out[p] = occ0_r[p]     # padded/missing lanes pre-occluded
            _row_dma(records, rows, sem, 2 * p, jnp.float32(1.0)).start()

        def visit(p, sp, buf, ref):
            _visit_anyhit(p, sp, buf, ref, rays[p], records, occ_out,
                          rows, stack, scl, nref_ref, sem)

        cond, body = _interleaved_loop(P, visit)
        state0 = (jnp.zeros((), jnp.int32), jnp.float32(1.0)) * P
        jax.lax.while_loop(cond, lambda s: body(s, scl, nref_ref), state0)

    return kernel


def _interleave() -> int:
    """Packets per grid step (default 2; SIMPLEPATH_INTERLEAVE overrides)."""
    import os
    return max(1, int(os.environ.get("SIMPLEPATH_INTERLEAVE", "2")))


def _to_packets(x: Array, n_pad: int, fill: float) -> Array:
    n = x.shape[0]
    x = jnp.pad(x, (0, n_pad - n), constant_values=fill)
    return x.reshape(n_pad // PACKET, SUB, LANES)


def _ray_specs(n_in: int, P: int):
    blk = pl.BlockSpec((P, SUB, LANES), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    return [blk] * n_in


def _scratch(P: int):
    return [
        pltpu.SMEM((2 * P * R, REC), jnp.float32),  # double-buffered rows/packet
        pltpu.SMEM((P, MAX_STACK), jnp.float32),    # one stack per packet
        pltpu.SMEM((P,), jnp.int32),                # next-sp scratch
        pltpu.SMEM((P,), jnp.float32),              # next-ref scratch
        pltpu.SemaphoreType.DMA((2 * P,)),          # one per row buffer
    ]


@functools.partial(jax.jit, static_argnames=("interpret",))
def packet_closest(records: Array, ro: Array, rd: Array, t_min: Array,
                   t_max: Array, *, interpret: bool = False):
    """Closest triangle hit for a flat ray batch via packet traversal.

    records: f32[M,128] unified BVH table; ro/rd: [N,3]; t_min/t_max: [N].
    Returns (t, tri_idx i32, beta, gamma, valid) each [N]; misses carry
    t=+inf, tri_idx=-1.
    """
    P = _interleave()
    n = ro.shape[0]
    n_pad = -(-n // (P * PACKET)) * (P * PACKET)
    ins = [_to_packets(ro[:, 0], n_pad, 0.0), _to_packets(ro[:, 1], n_pad, 0.0),
           _to_packets(ro[:, 2], n_pad, 0.0), _to_packets(rd[:, 0], n_pad, 1.0),
           _to_packets(rd[:, 1], n_pad, 1.0), _to_packets(rd[:, 2], n_pad, 1.0),
           _to_packets(t_min, n_pad, jnp.inf), _to_packets(t_max, n_pad, -jnp.inf)]
    grid = n_pad // (P * PACKET)
    shp = jax.ShapeDtypeStruct((grid * P, SUB, LANES), jnp.float32)
    shp_i = jax.ShapeDtypeStruct((grid * P, SUB, LANES), jnp.int32)
    out_blk = pl.BlockSpec((P, SUB, LANES), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    t, fi, b, g = pl.pallas_call(
        _make_closest_kernel(P),
        grid=(grid,),
        in_specs=_ray_specs(8, P) + [pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
        out_specs=[out_blk] * 4,
        out_shape=[shp, shp_i, shp, shp],
        scratch_shapes=_scratch(P),
        interpret=interpret,
    )(*ins, records)
    t = t.reshape(-1)[:n]
    fi = fi.reshape(-1)[:n]
    beta = b.reshape(-1)[:n]
    gamma = g.reshape(-1)[:n]
    valid = fi >= 0
    t = jnp.where(valid, t, jnp.inf)
    return t, fi, beta, gamma, valid


@functools.partial(jax.jit, static_argnames=("interpret",))
def packet_anyhit(records: Array, ro: Array, rd: Array, t_min: Array,
                  t_max: Array, *, interpret: bool = False) -> Array:
    """Any-hit (occlusion) against the triangle BVH.  Returns bool[N]."""
    P = _interleave()
    n = ro.shape[0]
    n_pad = -(-n // (P * PACKET)) * (P * PACKET)
    # lanes that can't hit anything start occluded so they never gate the
    # early-exit; the padding fill below also makes their boxes miss
    occ0 = jnp.zeros(n, jnp.float32)
    ins = [_to_packets(ro[:, 0], n_pad, 0.0), _to_packets(ro[:, 1], n_pad, 0.0),
           _to_packets(ro[:, 2], n_pad, 0.0), _to_packets(rd[:, 0], n_pad, 1.0),
           _to_packets(rd[:, 1], n_pad, 1.0), _to_packets(rd[:, 2], n_pad, 1.0),
           _to_packets(t_min, n_pad, jnp.inf), _to_packets(t_max, n_pad, -jnp.inf),
           _to_packets(occ0, n_pad, 1.0)]
    grid = n_pad // (P * PACKET)
    shp = jax.ShapeDtypeStruct((grid * P, SUB, LANES), jnp.float32)
    out_blk = pl.BlockSpec((P, SUB, LANES), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    occ = pl.pallas_call(
        _make_anyhit_kernel(P),
        grid=(grid,),
        in_specs=_ray_specs(9, P) + [pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
        out_specs=out_blk,
        out_shape=shp,
        scratch_shapes=_scratch(P),
        interpret=interpret,
    )(*ins, records)
    return occ.reshape(-1)[:n] > 0.5
