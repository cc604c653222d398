"""Roofline instrumentation for the packet-traversal kernels.

Measures, on the bench scene (round-2 VERDICT task 2):
  (a) visits per packet (internal/leaf split) for primary and incoherent
      rays — via a counting variant of the closest-hit loop that reuses the
      production visit helpers;
  (b) the serial HBM->SMEM row-DMA latency — via a pure pointer-chase
      kernel (each DMA's row index comes from the previously fetched row,
      so nothing can overlap: this is the latency term of the roofline);
  (c) measured ns/visit from kernel wall time / total visits, at
      INTERLEAVE=1 and 2.

The roofline statement for PERF.md: a packet traversal is a SERIAL chain of
`visits` iterations, each costing max(VPU visit work, exposed DMA latency);
with P-way interleave the exposed latency shrinks toward
max(0, t_dma - (P-1) * t_vpu) / P-ish.  Lower bound on time/packet =
visits * t_vpu.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from simplepath_tpu import load_scene
from simplepath_tpu.render.camera import generate_ray
from simplepath_tpu.render import pallas_traverse as pt

from _prof_util import timeit

SCENE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "scenes", "bunny_bench.sp")
SUB, LANES, PACKET = pt.SUB, pt.LANES, pt.PACKET


def counting_closest(records, ro, rd, t_min, t_max):
    """P=1 closest-hit that also returns (internal, leaf) visit counts per
    packet.  Reuses the production _visit_closest helper verbatim."""

    def kernel(rox_r, roy_r, roz_r, rdx_r, rdy_r, rdz_r, tmn_r, tmx_r,
               records, t_out, i_out, b_out, g_out, ni_out, nl_out,
               rows, stack, scl, nref_ref, sem):
        in_refs = (rox_r, roy_r, roz_r, rdx_r, rdy_r, rdz_r, tmn_r, tmx_r)
        rays = pt._read_rays(in_refs, 0)
        t_out[0] = rays[7]
        i_out[0] = jnp.full((SUB, LANES), -1, jnp.int32)
        b_out[0] = jnp.zeros((SUB, LANES), jnp.float32)
        g_out[0] = jnp.zeros((SUB, LANES), jnp.float32)
        pt._row_dma(records, rows, sem, 0, jnp.float32(1.0)).start()

        def cond(s):
            return s[2] != 0.0

        def body(s):
            sp, buf, ref, ni, nl = s
            pt._visit_closest(0, sp, buf, ref, rays, records,
                              (t_out, i_out, b_out, g_out),
                              rows, stack, scl, nref_ref, sem)
            leaf = (ref < 0.0).astype(jnp.int32)
            return (scl[0], 1 - buf, nref_ref[0], ni + 1 - leaf, nl + leaf)

        st = jax.lax.while_loop(cond, body,
                                (jnp.zeros((), jnp.int32),
                                 jnp.zeros((), jnp.int32),
                                 jnp.float32(1.0),
                                 jnp.zeros((), jnp.int32),
                                 jnp.zeros((), jnp.int32)))
        ni_out[0] = jnp.full((SUB, LANES), st[3], jnp.int32)
        nl_out[0] = jnp.full((SUB, LANES), st[4], jnp.int32)

    n = ro.shape[0]
    n_pad = -(-n // PACKET) * PACKET
    ins = [pt._to_packets(ro[:, 0], n_pad, 0.0), pt._to_packets(ro[:, 1], n_pad, 0.0),
           pt._to_packets(ro[:, 2], n_pad, 0.0), pt._to_packets(rd[:, 0], n_pad, 1.0),
           pt._to_packets(rd[:, 1], n_pad, 1.0), pt._to_packets(rd[:, 2], n_pad, 1.0),
           pt._to_packets(t_min, n_pad, jnp.inf), pt._to_packets(t_max, n_pad, -jnp.inf)]
    grid = n_pad // PACKET
    shp = jax.ShapeDtypeStruct((grid, SUB, LANES), jnp.float32)
    shp_i = jax.ShapeDtypeStruct((grid, SUB, LANES), jnp.int32)
    blk = pl.BlockSpec((1, SUB, LANES), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=pt._ray_specs(8, 1) + [pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
        out_specs=[blk] * 6,
        out_shape=[shp, shp_i, shp, shp, shp_i, shp_i],
        scratch_shapes=pt._scratch(1),
    )(*ins, records)
    ni = outs[4][:, 0, 0]
    nl = outs[5][:, 0, 0]
    return np.asarray(ni), np.asarray(nl)


def dma_chase(records, n_hops: int):
    """Serial 512B-row DMA pointer chase: row r's slot 48 (first child ref)
    names the next row, so DMA i+1 cannot start before DMA i lands.  Wall
    time / n_hops = per-visit DMA latency floor (HBM->SMEM, 512 B)."""

    def kernel(records, out, rows, sem):
        pt._row_dma(records, rows, sem, 0, jnp.float32(1.0)).start()

        def body(i, ref):
            buf = jax.lax.rem(i, 2)
            pt._row_dma(records, rows, sem, buf, ref).wait()
            child = rows[buf * pt.R, 6 * pt.W]       # first child ref of an internal row
            nxt = jnp.where((child > 0.0), child, jnp.float32(1.0))

            nbuf = 1 - buf

            # start next serially AFTER current landed (pure chase)
            @pl.when(i + 1 < n_hops)
            def _():
                pt._row_dma(records, rows, sem, nbuf, nxt).start()

            return nxt

        last = jax.lax.fori_loop(0, n_hops, body, jnp.float32(1.0))
        out[0, 0] = last

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[pltpu.SMEM((2, pt.REC), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    )(records)


def main():
    N = int(os.environ.get("N", "65536"))
    scene = load_scene(SCENE)
    rec = scene.bvh.records
    print(f"tris={scene.static.num_triangles} rows={rec.shape}", file=sys.stderr)

    side = int(np.sqrt(N))
    ys, xs = jnp.meshgrid(jnp.arange(side), jnp.arange(side), indexing="ij")
    px = (xs.reshape(-1).astype(jnp.float32) + 0.5) * (1024 / side)
    py = (ys.reshape(-1).astype(jnp.float32) + 0.5) * (1024 / side)
    ro, rd = generate_ray(scene.camera, px, py)
    t_min = jnp.zeros(N) + 1e-3
    t_max = jnp.full((N,), jnp.inf)

    k = jax.random.PRNGKey(0)
    ro2 = jax.random.uniform(k, (N, 3), minval=-3, maxval=3)
    d2 = jax.random.normal(jax.random.PRNGKey(1), (N, 3))
    rd2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)

    count_only = os.environ.get("COUNT_ONLY") == "1"
    for label, (o, d) in (("primary", (ro, rd)), ("incoherent", (ro2, rd2))):
        ni, nl = counting_closest(rec, o, d, t_min, t_max)
        tot = ni + nl
        print(f"{label}: visits/packet mean={tot.mean():.0f} "
              f"(int {ni.mean():.0f} / leaf {nl.mean():.0f}) "
              f"max={tot.max()} visits/ray={tot.sum()/N:.2f}", flush=True)
        if count_only:
            continue

        f = jax.jit(lambda o, d, a, b: pt.packet_closest(rec, o, d, a, b))
        dt = timeit(f, o, d, t_min, t_max, vary=2, iters=5)
        P = pt._interleave()
        steps = int(np.ceil(tot.reshape(-1, P).max(axis=1).sum())) if P > 1 \
            else int(tot.sum())
        print(f"  closest P={P}: {dt*1e3:.2f} ms -> {dt*1e9/tot.sum():.0f} "
              f"ns/visit ({dt*1e9/steps:.0f} ns/interleaved-step)")

    if count_only:
        return
    # serial DMA latency floor
    HOPS = 20000
    f = jax.jit(lambda r: dma_chase(r, HOPS))
    out = f(rec)
    jax.block_until_ready(out)
    dt = timeit(f, rec, vary_fn=lambda i, a: (a[0] + (i * 0.0),), iters=5)
    print(f"DMA pointer-chase: {dt*1e6/HOPS*1000:.0f} ns/hop "
          f"({HOPS} serial 512B rows in {dt*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
