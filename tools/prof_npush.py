#!/usr/bin/env python3
"""Histogram of valid-children counts (n_push) per internal visit.

The 19-CE scalar sorting network is 251 ns of the 380 ns internal visit
(PERF.md roofline); if a large fraction of internal visits have <= 1 valid
child, a sort-skipping fast path pays.  This counts that fraction on the
bench scene for primary and incoherent rays, reusing the production visit
helpers (same pattern as prof_visits.py).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from simplepath_tpu import load_scene
from simplepath_tpu.render.camera import generate_ray
from simplepath_tpu.render import pallas_traverse as pt

SCENE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "scenes", "bunny_bench.sp")
SUB, LANES, PACKET = pt.SUB, pt.LANES, pt.PACKET
NB = 4  # buckets: n_push == 0, 1, 2, >=3


def hist_closest(records, ro, rd, t_min, t_max):
    """P=1 closest-hit that returns per-packet n_push bucket counts."""

    def kernel(rox_r, roy_r, roz_r, rdx_r, rdy_r, rdz_r, tmn_r, tmx_r,
               records, t_out, i_out, b_out, g_out,
               h0_out, h1_out, h2_out, h3_out,
               rows, stack, scl, nref_ref, sem):
        in_refs = (rox_r, roy_r, roz_r, rdx_r, rdy_r, rdz_r, tmn_r, tmx_r)
        rays = pt._read_rays(in_refs, 0)
        rox, roy, roz, rdx, rdy, rdz, tmn, tmx, ivx, ivy, ivz = rays
        t_out[0] = rays[7]
        i_out[0] = jnp.full((SUB, LANES), -1, jnp.int32)
        b_out[0] = jnp.zeros((SUB, LANES), jnp.float32)
        g_out[0] = jnp.zeros((SUB, LANES), jnp.float32)
        pt._row_dma(records, rows, sem, 0, jnp.float32(1.0)).start()

        def cond(s):
            return s[2] != 0.0

        def body(s):
            sp, buf, ref, h0, h1, h2, h3 = s
            is_int = ref > 0.0
            # count valid children the same way _visit_closest will
            np_ = jnp.zeros((), jnp.int32)

            # peek: wait is done inside _visit_closest; replicate the key
            # computation AFTER the visit by re-reading the row buffer (the
            # visit leaves the row in place)
            pt._visit_closest(0, sp, buf, ref, rays, records,
                              (t_out, i_out, b_out, g_out),
                              rows, stack, scl, nref_ref, sem)
            limit = tmx  # conservative: use t_max (the visit used best-t);
            # recompute with the production helper for an exact count we
            # instead recompute keys with the CURRENT best-t AFTER the visit
            # -- close enough for a histogram?  No: use the exact same limit
            # the visit used is impossible post-hoc, so accept the visit's
            # updated best-t (undercounts slightly on leaf-adjacent nodes).
            refs, keys = pt._internal_visit(rows, buf, None, rox, roy, roz,
                                            ivx, ivy, ivz, tmn, t_out[0])
            for j in range(pt.W):
                np_ = np_ + (keys[j] > pt.NEG_INF).astype(jnp.int32)
            h0 = h0 + (is_int & (np_ == 0)).astype(jnp.int32)
            h1 = h1 + (is_int & (np_ == 1)).astype(jnp.int32)
            h2 = h2 + (is_int & (np_ == 2)).astype(jnp.int32)
            h3 = h3 + (is_int & (np_ >= 3)).astype(jnp.int32)
            return (scl[0], 1 - buf, nref_ref[0], h0, h1, h2, h3)

        z = jnp.zeros((), jnp.int32)
        st = jax.lax.while_loop(cond, body,
                                (z, z, jnp.float32(1.0), z, z, z, z))
        h0_out[0] = jnp.full((SUB, LANES), st[3], jnp.int32)
        h1_out[0] = jnp.full((SUB, LANES), st[4], jnp.int32)
        h2_out[0] = jnp.full((SUB, LANES), st[5], jnp.int32)
        h3_out[0] = jnp.full((SUB, LANES), st[6], jnp.int32)

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
        out_specs=[blk] * 4 + [pl.BlockSpec((1, SUB, LANES), lambda i: (i, 0, 0),
                                            memory_space=pltpu.VMEM)] * NB,
        out_shape=[shp, shp_i, shp, shp] + [shp_i] * NB,
        scratch_shapes=pt._scratch(1),
    )(*ins, records)
    return np.stack([np.asarray(outs[4 + b])[:, 0, 0] for b in range(NB)], axis=1)


def main():
    N = int(os.environ.get("N", "65536"))
    scene = load_scene(SCENE)
    rec = scene.bvh.records

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

    for label, (o, d) in (("primary", (ro, rd)), ("incoherent", (ro2, rd2))):
        h = hist_closest(rec, o, d, t_min, t_max).sum(axis=0)
        tot = h.sum()
        print(f"{label}: internal visits {tot}; n_push histogram "
              f"0: {h[0]/tot:.1%}  1: {h[1]/tot:.1%}  2: {h[2]/tot:.1%}  "
              f">=3: {h[3]/tot:.1%}")


if __name__ == "__main__":
    main()
