"""VPU-only cost of one internal / leaf visit body (no DMA, row resident).

Runs M visit bodies back-to-back inside ONE kernel on a resident SMEM row,
so the measurement is pure compute: per-visit VPU+scalar cost, the
reduction share (variant with the 8 cross-lane min-reductions replaced by
a representative lane), and the sort-network share (variant without the
scalar sort).  One dispatch per variant — immune to tunnel overhead.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from simplepath_tpu import load_scene
from simplepath_tpu.render import pallas_traverse as pt

SCENE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "scenes", "bunny_bench.sp")
SUB, LANES = pt.SUB, pt.LANES
W, K, INF, NEG_INF = pt.W, pt.K, pt.INF, pt.NEG_INF
_SORT8 = pt._SORTW

def make_kernel(mode, M):
    def kernel(seed_r, records, out, rows, sem):
        d0 = pt._row_dma(records, rows, sem, 0, seed_r[0, 0])
        d0.start(); d0.wait()                       # one row, resident
        d1 = pt._row_dma(records, rows, sem, 1, jnp.abs(seed_r[0, 0]) + 1.0)
        d1.start(); d1.wait()
        base = seed_r[0, 0]
        rox = jnp.full((SUB, LANES), 0.1) + base * 1e-6
        roy = jnp.full((SUB, LANES), 2.0); roz = jnp.full((SUB, LANES), 5.0)
        ivx = jnp.full((SUB, LANES), 3.0); ivy = jnp.full((SUB, LANES), -7.0)
        ivz = jnp.full((SUB, LANES), 2.0)
        rdx, rdy, rdz = 1.0/ivx, 1.0/ivy, 1.0/ivz
        tmn = jnp.full((SUB, LANES), 1e-3)

        def internal_body(i, carry):
            limit = carry
            if mode == "internal":
                refs, keys = pt._internal_visit(rows, 0, None, rox, roy, roz,
                                                ivx, ivy, ivz, tmn, limit)
                acc = keys[0]
                for j in range(1, W):
                    acc = jnp.minimum(acc, keys[j])
                return limit + acc * 0.0 + refs[0] * 0.0
            if mode == "internal_norel":
                # same box math, keys from a representative element (no
                # cross-lane reductions)
                acc = jnp.float32(0.0)
                for c in range(W):
                    lox, loy, loz = rows[0, c], rows[0, 8 + c], rows[0, 16 + c]
                    hix, hiy, hiz = rows[0, 24 + c], rows[0, 32 + c], rows[0, 40 + c]
                    t0x = (lox - rox) * ivx; t1x = (hix - rox) * ivx
                    t0y = (loy - roy) * ivy; t1y = (hiy - roy) * ivy
                    t0z = (loz - roz) * ivz; t1z = (hiz - roz) * ivz
                    tnear = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                                    jnp.minimum(t0y, t1y)),
                                        jnp.maximum(jnp.minimum(t0z, t1z), tmn))
                    tfar = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                                   jnp.maximum(t0y, t1y)),
                                       jnp.minimum(jnp.maximum(t0z, t1z), limit))
                    acc = acc + tnear[0, 0] * 0.0 + tfar[1, 1] * 0.0
                return limit + acc * 0.0
            if mode == "sort_only":
                keys = [rows[0, c] for c in range(W)]
                refs = [rows[0, 8 + c] for c in range(W)]
                for a, b in _SORT8:
                    swap = keys[a] < keys[b]
                    keys[a], keys[b] = (jnp.where(swap, keys[b], keys[a]),
                                        jnp.where(swap, keys[a], keys[b]))
                    refs[a], refs[b] = (jnp.where(swap, refs[b], refs[a]),
                                        jnp.where(swap, refs[a], refs[b]))
                return limit + keys[0] * 0.0 + refs[0] * 0.0
            raise ValueError(mode)

        def leaf_body(i, best_t):
            best = best_t
            for k in range(K):
                t, beta, gamma, hit = pt._leaf_tri(
                    rows, 1, k, jnp.int32(12), rdx, rdy, rdz,
                    rox, roy, roz, tmn, best)
                best = jnp.where(hit, t, best)
            return best

        if mode == "leaf":
            r = jax.lax.fori_loop(0, M, leaf_body, jnp.full((SUB, LANES), INF))
            out[0] = r
        elif mode in ("internal", "internal_norel"):
            r = jax.lax.fori_loop(0, M, internal_body, jnp.full((SUB, LANES), INF))
            out[0] = r
        else:
            r = jax.lax.fori_loop(0, M, internal_body, jnp.float32(INF))
            out[0] = jnp.full((SUB, LANES), r)
    return kernel

def run(mode, M, rec):
    f = jax.jit(lambda s: pl.pallas_call(
        make_kernel(mode, M),
        in_specs=[pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
        out_specs=pl.BlockSpec((1, SUB, LANES), lambda: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, SUB, LANES), jnp.float32),
        scratch_shapes=[pltpu.SMEM((2, pt.REC), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    )(s, rec))
    jax.block_until_ready(f(jnp.ones((1, 1), jnp.float32)))
    ts = []
    for i in range(5):
        s = jnp.full((1, 1), 1.0 + i, jnp.float32)
        t0 = time.perf_counter(); jax.block_until_ready(f(s))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    print(f"{mode:16s} M={M}: {med*1e3:8.2f} ms -> {med*1e9/M:7.1f} ns/visit")

if __name__ == "__main__":
    scene = load_scene(SCENE)
    rec = scene.bvh.records
    M = 100000
    for mode in ("internal", "internal_norel", "sort_only", "leaf"):
        run(mode, M, rec)
