"""How many concurrent serial DMA chains does the HBM->SMEM path sustain?

C independent pointer chases interleaved in one kernel: if time(C chains,
H hops each) ~= time(1 chain, H hops), concurrency is free and deeper
packet interleave pays; if it grows ~linearly, the DMA engine serializes.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from simplepath_tpu import load_scene
from simplepath_tpu.render import pallas_traverse as pt
from _prof_util import timeit

SCENE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "scenes", "bunny_bench.sp")

def chase(records, n_hops, C):
    def kernel(records, out, rows, sem):
        for c in range(C):
            pt._row_dma(records, rows, sem, 2 * c, jnp.float32(1.0 + c)).start()

        def body(i, refs):
            new = []
            for c in range(C):
                buf = 2 * c + jax.lax.rem(i, 2)
                nbuf = 2 * c + (1 - jax.lax.rem(i, 2))
                pt._row_dma(records, rows, sem, buf, refs[c]).wait()
                child = rows[buf * pt.R, 6 * pt.W]
                nxt = jnp.where(child > 0.0, child, jnp.float32(1.0 + c))
                @pl.when(i + 1 < n_hops)
                def _():
                    pt._row_dma(records, rows, sem, nbuf, nxt).start()
                new.append(nxt)
            return tuple(new)

        last = jax.lax.fori_loop(0, n_hops, body,
                                 tuple(jnp.float32(1.0 + c) for c in range(C)))
        out[0, 0] = last[0]

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[pltpu.SMEM((2 * C, pt.REC), jnp.float32),
                        pltpu.SemaphoreType.DMA((2 * C,))],
    )(records)

scene = load_scene(SCENE)
rec = scene.bvh.records
H = 20000
for C in (1, 2, 4, 8):
    f = jax.jit(lambda r, C=C: chase(r, H, C))
    jax.block_until_ready(f(rec))
    dt = timeit(f, rec, vary_fn=lambda i, a: (a[0] + (i * 0.0),), iters=5)
    print(f"C={C}: {dt*1e3:.2f} ms total, {dt*1e9/H:.0f} ns/step, "
          f"{dt*1e9/(H*C):.0f} ns/hop-effective")
