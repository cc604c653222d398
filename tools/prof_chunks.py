#!/usr/bin/env python3
"""Diagnose the gap between profiled integrator speed and bench speed.

Times jitted render_rays per chunk (131072 pixels) at spp=1 for each of the
8 chunks of a 1024x1024 frame, so we can see which image regions (sky vs
geometry vs glossy floor) dominate, plus the compile cost.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from simplepath_tpu import load_scene
from simplepath_tpu.render.film import render_rays

SCENE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "scenes", "bunny_bench.sp")

scene = load_scene(SCENE)
h, w = scene.static.height, scene.static.width
print(f"# {scene.static.num_triangles} tris {w}x{h} max_depth={scene.static.max_depth}",
      flush=True)

fn = jax.jit(render_rays, static_argnames=("spp", "integrator"))
key = jax.random.PRNGKey(0)

CHUNK = 1 << 17
ys_g, xs_g = jnp.meshgrid(jnp.arange(h, dtype=jnp.int32),
                          jnp.arange(w, dtype=jnp.int32), indexing="ij")
xs_all, ys_all = xs_g.reshape(-1), ys_g.reshape(-1)

t0 = time.time()
out = fn(scene, xs_all[:CHUNK], ys_all[:CHUNK], spp=1, key=key)
out.block_until_ready()
print(f"compile+first chunk: {time.time()-t0:.1f}s", flush=True)

for c in range(0, xs_all.shape[0], CHUNK):
    t0 = time.time()
    out = fn(scene, xs_all[c:c+CHUNK], ys_all[c:c+CHUNK], spp=1, key=key)
    out.block_until_ready()
    rows = (ys_all[c].item(), ys_all[c+CHUNK-1].item())
    dt = time.time() - t0
    print(f"chunk rows {rows[0]:4d}-{rows[1]:4d}: {dt*1e3:8.1f} ms "
          f"({CHUNK/dt/1e3:.0f}k paths/s)", flush=True)
