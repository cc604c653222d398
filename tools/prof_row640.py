#!/usr/bin/env python3
"""The row-640 A/B probe (PERF.md: stable to ±0.3% on this rig).

Renders the 65,536-pixel chunk at rows 640-703 of the 1024² bench frame at
4 spp in ONE jitted dispatch, with a FRESH PRNG key per repeat (the axon
tunnel memoizes identical dispatches — PERF.md round-3 gotchas).  Prints
per-run ms and the median.  Use for kernel A/Bs, not bench.py.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from simplepath_tpu import load_scene
from simplepath_tpu.render.film import render_rays

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCENE = os.path.join(ROOT, "scenes", "bunny_bench.sp")
REPS = int(os.environ.get("PROBE_REPS", "5"))
SPP = int(os.environ.get("PROBE_SPP", "4"))

scene = load_scene(SCENE)
w = scene.static.width
n = 1 << 16
start = 640 * w
idx = jnp.arange(start, start + n, dtype=jnp.int32)
xs, ys = idx % w, idx // w

fn = jax.jit(render_rays, static_argnames=("spp", "integrator"))
# NB: time to a host TRANSFER (float(out.mean())), never block_until_ready —
# through the axon tunnel block_until_ready returns immediately (observed
# 0.1 ms "renders"); only a value readback actually drains the device.
t0 = time.time()
m = float(fn(scene, xs, ys, spp=SPP, key=jax.random.PRNGKey(0)).mean())
print(f"# compile+first: {time.time()-t0:.1f}s mean={m:.6f}", flush=True)

times = []
for r in range(REPS):
    key = jax.random.PRNGKey(100 + r)
    t0 = time.time()
    float(fn(scene, xs, ys, spp=SPP, key=key).mean())
    dt = (time.time() - t0) * 1e3
    times.append(dt)
    print(f"run {r}: {dt:8.1f} ms ({n * SPP / dt:.0f}k paths/s)", flush=True)
times.sort()
med = times[len(times) // 2]
print(f"median: {med:.1f} ms ({n * SPP / med:.0f}k paths/s)", flush=True)
