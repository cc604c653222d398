"""Benchmark packet_closest/anyhit on the TPU with bench-scene geometry."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from simplepath_tpu import load_scene
from simplepath_tpu.render.camera import generate_ray
from simplepath_tpu.render.pallas_traverse import packet_closest, packet_anyhit

SCENE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "scenes", "bunny_bench.sp")

from _prof_util import timeit

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

f = jax.jit(lambda o, d, a, b: packet_closest(rec, o, d, a, b))
t0 = time.time()
out = f(ro, rd, t_min, t_max); jax.block_until_ready(out)
print(f"compile: {time.time()-t0:.1f}s", file=sys.stderr)
dt = timeit(f, ro, rd, t_min, t_max, vary=2, iters=5)
nh = int(out[4].sum())
print(f"closest(primary): {dt*1e3:.2f} ms ({N/dt/1e6:.2f} Mrays/s) hits={nh}")

k = jax.random.PRNGKey(0)
ro2 = jax.random.uniform(k, (N, 3), minval=-3, maxval=3)
d2 = jax.random.normal(jax.random.PRNGKey(1), (N, 3))
rd2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
dt = timeit(f, ro2, rd2, t_min, t_max, vary=2, iters=5)
print(f"closest(incoherent): {dt*1e3:.2f} ms ({N/dt/1e6:.2f} Mrays/s)")

g = jax.jit(lambda o, d, a, b: packet_anyhit(rec, o, d, a, b))
out = g(ro2, rd2, t_min, jnp.full((N,), 10.0)); jax.block_until_ready(out)
dt = timeit(g, ro2, rd2, t_min, jnp.full((N,), 10.0), vary=2, iters=5)
print(f"anyhit(incoherent): {dt*1e3:.2f} ms ({N/dt/1e6:.2f} Mrays/s)")
