"""Microbenchmark the BVH traversal hot loop on the bench scene."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from simplepath_tpu import load_scene
from simplepath_tpu.render.traverse import scene_intersect, scene_intersect_p
from simplepath_tpu.render.camera import generate_ray

SCENE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "scenes", "bunny_bench.sp")

from _prof_util import timeit

def main():
    N = int(os.environ.get("N", "65536"))
    scene = load_scene(SCENE)
    print(f"tris={scene.static.num_triangles} bvh_rows={scene.bvh.records.shape}",
          file=sys.stderr)

    side = int(np.sqrt(N))
    ys, xs = jnp.meshgrid(jnp.arange(side), jnp.arange(side), indexing="ij")
    px = (xs.reshape(-1).astype(jnp.float32) + 0.5) * (1024 / side)
    py = (ys.reshape(-1).astype(jnp.float32) + 0.5) * (1024 / side)
    ro, rd = generate_ray(scene.camera, px, py)

    t_min = jnp.zeros(N) + 1e-3
    t_max = jnp.full((N,), 3.4e38)

    closest = jax.jit(jax.vmap(lambda o, d, a, b: scene_intersect(scene, o, d, a, b)))
    anyhit = jax.jit(jax.vmap(lambda o, d, a, b: scene_intersect_p(scene, o, d, a, b)))

    dt = timeit(closest, ro, rd, t_min, t_max, vary=2)
    print(f"closest(primary): {dt*1e3:.2f} ms  ({N/dt/1e6:.2f} Mrays/s)")

    # incoherent rays: random dirs from random points in the scene bbox
    k = jax.random.PRNGKey(0)
    ro2 = jax.random.uniform(k, (N, 3), minval=-3, maxval=3)
    d = jax.random.normal(jax.random.PRNGKey(1), (N, 3))
    rd2 = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    dt = timeit(closest, ro2, rd2, t_min, t_max, vary=2)
    print(f"closest(incoherent): {dt*1e3:.2f} ms  ({N/dt/1e6:.2f} Mrays/s)")

    dt = timeit(anyhit, ro2, rd2, t_min, jnp.full((N,), 10.0), vary=2)
    print(f"anyhit(incoherent): {dt*1e3:.2f} ms  ({N/dt/1e6:.2f} Mrays/s)")

    # isolated gather: records[random rows] per ray per "iteration"
    records = scene.bvh.records
    M = records.shape[0]
    idx = jax.random.randint(jax.random.PRNGKey(2), (N,), 0, M)
    @jax.jit
    def gather_loop(idx):
        def body(i, acc):
            rows = records[(idx + i * 7919) % M]
            return acc + rows.sum(axis=-1)
        return jax.lax.fori_loop(0, 100, body, jnp.zeros((N,)))
    dt = timeit(gather_loop, idx, vary_fn=lambda i, a: (jnp.roll(a[0], i) + i,))
    print(f"gather 100 iters: {dt*1e3:.2f} ms -> {dt/100*1e6:.1f} us/iter "
          f"({N*256*100/dt/1e9:.1f} GB/s)")

if __name__ == "__main__":
    main()
