#!/usr/bin/env python3
"""Per-stage timing of the render pipeline on the current default device.

Times isolated jitted stages over a large ray batch to show where a bounce's
budget goes: traversal (closest/any-hit), material sampling, RNG, NEE, and
the full integrator.  Usage:

    python tools/profile_stages.py [--scene scenes/bunny_bench.sp] [--n 1048576]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


from _prof_util import timeit, vary_keys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default=os.path.join(os.path.dirname(__file__),
                                                    os.pardir, "scenes", "bunny_bench.sp"))
    ap.add_argument("--n", type=int, default=1 << 20)
    args = ap.parse_args()

    from simplepath_tpu import load_scene
    from simplepath_tpu.core.rng import uniform_2d
    from simplepath_tpu.render.camera import generate_ray
    from simplepath_tpu.render.integrators import make_integrator
    from simplepath_tpu.render.materials import (build_rho_tables,
                                                 gather_material,
                                                 material_sample)
    from simplepath_tpu.render.traverse import (hit_shading, scene_intersect,
                                                scene_intersect_lights,
                                                scene_intersect_p)

    scene = load_scene(args.scene)
    print(f"# scene tris={scene.static.num_triangles} device={jax.devices()[0]}")
    n = args.n
    key = jax.random.PRNGKey(0)

    w = scene.static.width
    xs = (jnp.arange(n) % w).astype(jnp.float32) + 0.5
    ys = ((jnp.arange(n) // w) % scene.static.height).astype(jnp.float32) + 0.5
    ro, rd = generate_ray(scene.camera, xs, ys)
    keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(key, jnp.arange(n))
    tmin = jnp.full(n, 1e-3)
    tmax = jnp.full(n, jnp.inf)

    raygen = jax.jit(lambda xs, ys: generate_ray(scene.camera, xs, ys))
    print(f"raygen:        {timeit(raygen, xs, ys, vary=0)*1e3:8.1f} ms")

    closest = jax.jit(jax.vmap(lambda o, d, a, b: scene_intersect(scene, o, d, a, b)))
    t_closest = timeit(closest, ro, rd, tmin, tmax, vary=2)
    print(f"closest-hit:   {t_closest*1e3:8.1f} ms  ({n/t_closest/1e6:.2f} Mray/s)")

    anyhit = jax.jit(jax.vmap(lambda o, d, a, b: scene_intersect_p(scene, o, d, a, b)))
    t_any = timeit(anyhit, ro, rd, tmin, jnp.full(n, 100.0), vary=2)
    print(f"any-hit:       {t_any*1e3:8.1f} ms  ({n/t_any/1e6:.2f} Mray/s)")

    lightisect = jax.jit(jax.vmap(lambda o, d, a, b: scene_intersect_lights(scene, o, d, a, b)[1]))
    t_li = timeit(lightisect, ro, rd, tmin, tmax, vary=2)
    print(f"light-isect:   {t_li*1e3:8.1f} ms")

    rho = build_rho_tables(scene.materials)
    hits = closest(ro, rd, tmin, tmax)
    shade = jax.jit(jax.vmap(lambda h, o, d: hit_shading(scene, h, o, d),
                             in_axes=(0, 0, 0)))
    t_sh = timeit(shade, hits, ro, rd,
                  vary_fn=lambda i, a: (a[0], a[1] + i * 1e-6, a[2]))
    print(f"hit-shading:   {t_sh*1e3:8.1f} ms")

    _, nrm, mids = shade(hits, ro, rd)

    def mat_fn(mid, k):
        m = gather_material(scene.materials, rho, mid)
        u = uniform_2d(k, 2)
        return material_sample(m, jnp.asarray([0.3, 0.9, 0.1]),
                               u[0], u[1], u)
    mat = jax.jit(jax.vmap(mat_fn))
    t_mat = timeit(mat, mids, keys, vary_fn=vary_keys(1))
    print(f"material:      {t_mat*1e3:8.1f} ms")

    def rng_fn(k):
        tot = 0.0
        for site in range(12):
            tot = tot + jax.random.uniform(jax.random.fold_in(k, site))
        return tot
    rngs = jax.jit(jax.vmap(rng_fn))
    t_rng = timeit(rngs, keys, vary_fn=vary_keys(0))
    print(f"rng (12 draws):{t_rng*1e3:8.1f} ms")

    fn = make_integrator(scene.static.integrator)
    pc = jnp.stack([xs, ys], axis=-1)
    full = jax.jit(lambda o, d, k, p: fn(scene, rho, o, d, k, p))
    t_full = timeit(full, ro, rd, keys, pc, iters=1, vary_fn=vary_keys(2))
    print(f"full {scene.static.integrator}: {t_full*1e3:8.1f} ms "
          f"({n/t_full/1e3:.1f}k paths/s)")


if __name__ == "__main__":
    main()
