#!/usr/bin/env python3
"""Per-bounce and per-stage timing of the flagship integrator on device.

Two views:
 1. marginal bounce cost: time render_rays with max_depth = 1..D (the
    difference between successive depths is what bounce k costs end-to-end,
    including its dead-lane fraction);
 2. stage costs at the first bounce, using the REAL batched entry points
    (packet closest / packet any-hit / light isect / sample / NEE math).

Usage: python tools/prof_bounce.py [--n 131072] [--depth 10]
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
    ap.add_argument("--scene", default=os.path.join(
        os.path.dirname(__file__), os.pardir, "scenes", "bunny_bench.sp"))
    ap.add_argument("--n", type=int, default=1 << 17)
    ap.add_argument("--depth", type=int, default=10)
    ap.add_argument("--stages-only", action="store_true",
                    help="skip the (slow, 10-compile) max_depth sweep")
    args = ap.parse_args()

    from simplepath_tpu import load_scene
    from simplepath_tpu.render.camera import generate_ray
    from simplepath_tpu.render.film import render_rays
    from simplepath_tpu.render.integrators import (_estimate_direct_mis_all,
                                                   _sample_batch,
                                                   _shading_batch)
    from simplepath_tpu.render.materials import build_rho_tables
    from simplepath_tpu.render.traverse import (scene_intersect_batch,
                                                scene_intersect_lights,
                                                scene_intersect_p_batch)
    from simplepath_tpu.core.onb import onb_from_v, onb_to_local

    scene = load_scene(args.scene)
    n = args.n
    print(f"# tris={scene.static.num_triangles} n={n} device={jax.devices()[0]}",
          flush=True)

    w, h = scene.static.width, scene.static.height
    xs = (jnp.arange(n, dtype=jnp.int32) % w)
    ys = ((jnp.arange(n, dtype=jnp.int32) * 7919) // w) % h
    key = jax.random.PRNGKey(0)

    # ---- view 0: fixed dispatch overhead (tunnel / launch latency)
    trivial = jax.jit(lambda x: x + 1.0)
    t_triv = timeit(trivial, jnp.zeros(8), iters=10, vary=0)
    print(f"dispatch overhead (trivial jit): {t_triv*1e3:.2f} ms", flush=True)

    # ---- view 1: marginal bounce cost
    fn = jax.jit(render_rays, static_argnames=("spp", "integrator"))
    prev = 0.0
    depths = [int(x) for x in os.environ.get("DEPTHS", "").split(",") if x] \
        or list(range(1, args.depth + 1))
    for d in ([] if args.stages_only else depths):
        import dataclasses
        sc = dataclasses.replace(
            scene, static=dataclasses.replace(scene.static, max_depth=d))
        dt = timeit(fn, sc, xs, ys, 1, key, vary_fn=vary_keys(4))
        print(f"max_depth={d:2d}: {dt*1e3:8.1f} ms  (+{(dt-prev)*1e3:7.1f} ms)"
              f"  {n/dt/1e3:8.0f}k paths/s", flush=True)
        prev = dt

    # ---- view 2: stage costs on the primary-hit wavefront
    rho = build_rho_tables(scene.materials)
    pxf = xs.astype(jnp.float32) + 0.5
    pyf = ys.astype(jnp.float32) + 0.5
    ro, rd = generate_ray(scene.camera, pxf, pyf)
    keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(key, jnp.arange(n))
    tmin = jnp.full(n, 1e-3)
    tmax = jnp.full(n, jnp.inf)

    t_li = timeit(jax.jit(lambda o, d_, a, b: jax.vmap(
        lambda oo, dd, aa, bb: scene_intersect_lights(scene, oo, dd, aa, bb))(
            o, d_, a, b)), ro, rd, tmin, tmax, vary=2)
    print(f"light-isect:   {t_li*1e3:8.1f} ms", flush=True)

    closest = jax.jit(lambda o, d_, a, b: scene_intersect_batch(scene, o, d_, a, b))
    t_c = timeit(closest, ro, rd, tmin, tmax, vary=2)
    print(f"closest:       {t_c*1e3:8.1f} ms  ({n/t_c/1e6:.2f} Mray/s)", flush=True)
    hit = closest(ro, rd, tmin, tmax)

    anyhit = jax.jit(lambda o, d_, a, b: scene_intersect_p_batch(scene, o, d_, a, b))
    t_a = timeit(anyhit, ro, rd, tmin, jnp.full(n, 30.0), vary=2)
    print(f"anyhit(prim):  {t_a*1e3:8.1f} ms  ({n/t_a/1e6:.2f} Mray/s)", flush=True)

    def shade_sample(hit, ro, rd, keys):
        p, nrm, mid = _shading_batch(scene, hit, ro, rd)
        onb = jax.vmap(onb_from_v)(nrm)
        wo_local = jax.vmap(onb_to_local)(onb, -rd)
        m, ms = _sample_batch(scene, rho, mid, wo_local, keys)
        return p, nrm, onb, m, ms

    t_ss = timeit(jax.jit(shade_sample), hit, ro, rd, keys,
                  vary_fn=vary_keys(3))
    print(f"shade+sample:  {t_ss*1e3:8.1f} ms", flush=True)
    p, nrm, onb, m, ms = jax.jit(shade_sample)(hit, ro, rd, keys)

    nee = jax.jit(lambda p_, n_, wo_, onb_, m_, k_, en_: _estimate_direct_mis_all(
        scene, rho, p_, n_, wo_, onb_, m_, k_, en_))
    en = hit.valid
    t_nee = timeit(nee, p, nrm, -rd, onb, m, keys, en,
                   vary_fn=vary_keys(5))
    print(f"nee(full):     {t_nee*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
