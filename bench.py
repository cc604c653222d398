#!/usr/bin/env python3
"""Headline benchmark: rays/sec/chip on the bunny-class scene at 1024².

The reference's bunny.sp needs Stanford PLY assets that are not shipped
(scenes/bunny.sp → ply_files/.../bun_zipper.ply), so this bench mirrors its
structure with a deterministic procedural stand-in: 4 instances of an
~82k-triangle displaced icosphere (≈ bunny's 4×69k), a glossy plane, and a
sphere light, rendered with the flagship IterativeRRNEE integrator at
1024×1024.

Prints ONE JSON line:
  {"metric": "rays_per_sec_per_chip", "value": N, "unit": "paths/s",
   "vs_baseline": R}

"rays" = camera paths (W*H*spp); each path additionally traces NEE shadow
rays and bounce segments identically in ours and the reference, so the
ratio is apples-to-apples.  vs_baseline compares against the reference C++
binary measured on this machine's CPU (scenes/ref_baseline.json); the
reference is a CPU-only program — beating it by a large factor on a TPU
chip is the point.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ROOT = os.path.dirname(os.path.abspath(__file__))
SCENE_DIR = os.path.join(ROOT, "scenes")
ASSET = os.path.join(SCENE_DIR, "bench_blob.ply")
SCENE = os.path.join(SCENE_DIR, "bunny_bench.sp")

BENCH_SPP = int(os.environ.get("BENCH_SPP", "4"))
BENCH_SIZE = int(os.environ.get("BENCH_SIZE", "1024"))

SCENE_TEXT = """version: 1

scene_parameters {{
    output_file_name: "bunny_bench.pfm"
    width: {size}
    height: {size}
    max_depth: 10
    russian_roulette_depth: 3
    integrator: iterative_rrnee
}}

perspective_camera {{
    origin: 0.0 2.0 5.0
    look_at: -0.25 1.0 0.0
    fov: 45
}}

material_lambertian {{
    name: "material_lambertian"
    diffuse: 0.1 0.8 0.8
}}

material_lambertian {{
    name: "material_lambertian_base"
    diffuse: 0.1 0.2 0.8
}}

material_glossy {{
    name: "material_glossy_base"
    diffuse: 0.8 0.2 0.8
    ior: 1.8
    roughness: 0.25
}}

material_glossy {{
    name: "material_glossy"
    diffuse: 0.8 0.2 0.2
    ior: 1.8
    roughness: 0.75
}}

material_glossy {{
    name: "material_glossy_plane"
    diffuse: 0.6 0.6 0.6
    ior: 1.8
    roughness: 0.01
}}

material_clearcoat {{
    name: "material_lambertian_clearcoat"
    base: "material_lambertian_base"
    ior: 1.5
    color: 1.0 0.8 0.8
}}

material_clearcoat {{
    name: "material_glossy_clearcoat"
    base: "material_glossy_base"
    ior: 1.3
    color: 1.0 1.0 1.0
}}

mesh {{
    file: "bench_blob.ply"
    translate: 2.25 1.0 0.0
    scale: 0.9 0.9 0.9
    material: "material_glossy_clearcoat"
}}

mesh {{
    file: "bench_blob.ply"
    translate: 0.75 1.0 0.0
    scale: 0.9 0.9 0.9
    material: "material_lambertian_clearcoat"
}}

mesh {{
    file: "bench_blob.ply"
    translate: -0.75 1.0 0.0
    scale: 0.9 0.9 0.9
    material: "material_lambertian"
}}

mesh {{
    file: "bench_blob.ply"
    translate: -2.25 1.0 0.0
    scale: 0.9 0.9 0.9
    material: "material_glossy"
}}

plane {{
    material: "material_glossy_plane"
}}

sphere_light {{
    translate: 0.0 4.0 0.0
    scale: 0.5 0.5 0.5
    radiance: 10.0 10.0 10.0
}}
"""


def ensure_assets():
    os.makedirs(SCENE_DIR, exist_ok=True)
    if not os.path.exists(ASSET):
        from simplepath_tpu.io.meshgen import displaced_blob, write_ply
        v, f = displaced_blob(6)  # 81920 tris
        write_ply(ASSET, v, f)
    scene_txt = SCENE_TEXT.format(size=BENCH_SIZE)
    if not os.path.exists(SCENE) or open(SCENE).read() != scene_txt:
        with open(SCENE, "w") as f:
            f.write(scene_txt)


def compile_health_probe() -> float:
    """Seconds to compile a fresh ~40-matmul chain with the persistent
    cache bypassed (unique baked constant ⇒ never a cache hit).  The rig's
    shared compile service degrades unpredictably (PERF.md round 4: ~5 s
    healthy, >590 s degraded while EXECUTION stayed normal), so warmup
    timings are only meaningful alongside this probe; the throughput number
    itself is unaffected either way."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    c = jnp.asarray(np.random.default_rng().standard_normal(
        (256, 256)).astype(np.float32))

    @jax.jit
    def probe(x):
        for _ in range(40):
            x = jnp.tanh(x @ c)
        return x

    t0 = time.time()
    float(probe(jnp.ones((256, 256), jnp.float32)).sum())
    return time.time() - t0


def main():
    ensure_assets()
    import jax

    from simplepath_tpu import load_scene
    from simplepath_tpu.parallel.mesh import (make_ray_mesh,
                                              render_image_sharded,
                                              warmup_render)

    t0 = time.time()
    scene = load_scene(SCENE)
    t_load = time.time() - t0
    print(f"# scene: {scene.static.num_triangles} tris, load {t_load:.1f}s, "
          f"devices: {jax.devices()}", file=sys.stderr)

    mesh = make_ray_mesh()

    # Warmup compiles the EXACT executable(s) the timed run uses — shape and
    # spp-splitting derived inside parallel/mesh from the render path's own
    # helpers (the round-4 bench bug was a warmup that compiled a program
    # the timed run never reused).  With the persistent compilation cache a
    # repeat invocation deserializes instead of recompiling.
    t_compile = warmup_render(scene, BENCH_SPP, mesh)
    print(f"# warmup(one chunk @ {BENCH_SPP}spp incl. compile): "
          f"{t_compile:.1f}s", file=sys.stderr)
    t_health = compile_health_probe()
    print(f"# compile-health probe (fresh 40-matmul chain): {t_health:.1f}s "
          f"({'healthy' if t_health < 30 else 'DEGRADED compile service'})",
          file=sys.stderr)

    n_runs = int(os.environ.get("BENCH_RUNS", "3"))
    times = []
    for r in range(n_runs):
        t0 = time.time()
        img = render_image_sharded(scene, BENCH_SPP,
                                   jax.random.PRNGKey(1 + r), mesh)
        float(img.sum())  # true barrier (see warmup note)
        times.append(time.time() - t0)
    times.sort()
    dt = times[len(times) // 2]  # median-of-n: the rig is shared and noisy

    n_chips = len(jax.devices())
    paths = scene.static.width * scene.static.height * BENCH_SPP
    rays_per_s = paths / dt / n_chips

    vs_baseline = None
    baseline_file = os.path.join(SCENE_DIR, "ref_baseline.json")
    if os.path.exists(baseline_file):
        with open(baseline_file) as f:
            base = json.load(f)
        if base.get("rays_per_s"):
            vs_baseline = rays_per_s / base["rays_per_s"]

    print(f"# {paths} paths; run times {['%.2f' % t for t in times]}s "
          f"(median {dt:.2f}s) on {n_chips} chip(s)", file=sys.stderr)
    print(json.dumps({
        "metric": "rays_per_sec_per_chip",
        "value": round(rays_per_s, 1),
        "unit": "paths/s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "compile_health": {
            "warmup_s": round(t_compile, 1),
            "probe_compile_s": round(t_health, 1),
            "healthy": t_health < 30,
        },
    }))


if __name__ == "__main__":
    main()
