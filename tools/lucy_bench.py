"""Measure the lucy-class scene end-to-end: tree stats + full render.

Re-measures PERF.md's 28.9M-triangle numbers (VERDICT r4 task 2: the
round-3 figures predate the target-leaf-count split fix, so rows / leaf
occupancy / throughput were stale).  Prints record-table statistics from
the packed BVH, then renders lucy_bench.sp at 4 spp on the default
backend and reports paths/s.

Usage: python tools/lucy_bench.py [--spp N]
"""

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    spp = 4
    if "--spp" in sys.argv:
        spp = int(sys.argv[sys.argv.index("--spp") + 1])

    import jax

    from simplepath_tpu import load_scene
    from simplepath_tpu.parallel.mesh import render_image_sharded

    path = os.path.join(ROOT, "scenes", "lucy_bench.sp")
    t0 = time.time()
    scene = load_scene(path)
    t_load = time.time() - t0
    rec = scene.bvh.records
    M = rec.shape[0]
    counts = np.asarray(rec[:, 110])
    leaf_rows = counts > 0
    n_leaf = int(leaf_rows.sum())
    mean_occ = float(counts[leaf_rows].mean())
    tris = scene.static.num_triangles
    print(f"load {t_load:.0f}s; tris {tris:,}; record rows {M:,} "
          f"({M * 512 / 1e9:.2f} GB); leaf rows {n_leaf:,}; "
          f"mean leaf occupancy {mean_occ:.1f}/12", flush=True)

    h, w = scene.static.height, scene.static.width
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    img = render_image_sharded(scene, spp=spp, key=key)
    mean = float(np.asarray(img).mean())  # true barrier (readback)
    t_render = time.time() - t0
    paths = h * w * spp
    n_chips = len(jax.devices())
    print(f"render {w}x{h} @ {spp}spp: {t_render:.0f}s "
          f"({paths / t_render / n_chips / 1e3:.1f}k paths/s/chip "
          f"on {n_chips} chip(s)); mean {mean:.5f}", flush=True)


if __name__ == "__main__":
    main()
