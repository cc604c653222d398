"""Lucy-scale geometry sharding: the 28.9M-triangle terrain through the
forest build + cache + sharded-combine render path (VERDICT r4 task 3c —
geometry sharding previously never ran above 51k triangles).

Runs on the virtual 8-CPU mesh (4 geometry shards), like the in-repo geom
tests: platform is forced to CPU *in Python* (this rig pre-registers a TPU
backend that env vars alone don't override).  Reports:

  * forest build time COLD (Morton slice + 4 native sub-BVH builds + pack)
  * forest cache save / load time WARM (full-content key, geom_shard.py)
  * per-shard record-table stats (rows, GB, leaf occupancy)
  * a low-res render through sharded_closest/anyhit (min-t combine on the
    geom axis) with a finite, nonzero film as the correctness receipt

Usage: python tools/lucy_geom_bench.py [--res WxH] [--spp N]
"""

import os
import sys
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    res = "135x200"
    spp = 1
    if "--res" in sys.argv:
        res = sys.argv[sys.argv.index("--res") + 1]
    if "--spp" in sys.argv:
        spp = int(sys.argv[sys.argv.index("--spp") + 1])
    w, h = (int(x) for x in res.split("x"))

    from jax.sharding import Mesh

    from simplepath_tpu import build_scene, parse_sp
    from simplepath_tpu.parallel.geom_shard import (
        GEOM_AXIS, render_image_geom_sharded, shard_scene_geometry)

    scene_dir = os.path.join(ROOT, "scenes")
    txt = open(os.path.join(scene_dir, "lucy_bench.sp")).read()
    txt = txt.replace("width: 1350", f"width: {w}")
    txt = txt.replace("height: 2000", f"height: {h}")

    t0 = time.time()
    scene = build_scene(parse_sp(txt, base_dir=scene_dir), use_bvh=False)
    print(f"parse+load (no BVH): {time.time()-t0:.0f}s; "
          f"tris {scene.static.num_triangles:,}", flush=True)

    mesh = Mesh(np.asarray(jax.devices()[:4]), (GEOM_AXIS,))

    t0 = time.time()
    sh = shard_scene_geometry(scene, mesh, cache_dir=scene_dir)
    t_cold = time.time() - t0
    rec = np.asarray(sh.bvh.records)  # [4, M, 128]
    D, M, _ = rec.shape
    occs, rows = [], []
    for d in range(D):
        counts = rec[d, :, 110]
        leaf = counts > 0
        rows.append(int((rec[d] != 0).any(axis=1).sum()))
        occs.append(float(counts[leaf].mean()))
    print(f"forest build COLD (incl. cache save): {t_cold:.0f}s; "
          f"{D} shards, padded rows {M:,} each "
          f"({D * M * 512 / 1e9:.2f} GB stacked); "
          f"per-shard used rows {rows}; mean leaf occupancy "
          f"{[round(o, 1) for o in occs]}", flush=True)

    t0 = time.time()
    sh2 = shard_scene_geometry(scene, mesh, cache_dir=scene_dir)
    t_warm = time.time() - t0
    print(f"forest build WARM (cache hit): {t_warm:.0f}s", flush=True)
    del sh2

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    img = render_image_geom_sharded(sh, spp=spp, key=key, mesh=mesh)
    img = np.asarray(img)
    t_render = time.time() - t0
    assert np.isfinite(img).all() and img.max() > 0, "broken render"
    print(f"geom-sharded render {w}x{h} @ {spp}spp on 4 CPU shards: "
          f"{t_render:.0f}s; film mean {img.mean():.5f}", flush=True)


if __name__ == "__main__":
    main()
