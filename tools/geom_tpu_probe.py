"""Pallas-inside-shard_map on the REAL TPU (VERDICT r4 weak #2): geometry
sharding's traversal always ran interpret-mode on the CPU test mesh; this
executes `sharded_closest`/`sharded_anyhit` — the packet kernels compiled
by Mosaic INSIDE a shard_map with geom-axis collectives — on the device.

The rig has one chip, so the mesh is 1x1 (rays x geom): the collectives
are trivial but the risky composition (pallas_call under shard_map, record
table as a sharded operand) is exactly the production code path.  The
sharded render must match the replicated-path render bit-for-bit up to fp
association.

Usage: python tools/geom_tpu_probe.py   (on the TPU rig; records the
result for PERF.md)
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from simplepath_tpu import load_scene  # noqa: E402
from simplepath_tpu.parallel.geom_shard import (  # noqa: E402
    GEOM_AXIS, render_image_geom_sharded, shard_scene_geometry)
from simplepath_tpu.parallel.mesh import render_image_sharded  # noqa: E402

SCENE = os.path.join(ROOT, "tests", "scenes", "g_blob.sp")


def main():
    backend = jax.default_backend()
    print(f"backend: {backend}; devices: {jax.devices()}", flush=True)
    if backend != "tpu":
        raise SystemExit("this probe certifies the TPU composition — "
                         "run it on the TPU rig")
    key = jax.random.PRNGKey(11)
    spp = 4

    t0 = time.time()
    ref = np.asarray(render_image_sharded(load_scene(SCENE), spp=spp, key=key))
    float(ref.sum())
    print(f"replicated Pallas render: {time.time()-t0:.1f}s "
          f"mean={ref.mean():.6f}", flush=True)

    mesh = Mesh(np.asarray(jax.devices()[:1]), (GEOM_AXIS,))
    scene = shard_scene_geometry(load_scene(SCENE, use_bvh=False), mesh)
    t0 = time.time()
    ours = np.asarray(render_image_geom_sharded(scene, spp=spp, key=key,
                                                mesh=mesh))
    print(f"geom-sharded (1-shard) Pallas-in-shard_map render: "
          f"{time.time()-t0:.1f}s mean={ours.mean():.6f}", flush=True)

    diff = float(np.max(np.abs(ours - ref)))
    print(f"max |sharded - replicated| = {diff:.2e}", flush=True)
    assert diff < 1e-4, diff
    print("OK: packet kernels execute inside shard_map on TPU", flush=True)


if __name__ == "__main__":
    main()
