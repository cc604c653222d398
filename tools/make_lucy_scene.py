#!/usr/bin/env python3
"""Generate the lucy-class stress scene: a 28.9M-triangle mesh + plane +
environment light at 1350x2000.

The reference's stress scene (/root/reference/scenes/lucy.sp) points at
ply_files/lucy.ply (~28M triangles, not shipped); this synthesizes a
deterministic displaced-grid stand-in of the same triangle count and scene
structure (clearcoat glossy mesh, glossy plane, env light, same resolution).

Usage:
    python tools/make_lucy_scene.py [--tris 28_880_000]
Then render:
    python -m simplepath_tpu.cli scenes/lucy_bench.sp --samples 4 \
        --spp-chunk 1 --integrator iterative_rrnee
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCENE_DIR = os.path.join(ROOT, "scenes")
ASSET = os.path.join(SCENE_DIR, "terrain_28m.ply")
SCENE = os.path.join(SCENE_DIR, "lucy_bench.sp")

SCENE_TEXT = """version: 1

scene_parameters {
    output_file_name: "lucy_bench.pfm"
    width: 1350
    height: 2000
    max_depth: 10
    russian_roulette_depth: 3
    integrator: iterative_rrnee
}

perspective_camera {
    origin: 0.0 900.0 -2300.0
    look_at: 0.0 0.0 0.0
    fov: 45
}

material_glossy {
    name: "material_glossy_base"
    diffuse: 0.7 0.7 0.7
    ior: 1.3
    roughness: 0.75
}

material_glossy {
    name: "material_glossy_plane"
    diffuse: 0.4 0.1 0.1
    ior: 1.8
    roughness: 0.01
}

material_clearcoat {
    name: "material_glossy_clearcoat"
    base: "material_glossy_base"
    ior: 1.5
    color: 1.0 1.0 1.0
}

mesh {
    file: "terrain_28m.ply"
    material: "material_glossy_clearcoat"
}

plane {
    material: "material_glossy_plane"
    translate: 0.0 -400.0 0.0
}

environment_light {
    radiance: 1.0 1.0 1.3
}
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=28_880_000,
                    help="minimum triangle count (grid rounds up)")
    args = ap.parse_args()

    from simplepath_tpu.io.meshgen import displaced_grid, write_ply

    # 2(n-1)^2 >= tris
    n = int((args.tris / 2.0) ** 0.5) + 2
    os.makedirs(SCENE_DIR, exist_ok=True)
    if not os.path.exists(ASSET):
        t0 = time.time()
        v, f = displaced_grid(n)
        print(f"generated {len(f):,} tris / {len(v):,} verts "
              f"in {time.time() - t0:.1f}s")
        t0 = time.time()
        write_ply(ASSET, v, f)
        print(f"wrote {ASSET} ({os.path.getsize(ASSET) / 1e6:.0f} MB) "
              f"in {time.time() - t0:.1f}s")
    else:
        print(f"{ASSET} already exists")
    with open(SCENE, "w") as fh:
        fh.write(SCENE_TEXT)
    print(f"wrote {SCENE}")


if __name__ == "__main__":
    main()
