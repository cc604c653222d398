#!/usr/bin/env python3
"""Generate golden-parity scenes + reference renders.

Writes .sp scenes and procedural assets to tests/scenes/, then runs the
reference C++ binary (see .claude/skills/verify/SKILL.md for how it is
built) to produce tests/golden/<name>.pfm at the spp recorded in
tests/golden/manifest.json.  tests/test_golden_parity.py renders the same
scenes with simplepath_tpu and compares statistically.

Usage: python tools/make_goldens.py [--ref /tmp/refbuild/SimplePath]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simplepath_tpu.io.meshgen import displaced_blob, icosphere, write_ply, write_stl  # noqa: E402
from simplepath_tpu.io.pfm import write_pfm  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCENES = os.path.join(ROOT, "tests", "scenes")
GOLDEN = os.path.join(ROOT, "tests", "golden")

COMMON_HEADER = """version: 1

scene_parameters {{
    output_file_name: "{name}.pfm"
    width: {w}
    height: {h}
    max_depth: {max_depth}
    russian_roulette_depth: 3
    integrator: {integrator}
}}

perspective_camera {{
    origin: 0.0 2.0 5.0
    look_at: 0.0 1.0 0.0
    fov: 45
}}
"""

BASIC_GEO = """
material_lambertian {
    name: "blue"
    diffuse: 0.2 0.3 0.7
}

material_lambertian {
    name: "grey"
    diffuse: 0.5 0.5 0.5
}

sphere {
    translate: -0.8 1.0 0.0
    material: "blue"
}

sphere {
    translate: 1.1 0.6 0.8
    scale: 0.6 0.6 0.6
    material: "grey"
}

plane {
    material: "grey"
}
"""

SPHERE_LIGHT = """
sphere_light {
    translate: 0.0 4.0 0.0
    radiance: 10.0 10.0 10.0
}
"""

ENV_LIGHT = """
environment_light {
    radiance: 0.6 0.7 0.8
}
"""

GLOSSY_GEO = """
material_glossy {
    name: "rough"
    diffuse: 0.7 0.3 0.2
    ior: 1.8
    roughness: 0.6
}

material_glossy {
    name: "shiny"
    diffuse: 0.3 0.6 0.3
    ior: 1.5
    roughness: 0.05
}

material_lambertian {
    name: "base_lam"
    diffuse: 0.2 0.3 0.7
}

material_clearcoat {
    name: "coat"
    base: "base_lam"
    ior: 1.5
    color: 1.0 0.9 0.9
}

material_lambertian {
    name: "grey"
    diffuse: 0.5 0.5 0.5
}

sphere {
    translate: -1.5 1.0 0.0
    material: "rough"
}

sphere {
    translate: 0.0 1.0 0.0
    material: "coat"
}

sphere {
    translate: 1.5 1.0 0.0
    material: "shiny"
}

plane {
    material: "grey"
}
"""


def scene_text(name, integrator, body, w=64, h=64, max_depth=8):
    return COMMON_HEADER.format(name=name, w=w, h=h, max_depth=max_depth,
                                integrator=integrator) + body


def make_assets():
    v, f = icosphere(3)  # 1280 tris
    v = v * 0.8
    v[:, 1] += 1.0
    write_ply(os.path.join(SCENES, "ico.ply"), v, f)
    write_stl(os.path.join(SCENES, "ico.stl"), v, f)

    vb, fb = displaced_blob(4)  # 5120 tris
    vb = vb * 0.8
    vb[:, 1] += 1.0
    write_ply(os.path.join(SCENES, "blob.ply"), vb, fb)

    # tiny IBL environment map: smooth gradient + a bright "sun" texel patch
    h, w = 16, 32
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w), indexing="ij")
    img = np.stack([0.2 + 0.3 * xx, 0.3 + 0.2 * yy, 0.4 + 0.1 * xx * yy], axis=-1)
    img[3:5, 6:9] = [20.0, 18.0, 15.0]
    write_pfm(os.path.join(SCENES, "env.pfm"), img.astype(np.float32))


MESH_GEO = """
material_lambertian {{
    name: "grey"
    diffuse: 0.5 0.5 0.5
}}

material_lambertian {{
    name: "red"
    diffuse: 0.7 0.2 0.2
}}

mesh {{
    file: "{meshfile}"
    material: "red"
}}

plane {{
    material: "grey"
}}
"""

IBL_LIGHT = """
environment_light {
    rotate: 0.0 1.0 0.0 30.0
    radiance: 1.0 1.0 1.0
    max_radiance: 50
    image: "env.pfm"
}
"""


# Combined coverage scene: triangle mesh + spheres + plane + clearcoat +
# glossy + lambertian + sphere light + IBL env, under the flagship RRNEE —
# every geometric kind, material kind, and light kind in ONE golden.
COMBO_GEO = """
material_lambertian {
    name: "grey"
    diffuse: 0.5 0.5 0.5
}

material_glossy {
    name: "rough"
    diffuse: 0.6 0.3 0.2
    ior: 1.6
    roughness: 0.4
}

material_lambertian {
    name: "base_lam"
    diffuse: 0.2 0.3 0.7
}

material_clearcoat {
    name: "coat"
    base: "base_lam"
    ior: 1.5
    color: 1.0 0.9 0.9
}

material_glossy {
    name: "shiny"
    diffuse: 0.3 0.6 0.3
    ior: 1.5
    roughness: 0.05
}

mesh {
    file: "blob.ply"
    translate: -0.9 0.0 0.0
    material: "rough"
}

sphere {
    translate: 1.2 1.0 0.3
    material: "coat"
}

sphere {
    translate: 0.3 0.6 1.3
    scale: 0.55 0.55 0.55
    material: "shiny"
}

plane {
    material: "grey"
}
"""


def all_scenes():
    return {
        # name: (integrator, body, spp, size, max_depth)
        "g_direct": ("direct_lighting", BASIC_GEO + SPHERE_LIGHT, 256, 64, 8),
        "g_combo_ibl": ("iterative_rrnee",
                        COMBO_GEO + SPHERE_LIGHT + IBL_LIGHT, 256, 64, 6),
        "g_direct_env": ("direct_lighting", BASIC_GEO + ENV_LIGHT, 256, 64, 8),
        "g_bf": ("brute_force", BASIC_GEO + ENV_LIGHT, 128, 48, 4),
        "g_bfiter": ("brute_force_iterative", BASIC_GEO + ENV_LIGHT, 128, 48, 5),
        "g_bfiterrr": ("brute_force_iterative_rr", BASIC_GEO + ENV_LIGHT, 128, 48, 8),
        "g_rrnee": ("iterative_rrnee", BASIC_GEO + SPHERE_LIGHT + ENV_LIGHT, 256, 64, 6),
        "g_whitted": ("whitted", GLOSSY_GEO + SPHERE_LIGHT, 128, 64, 4),
        "g_glossy": ("iterative_rrnee", GLOSSY_GEO + ENV_LIGHT, 256, 64, 5),
        "g_mesh_ply": ("iterative_rrnee",
                       MESH_GEO.format(meshfile="ico.ply") + SPHERE_LIGHT + ENV_LIGHT,
                       128, 64, 5),
        "g_mesh_stl": ("direct_lighting",
                       MESH_GEO.format(meshfile="ico.stl") + SPHERE_LIGHT, 128, 64, 5),
        "g_blob": ("iterative_rrnee",
                   MESH_GEO.format(meshfile="blob.ply") + ENV_LIGHT, 128, 48, 5),
        "g_ibl": ("direct_lighting", BASIC_GEO + IBL_LIGHT, 256, 64, 8),
        "g_ibl_rrnee": ("iterative_rrnee", BASIC_GEO + IBL_LIGHT, 256, 48, 5),
        "g_mandel": ("mandelbrot", "", 1, 64, 8),
    }


# Headline-config parity (round-2 VERDICT task 4): the bunny-class bench
# scene (same .sp text as bench.py — 4x 82k-tri displaced blobs, glossy
# plane, sphere light, RRNEE depth 10) at 512x512, with the golden rendered
# at an spp our side MATCHES exactly, so the unblurred per-pixel comparison
# in test_golden_parity.py::test_headline_spp_matched is limited only by
# independent-stream MC noise.
HEADLINE_SPP = 512
HEADLINE_SIZE = 512


def make_headline(ref: str, threads: int) -> None:
    import bench  # repo-root bench.py — reuse its scene verbatim

    root_scenes = os.path.join(ROOT, "scenes")
    os.makedirs(root_scenes, exist_ok=True)
    asset = os.path.join(root_scenes, "bench_blob.ply")
    if not os.path.exists(asset):
        from simplepath_tpu.io.meshgen import displaced_blob, write_ply
        v, f = displaced_blob(6)  # 81920 tris (bench.py ensure_assets)
        write_ply(asset, v, f)
    text = bench.SCENE_TEXT.format(size=HEADLINE_SIZE).replace(
        'output_file_name: "bunny_bench.pfm"',
        'output_file_name: "g_headline.pfm"')
    with open(os.path.join(root_scenes, "headline_parity.sp"), "w") as f:
        f.write(text)
    print(f"render g_headline ({HEADLINE_SIZE}^2 @ {HEADLINE_SPP}spp, "
          f"reference, ~1h on 2 vCPUs)...", flush=True)
    subprocess.run([ref, "--threads", str(threads),
                    "--samples", str(HEADLINE_SPP), "headline_parity.sp"],
                   cwd=root_scenes, check=True, capture_output=True)
    shutil.move(os.path.join(root_scenes, "g_headline.pfm"),
                os.path.join(GOLDEN, "g_headline.pfm"))
    _update_manifest({"g_headline": {
        "spp": HEADLINE_SPP, "integrator": "iterative_rrnee",
        "size": HEADLINE_SIZE, "max_depth": 10, "tier": "headline",
        "scene": "scenes/headline_parity.sp"}})


def _update_manifest(entries: dict) -> None:
    path = os.path.join(GOLDEN, "manifest.json")
    manifest = {}
    if os.path.exists(path):
        with open(path) as f:
            manifest = json.load(f)
    manifest.update(entries)
    with open(path, "w") as f:
        json.dump(manifest, f, indent=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/tmp/refbuild/SimplePath")
    ap.add_argument("--threads", type=int, default=os.cpu_count())
    ap.add_argument("--only", default=None,
                    help="comma-separated golden names to regenerate "
                         "(default: all; manifest entries are merged)")
    ap.add_argument("--headline", action="store_true",
                    help="also render the 512^2 spp-matched headline golden")
    args = ap.parse_args()

    os.makedirs(SCENES, exist_ok=True)
    os.makedirs(GOLDEN, exist_ok=True)
    make_assets()

    only = set(args.only.split(",")) if args.only else None
    manifest = {}
    for name, (integ, body, spp, size, max_depth) in all_scenes().items():
        if only is not None and name not in only:
            continue
        text = scene_text(name, integ, body, w=size, h=size, max_depth=max_depth)
        path = os.path.join(SCENES, name + ".sp")
        with open(path, "w") as f:
            f.write(text)
        print(f"render {name} ({integ}, {size}x{size} @ {spp}spp)...", flush=True)
        subprocess.run([args.ref, "--threads", str(args.threads),
                        "--samples", str(spp), name + ".sp"],
                       cwd=SCENES, check=True, capture_output=True)
        shutil.move(os.path.join(SCENES, name + ".pfm"),
                    os.path.join(GOLDEN, name + ".pfm"))
        manifest[name] = {"spp": spp, "integrator": integ, "size": size,
                          "max_depth": max_depth}
    _update_manifest(manifest)
    if args.headline:
        make_headline(args.ref, args.threads)
    print("done:", len(manifest), "goldens")


if __name__ == "__main__":
    main()
