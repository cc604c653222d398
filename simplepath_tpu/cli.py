"""Command-line render driver.

Mirrors the reference's CLI (``/root/reference/main.cpp:308-405``):

    python -m simplepath_tpu.cli [--samples N] [--integrator NAME]
                                 [--spp-chunk N] [--checkpoint PATH]
                                 [--test] <scene.sp | ->

``--threads`` is accepted for drop-in compatibility but ignored (the device
replaces the thread pool).  ``--integrator`` overrides the scene, which
overrides the DirectLighting default (main.cpp:387-392).  ``--test`` runs
the built-in test suite like the reference's UnitTests path.  Output is
written to the scene's ``output_file_name`` next to the scene file.

Rendering always goes through the sharded, ray-chunked path (bounded device
memory at any resolution; multi-device meshes shard the pixel axis).  With
``--spp-chunk`` or ``--checkpoint`` the render runs progressively in
spp-chunk passes — resumable, with a progress bar — and sample streams are
keyed by absolute sample index so the result is identical to an
uninterrupted render.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time

from .scene.types import INTEGRATORS

logger = logging.getLogger("simplepath_tpu")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="simplepath_tpu",
        description="TPU-native differentiable path tracer (SimplePath-compatible)")
    ap.add_argument("scene", help=".sp scene file, or '-' for stdin")
    ap.add_argument("--samples", type=int, default=1,
                    help="samples per pixel (default 1, like the reference)")
    ap.add_argument("--threads", type=int, default=None,
                    help="accepted for compatibility; ignored (device-parallel)")
    ap.add_argument("--integrator", choices=INTEGRATORS, default=None)
    ap.add_argument("--test", action="store_true", help="run unit tests and exit")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu)")
    ap.add_argument("--output", default=None, help="override output file name")
    ap.add_argument("--stats", action="store_true", help="print render stats")
    ap.add_argument("--spp-chunk", type=int, default=0,
                    help="render progressively in passes of N spp "
                         "(default: one pass)")
    ap.add_argument("--checkpoint", default=None, metavar="PATH",
                    help="save film+spp checkpoints to PATH and resume from "
                         "it (implies progressive rendering)")
    ap.add_argument("--no-progress", action="store_true",
                    help="disable the progress bar in progressive mode")
    ap.add_argument("--geom-shards", type=int, default=0, metavar="N",
                    help="shard the BVH across N devices (geometry/'model' "
                         "parallelism for scenes too large to replicate); "
                         "rays are replicated instead of sharded")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of the render into "
                         "DIR (view with TensorBoard / xprof)")
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(levelname)s: %(message)s")

    if args.test:
        import pytest
        return pytest.main(["-q", os.path.join(os.path.dirname(__file__),
                                               os.pardir, "tests")])

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from . import load_scene, parse_sp
    from .io.pfm import write_image
    from .scene.build import build_scene

    t0 = time.time()
    use_bvh = False if args.geom_shards > 1 else None  # sharding rebuilds it
    if args.scene == "-":
        ps = parse_sp(sys.stdin.read())
        scene = build_scene(ps, cli_integrator=args.integrator, use_bvh=use_bvh)
        out_dir = os.getcwd()
    else:
        scene = load_scene(args.scene, cli_integrator=args.integrator,
                           use_bvh=use_bvh)
        out_dir = os.path.dirname(os.path.abspath(args.scene))
    t_parse = time.time() - t0

    import contextlib
    prof = (jax.profiler.trace(args.profile) if args.profile
            else contextlib.nullcontext())

    t0 = time.time()
    with prof:
        img = _render(ap, args, scene, out_dir)
    t_render = time.time() - t0

    out = args.output or os.path.join(out_dir, scene.static.output_file_name)
    import numpy as np
    write_image(out, np.asarray(img))

    w, h = scene.static.width, scene.static.height
    rays = w * h * args.samples
    print(f"Wrote {out}")
    if args.profile:
        print(f"Profiler trace written to {args.profile}")
    elapsed = t_parse + t_render
    hh, rem = divmod(int(elapsed), 3600)
    mm, ss = divmod(rem, 60)
    cc = int((elapsed - int(elapsed)) * 100)
    print(f"Elapsed time: {hh:02d}:{mm:02d}:{ss:02d}.{cc:02d}")
    if args.stats:
        print(f"parse: {t_parse:.2f}s  render: {t_render:.2f}s  "
              f"primary rays/s: {rays / max(t_render, 1e-9):,.0f}")
    return 0


def _render(ap, args, scene, out_dir):
    """Dispatch to the right render path; returns the finished film."""
    import jax

    from .parallel.mesh import render_image_sharded
    from .render.film import render_image_progressive

    if args.geom_shards > 1:
        import numpy as np
        from jax.sharding import Mesh

        from .parallel.geom_shard import (GEOM_AXIS,
                                          render_image_geom_sharded,
                                          shard_scene_geometry)
        devs = jax.devices()
        if len(devs) < args.geom_shards:
            ap.error(f"--geom-shards {args.geom_shards} but only "
                     f"{len(devs)} device(s) visible")
        mesh = Mesh(np.asarray(devs[:args.geom_shards]), (GEOM_AXIS,))
        try:
            scene = shard_scene_geometry(scene, mesh, cache_dir=out_dir)
        except ValueError as e:
            ap.error(str(e))
        if bool(args.checkpoint) or (0 < args.spp_chunk < args.samples):
            # progressive/checkpointed passes compose with geometry
            # sharding: each pass renders absolute sample offsets through
            # the sharded forest
            chunk = args.spp_chunk or min(16, args.samples)
            img = render_image_progressive(
                scene, args.samples, jax.random.PRNGKey(args.seed),
                chunk=chunk, checkpoint_path=args.checkpoint,
                progress=not args.no_progress,
                render_fn=lambda scene, spp, key, integrator=None,
                spp_offset=0: render_image_geom_sharded(
                    scene, spp, key, mesh=mesh, integrator=integrator,
                    spp_offset=spp_offset))
        else:
            img = render_image_geom_sharded(scene, args.samples,
                                            jax.random.PRNGKey(args.seed),
                                            mesh=mesh)
    elif bool(args.checkpoint) or (0 < args.spp_chunk < args.samples):
        chunk = args.spp_chunk or min(16, args.samples)
        img = render_image_progressive(
            scene, args.samples, jax.random.PRNGKey(args.seed), chunk=chunk,
            checkpoint_path=args.checkpoint, progress=not args.no_progress)
    else:
        img = render_image_sharded(scene, args.samples,
                                   jax.random.PRNGKey(args.seed))
    img.block_until_ready()
    return img


if __name__ == "__main__":
    sys.exit(main())
