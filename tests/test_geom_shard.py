"""Geometry ("model") sharding: the BVH forest split across a device mesh.

A geometry-sharded render must be pixel-identical (up to fp noise) to the
replicated mono-BVH render: the Morton-sliced sub-BVHs cover the same
triangle soup, the min-t/OR shard combine picks the same closest hit, and
the globally reordered triangle tables keep shading/NEE unchanged
(parallel/geom_shard.py).  Runs on the virtual 8-CPU mesh from conftest —
the fake-backend story for the SURVEY §2 "model parallel" row.
"""

import os

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from simplepath_tpu import load_scene
from simplepath_tpu.parallel.geom_shard import (GEOM_AXIS,
                                                render_image_geom_sharded,
                                                shard_scene_geometry)
from simplepath_tpu.parallel.mesh import render_image_sharded

HERE = os.path.dirname(os.path.abspath(__file__))
SCENES = os.path.join(HERE, "scenes")
BLOB = os.path.join(SCENES, "g_blob.sp")


@pytest.mark.parametrize("n_shards", [2, 4])
def test_sharded_matches_replicated(n_shards):
    key = jax.random.PRNGKey(11)
    spp = 4

    ref = np.asarray(render_image_sharded(
        load_scene(BLOB), spp=spp, key=key))

    mesh = Mesh(np.asarray(jax.devices()[:n_shards]), (GEOM_AXIS,))
    scene = shard_scene_geometry(load_scene(BLOB, use_bvh=False), mesh)
    assert scene.static.geom_shards == n_shards
    assert scene.bvh.records.shape[0] == n_shards
    ours = np.asarray(render_image_geom_sharded(scene, spp=spp, key=key,
                                                mesh=mesh))

    # same estimator, same RNG streams; only fp association differs
    assert np.max(np.abs(ours - ref)) < 1e-4, (
        f"max diff {np.max(np.abs(ours - ref))}")


def test_cli_geom_shards(tmp_path):
    """The --geom-shards flag end-to-end: parse → shard → render → write."""
    from simplepath_tpu.cli import main

    out = tmp_path / "blob.pfm"
    rc = main([BLOB, "--samples", "2", "--geom-shards", "2",
               "--output", str(out), "--platform", "cpu"])
    assert rc == 0
    from simplepath_tpu.io.pfm import read_pfm
    img = read_pfm(str(out))
    assert img.shape == (48, 48, 3)
    assert np.isfinite(img).all() and img.max() > 0


def test_too_many_shards_errors(tmp_path):
    from simplepath_tpu.cli import main

    with pytest.raises(SystemExit):
        main([BLOB, "--samples", "1", "--geom-shards", "64",
              "--output", str(tmp_path / "x.pfm")])
