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
                                                make_geom_mesh,
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


@pytest.mark.parametrize("n_rays,n_geom", [(2, 2), (4, 2), (2, 4)])
def test_sharded_2d_mesh_matches_replicated(n_rays, n_geom):
    """The production 2-D rays x geom layout: pixels sharded over RAY_AXIS,
    records over GEOM_AXIS, min-t combine as a geom-axis collective.  Must
    match the replicated mono-BVH render."""
    key = jax.random.PRNGKey(11)
    spp = 4

    ref = np.asarray(render_image_sharded(
        load_scene(BLOB), spp=spp, key=key))

    mesh = make_geom_mesh(n_geom, n_rays)
    assert mesh.shape == {"rays": n_rays, "geom": n_geom}
    scene = shard_scene_geometry(load_scene(BLOB, use_bvh=False), mesh)
    ours = np.asarray(render_image_geom_sharded(scene, spp=spp, key=key,
                                                mesh=mesh))
    assert np.max(np.abs(ours - ref)) < 1e-4, (
        f"max diff {np.max(np.abs(ours - ref))}")


def test_sharded_lucy_class_reduced(tmp_path):
    """The lucy stress scene's structure (displaced-grid terrain + glossy
    plane + env light, scenes/lucy_bench.sp / reference scenes/lucy.sp) at
    reduced scale through the geometry-sharded path on the virtual mesh —
    the shape of workload geometry sharding exists for, not just the small
    blob (VERDICT r3 task 3)."""
    from simplepath_tpu import build_scene, parse_sp
    from simplepath_tpu.io.meshgen import displaced_grid, write_ply

    v, f = displaced_grid(160)  # ~51k tris — forces the BVH path per shard
    write_ply(os.path.join(tmp_path, "terrain.ply"), v, f)
    scene_txt = """version: 1
scene_parameters {
    output_file_name: "t.pfm"
    width: 40
    height: 28
    max_depth: 4
    russian_roulette_depth: 2
    integrator: iterative_rrnee
}
perspective_camera {
    origin: 0.0 900.0 -2300.0
    look_at: 0.0 0.0 0.0
    fov: 45
}
material_glossy {
    name: "terrain"
    diffuse: 0.7 0.7 0.7
    ior: 1.3
    roughness: 0.75
}
mesh {
    file: "terrain.ply"
    material: "terrain"
}
plane {
    material: "terrain"
    translate: 0.0 -400.0 0.0
}
environment_light {
    radiance: 1.0 1.0 1.3
}
"""
    key = jax.random.PRNGKey(3)
    ref = np.asarray(render_image_sharded(
        build_scene(parse_sp(scene_txt, base_dir=str(tmp_path))),
        spp=2, key=key))

    mesh = Mesh(np.asarray(jax.devices()[:4]), (GEOM_AXIS,))
    scene = shard_scene_geometry(
        build_scene(parse_sp(scene_txt, base_dir=str(tmp_path)),
                    use_bvh=False), mesh)
    ours = np.asarray(render_image_geom_sharded(scene, spp=2, key=key,
                                                mesh=mesh))
    assert np.isfinite(ours).all() and ours.max() > 0
    # The regular grid produces exact closest-hit t-TIES between different
    # physical triangles on bounce rays; the mono traversal breaks ties by
    # visit order, the shard combine by argmin shard order, so a handful of
    # pixels legitimately diverge (diagnosed: camera hits are physically
    # identical on all rays; divergence starts at bounce 2, 0 pixels at
    # max_depth<=2, 5/1120 at depth 4).  Gate: <1% tie pixels, everything
    # else identical.
    diff = np.abs(ours - ref).max(axis=2)
    frac_bad = float((diff > 1e-3).mean())
    assert frac_bad < 0.01, f"{frac_bad:.2%} divergent pixels"
    assert float(np.abs(ours.mean() - ref.mean())) < 0.01 * ref.mean()


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


def test_cli_geom_shards_checkpoint(tmp_path):
    """--geom-shards composes with --spp-chunk/--checkpoint (round-4 review
    finding: the flags were silently dropped on the sharded path)."""
    from simplepath_tpu.cli import main
    from simplepath_tpu.io.pfm import read_pfm

    out = tmp_path / "blob.pfm"
    ck = tmp_path / "ck.npz"
    rc = main([BLOB, "--samples", "4", "--geom-shards", "2",
               "--spp-chunk", "2", "--checkpoint", str(ck),
               "--output", str(out), "--platform", "cpu", "--no-progress"])
    assert rc == 0
    assert ck.exists(), "checkpoint was not written"
    img = read_pfm(str(out))
    assert np.isfinite(img).all() and img.max() > 0

    # the checkpointed progressive render equals the one-shot sharded render
    key = jax.random.PRNGKey(0)
    mesh = Mesh(np.asarray(jax.devices()[:2]), (GEOM_AXIS,))
    scene = shard_scene_geometry(load_scene(BLOB, use_bvh=False), mesh)
    one = np.asarray(render_image_geom_sharded(scene, spp=4, key=key,
                                               mesh=mesh))
    np.testing.assert_allclose(img, one, atol=2e-6)


def test_too_many_shards_errors(tmp_path):
    from simplepath_tpu.cli import main

    with pytest.raises(SystemExit):
        main([BLOB, "--samples", "1", "--geom-shards", "64",
              "--output", str(tmp_path / "x.pfm")])


def test_geom_sharded_albedo_grad_matches_fd():
    """Autodiff THROUGH the geometry-sharded traversal (VERDICT r4 missing
    #2): the shard_map pmin/psum combine runs on stop_gradient'd inputs and
    the winning triangle is re-intersected differentiably
    (traverse.scene_intersect_batch), so the geom_shard.py claim that
    'the entire downstream pipeline (shading, NEE, autodiff) is unchanged'
    must hold literally — the blob material's albedo gradient through a
    4-shard forest has to match central finite differences AND the
    replicated-path gradient."""
    import jax.numpy as jnp

    from simplepath_tpu.diff.grad import get_params, render_loss
    from simplepath_tpu.parallel.geom_shard import set_geom_mesh

    mesh = Mesh(np.asarray(jax.devices()[:4]), (GEOM_AXIS,))
    scene = shard_scene_geometry(load_scene(BLOB, use_bvh=False), mesh)
    assert scene.static.geom_shards == 4

    # a 12x12 pixel subsample of the 48x48 frame keeps the FD evals cheap
    g = np.arange(6, 48, 4, dtype=np.int32)
    xs_g, ys_g = np.meshgrid(g, g, indexing="xy")
    xs = jnp.asarray(xs_g.reshape(-1))
    ys = jnp.asarray(ys_g.reshape(-1))
    key = jax.random.PRNGKey(2)
    params = get_params(scene)
    target = jnp.full((xs.shape[0], 3), 0.25, jnp.float32)

    with set_geom_mesh(mesh):
        def loss(p):
            return render_loss(scene, p, target, xs, ys, spp=2, key=key)

        loss_jit = jax.jit(loss)
        grads = jax.jit(jax.grad(loss))(params)
        assert all(bool(jnp.isfinite(x).all())
                   for x in jax.tree_util.tree_leaves(grads))

        # material 1 = "red" (the blob's): FD on its red channel
        eps = 1e-3
        pp = dict(params)
        pp["mat_albedo"] = params["mat_albedo"].at[1, 0].add(eps)
        pm = dict(params)
        pm["mat_albedo"] = params["mat_albedo"].at[1, 0].add(-eps)
        g_fd = (float(loss_jit(pp)) - float(loss_jit(pm))) / (2 * eps)

    g_ad = float(grads["mat_albedo"][1, 0])
    tol = max(0.08 * max(abs(g_fd), abs(g_ad)), 2e-3)
    assert abs(g_ad - g_fd) < tol, f"ad={g_ad:.6f} fd={g_fd:.6f}"
    assert abs(g_ad) > 1e-5, "geom-sharded albedo gradient is zero"

    # and the sharded gradient equals the replicated-path gradient
    scene_rep = load_scene(BLOB)
    params_rep = get_params(scene_rep)
    g_rep = jax.jit(jax.grad(lambda p: render_loss(
        scene_rep, p, target, xs, ys, spp=2, key=key)))(params_rep)
    g_rep_v = float(g_rep["mat_albedo"][1, 0])
    assert abs(g_ad - g_rep_v) < max(0.05 * abs(g_rep_v), 1e-4), \
        f"sharded {g_ad} vs replicated {g_rep_v}"


def test_geom_sharded_2d_train_step():
    """Training over the full dp x tp layout: pixel batch sharded over
    RAY_AXIS, forest over GEOM_AXIS, one SGD step — SPMD AD inserts the
    gradient psum over the rays axis while the detached forest combine
    runs over the geom axis.  The updated albedo must match the
    replicated-scene train step (same batch/key; geom tie-breaks and
    reduction partitioning allow small fp drift)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from simplepath_tpu.diff.grad import get_params, make_train_step
    from simplepath_tpu.parallel.geom_shard import (RAY_AXIS, make_geom_mesh,
                                                    set_geom_mesh)

    mesh = make_geom_mesh(2, 4)  # 4 ray blocks x 2 forest shards = 8 devices
    scene = shard_scene_geometry(load_scene(BLOB, use_bvh=False), mesh)

    g = np.arange(2, 48, 4, dtype=np.int32)  # 12x12 subsample, 144 % 4 == 0
    xs_g, ys_g = np.meshgrid(g, g, indexing="xy")
    ray_sh = NamedSharding(mesh, P(RAY_AXIS))
    xs = jax.device_put(jnp.asarray(xs_g.reshape(-1)), ray_sh)
    ys = jax.device_put(jnp.asarray(ys_g.reshape(-1)), ray_sh)
    target = jax.device_put(jnp.full((xs.shape[0], 3), 0.25, jnp.float32),
                            ray_sh)
    rep = NamedSharding(mesh, P())
    params = jax.tree_util.tree_map(lambda a: jax.device_put(a, rep),
                                    get_params(scene))
    key = jax.random.PRNGKey(2)

    with set_geom_mesh(mesh):
        step = jax.jit(make_train_step(scene, spp=2))
        new_params, loss = step(params, target, xs, ys, key)
        new_params = jax.tree_util.tree_map(np.asarray, new_params)
    assert np.isfinite(float(loss))

    # replicated-path reference: same batch, same key, plain scene
    scene_rep = load_scene(BLOB)
    params_rep = get_params(scene_rep)
    step_rep = jax.jit(make_train_step(scene_rep, spp=2))
    ref_params, ref_loss = step_rep(params_rep,
                                    jnp.full((144, 3), 0.25, jnp.float32),
                                    jnp.asarray(xs_g.reshape(-1)),
                                    jnp.asarray(ys_g.reshape(-1)), key)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)
    d_new = new_params["mat_albedo"] - np.asarray(params_rep["mat_albedo"])
    d_ref = np.asarray(ref_params["mat_albedo"]) \
        - np.asarray(params_rep["mat_albedo"])
    assert np.abs(d_new).max() > 1e-7, "no update"
    np.testing.assert_allclose(d_new, d_ref, rtol=0.05, atol=1e-6)
