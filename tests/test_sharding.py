"""Multi-device sharding: rendering and training over a virtual 8-CPU mesh.

The fake-backend story the reference lacks (SURVEY §4): conftest forces
XLA_FLAGS=--xla_force_host_platform_device_count=8, so these tests validate
the real pjit/sharding path without TPU hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simplepath_tpu import build_scene, parse_sp, render_image
from simplepath_tpu.parallel.mesh import (make_ray_mesh, render_image_sharded,
                                          replicate_scene, shard_pixels)

SCENE = """version: 1

scene_parameters {
    output_file_name: "s.pfm"
    width: 24
    height: 16
    max_depth: 3
    integrator: iterative_rrnee
}

perspective_camera {
    origin: 0.0 2.0 5.0
    look_at: 0.0 1.0 0.0
    fov: 45
}

material_lambertian {
    name: "blue"
    diffuse: 0.2 0.3 0.7
}

sphere {
    translate: 0.0 1.0 0.0
    material: "blue"
}

plane {
    material: "blue"
}

sphere_light {
    translate: 0.0 4.0 0.0
    radiance: 10.0 10.0 10.0
}
"""


@pytest.fixture(scope="module")
def scene():
    return build_scene(parse_sp(SCENE))


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_render_matches_single(scene):
    key = jax.random.PRNGKey(5)
    img_single = np.asarray(render_image(scene, spp=2, key=key))
    mesh = make_ray_mesh()
    img_sharded = np.asarray(render_image_sharded(scene, 2, key, mesh))
    np.testing.assert_allclose(img_sharded, img_single, atol=1e-5)


def test_sharded_pixels_placement(scene):
    mesh = make_ray_mesh()
    xs = jnp.arange(24 * 16, dtype=jnp.int32) % 24
    ys = jnp.arange(24 * 16, dtype=jnp.int32) // 24
    xs_s, ys_s, n = shard_pixels(mesh, xs, ys)
    assert n == 24 * 16
    assert len(xs_s.sharding.device_set) == 8


def test_sharded_train_step(scene):
    """Gradient all-reduce across the ray axis must produce identical params
    on every device (SPMD inserts the psum)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from simplepath_tpu.diff.grad import get_params, make_train_step

    mesh = make_ray_mesh()
    xs = jnp.arange(8 * 8, dtype=jnp.int32) % 8
    ys = jnp.arange(8 * 8, dtype=jnp.int32) // 8
    xs_s, ys_s, n = shard_pixels(mesh, xs, ys)
    sc = replicate_scene(mesh, scene)
    params = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P())), get_params(sc))
    target = jax.device_put(jnp.zeros((xs_s.shape[0], 3)),
                            NamedSharding(mesh, P("rays")))
    step = jax.jit(make_train_step(sc, spp=1))
    new_params, loss = step(params, target, xs_s, ys_s, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    # updated params stay replicated
    assert len(new_params["mat_albedo"].sharding.device_set) == 8


def test_spp_split_dispatch_matches_single(scene, monkeypatch):
    """The TPU-fallback watchdog guard splits spp across dispatches
    (mesh._spp_splits); absolute spp offsets must make the split image
    bit-identical (up to fp accumulation) to the one-dispatch render."""
    import simplepath_tpu.parallel.mesh as pm

    key = jax.random.PRNGKey(7)
    mesh = make_ray_mesh()
    one = np.asarray(render_image_sharded(scene, 6, key, mesh))
    monkeypatch.setattr(pm, "_spp_splits",
                        lambda spp: [(0, 2), (2, 2), (4, 2)])
    split = np.asarray(render_image_sharded(scene, 6, key, mesh))
    np.testing.assert_allclose(split, one, atol=2e-6)


def test_progressive_offset_composition():
    """Progressive passes with absolute spp offsets compose to the one-shot
    film (resume-identical sample streams; main.cpp multi-pass scaffolding
    grown into a real capability)."""
    import numpy as np

    from simplepath_tpu import build_scene, parse_sp, render_image
    from simplepath_tpu.render.film import render_image_progressive

    scene = build_scene(parse_sp(SCENE))
    key = jax.random.PRNGKey(5)
    one = np.asarray(render_image(scene, spp=6, key=key))
    prog = np.asarray(render_image_progressive(scene, 6, key, chunk=2))
    np.testing.assert_allclose(prog, one, atol=2e-6)
