"""Gradient correctness: autodiff vs central finite differences.

The BASELINE metric "pixel-gradient max abs error vs finite differences"
for material albedo/roughness, light radiance, and camera parameters.
Because the renderer is deterministic given the RNG key, finite differences
use common random numbers — the FD estimate is exact up to O(eps²) except
where a discrete decision (lobe select, RR, occlusion) flips inside the
eps-interval; tolerances account for that.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simplepath_tpu import build_scene, parse_sp
from simplepath_tpu.diff.grad import get_params, render_loss, set_params

SCENE = """version: 1

scene_parameters {
    output_file_name: "g.pfm"
    width: 16
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

material_glossy {
    name: "shiny"
    diffuse: 0.6 0.3 0.2
    ior: 1.6
    roughness: 0.4
}

sphere {
    translate: -0.5 1.0 0.0
    material: "shiny"
}

sphere {
    translate: 1.0 0.6 0.5
    scale: 0.6 0.6 0.6
    material: "blue"
}

plane {
    material: "blue"
}

sphere_light {
    translate: 0.0 4.0 0.0
    radiance: 10.0 10.0 10.0
}

environment_light {
    radiance: 0.3 0.35 0.4
}
"""


@pytest.fixture(scope="module")
def setup():
    scene = build_scene(parse_sp(SCENE))
    n = 16 * 16
    xs = jnp.arange(n, dtype=jnp.int32) % 16
    ys = jnp.arange(n, dtype=jnp.int32) // 16
    key = jax.random.PRNGKey(3)
    params = get_params(scene)
    target = jnp.full((n, 3), 0.25, jnp.float32)

    def loss(p):
        return render_loss(scene, p, target, xs, ys, spp=4, key=key)

    loss_jit = jax.jit(loss)
    grads = jax.jit(jax.grad(loss))(params)
    return loss_jit, params, grads


def fd(loss, params, path, idx, eps):
    def bump(sign):
        p = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
        arr = p[path]
        p[path] = arr.at[idx].add(sign * eps)
        return float(loss(p))
    return (bump(+1) - bump(-1)) / (2 * eps)


@pytest.mark.parametrize("path,idx,eps", [
    ("mat_albedo", (0, 0), 1e-3),        # shiny diffuse r
    ("mat_albedo", (1, 2), 1e-3),        # blue diffuse b
    ("mat_roughness", (0,), 1e-3),
    ("light_radiance", (0, 1), 1e-2),
    ("env_radiance", (0,), 1e-3),
    ("cam_eye", (2,), 1e-4),
    # direction-changing params shift silhouettes; FD needs a small eps so
    # the continuous term dominates the (detached) visibility flips —
    # measured: fd(3e-5)=0.01453 vs ad=0.01441, while fd(1e-4..1e-3) swings
    # between -0.94 and +0.31 from discrete hit-selection flips
    ("cam_to", (1,), 3e-5),
    ("cam_fov", (), 3e-4),   # fd stabilizes ≤3e-4 (silhouette flips above)
])
def test_grad_matches_fd(setup, path, idx, eps):
    loss, params, grads = setup
    g_ad = float(grads[path][idx])
    g_fd = fd(loss, params, path, idx, eps)
    tol = max(0.08 * max(abs(g_fd), abs(g_ad)), 2e-3)
    assert abs(g_ad - g_fd) < tol, f"{path}{idx}: ad={g_ad:.6f} fd={g_fd:.6f}"


def test_grad_spp32_remat_compiles_and_matches_fd():
    """High-spp reverse mode: with jax.checkpoint around the spp and bounce
    loops, a 32-spp differentiable render must compile, produce finite
    grads, and match spp-accumulated central finite differences (VERDICT
    round-1 item 6; SURVEY §5 checkpointed-scan row)."""
    scene = build_scene(parse_sp(SCENE))
    n = 8 * 8
    xs = jnp.arange(n, dtype=jnp.int32) % 8
    ys = jnp.arange(n, dtype=jnp.int32) // 8
    key = jax.random.PRNGKey(11)
    params = get_params(scene)
    target = jnp.full((n, 3), 0.25, jnp.float32)

    def loss(p):
        return render_loss(scene, p, target, xs, ys, spp=32, key=key)

    loss_jit = jax.jit(loss)
    grads = jax.jit(jax.grad(loss))(params)
    g_ad = float(grads["mat_albedo"][1, 2])
    assert all(bool(jnp.isfinite(g).all()) for g in
               jax.tree_util.tree_leaves(grads))

    eps = 1e-3
    g_fd = fd(loss_jit, params, "mat_albedo", (1, 2), eps)
    tol = max(0.08 * max(abs(g_fd), abs(g_ad)), 2e-3)
    assert abs(g_ad - g_fd) < tol, f"ad={g_ad:.6f} fd={g_fd:.6f}"


def test_gradients_nonzero(setup):
    _, _, grads = setup
    assert float(jnp.abs(grads["mat_albedo"]).sum()) > 0
    assert float(jnp.abs(grads["light_radiance"]).sum()) > 0
    assert float(jnp.abs(grads["cam_eye"]).sum()) > 0
    assert float(jnp.abs(grads["cam_fov"]).sum()) > 0


# ------------------------------------------------------------------ mesh

MESH_SCENE = """version: 1

scene_parameters {
    output_file_name: "gm.pfm"
    width: 16
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
    name: "red"
    diffuse: 0.6 0.2 0.2
}

material_lambertian {
    name: "grey"
    diffuse: 0.5 0.5 0.5
}

mesh {
    file: "ico.ply"
    translate: 0.0 1.0 0.0
    material: "red"
}

plane {
    material: "grey"
}

sphere_light {
    translate: 0.0 4.0 0.0
    radiance: 10.0 10.0 10.0
}
"""


def test_mesh_albedo_grad_matches_fd(tmp_path):
    """FD-gradient on a MESH scene (VERDICT r3 task 6): autodiff through
    the triangle/BVH traversal path must match finite differences on the
    mesh material's albedo — the flagship geometry pipeline, not just the
    analytic-sphere path the other cases cover."""
    import os

    from simplepath_tpu.io.meshgen import icosphere, write_ply

    v, f = icosphere(1)  # 80 faces -> above BVH_MIN_TRIS, BVH path active
    write_ply(os.path.join(tmp_path, "ico.ply"), v.astype(np.float32), f)
    scene = build_scene(parse_sp(MESH_SCENE, base_dir=str(tmp_path)))
    assert scene.static.num_triangles == 80 and scene.static.has_bvh

    n = 16 * 16
    xs = jnp.arange(n, dtype=jnp.int32) % 16
    ys = jnp.arange(n, dtype=jnp.int32) // 16
    key = jax.random.PRNGKey(5)
    params = get_params(scene)
    target = jnp.full((n, 3), 0.25, jnp.float32)

    def loss(p):
        return render_loss(scene, p, target, xs, ys, spp=4, key=key)

    loss_jit = jax.jit(loss)
    grads = jax.jit(jax.grad(loss))(params)
    assert all(bool(jnp.isfinite(g).all()) for g in
               jax.tree_util.tree_leaves(grads))

    # material 0 = "red" (the mesh's): FD on its red channel
    g_ad = float(grads["mat_albedo"][0, 0])
    g_fd = fd(loss_jit, params, "mat_albedo", (0, 0), 1e-3)
    tol = max(0.08 * max(abs(g_fd), abs(g_ad)), 2e-3)
    assert abs(g_ad - g_fd) < tol, f"ad={g_ad:.6f} fd={g_fd:.6f}"
    assert abs(g_ad) > 1e-5, "mesh albedo gradient is zero"
