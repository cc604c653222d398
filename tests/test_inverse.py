"""Inverse rendering: the differentiable renderer works as a CAPABILITY.

The gradient tests (test_gradients.py) prove per-parameter FD agreement;
these prove the actual use case the reference lacks (SURVEY §7 "new
capability"): optimizing scene parameters from a target render until the
image — and the parameters — are recovered.

Scene-scale identifiability note, measured while writing this test: with a
single sphere light illuminating everything, albedo and radiance are only
jointly identifiable through their PRODUCT (a joint solve from a 0.027 loss
converged to 0.00024 with albedo*radiance within 3% of truth per channel,
but each factor off by ~2x).  So the recovery gate is albedo-only with
known lighting; the joint solve asserts loss convergence and the physically
identifiable product.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

optax = pytest.importorskip("optax")  # undeclared optional dep

from simplepath_tpu import build_scene, parse_sp
from simplepath_tpu.diff.grad import get_params, render_loss
from simplepath_tpu.render.film import render_rays

SCENE = """version: 1

scene_parameters {
    output_file_name: "inv.pfm"
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
def problem():
    scene = build_scene(parse_sp(SCENE))
    n = 16 * 16
    xs = jnp.arange(n, dtype=jnp.int32) % 16
    ys = jnp.arange(n, dtype=jnp.int32) // 16
    key = jax.random.PRNGKey(9)
    p_true = get_params(scene)
    # target rendered through the SAME fixed-trip differentiable graph the
    # loss uses, so the optimum is exactly loss == 0 at the true params
    sc_d = dataclasses.replace(
        scene, static=dataclasses.replace(scene.static, differentiable=True))
    target = render_rays(sc_d, xs, ys, 4, key)
    loss_grad = jax.jit(jax.value_and_grad(
        lambda p: render_loss(scene, p, target, xs, ys, 4, key)))
    return scene, p_true, loss_grad


def _optimize(p0, loss_grad, trainable, steps, lr):
    opt = optax.adam(lr)
    params, state = p0, opt.init(p0)
    loss0 = float(loss_grad(p0)[0])
    loss = loss0
    for _ in range(steps):
        loss, g = loss_grad(params)
        g = {k: (v if k in trainable else jnp.zeros_like(v))
             for k, v in g.items()}
        updates, state = opt.update(g, state)
        params = optax.apply_updates(params, updates)
    return params, loss0, float(loss)


def test_inverse_albedo_recovery(problem):
    """From a flat 0.5 albedo guess under known lighting, 60 Adam steps on
    the 4-spp differentiable render recover the true albedo to <0.05 and
    drop the loss by far more than 10x (measured: ~4000x, max err 0.005)."""
    scene, p_true, loss_grad = problem
    p0 = dict(p_true)
    p0["mat_albedo"] = jnp.full_like(p_true["mat_albedo"], 0.5)
    params, loss0, lossN = _optimize(p0, loss_grad, {"mat_albedo"},
                                     steps=60, lr=0.05)
    assert loss0 / max(lossN, 1e-30) >= 10, (loss0, lossN)
    err = np.abs(np.asarray(params["mat_albedo"])
                 - np.asarray(p_true["mat_albedo"])).max()
    assert err < 0.05, f"albedo recovery error {err}"


def test_inverse_joint_albedo_radiance(problem):
    """Joint albedo + light-radiance solve from a far-off initialization:
    loss must drop >= 10x and the identifiable quantity — the per-channel
    albedo*radiance product — must land within 10% of truth (see module
    docstring for why the individual factors are not identifiable here)."""
    scene, p_true, loss_grad = problem
    p0 = dict(p_true)
    p0["mat_albedo"] = jnp.full_like(p_true["mat_albedo"], 0.5)
    p0["light_radiance"] = jnp.full_like(p_true["light_radiance"], 5.0)
    params, loss0, lossN = _optimize(
        p0, loss_grad, {"mat_albedo", "light_radiance"}, steps=60, lr=0.1)
    assert loss0 / max(lossN, 1e-30) >= 10, (loss0, lossN)
    prod = (np.asarray(params["mat_albedo"])[0]
            * np.asarray(params["light_radiance"])[0])
    prod_true = (np.asarray(p_true["mat_albedo"])[0]
                 * np.asarray(p_true["light_radiance"])[0])
    rel = np.abs(prod - prod_true) / prod_true
    assert rel.max() < 0.10, f"albedo*radiance off by {rel}"
