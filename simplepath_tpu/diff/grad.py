"""Differentiable rendering: parameter pytree, loss, and train step.

The new capability the reference lacks (SURVEY §7): the render is
differentiable w.r.t. material albedo/roughness/ior, clearcoat parameters,
light radiance, and the USER-LEVEL camera parameters (eye, look-at, up,
fov — the look-at bake runs in-graph, Cameras/Camera.h:99-117).  Discrete decisions (BVH traversal,
hit selection, lobe/layer selection, RR, occlusion) are detached; continuous
quantities re-flow through the winning branch — the standard
detached-sampling estimator, matched against finite differences in
tests/test_gradients.py.

Known non-differentiable corners (documented, out of scope per BASELINE):
visibility boundaries (silhouettes) and the IBL CDF tables (built host-side;
radiance gradients flow through the radiance *lookup*, not the sampling
distribution).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..render.film import render_rays
from ..scene.types import Scene

__all__ = ["get_params", "set_params", "render_loss", "make_train_step"]


def get_params(scene: Scene) -> dict[str, Any]:
    """Extract the differentiable parameter pytree."""
    p = {
        "mat_albedo": scene.materials.albedo,
        "mat_roughness": scene.materials.roughness,
        "mat_ior": scene.materials.ior,
        "mat_cc_ior": scene.materials.cc_ior,
        "mat_cc_color": scene.materials.cc_color,
        "cam_eye": scene.camera.eye,
        "cam_to": scene.camera.to,
        "cam_up": scene.camera.up,
        "cam_fov": scene.camera.fov,
    }
    if scene.static.num_sphere_lights > 0:
        p["light_radiance"] = scene.sphere_lights.radiance
    if scene.env is not None:
        p["env_radiance"] = scene.env.radiance
        p["env_image"] = scene.env.image
    return p


def set_params(scene: Scene, params: dict[str, Any]) -> Scene:
    """Write a parameter pytree back into the scene."""
    materials = dataclasses.replace(
        scene.materials,
        albedo=params["mat_albedo"],
        roughness=params["mat_roughness"],
        ior=params["mat_ior"],
        cc_ior=params["mat_cc_ior"],
        cc_color=params["mat_cc_color"],
    )
    camera = dataclasses.replace(
        scene.camera, eye=params["cam_eye"], to=params["cam_to"],
        up=params["cam_up"], fov=params["cam_fov"])
    sphere_lights = scene.sphere_lights
    if "light_radiance" in params:
        sphere_lights = dataclasses.replace(scene.sphere_lights,
                                            radiance=params["light_radiance"])
    env = scene.env
    if env is not None and "env_radiance" in params:
        env = dataclasses.replace(env, radiance=params["env_radiance"],
                                  image=params["env_image"])
    return dataclasses.replace(scene, materials=materials, camera=camera,
                               sphere_lights=sphere_lights, env=env)


def render_loss(scene: Scene, params: dict, target_flat, xs, ys, spp: int,
                key, integrator: str | None = None):
    """MSE between a rendered pixel batch and a target."""
    scene = set_params(scene, params)
    # force the fixed-trip (reverse-differentiable) bounce loops
    scene = dataclasses.replace(
        scene, static=dataclasses.replace(scene.static, differentiable=True))
    img = render_rays(scene, xs, ys, spp, key, integrator)
    return jnp.mean((img - target_flat) ** 2)


class TrainState(NamedTuple):
    params: dict
    loss: Any


def make_train_step(scene: Scene, spp: int, integrator: str | None = None,
                    lr: float = 0.05):
    """SGD step closure: (params, target_flat, xs, ys, key) → (params, loss).

    Used by the multi-chip dry run and the inverse-rendering examples; the
    pixel batch may be sharded across a device mesh — AD's mean-reduction
    then inserts the gradient psum over the ray axis automatically.
    """

    def step(params, target_flat, xs, ys, key):
        loss, grads = jax.value_and_grad(
            lambda p: render_loss(scene, p, target_flat, xs, ys, spp, key,
                                  integrator))(params)
        new_params = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
        return new_params, loss

    return step
