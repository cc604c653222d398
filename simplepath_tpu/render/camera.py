"""Perspective camera: raster→world ray generation.

Mirrors ``/root/reference/Cameras/Camera.h:85-130``: the look-at transform,
fov scale, and film dimensions bake into four vec3s (vx, vy, vz, origin) so
ray generation is two madds and a normalize.  Unlike the reference — which
bakes once at construction — the bake runs IN-GRAPH from the user-level
parameters (eye, to, up, fov) each trace, so rays are differentiable w.r.t.
all of them (the bake is a handful of ops, traced once per compilation).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from ..core.transform import look_at
from ..core.vec import normalize
from ..scene.types import CameraArrays

__all__ = ["make_perspective_camera", "camera_vectors", "generate_ray"]


def make_perspective_camera(origin, to, up, fov_degrees, film_width: int,
                            film_height: int) -> CameraArrays:
    """Store the user parameters; the bake happens in :func:`camera_vectors`."""
    return CameraArrays(
        eye=jnp.asarray(origin, jnp.float32),
        to=jnp.asarray(to, jnp.float32),
        up=jnp.asarray(up, jnp.float32),
        fov=jnp.asarray(fov_degrees, jnp.float32),
        wh=jnp.asarray([film_width, film_height], jnp.float32))


def camera_vectors(camera: CameraArrays) -> tuple[Array, Array, Array, Array]:
    """The raster→world bake (Camera.h:99-117) → (vx, vy, vz, origin)."""
    fov_scale = 1.0 / jnp.tan(0.5 * jnp.deg2rad(camera.fov))
    c2w = look_at(camera.eye, camera.to, camera.up)
    u = c2w.linear[:, 0]
    v = c2w.linear[:, 1]
    z = c2w.linear[:, 2]
    w, h = camera.wh[0], camera.wh[1]
    vx = u
    vy = -v
    vz = (-0.5 * w) * u + (0.5 * h) * v + (0.5 * h * fov_scale) * z
    return vx, vy, vz, c2w.t


def generate_ray(camera: CameraArrays, pixel_x: Array, pixel_y: Array) -> tuple[Array, Array]:
    """(origin, direction) for raster coords; Camera.h:119-129."""
    vx, vy, vz, origin = camera_vectors(camera)
    d = (pixel_x[..., None] * vx + pixel_y[..., None] * vy + vz)
    return jnp.broadcast_to(origin, d.shape), normalize(d)
