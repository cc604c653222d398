"""Perspective camera: raster→world ray generation.

Mirrors ``/root/reference/Cameras/Camera.h:85-130``: the look-at transform,
fov scale, and film dimensions are baked into four vec3s (vx, vy, vz, origin)
so ray generation is two madds and a normalize — differentiable w.r.t. all
camera parameters.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import Array

from ..core.transform import look_at
from ..core.vec import normalize
from ..scene.types import CameraArrays

__all__ = ["make_perspective_camera", "generate_ray"]


def make_perspective_camera(origin, to, up, fov_degrees, film_width: int,
                            film_height: int) -> CameraArrays:
    """Build the raster→world transform (Camera.h:99-117)."""
    fov_scale = 1.0 / jnp.tan(0.5 * jnp.deg2rad(jnp.asarray(fov_degrees, jnp.float32)))
    c2w = look_at(origin, to, up)
    u = c2w.linear[:, 0]
    v = c2w.linear[:, 1]
    z = c2w.linear[:, 2]
    vx = u
    vy = -v
    vz = (-0.5 * film_width) * u + (0.5 * film_height) * v + (0.5 * film_height * fov_scale) * z
    return CameraArrays(vx=vx, vy=vy, vz=vz, origin=c2w.t)


def generate_ray(camera: CameraArrays, pixel_x: Array, pixel_y: Array) -> tuple[Array, Array]:
    """(origin, direction) for raster coords; Camera.h:119-129."""
    d = (pixel_x[..., None] * camera.vx
         + pixel_y[..., None] * camera.vy
         + camera.vz)
    return jnp.broadcast_to(camera.origin, d.shape), normalize(d)
