"""Sampling warp functions in the local y-up frame.

Mirrors ``/root/reference/math/Sampling.{h,cpp}`` exactly: the local frame is
right-handed y-up, so the "primary" axis for hemispheres is +y
(Sampling.h:12-16).  Every function is vectorized over leading batch axes and
differentiable w.r.t. ``u``.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import Array

from .vec import vec3, safe_sqrt

PI = math.pi
TWO_PI = 2.0 * math.pi
INV_PI = 1.0 / math.pi

__all__ = [
    "sample_to_uniform_sphere",
    "uniform_sphere_pdf",
    "sample_to_uniform_hemisphere",
    "uniform_hemisphere_pdf",
    "sample_to_concentric_disk",
    "sample_to_cosine_hemisphere",
    "cosine_hemisphere_pdf",
    "sample_to_uniform_cone",
    "uniform_cone_pdf",
    "spherical_direction",
    "spherical_theta",
    "spherical_phi",
]


def sample_to_uniform_sphere(u: Array) -> Array:
    """Uniform direction on S²; matches Sampling.h:20-26 (z is the polar axis
    in the reference's formula even though the frame is y-up — reproduced)."""
    z = 1.0 - 2.0 * u[..., 0]
    r = safe_sqrt(1.0 - z * z)
    phi = TWO_PI * u[..., 1]
    return vec3(r * jnp.cos(phi), r * jnp.sin(phi), z)


def uniform_sphere_pdf() -> float:
    return 1.0 / (4.0 * PI)


def sample_to_uniform_hemisphere(u: Array) -> Array:
    """Uniform over the y>0 hemisphere (Sampling.h:33-39)."""
    y = u[..., 0]
    r = safe_sqrt(1.0 - y * y)
    phi = TWO_PI * u[..., 1]
    return vec3(r * jnp.cos(phi), y, r * jnp.sin(phi))


def uniform_hemisphere_pdf() -> float:
    return 1.0 / (2.0 * PI)


def sample_to_concentric_disk(u: Array) -> Array:
    """Shirley–Chiu concentric disk map (Sampling.cpp:10-34), branchless."""
    ox = 2.0 * u[..., 0] - 1.0
    oy = 2.0 * u[..., 1] - 1.0
    use_x = jnp.abs(ox) > jnp.abs(oy)
    r = jnp.where(use_x, ox, oy)
    # Guard the divisions; degenerate origin handled by the r==0 select below.
    safe_ox = jnp.where(ox == 0.0, 1.0, ox)
    safe_oy = jnp.where(oy == 0.0, 1.0, oy)
    theta = jnp.where(use_x,
                      (PI / 4.0) * (oy / safe_ox),
                      (PI / 2.0) - (PI / 4.0) * (ox / safe_oy))
    degenerate = (ox == 0.0) & (oy == 0.0)
    r = jnp.where(degenerate, 0.0, r)
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def sample_to_cosine_hemisphere(u: Array) -> Array:
    """Cosine-weighted hemisphere via concentric disk (Sampling.h:46-51)."""
    d = sample_to_concentric_disk(u)
    y = safe_sqrt(1.0 - d[..., 0] ** 2 - d[..., 1] ** 2)
    return vec3(d[..., 0], y, d[..., 1])


def cosine_hemisphere_pdf(cos_theta: Array) -> Array:
    return cos_theta * INV_PI


def sample_to_uniform_cone(u: Array, cos_theta_max: Array) -> Array:
    """Uniform in a cone around +y (Sampling.h:58-64)."""
    cos_theta = (1.0 - u[..., 0]) + u[..., 0] * cos_theta_max
    sin_theta = safe_sqrt(1.0 - cos_theta * cos_theta)
    phi = u[..., 1] * TWO_PI
    return vec3(jnp.cos(phi) * sin_theta, cos_theta, jnp.sin(phi) * sin_theta)


def uniform_cone_pdf(cos_theta_max: Array) -> Array:
    return 1.0 / (TWO_PI * (1.0 - cos_theta_max))


def spherical_direction(sin_theta: Array, cos_theta: Array, phi: Array) -> Array:
    """y-up spherical direction (Sampling.h:71-74)."""
    return vec3(sin_theta * jnp.cos(phi), cos_theta, sin_theta * jnp.sin(phi))


def spherical_theta(v: Array) -> Array:
    return jnp.arccos(jnp.clip(v[..., 1], -0.9999999, 0.9999999))


def spherical_phi(v: Array) -> Array:
    p = jnp.arctan2(v[..., 2], v[..., 0])
    return jnp.where(p < 0.0, p + TWO_PI, p)
