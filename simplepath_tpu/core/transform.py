"""Affine transforms as (3x3 linear, translation) array pairs.

TPU-native equivalent of ``/root/reference/math/AffineSpace.h`` /
``LinearSpace3x3.h`` / ``Transformation.h``.  A transform is represented by a
``[..., 3, 3]`` matrix whose COLUMNS are the images of the basis vectors
(matching the reference's col-major ``LinearSpace3x3``) plus a ``[..., 3]``
translation.  Like the reference (`Transformation.h:37-107`) we precompute and
carry the inverse alongside the forward transform.

Reference quirk reproduced deliberately: normals are transformed by the plain
linear matrix, NOT the inverse transpose (AffineSpace.h:93-96,
Transformation.h:70-73).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np
from jax import Array

from .vec import cross, matvec3, normalize

__all__ = [
    "Affine",
    "affine_identity",
    "affine_translate",
    "affine_rotate",
    "affine_scale",
    "affine_compose",
    "affine_inverse",
    "apply_point",
    "apply_vector",
    "apply_normal",
    "look_at",
    "Transform",
    "transform_identity",
    "transform_compose",
]


class Affine(NamedTuple):
    """linear: [...,3,3] (columns = basis images), t: [...,3]."""
    linear: Array
    t: Array


class Transform(NamedTuple):
    """Forward + inverse pair (Transformation.h:37-107)."""
    fwd: Affine
    inv: Affine


def _np(x):
    return np.asarray(x, dtype=np.float32)


def affine_identity() -> Affine:
    return Affine(jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32))


def affine_translate(p) -> Affine:
    return Affine(jnp.eye(3, dtype=jnp.float32), jnp.asarray(p, jnp.float32))


def affine_scale(s) -> Affine:
    return Affine(jnp.diag(jnp.asarray(s, jnp.float32)), jnp.zeros(3, jnp.float32))


def affine_rotate(axis, degrees) -> Affine:
    """Rotation about an arbitrary axis (LinearSpace3x3.h:132-151).

    The reference builds this row-major from axis u and angle r.
    """
    u = _np(axis)
    u = u / np.linalg.norm(u)
    r = math.radians(float(degrees))
    s, c = math.sin(r), math.cos(r)
    x, y, z = float(u[0]), float(u[1]), float(u[2])
    m = np.array([
        [x * x + (1 - x * x) * c, x * y * (1 - c) - z * s, x * z * (1 - c) + y * s],
        [x * y * (1 - c) + z * s, y * y + (1 - y * y) * c, y * z * (1 - c) - x * s],
        [x * z * (1 - c) - y * s, y * z * (1 - c) + x * s, z * z + (1 - z * z) * c],
    ], dtype=np.float32)
    return Affine(jnp.asarray(m), jnp.zeros(3, jnp.float32))


def affine_compose(a: Affine, b: Affine) -> Affine:
    """a ∘ b: apply b first, then a (AffineSpace.h:170-173)."""
    return Affine(a.linear @ b.linear,
                  matvec3(a.linear, b.t) + a.t)


def affine_inverse(a: Affine) -> Affine:
    il = jnp.linalg.inv(a.linear)
    return Affine(il, -matvec3(il, a.t))


def apply_point(a: Affine, p: Array) -> Array:
    return matvec3(a.linear, p) + a.t


def apply_vector(a: Affine, v: Array) -> Array:
    return matvec3(a.linear, v)


def apply_normal(a: Affine, n: Array) -> Array:
    # Reference quirk: same as vectors (no inverse transpose).
    return apply_vector(a, n)


def look_at(eye, point, up) -> Affine:
    """Camera-to-world (AffineSpace.h:59-65): columns (u, v, z), origin eye."""
    eye = jnp.asarray(eye, jnp.float32)
    point = jnp.asarray(point, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    z = normalize(point - eye)
    u = normalize(cross(up, z))
    v = normalize(cross(z, u))
    return Affine(jnp.stack([u, v, z], axis=-1), eye)


def transform_identity() -> Transform:
    return Transform(affine_identity(), affine_identity())


def transform_compose(a: Transform, b: Transform) -> Transform:
    """a *= b semantics of Transformation.h:95-101 — forward = a.fwd∘b.fwd,
    inverse = b.inv∘a.inv."""
    return Transform(affine_compose(a.fwd, b.fwd), affine_compose(b.inv, a.inv))
