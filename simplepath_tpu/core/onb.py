"""Branchless orthonormal basis (Pixar/Duff revisited).

Mirrors ``/root/reference/math/ONB.h:12-32``; the shading frame is built with
``from_v`` (normal becomes the +y axis) as in Material.h:464.  Vectorized over
batch axes: an ONB is a ``[..., 3, 3]`` array whose ROWS are (u, v, w).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from .vec import normalize

__all__ = ["onb_create", "onb_from_v", "onb_to_world", "onb_to_local"]


def onb_create(n: Array) -> tuple[Array, Array]:
    """Two tangent vectors (b1, b2) for unit n (ONB.h:12-32), branchless."""
    sign = jnp.copysign(1.0, n[..., 2])
    a = -1.0 / (sign + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    b1 = jnp.stack([1.0 + sign * n[..., 0] * n[..., 0] * a,
                    sign * b,
                    -sign * n[..., 0]], axis=-1)
    b2 = jnp.stack([b,
                    sign + n[..., 1] * n[..., 1] * a,
                    -n[..., 1]], axis=-1)
    return b1, b2


def onb_from_v(n: Array) -> Array:
    """ONB with n as the v (y) axis: rows (u, v, w) — ONB.h:57-62.

    The reference does ``const auto [w, u] = create(v)``, i.e. b1 is w and
    b2 is u.
    """
    v = normalize(n)
    w, u = onb_create(v)
    return jnp.stack([u, v, w], axis=-2)


def onb_to_world(onb: Array, a: Array) -> Array:
    """a.x*u + a.y*v + a.z*w (ONB.h:135-138)."""
    from .vec import vecmat3
    return vecmat3(a, onb)


def onb_to_local(onb: Array, a: Array) -> Array:
    """(dot(a,u), dot(a,v), dot(a,w)) (ONB.h:140-143)."""
    from .vec import matvec3
    return matvec3(onb, a)
