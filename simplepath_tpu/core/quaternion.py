"""Quaternions as [..., 4] jnp arrays (layout ``[r, i, j, k]``).

TPU-native equivalent of ``/root/reference/math/Quaternion.h`` (Embree-derived,
unused by the reference's core render path but part of its math library).
Instead of a class with operator overloads, these are pure functions over
``[..., 4]`` float arrays — batched, differentiable, jit-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

__all__ = [
    "quat", "quat_identity", "quat_rotate_axis_angle", "quat_yaw_pitch_roll",
    "quat_from_basis", "quat_mul", "quat_conj", "quat_abs", "quat_rcp",
    "quat_normalize", "quat_dot", "quat_lerp", "quat_apply",
]


def quat(r, i, j, k) -> Array:
    return jnp.stack([jnp.asarray(r, jnp.float32), jnp.asarray(i, jnp.float32),
                      jnp.asarray(j, jnp.float32), jnp.asarray(k, jnp.float32)],
                     axis=-1)


def quat_identity() -> Array:
    return jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32)


def quat_rotate_axis_angle(axis: Array, angle) -> Array:
    """Rotation of ``angle`` radians about ``axis`` (Quaternion.h:72-75)."""
    axis = jnp.asarray(axis, jnp.float32)
    u = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    half = 0.5 * jnp.asarray(angle, jnp.float32)
    s = jnp.sin(half)[..., None]
    return jnp.concatenate([jnp.cos(half)[..., None], s * u], axis=-1)


def quat_yaw_pitch_roll(yaw, pitch, roll) -> Array:
    """Euler-angle constructor (Quaternion.h:318-331), same convention."""
    cya, sya = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    cpi, spi = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cro, sro = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    return quat(cro * cya * cpi + sro * sya * spi,
                cro * cya * spi + sro * sya * cpi,
                cro * sya * cpi - sro * cya * spi,
                sro * cya * cpi - cro * sya * spi)


def quat_from_basis(vx: Array, vy: Array, vz: Array) -> Array:
    """Quaternion from three orthonormal column vectors (Quaternion.h:276-316).

    Branchless jnp version of the reference's four-case trace construction:
    all four candidates are computed and the reference's branch order is
    replicated with nested ``where``.
    """
    vx, vy, vz = (jnp.asarray(v, jnp.float32) for v in (vx, vy, vz))
    xx, yy, zz = vx[..., 0], vy[..., 1], vz[..., 2]

    def mk(t, a, b, c):
        s = 0.5 / jnp.sqrt(jnp.maximum(t, 1e-30))
        return t * s, a * s, b * s, c * s

    # case 0: trace >= 0
    t0 = 1.0 + xx + yy + zz
    r0, i0, j0, k0 = mk(jnp.maximum(t0, 1e-30),
                        vy[..., 2] - vz[..., 1],
                        vz[..., 0] - vx[..., 2],
                        vx[..., 1] - vy[..., 0])
    q0 = jnp.stack([r0, i0, j0, k0], axis=-1)
    # case 1: xx largest
    t1 = (1.0 + xx) - (yy + zz)
    i1, r1, j1, k1 = mk(jnp.maximum(t1, 1e-30),
                        vy[..., 2] - vz[..., 1],
                        vx[..., 1] + vy[..., 0],
                        vz[..., 0] + vx[..., 2])
    q1 = jnp.stack([r1, i1, j1, k1], axis=-1)
    # case 2: yy largest
    t2 = (1.0 + yy) - (zz + xx)
    j2, r2, i2, k2 = mk(jnp.maximum(t2, 1e-30),
                        vz[..., 0] - vx[..., 2],
                        vx[..., 1] + vy[..., 0],
                        vy[..., 2] + vz[..., 1])
    q2 = jnp.stack([r2, i2, j2, k2], axis=-1)
    # case 3: zz largest
    t3 = (1.0 + zz) - (xx + yy)
    k3, r3, i3, j3 = mk(jnp.maximum(t3, 1e-30),
                        vx[..., 1] - vy[..., 0],
                        vz[..., 0] + vx[..., 2],
                        vy[..., 2] + vz[..., 1])
    q3 = jnp.stack([r3, i3, j3, k3], axis=-1)

    c0 = (xx + yy + zz >= 0.0)[..., None]
    c1 = (xx >= jnp.maximum(yy, zz))[..., None]
    c2 = (yy >= zz)[..., None]
    return jnp.where(c0, q0, jnp.where(c1, q1, jnp.where(c2, q2, q3)))


def quat_mul(a: Array, b: Array) -> Array:
    """Hamilton product (Quaternion.h:185-191)."""
    ar, ai, aj, ak = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    br, bi, bj, bk = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([ar * br - ai * bi - aj * bj - ak * bk,
                      ar * bi + ai * br + aj * bk - ak * bj,
                      ar * bj - ai * bk + aj * br + ak * bi,
                      ar * bk + ai * bj - aj * bi + ak * br], axis=-1)


def quat_conj(a: Array) -> Array:
    return a * jnp.asarray([1.0, -1.0, -1.0, -1.0], a.dtype)


def quat_abs(a: Array) -> Array:
    return jnp.linalg.norm(a, axis=-1)


def quat_rcp(a: Array) -> Array:
    return quat_conj(a) / jnp.sum(a * a, axis=-1, keepdims=True)


def quat_normalize(a: Array) -> Array:
    return a / jnp.linalg.norm(a, axis=-1, keepdims=True)


def quat_dot(a: Array, b: Array) -> Array:
    return jnp.sum(a * b, axis=-1)


def quat_lerp(q0: Array, q1: Array, factor) -> Array:
    """Component-wise lerp, matching the reference (NOT slerp,
    Quaternion.h:345-352)."""
    f = jnp.asarray(factor, jnp.float32)[..., None]
    return q0 + (q1 - q0) * f


def quat_apply(a: Array, v: Array) -> Array:
    """Rotate vector(s) ``v`` by quaternion(s) ``a``: ``a * (0,v) * conj(a)``
    (Quaternion.h:193-196)."""
    qv = jnp.concatenate([jnp.zeros_like(v[..., :1]), v], axis=-1)
    return quat_mul(quat_mul(a, qv), quat_conj(a))[..., 1:]
