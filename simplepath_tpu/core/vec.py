"""Vector math over ``[..., 3]`` JAX arrays.

TPU-native replacement for the reference's SSE ``BaseVector3`` classes
(``/root/reference/math/Vector3.h:22-39``).  Instead of SIMD-within-a-vec3,
every function here is written over batched arrays whose trailing axis is the
xyz component axis; the VPU vectorizes across the batch ("SIMD across rays").

All functions are pure and differentiable.  ``dtype`` is whatever the inputs
carry (float32 throughout the renderer).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

__all__ = [
    "vec3",
    "dot",
    "cross",
    "length",
    "sqr_length",
    "normalize",
    "safe_normalize",
    "madd",
    "lerp",
    "safe_divide",
    "is_normalized",
    "reflect_local",
    "reflect",
]


def vec3(x, y, z) -> Array:
    """Stack three scalars/batches into a trailing xyz axis."""
    return jnp.stack(jnp.broadcast_arrays(jnp.asarray(x, jnp.float32),
                                          jnp.asarray(y, jnp.float32),
                                          jnp.asarray(z, jnp.float32)), axis=-1)


def dot(a: Array, b: Array) -> Array:
    """Dot product over the trailing axis (``sp::dot``, Vector3.h)."""
    return jnp.sum(a * b, axis=-1)


def cross(a: Array, b: Array) -> Array:
    return jnp.cross(a, b)


def sqr_length(a: Array) -> Array:
    return dot(a, a)


def length(a: Array) -> Array:
    return jnp.sqrt(sqr_length(a))


def normalize(a: Array) -> Array:
    return a / length(a)[..., None]


def matvec3(m: Array, v: Array) -> Array:
    """Batched 3x3 matrix @ vec3 as ELEMENTWISE multiply+sum.

    jnp.einsum / ``@`` lower even tiny matvecs onto the MXU, whose default
    TPU precision is bf16 — measured as a ~20% energy deficit on rendered
    images (sphere/light/plane intersections lose ~3 decimal digits).
    Elementwise math stays on the VPU in full f32.  Broadcasts over leading
    dims of either argument."""
    return (m * v[..., None, :]).sum(-1)


def vecmat3(v: Array, m: Array) -> Array:
    """Batched vec3^T @ 3x3 (row-vector form of :func:`matvec3`)."""
    return (v[..., :, None] * m).sum(-2)


def safe_normalize(a: Array, eps: float = 1e-20) -> Array:
    """Normalize with a floored squared length: zero vectors map to zero
    vectors and — unlike a where-masked ``1/length`` — the BACKWARD is finite
    everywhere too (sqrt'(0)=inf would turn masked lanes' zero cotangents
    into 0·inf = NaN under reverse-mode AD)."""
    import jax

    len2 = jnp.maximum(sqr_length(a), eps)
    return a * jax.lax.rsqrt(len2)[..., None]


def madd(a, b, c):
    """Fused multiply-add semantics of the reference (Math.h:138-147).

    XLA fuses this on its own; kept as a named helper so kernel code reads
    like the reference math.
    """
    return a * b + c


def lerp(x, a, b):
    """(1-x)*a + x*b (Math.h:47-50)."""
    return (1.0 - x) * a + x * b


def safe_divide(a, b):
    """a/b with 0 where b == 0 (Math.h:18-26)."""
    b_arr = jnp.asarray(b)
    return jnp.where(b_arr == 0.0, 0.0, a / jnp.where(b_arr == 0.0, 1.0, b_arr))


def safe_sqrt(x, floor: float = 1e-20) -> Array:
    """sqrt clamped away from 0 so the backward jacobian stays finite.

    sqrt' (x→0) = ∞; under autodiff a masked-out lane's 0-cotangent times
    that ∞ is NaN.  The 1e-10 forward perturbation at exactly-0 inputs is
    far below render precision.
    """
    return jnp.sqrt(jnp.maximum(x, floor))


def is_normalized(a: Array, eps: float = 1e-3) -> Array:
    return jnp.abs(sqr_length(a) - 1.0) < eps


def reflect_local(wo: Array) -> Array:
    """Mirror reflection in the local y-up frame (Material.h:50-54)."""
    return wo * jnp.asarray([-1.0, 1.0, -1.0], dtype=wo.dtype)


def reflect(wo: Array, n: Array) -> Array:
    """Mirror reflection about a normal (Material.h:45-48)."""
    return -wo + 2.0 * dot(wo, n)[..., None] * n
