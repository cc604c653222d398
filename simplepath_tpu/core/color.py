"""Color utilities: luminance, sRGB encode, HSV→RGB.

Mirrors ``/root/reference/math/RGB.h`` and ``HSV.h``.  Colors are
``[..., 3]`` float32 arrays.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

__all__ = ["relative_luminance", "rgb_to_srgb", "hsv_to_rgb"]

_LUMA_WEIGHTS = (0.2126, 0.7152, 0.0722)  # Rec.709, RGB.h:224-227


def relative_luminance(c: Array) -> Array:
    return (_LUMA_WEIGHTS[0] * c[..., 0]
            + _LUMA_WEIGHTS[1] * c[..., 1]
            + _LUMA_WEIGHTS[2] * c[..., 2])


def rgb_to_srgb(c: Array) -> Array:
    """Linear → sRGB transfer (Image.h:39-50)."""
    return jnp.where(c <= 0.0031308,
                     12.92 * c,
                     1.055 * jnp.power(jnp.maximum(c, 1e-12), 1.0 / 2.4) - 0.055)


def hsv_to_rgb(h: Array, s: Array, v: Array) -> Array:
    """HSV → RGB (HSV.h:133-161 active branch), branchless.

    h, s, v in [0, 1].
    """
    c = v * s
    hprime = jnp.floor(h * 6.0).astype(jnp.int32)
    x = c * (1.0 - jnp.abs(jnp.mod(hprime.astype(jnp.float32), 2.0) - 1.0))
    m = v - c
    zero = jnp.zeros_like(c)
    # The reference leaves M out of the switch result (quirk: it computes M
    # but never adds it). Reproduce: return the raw switch values.
    cases = jnp.stack([
        jnp.stack([c, x, zero], axis=-1),
        jnp.stack([x, c, zero], axis=-1),
        jnp.stack([zero, c, x], axis=-1),
        jnp.stack([zero, x, c], axis=-1),
        jnp.stack([x, zero, c], axis=-1),
        jnp.stack([c, zero, x], axis=-1),
    ], axis=0)
    idx = jnp.clip(jnp.mod(hprime, 6), 0, 5)
    onehot = (jnp.arange(6).reshape((6,) + (1,) * idx.ndim) == idx[None]).astype(c.dtype)
    return jnp.sum(cases * onehot[..., None], axis=0)
