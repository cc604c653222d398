"""Texture sampling: nearest-neighbor and bilinear with remap policies.

TPU-native equivalent of ``/root/reference/Image/Image.h:52-163``: the five
remap policies (None/Clamp/Black/Repeat/Wrap) become string-selected pure
functions, and the samplers operate on ``[H, W, 3]`` jnp arrays with batched
(s, t) coordinates, so a million texel fetches are one gather.

Faithfulness notes:

* ``sample_bilinear`` reproduces the reference verbatim, including its quirk:
  the corner weights are ``u_upper - u_lower`` = ceil(u) - floor(u), which is
  1 for every non-integer u (and 0 at integers) — so the "bilinear" filter
  actually returns the floor-corner texel almost everywhere
  (Image.h:141-155).  ``sample_bilinear_true`` is the textbook filter for new
  code.
* ``RemapBlack`` cannot return a sentinel color from a remap of a scalar
  coordinate; like the reference, out-of-range coordinates map to texel
  weight 0 via an explicit in-range mask here.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

__all__ = ["remap", "sample_nearest_neighbor", "sample_bilinear",
           "sample_bilinear_true"]

# largest float < 1.0 (base/Constants.h:15)
_MAX_LT_ONE = 0.99999994  # largest f32 < 1; plain float (no import-time backend init)


def remap(f: Array, policy: str) -> tuple[Array, Array]:
    """Apply a remap policy to coordinate(s) ``f`` → (coord, in_range_mask).

    Policies (Image.h:52-92): ``none`` passes through; ``clamp`` clips to
    [0, 1); ``black`` zeroes contributions outside [0, 1); ``repeat`` is
    ``abs(fmod(f, 1))`` (mirrors negatives about 0, as in the reference);
    ``wrap`` is the true positive modulus.
    """
    f = jnp.asarray(f, jnp.float32)
    ok = jnp.ones(f.shape, bool)
    if policy == "none":
        out = f
    elif policy == "clamp":
        out = jnp.clip(f, 0.0, _MAX_LT_ONE)
    elif policy == "black":
        ok = (f >= 0.0) & (f < 1.0)
        out = jnp.where(ok, f, 0.0)
    elif policy == "repeat":
        out = jnp.abs(jnp.fmod(f, 1.0))
    elif policy == "wrap":
        out = jnp.mod(1.0 + jnp.fmod(f, 1.0), 1.0)
    else:
        raise ValueError(f"Unknown remap policy: {policy}")
    return out, ok


def sample_nearest_neighbor(img: Array, s: Array, t: Array,
                            remap_horizontal: str = "none",
                            remap_vertical: str | None = None) -> Array:
    """Nearest texel: round(s·W), round(t·H), clamped to the last texel
    (Image.h:95-115).  img is [H, W, C]; s/t broadcast to any batch shape."""
    if remap_vertical is None:
        remap_vertical = remap_horizontal
    s, ok_s = remap(s, remap_horizontal)
    t, ok_t = remap(t, remap_vertical)
    h, w = img.shape[0], img.shape[1]
    x = jnp.minimum(jnp.round(s * w).astype(jnp.int32), w - 1)
    y = jnp.minimum(jnp.round(t * h).astype(jnp.int32), h - 1)
    out = img[y, x]
    return jnp.where((ok_s & ok_t)[..., None], out, 0.0)


def sample_bilinear(img: Array, s: Array, t: Array,
                    remap_horizontal: str = "none",
                    remap_vertical: str | None = None) -> Array:
    """Reference-faithful 'bilinear' (Image.h:122-162), including the
    degenerate ceil-floor weights — see the module docstring."""
    if remap_vertical is None:
        remap_vertical = remap_horizontal
    s, ok_s = remap(s, remap_horizontal)
    t, ok_t = remap(t, remap_vertical)
    h, w = img.shape[0], img.shape[1]
    u = s * w
    v = t * h
    u_lower, u_upper = jnp.floor(u), jnp.ceil(u)
    v_lower, v_upper = jnp.floor(v), jnp.ceil(v)
    u_bias = (u_upper - u_lower)[..., None]
    v_bias = (v_upper - v_lower)[..., None]
    x0 = jnp.minimum(u_lower.astype(jnp.int32), w - 1)
    x1 = jnp.minimum(u_upper.astype(jnp.int32), w - 1)
    y0 = jnp.minimum(v_lower.astype(jnp.int32), h - 1)
    y1 = jnp.minimum(v_upper.astype(jnp.int32), h - 1)
    c0, c1 = img[y0, x0], img[y0, x1]
    c2, c3 = img[y1, x0], img[y1, x1]
    out = v_bias * (u_bias * c0 + (1.0 - u_bias) * c1) \
        + (1.0 - v_bias) * (u_bias * c2 + (1.0 - u_bias) * c3)
    return jnp.where((ok_s & ok_t)[..., None], out, 0.0)


def sample_bilinear_true(img: Array, s: Array, t: Array,
                         remap_horizontal: str = "none",
                         remap_vertical: str | None = None) -> Array:
    """Textbook bilinear filter (texel centers at half-integers) — the filter
    the reference's sample_bilinear intends; differentiable w.r.t. (s, t)."""
    if remap_vertical is None:
        remap_vertical = remap_horizontal
    s, ok_s = remap(s, remap_horizontal)
    t, ok_t = remap(t, remap_vertical)
    h, w = img.shape[0], img.shape[1]
    u = s * w - 0.5
    v = t * h - 0.5
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]
    x0 = jnp.clip(u0.astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(u0.astype(jnp.int32) + 1, 0, w - 1)
    y0 = jnp.clip(v0.astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(v0.astype(jnp.int32) + 1, 0, h - 1)
    c0, c1 = img[y0, x0], img[y0, x1]
    c2, c3 = img[y1, x0], img[y1, x1]
    out = (1.0 - fv) * ((1.0 - fu) * c0 + fu * c1) \
        + fv * ((1.0 - fu) * c2 + fu * c3)
    return jnp.where((ok_s & ok_t)[..., None], out, 0.0)
