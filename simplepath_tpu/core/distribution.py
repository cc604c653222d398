"""Piecewise-constant 1D/2D distributions via cumsum + searchsorted.

TPU-native port of ``/root/reference/math/Distribution1D.h`` and
``Distribution2D.h``: the CDF build becomes a prefix sum, sampling becomes a
vectorized binary search.  Used for importance sampling image-based
environment lights (Lights/Light.h:226-248, 302-329).

IMPORTANT reference quirk, reproduced bit-for-bit (verified against a
compiled probe of the reference headers): Distribution1D's CDF
normalization ``std::transform(next(cbegin), cend, begin(), /integral)``
writes the results LEFT-SHIFTED by one (Distribution1D.h:42-43), so the
effective CDF stored is ``[c1/I, c2/I, ..., cn/I, I]`` — the last entry
keeps the UNNORMALIZED integral.  Consequences:

* ``get_offset``'s upper_bound lands on the correct PBRT-style bin index;
* the intra-bin remainder ``du = u - cdf[offset]`` is NEGATIVE (relative to
  the bin's end), divided by the NEXT segment's width — or kept raw when
  that segment has zero width;
* sampled positions can dip slightly below the bin start (even below 0 for
  the first bin).

The zero-integral fallback writes ``[0, 1/n, ..., 1]`` in place (no shift).

All of this is deterministic and matches the reference's IBL sampling
numerically; see the Distribution1D/2D golden tests in
tests/test_core_math.py for values captured from a compiled probe of the
reference header.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import Array

from .vec import lerp

__all__ = ["Distribution1D", "build_distribution_1d", "sample_continuous_1d",
           "sample_discrete_1d", "discrete_pdf_1d", "invert_1d",
           "Distribution2D", "build_distribution_2d", "sample_continuous_2d",
           "pdf_2d"]


class Distribution1D(NamedTuple):
    function: Array    # [n] |f|
    cdf: Array         # [n+1] the reference's effective (shifted) CDF
    integral: Array    # scalar: unnormalized total
    dmin: float
    dmax: float


def _effective_cdf(f: Array, dmin: float, dmax: float) -> tuple[Array, Array]:
    """Build the reference's shifted CDF; returns (cdf [n+1], integral)."""
    n = f.shape[-1]
    steps = f * ((dmax - dmin) / n)
    raw = jnp.cumsum(steps, axis=-1)                 # c1..cn
    integral = raw[..., -1]
    safe = jnp.where(integral == 0.0, 1.0, integral)
    shifted = jnp.concatenate([raw / safe[..., None], integral[..., None]], axis=-1)
    uniform = jnp.arange(n + 1, dtype=f.dtype) / n   # in-place zero branch
    cdf = jnp.where(integral[..., None] == 0.0, uniform, shifted)
    return cdf, integral


def build_distribution_1d(f: Array, dmin: float = 0.0, dmax: float = 1.0) -> Distribution1D:
    f = jnp.abs(f)
    cdf, integral = _effective_cdf(f, dmin, dmax)
    return Distribution1D(f, cdf, integral, dmin, dmax)


def _rowwise_upper_bound(rows: Array, u: Array, m: int) -> Array:
    """upper_bound per row over rows[..., :m]: index of first entry > u.
    O(log m) branchless binary search (works batched)."""
    lo = jnp.zeros(u.shape, jnp.int32)
    hi = jnp.full(u.shape, m, jnp.int32)
    for _ in range(int(m).bit_length()):
        mid = (lo + hi) // 2
        vals = jnp.take_along_axis(
            rows, jnp.clip(mid, 0, rows.shape[-1] - 1)[..., None], axis=-1)[..., 0] \
            if rows.ndim > 1 else rows[jnp.clip(mid, 0, rows.shape[-1] - 1)]
        go_right = (vals <= u) & (mid < m)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return lo


def _sample_from(function: Array, cdf: Array, integral: Array, u: Array,
                 dmin: float, dmax: float) -> tuple[Array, Array, Array]:
    """Shared 1D sampling on (possibly batched-row) tables.

    function: [..., n], cdf: [..., n+1], u/integral broadcastable [...].
    Returns (x, pdf, offset) with exact reference semantics
    (Distribution1D.h:77-98, 135-143).
    """
    n = function.shape[-1]
    # upper_bound over the first n entries; guard maps index n → n-1
    idx = _rowwise_upper_bound(cdf, u, n)
    offset = jnp.clip(idx, 0, n - 1)

    def take(a, i):
        if a.ndim > 1:
            return jnp.take_along_axis(a, i[..., None], axis=-1)[..., 0]
        return a[i]

    c0 = take(cdf, offset)
    c1 = take(cdf, offset + 1)
    du = u - c0
    seg = c1 - c0
    du = jnp.where(seg > 0, du / jnp.where(seg > 0, seg, 1.0), du)
    f_off = take(function, offset)
    pdf = jnp.where(integral > 0, f_off / jnp.where(integral > 0, integral, 1.0), 0.0)
    x = lerp((offset.astype(u.dtype) + du) / n, dmin, dmax)
    return x, pdf, offset


def sample_continuous_1d(d: Distribution1D, u: Array) -> tuple[Array, Array, Array]:
    return _sample_from(d.function, d.cdf, d.integral, u, d.dmin, d.dmax)


def sample_discrete_1d(d: Distribution1D, u: Array) -> tuple[Array, Array, Array]:
    """sample_discrete (Distribution1D.h:100-111) → (offset, pdf, u_remapped).

    pdf is the DISCRETE probability f[offset] / (integral · n); u_remapped
    rescales u into the chosen bin.  Like the reference, the remap divides by
    the raw segment width with no zero guard (a zero-width bin can only be
    selected at u exactly on its boundary, where the reference's assert
    allows 0/0 to surface; IEEE semantics are kept).
    """
    n = d.function.shape[-1]
    offset = jnp.clip(_rowwise_upper_bound(d.cdf, u, n), 0, n - 1)
    f_off = d.function[offset]
    pdf = jnp.where(d.integral > 0,
                    f_off / jnp.where(d.integral > 0, d.integral, 1.0) / n, 0.0)
    u_remapped = (u - d.cdf[offset]) / (d.cdf[offset + 1] - d.cdf[offset])
    return offset, pdf, u_remapped


def discrete_pdf_1d(d: Distribution1D, index: Array) -> Array:
    """discrete_pdf (Distribution1D.h:113-117): f[i] / (integral · n).
    Raw division like the reference (asserts, no zero-integral guard)."""
    n = d.function.shape[-1]
    return d.function[index] / (d.integral * n)


def invert_1d(d: Distribution1D, x: Array) -> tuple[Array, Array]:
    """invert (Distribution1D.h:119-132) → (value, valid).

    The reference returns std::nullopt outside [min, max]; here ``valid``
    carries that flag and ``value`` is the in-range result (arbitrary when
    invalid).  The reference's size_t cast of a negative float is UB; inputs
    are clamped to the valid range first so the cast is always in-range.
    """
    n = d.function.shape[-1]
    valid = (x >= d.dmin) & (x <= d.dmax)
    xc = jnp.clip(x, d.dmin, d.dmax)
    c = (xc - d.dmin) / (d.dmax - d.dmin) * n
    offset = jnp.clip(c.astype(jnp.int32), 0, n - 1)
    delta = c - offset.astype(c.dtype)
    return lerp(delta, d.cdf[offset], d.cdf[offset + 1]), valid


class Distribution2D(NamedTuple):
    conditional_f: Array     # [nv, nu]
    conditional_cdf: Array   # [nv, nu+1] effective CDFs per row
    conditional_int: Array   # [nv] unnormalized row integrals (= sum/nu)
    marginal: Distribution1D


def build_distribution_2d(func: Array) -> Distribution2D:
    """func: [nv, nu] — rows are conditionals, marginal over row integrals
    (Distribution2D.h:41-79)."""
    f = jnp.abs(func)
    ccdf, cint = _effective_cdf(f, 0.0, 1.0)
    marginal = build_distribution_1d(cint)
    return Distribution2D(f, ccdf, cint, marginal)


def sample_continuous_2d(d: Distribution2D, u: Array) -> tuple[Array, Array]:
    """u: [..., 2] → ((s, t), pdf) — Distribution2D.h:22-29."""
    d1, pdf1, v_idx = sample_continuous_1d(d.marginal, u[..., 1])
    d0, pdf0, _ = _sample_from(d.conditional_f[v_idx], d.conditional_cdf[v_idx],
                               d.conditional_int[v_idx], u[..., 0], 0.0, 1.0)
    st = jnp.stack([d0, d1], axis=-1)
    return st, pdf0 * pdf1


def pdf_2d(d: Distribution2D, p: Array) -> Array:
    """pdf at continuous (s, t) — Distribution2D.h:31-38.

    NB int casts clamp like the reference's size_t clamp (negative inputs
    cast through int32 then clamp to 0 — the reference's size_t cast of a
    negative float is UB; we choose the clamp)."""
    nv, nu = d.conditional_f.shape
    iu = jnp.clip((p[..., 0] * nu).astype(jnp.int32), 0, nu - 1)
    iv = jnp.clip((p[..., 1] * nv).astype(jnp.int32), 0, nv - 1)
    mint = d.marginal.integral
    return jnp.where(mint > 0, d.conditional_f[iv, iu] / jnp.where(mint > 0, mint, 1.0), 0.0)
