"""Scalar math helpers: balance heuristic, erfinv, fresnel.

Mirrors ``/root/reference/math/Math.h`` and the Fresnel / local-trig helpers
from ``materials/Material.h:56-143``.  Everything is branchless / vectorized.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

__all__ = [
    "balance_heuristic",
    "balance_heuristic_counts",
    "erfinv",
    "fresnel_dielectric",
    "cos_theta",
    "abs_cos_theta",
    "cos2_theta",
    "sin2_theta",
    "sin_theta",
    "tan_theta",
    "tan2_theta",
    "cos_phi",
    "sin_phi",
    "same_hemisphere",
]


def balance_heuristic(p: Array, inner_product: Array) -> Array:
    """One-sample balance heuristic w = p / Σp (Math.h:81-88)."""
    return jnp.where(inner_product == 0.0, 0.0,
                     p / jnp.where(inner_product == 0.0, 1.0, inner_product))


def balance_heuristic_counts(nf, f_pdf: Array, ng, g_pdf: Array) -> Array:
    """(nf·f)/(nf·f+ng·g) (Math.h:90-93)."""
    denom = nf * f_pdf + ng * g_pdf
    return jnp.where(denom == 0.0, 0.0,
                     (nf * f_pdf) / jnp.where(denom == 0.0, 1.0, denom))


def erfinv(a: Array) -> Array:
    """Polynomial inverse error function (Math.h:230-261), branchless."""
    a = jnp.asarray(a, jnp.float32)
    t = jnp.log(jnp.maximum(a * (0.0 - a) + 1.0, 1e-38))

    def poly(coeffs, t):
        p = jnp.full_like(t, coeffs[0])
        for c in coeffs[1:]:
            p = p * t + c
        return p

    p_big = poly([3.03697567e-10, 2.93243101e-8, 1.22150334e-6, 2.84108955e-5,
                  3.93552968e-4, 3.02698812e-3, 4.83185798e-3, -2.64646143e-1,
                  8.40016484e-1], t)
    p_small = poly([5.43877832e-9, 1.43285448e-7, 1.22774793e-6, 1.12963626e-7,
                    -5.61530760e-5, -1.47697632e-4, 2.31468678e-3, 1.15392581e-2,
                    -2.32015476e-1, 8.86226892e-1], t)
    p = jnp.where(jnp.abs(t) > 6.125, p_big, p_small)
    return a * p


def fresnel_dielectric(cos_theta_i: Array, eta_i: float, eta_t: float) -> Array:
    """Unpolarized dielectric Fresnel (Material.h:114-143), branchless.

    Handles rays entering/exiting by swapping IORs when cos < 0.
    """
    cti = jnp.clip(cos_theta_i, -1.0, 1.0)
    entering = cti > 0.0
    ei = jnp.where(entering, eta_i, eta_t)
    et = jnp.where(entering, eta_t, eta_i)
    cti = jnp.abs(cti)

    sin_i = jnp.sqrt(jnp.maximum(1e-20, 1.0 - cti * cti))
    sin_t = ei / et * sin_i
    tir = sin_t >= 1.0
    ctt = jnp.sqrt(jnp.maximum(1e-20, 1.0 - sin_t * sin_t))

    r_parl = (et * cti - ei * ctt) / (et * cti + ei * ctt)
    r_perp = (ei * cti - et * ctt) / (ei * cti + et * ctt)
    f = 0.5 * (r_parl * r_parl + r_perp * r_perp)
    return jnp.where(tir, 1.0, f)


# ---- local-frame trig (y-up), Material.h:56-111 ----

def cos_theta(w: Array) -> Array:
    return w[..., 1]


def abs_cos_theta(w: Array) -> Array:
    return jnp.abs(w[..., 1])


def cos2_theta(w: Array) -> Array:
    return w[..., 1] * w[..., 1]


def sin2_theta(w: Array) -> Array:
    return jnp.maximum(0.0, 1.0 - cos2_theta(w))


def sin_theta(w: Array) -> Array:
    return jnp.sqrt(jnp.maximum(sin2_theta(w), 1e-20))


def tan_theta(w: Array) -> Array:
    # |cos| floored at 1e-18 (sign kept): values past that are ≥1e18 — far
    # beyond any physically meaningful tangent — and the floor keeps the
    # BACKWARD (-sin/cos²) finite, so masked-out grazing lanes can't turn
    # zero cotangents into 0·inf = NaN under reverse-mode AD.
    ct = cos_theta(w)
    safe = jnp.where(jnp.abs(ct) < 1e-18, jnp.where(ct < 0, -1e-18, 1e-18), ct)
    return sin_theta(w) / safe


def tan2_theta(w: Array) -> Array:
    # c2 floored at 1e-18 for the same AD-safety reason as tan_theta
    c2 = jnp.maximum(cos2_theta(w), 1e-18)
    return sin2_theta(w) / c2


def cos_phi(w: Array) -> Array:
    st = sin_theta(w)
    return jnp.where(st == 0.0, 1.0,
                     jnp.clip(w[..., 0] / jnp.where(st == 0.0, 1.0, st), -1.0, 1.0))


def sin_phi(w: Array) -> Array:
    st = sin_theta(w)
    return jnp.where(st == 0.0, 1.0,
                     jnp.clip(w[..., 2] / jnp.where(st == 0.0, 1.0, st), -1.0, 1.0))


def same_hemisphere(a: Array, b: Array) -> Array:
    return a[..., 1] * b[..., 1] > 0.0
