"""Stateless, counter-based random sampling.

The reference uses two stateful samplers (``/root/reference/math/Sampler.h``):

* ``RSequenceSampler`` — additive-recurrence quasirandom sequence keyed by a
  pixel seed, used for pixel jitter (main.cpp:67-71).  It is already a closed
  form of ``(seed, n)`` so it ports directly to JAX with no state.
* ``IncoherentSampler`` — mt19937_64, used for all integrator decisions
  (main.cpp:73-76).  Mersenne Twister is inherently sequential; the TPU-native
  replacement is counter-based threefry via ``jax.random`` keyed by
  ``(pixel, sample, bounce, draw-site)``, which is statistically equivalent
  (i.i.d. uniforms) and fully parallel.

Draw-site discipline: every distinct place in the integrator that consumes a
uniform gets a distinct static site id, so lanes never correlate.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import Array

__all__ = [
    "r_sequence_alpha",
    "r_sequence",
    "pixel_jitter",
    "uniform_1d",
    "uniform_2d",
    "site_key",
]


def r_sequence_alpha(dimension: int) -> list[float]:
    """Generalized-golden-ratio alphas (Sampler.h:18-27, 47-52).

    phi_d solves x^(d+1) = x + 1; alphas are frac(phi^-i).
    """
    x = 2.0
    for _ in range(10):
        x = (1.0 + x) ** (1.0 / (dimension + 1.0))
    return [math.modf((1.0 / x) ** (i + 1.0))[0] for i in range(dimension)]


_ALPHA_1D = r_sequence_alpha(1)
_ALPHA_2D = r_sequence_alpha(2)


def r_sequence(seed: Array, n: Array, dimension: int = 2) -> Array:
    """R-sequence sample n for integer seed (Sampler.h:35-44).

    Matches the reference exactly, including the quirk that the seed is
    normalized by float32 max (Sampler.h:37) which makes ``fseed`` ~1e-29 —
    i.e. effectively zero — so the sequence is the same for every seed.
    """
    alpha = jnp.asarray(_ALPHA_2D if dimension == 2 else _ALPHA_1D, jnp.float32)
    fseed = seed.astype(jnp.float32) / jnp.float32(3.4028235e38)
    vals = fseed[..., None] + alpha * (n.astype(jnp.float32)[..., None] + 1.0)
    return jnp.mod(vals, 1.0)


def pixel_jitter(x: Array, y: Array, sample_index: Array) -> Array:
    """Per-pixel jitter matching main.cpp:67-71, 92-98.

    The reference's pixel sampler is ``RSequenceSampler(Seed{x<<16|y})`` with
    the 2D stream; returns the ``sample_index``-th 2D point in [0,1)².
    """
    seed = (x.astype(jnp.uint32) << 16) | y.astype(jnp.uint32)
    seed = seed ^ jnp.uint32(0x6184FAF4)  # 2D stream seed (Sampler.h:164-167)
    return r_sequence(seed, sample_index, 2)


def site_key(key: Array, site: int) -> Array:
    """Derive the key for a static draw site."""
    return jax.random.fold_in(key, site)


def uniform_1d(key: Array, site: int) -> Array:
    return jax.random.uniform(site_key(key, site), ())


def uniform_2d(key: Array, site: int) -> Array:
    return jax.random.uniform(site_key(key, site), (2,))
