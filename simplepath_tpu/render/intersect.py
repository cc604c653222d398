"""Primitive intersection kernels over SoA batches.

TPU-native replacement for the reference's per-object virtual
``intersect_impl`` methods: each function tests ONE ray against MANY
primitives at once (vectorized on the VPU); closest-hit reduction is an
argmin.  Used directly for small scenes (the ListAccelerator path,
shapes/ListAccelerator.h:36-62) and inside BVH leaves.

Conventions:
 * a "hit" is (t, valid); shading data (point, normal, material) is computed
   by the caller from the winning primitive only.
 * t limits follow RayLimits (math/Ray.h:13-19): valid iff t_min <= t <= t_max
   with the same boundary senses as the reference (t < t_min || t > t_max
   rejects).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from ..core.vec import dot, matvec3, normalize
from ..scene.types import PlaneArrays, SphereArrays, TriangleArrays

__all__ = [
    "intersect_spheres", "sphere_normal",
    "intersect_planes", "plane_normal",
    "intersect_triangles", "triangle_normal",
    "RAY_EPSILON", "INF_DISTANCE",
]

RAY_EPSILON = 1e-3          # k_ray_epsilon (math/Ray.h:13)
INF_DISTANCE = jnp.inf      # k_infinite_distance (base/Constants.h:16)


# ---------------------------------------------------------------- spheres

def intersect_spheres(sph: SphereArrays, ro: Array, rd: Array,
                      t_min: Array, t_max: Array) -> tuple[Array, Array]:
    """Ray vs all unit spheres in object space (shapes/Sphere.h:77-109).

    ro, rd: [3]; returns (t [S], valid [S]).
    """
    o = matvec3(sph.w2o_l, ro) + sph.w2o_t   # [S,3]
    d = matvec3(sph.w2o_l, rd)                # [S,3]
    a = dot(d, d)
    b = 2.0 * dot(d, o)
    c = dot(o, o) - 1.0
    disc = b * b - 4.0 * a * c
    has = disc > 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (-b - sq) / (2.0 * a)
    t1 = (-b + sq) / (2.0 * a)
    t = jnp.where(t0 < t_min, t1, t0)
    valid = has & (t >= t_min) & (t <= t_max)
    return t, valid


def sphere_normal(sph: SphereArrays, idx: Array, ro: Array, rd: Array, t: Array) -> Array:
    """World normal at hit t for sphere ``idx`` (Sphere.h:100-102).

    Reference quirk: the object-space normal is transformed by the
    object→world LINEAR matrix (not inverse transpose) then normalized.
    """
    w2o_l = sph.w2o_l[idx]
    w2o_t = sph.w2o_t[idx]
    o = matvec3(w2o_l, ro) + w2o_t
    d = matvec3(w2o_l, rd)
    n_obj = o + t * d  # radius 1
    n_world = sph.o2w_l[idx] @ n_obj
    # guarded normalize: masked-out lanes may carry degenerate vectors whose
    # 1/|n| jacobian would be NaN even under jnp.where
    len2 = jnp.maximum(dot(n_world, n_world), 1e-12)
    return n_world * jax.lax.rsqrt(len2)


# ---------------------------------------------------------------- planes

def intersect_planes(pl: PlaneArrays, ro: Array, rd: Array,
                     t_min: Array, t_max: Array) -> tuple[Array, Array]:
    """Ray vs all y=0 planes in object space (shapes/Plane.h:21-71)."""
    oy = (pl.w2o_l[:, 1, :] * ro).sum(-1) + pl.w2o_t[:, 1]
    dy = (pl.w2o_l[:, 1, :] * rd).sum(-1)
    parallel = dy == 0.0
    t = -oy / jnp.where(parallel, 1.0, dy)
    valid = (~parallel) & (t >= t_min) & (t <= t_max)
    return t, valid


def plane_normal(pl: PlaneArrays, idx: Array) -> Array:
    """World normal (Plane.h:66): o2w linear applied to (0,1,0), i.e. column 1.
    NB the reference does NOT normalize this (quirk kept)."""
    return pl.o2w_l[idx][:, 1]


# ---------------------------------------------------------------- triangles

def intersect_triangles(v0: Array, v1: Array, v2: Array, ro: Array, rd: Array,
                        t_min: Array, t_max: Array) -> tuple[Array, Array, Array, Array]:
    """Shirley-style barycentric test (shapes/Triangle.h:97-162), batched.

    v0/v1/v2: [T,3] world-space vertices; returns (t, beta, gamma, valid).
    Boundary senses match the reference exactly (beta<=0, beta>=1 reject...).
    """
    A = v0[:, 0] - v1[:, 0]
    B = v0[:, 1] - v1[:, 1]
    C = v0[:, 2] - v1[:, 2]
    D = v0[:, 0] - v2[:, 0]
    E = v0[:, 1] - v2[:, 1]
    F = v0[:, 2] - v2[:, 2]
    G, H, I = rd[0], rd[1], rd[2]
    J = v0[:, 0] - ro[0]
    K = v0[:, 1] - ro[1]
    L = v0[:, 2] - ro[2]

    EIHF = E * I - H * F
    GFDI = G * F - D * I
    DHEG = D * H - E * G
    denom = A * EIHF + B * GFDI + C * DHEG
    safe_denom = jnp.where(denom == 0.0, 1.0, denom)

    beta = (J * EIHF + K * GFDI + L * DHEG) / safe_denom
    AKJB = A * K - J * B
    JCAL = J * C - A * L
    BLKC = B * L - K * C
    gamma = (I * AKJB + H * JCAL + G * BLKC) / safe_denom
    t = -(F * AKJB + E * JCAL + D * BLKC) / safe_denom

    valid = ((denom != 0.0)
             & (beta > 0.0) & (beta < 1.0)
             & (gamma > 0.0) & (beta + gamma < 1.0)
             & (t >= t_min) & (t <= t_max))
    return t, beta, gamma, valid


def triangle_normal(tri: TriangleArrays, idx: Array, beta: Array, gamma: Array) -> Array:
    """Barycentric-interpolated shading normal (Triangle.h:147-154).

    Gathers the per-component normal arrays (never a [T,3] operand — see
    TriangleArrays)."""
    alpha = 1.0 - beta - gamma
    n = (alpha * tri.gather_row("n0", idx) + beta * tri.gather_row("n1", idx)
         + gamma * tri.gather_row("n2", idx))
    return normalize(n)
