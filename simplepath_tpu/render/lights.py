"""Light sampling, pdf, radiance, and light-ray intersection.

TPU-native port of ``/root/reference/Lights/Light.h``: the Light virtual
hierarchy becomes per-kind functions over the light tables.  All functions
are per-ray (unbatched) and vmapped by the integrators.

Sphere light sampling reproduces the reference's scheme exactly
(shapes/Sphere.h:20-74): cosine-hemisphere POINT sampling toward the
observer with the uniform-CONE pdf — an intentional reproduction of the
reference's (slightly inconsistent) math so images match.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
from jax import Array

from ..core.distribution import Distribution1D, Distribution2D, pdf_2d, sample_continuous_2d
from ..core.onb import onb_from_v, onb_to_world
from ..core.sampling import (PI, TWO_PI, sample_to_cosine_hemisphere,
                             sample_to_uniform_sphere, spherical_phi,
                             spherical_theta, uniform_sphere_pdf)
from ..core.vec import dot, length, matvec3, normalize, sqr_length
from ..scene.types import ENV_CONST, ENV_IBL, EnvLightArrays, SphereLightArrays
from .intersect import RAY_EPSILON, INF_DISTANCE

__all__ = [
    "LightSample",
    "sphere_light_sample", "sphere_light_pdf", "sphere_light_intersect",
    "sphere_light_intersect_p",
    "env_light_sample", "env_light_pdf", "env_light_radiance",
    "get_ray_offset",
]


class LightSample(NamedTuple):
    L: Array            # [3] radiance
    pdf: Array          # []
    wi: Array           # [3] world direction toward light
    t_min: Array        # [] shadow-ray start (offset)
    t_max: Array        # [] shadow-ray end (light distance - offset)


def get_ray_offset(cos_d: Array) -> Array:
    """Self-intersection offset ε/|cosθ| (math/Ray.h:51-58)."""
    return jnp.where(cos_d == 0.0, RAY_EPSILON,
                     RAY_EPSILON / jnp.where(cos_d == 0.0, 1.0, cos_d))


def get_ray_offset_nd(n: Array, d: Array) -> Array:
    """Offset from normal/direction pair (Ray.h:60-85)."""
    return get_ray_offset(jnp.abs(dot(n, d)))


# ------------------------------------------------------------ sphere light

def _sphere_shape_sample(lights: SphereLightArrays, li: int, observer_world: Array,
                         u: Array) -> tuple[Array, Array]:
    """Sphere::sample(observer, u) → (point, normal) world (Sphere.h:27-51)."""
    w2o_l = lights.w2o_l[li]
    w2o_t = lights.w2o_t[li]
    o2w_l = lights.o2w_l[li]
    o2w_t = lights.o2w_t[li]

    obs = matvec3(w2o_l, observer_world) + w2o_t           # local observer
    inside = sqr_length(obs) <= 1.0

    # outside branch: cosine hemisphere toward observer (Sphere.h:37-50)
    onb = onb_from_v(obs)  # v axis = to_observer
    s_cos = onb_to_world(onb, sample_to_cosine_hemisphere(u))
    # inside branch: uniform sphere (Sphere.h:20-25 via sample(u))
    s_uni = sample_to_uniform_sphere(u)

    local_sample = jnp.where(inside, s_uni, s_cos)
    point = matvec3(o2w_l, local_sample) + o2w_t
    normal = normalize(matvec3(o2w_l, local_sample))  # reference: o2w applied to normal
    return point, normal


def _sphere_shape_pdf(lights: SphereLightArrays, li: int, observer_world: Array) -> Array:
    """Solid-angle cone pdf (Sphere.h:53-74)."""
    obs = matvec3(lights.w2o_l[li], observer_world) + lights.w2o_t[li]
    sqr_dist = sqr_length(obs)
    inside = sqr_dist <= 1.0

    sin2_1_5_deg = 0.00068523
    sin2_theta_max = 1.0 / jnp.maximum(sqr_dist, 1.0)
    cos_theta_max = jnp.sqrt(jnp.maximum(1e-20, 1.0 - sin2_theta_max))
    one_minus = jnp.where(sin2_theta_max < sin2_1_5_deg,
                          sin2_theta_max / 2.0,
                          1.0 - cos_theta_max)
    pdf_cone = 1.0 / (TWO_PI * jnp.maximum(one_minus, 1e-20))
    return jnp.where(inside, uniform_sphere_pdf(), pdf_cone)


def sphere_light_sample(lights: SphereLightArrays, li: int, p: Array, n: Array,
                        u: Array) -> LightSample:
    """ObjectLight::sample_impl + Light::sample (Light.h:38-49, 81-90)."""
    sampled_point, sampled_normal = _sphere_shape_sample(lights, li, p, u)
    to_sample = sampled_point - p
    wi = normalize(to_sample)
    pdf = _sphere_shape_pdf(lights, li, p)
    distance = length(to_sample) - get_ray_offset_nd(sampled_normal, -wi)
    t_min = get_ray_offset_nd(n, wi)
    return LightSample(L=lights.radiance[li], pdf=pdf, wi=wi,
                       t_min=t_min, t_max=distance)


def sphere_light_pdf(lights: SphereLightArrays, li: int, p: Array, wi: Array) -> Array:
    return _sphere_shape_pdf(lights, li, p)


def sphere_light_intersect(lights: SphereLightArrays, li: int, ro: Array, rd: Array,
                           t_min: Array, t_max: Array) -> tuple[Array, Array]:
    """Sphere intersect for light rays → (t, valid) (Light.h:352-359)."""
    o = matvec3(lights.w2o_l[li], ro) + lights.w2o_t[li]
    d = matvec3(lights.w2o_l[li], rd)
    a = dot(d, d)
    b = 2.0 * dot(d, o)
    c = dot(o, o) - 1.0
    disc = b * b - 4.0 * a * c
    has = disc > 0.0
    # guard: sqrt'(0)=∞ turns masked lanes' 0-cotangents into NaN under AD
    sq = jnp.sqrt(jnp.where(has, jnp.maximum(disc, 1e-12), 1.0))
    t0 = (-b - sq) / (2.0 * a)
    t1 = (-b + sq) / (2.0 * a)
    t = jnp.where(t0 < t_min, t1, t0)
    valid = has & (t >= t_min) & (t <= t_max)
    return t, valid


def sphere_light_intersect_p(lights: SphereLightArrays, li: int, ro: Array, rd: Array,
                             t_min: Array, t_max: Array) -> Array:
    _, valid = sphere_light_intersect(lights, li, ro, rd, t_min, t_max)
    return valid


# ------------------------------------------------------------ env lights

def _env_distribution(env: EnvLightArrays) -> Distribution2D:
    marg = Distribution1D(env.cdf_marg_f, env.cdf_marg, env.cdf_marg_int, 0.0, 1.0)
    return Distribution2D(env.cdf_cond_f, env.cdf_cond, env.cdf_cond_int, marg)


def _ibl_lookup(env: EnvLightArrays, s: Array, t: Array) -> Array:
    """Nearest-neighbor texel fetch with RemapWrap/RemapClamp
    (Light.h:246, Image.h:96-115)."""
    s = jnp.mod(1.0 + jnp.mod(s, 1.0), 1.0)                 # RemapWrap
    t = jnp.clip(t, 0.0, 0.99999994)                        # RemapClamp
    h, w = env.image.shape[0], env.image.shape[1]
    x = jnp.minimum(jnp.round(s * w).astype(jnp.int32), w - 1)
    y = jnp.minimum(jnp.round(t * h).astype(jnp.int32), h - 1)
    return env.image[y, x]


def env_light_sample(env: EnvLightArrays, env_kind: int, u: Array) -> LightSample:
    """EnvironmentLight / ImageBasedEnvironmentLight light_sample
    (Light.h:158-164, 226-248).  env_kind is static."""
    if env_kind == ENV_CONST:
        p = sample_to_uniform_sphere(u)
        return LightSample(L=env.radiance, pdf=jnp.asarray(uniform_sphere_pdf(), jnp.float32),
                           wi=p, t_min=jnp.asarray(RAY_EPSILON, jnp.float32),
                           t_max=jnp.asarray(INF_DISTANCE, jnp.float32))
    # ENV_IBL
    dist = _env_distribution(env)
    st, map_pdf = sample_continuous_2d(dist, u)
    theta = st[1] * PI
    phi = st[0] * TWO_PI
    ct, stheta = jnp.cos(theta), jnp.sin(theta)
    wi_local = jnp.stack([stheta * jnp.cos(phi), ct, stheta * jnp.sin(phi)])
    wi = matvec3(env.l2w, wi_local)
    pdf = jnp.where(stheta == 0.0, 0.0,
                    map_pdf / (2.0 * PI * PI * jnp.where(stheta == 0.0, 1.0, stheta)))
    pdf = jnp.where(map_pdf == 0.0, 0.0, pdf)
    L = _ibl_lookup(env, st[0], st[1])
    L = jnp.where(map_pdf == 0.0, 0.0, L)
    return LightSample(L=L, pdf=pdf, wi=wi,
                       t_min=jnp.asarray(RAY_EPSILON, jnp.float32),
                       t_max=jnp.asarray(INF_DISTANCE, jnp.float32))


def env_light_pdf(env: EnvLightArrays, env_kind: int, wi: Array) -> Array:
    """pdf_impl (Light.h:166-169, 250-265)."""
    if env_kind == ENV_CONST:
        return jnp.asarray(uniform_sphere_pdf(), jnp.float32)
    w = matvec3(env.w2l, wi)
    theta = spherical_theta(w)
    phi = spherical_phi(w)
    stheta = jnp.sin(theta)
    dist = _env_distribution(env)
    # Reference quirk (Light.h:262): the v coordinate passed to the 2D pdf is
    # theta * π (not theta/π); reproduced verbatim.
    p = jnp.stack([phi / TWO_PI, theta * PI])
    map_pdf = pdf_2d(dist, p)
    return jnp.where(stheta == 0.0, 0.0,
                     map_pdf / (2.0 * PI * PI * jnp.where(stheta == 0.0, 1.0, stheta)))


def env_light_radiance(env: EnvLightArrays, env_kind: int, rd: Array) -> Array:
    """Radiance seen by a ray that escapes to infinity
    (intersect_lights_impl: Light.h:135-141, 196-209)."""
    if env_kind == ENV_CONST:
        return env.radiance
    w = normalize(matvec3(env.w2l, rd))
    s = spherical_phi(w) / TWO_PI
    t = spherical_theta(w) / PI
    return _ibl_lookup(env, s, t)
