"""Scene intersection: closest-hit, any-hit, and light-hit queries.

TPU-native replacement for the reference's accelerator stack
(``/root/reference/base/Scene.h:69-88``, ``shapes/ListAccelerator.h``,
``shapes/BVHAccelerator.h``): recursion and virtual dispatch become a
fixed-state ``lax.while_loop`` over a flattened 4-wide BVH plus vectorized
brute-force scans for the (few) analytic primitives.  Each function is
written per-ray and vmapped by the integrators; XLA turns the vmapped
while-loop into a lock-step masked loop across the ray batch.

Primitive kind tags in Hit: 0 = triangle, 1 = sphere, 2 = plane.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from ..scene.types import Scene
from .intersect import (INF_DISTANCE, intersect_planes, intersect_spheres,
                        intersect_triangles, plane_normal, sphere_normal,
                        triangle_normal)

__all__ = ["Hit", "scene_intersect", "scene_intersect_p",
           "scene_intersect_lights", "hit_shading"]

KIND_TRIANGLE = 0
KIND_SPHERE = 1
KIND_PLANE = 2

STACK_DEPTH = 64


class Hit(NamedTuple):
    valid: Array
    t: Array
    kind: Array    # int32 primitive kind
    idx: Array     # int32 index into the kind's table
    beta: Array    # triangle barycentrics (0 otherwise)
    gamma: Array


def _miss() -> Hit:
    return Hit(valid=jnp.asarray(False),
               t=jnp.asarray(INF_DISTANCE, jnp.float32),
               kind=jnp.asarray(-1, jnp.int32),
               idx=jnp.asarray(-1, jnp.int32),
               beta=jnp.asarray(0.0, jnp.float32),
               gamma=jnp.asarray(0.0, jnp.float32))


def _closer(a: Hit, b: Hit) -> Hit:
    """Pick the closer of two hits (invalid = +inf)."""
    ta = jnp.where(a.valid, a.t, INF_DISTANCE)
    tb = jnp.where(b.valid, b.t, INF_DISTANCE)
    take_a = ta <= tb
    return Hit(valid=a.valid | b.valid,
               t=jnp.where(take_a, a.t, b.t),
               kind=jnp.where(take_a, a.kind, b.kind),
               idx=jnp.where(take_a, a.idx, b.idx),
               beta=jnp.where(take_a, a.beta, b.beta),
               gamma=jnp.where(take_a, a.gamma, b.gamma))


# ---------------------------------------------------------- brute force

def _brute_triangles(scene: Scene, ro, rd, t_min, t_max) -> Hit:
    tri = scene.triangles
    t, beta, gamma, valid = intersect_triangles(tri.v0, tri.v1, tri.v2,
                                                ro, rd, t_min, t_max)
    t_masked = jnp.where(valid, t, INF_DISTANCE)
    i = jnp.argmin(t_masked)
    return Hit(valid=valid[i], t=t[i],
               kind=jnp.asarray(KIND_TRIANGLE, jnp.int32), idx=i.astype(jnp.int32),
               beta=beta[i], gamma=gamma[i])


def _brute_spheres(scene: Scene, ro, rd, t_min, t_max) -> Hit:
    t, valid = intersect_spheres(scene.spheres, ro, rd, t_min, t_max)
    t_masked = jnp.where(valid, t, INF_DISTANCE)
    i = jnp.argmin(t_masked)
    z = jnp.asarray(0.0, jnp.float32)
    return Hit(valid=valid[i], t=t[i],
               kind=jnp.asarray(KIND_SPHERE, jnp.int32), idx=i.astype(jnp.int32),
               beta=z, gamma=z)


def _brute_planes(scene: Scene, ro, rd, t_min, t_max) -> Hit:
    t, valid = intersect_planes(scene.planes, ro, rd, t_min, t_max)
    t_masked = jnp.where(valid, t, INF_DISTANCE)
    i = jnp.argmin(t_masked)
    z = jnp.asarray(0.0, jnp.float32)
    return Hit(valid=valid[i], t=t[i],
               kind=jnp.asarray(KIND_PLANE, jnp.int32), idx=i.astype(jnp.int32),
               beta=z, gamma=z)


# ---------------------------------------------------------- BVH traversal

def _slab_test(lo: Array, hi: Array, ro: Array, inv_d: Array,
               t_min: Array, t_max: Array) -> Array:
    """Ray-vs-4-boxes slab test (math/BBox.h:122-146), vectorized over the
    child axis.  lo/hi: [4,3]."""
    t0 = (lo - ro) * inv_d          # [4,3]
    t1 = (hi - ro) * inv_d
    tnear = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tfar = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return (jnp.maximum(tnear, t_min) <= jnp.minimum(tfar, t_max)) & (tfar >= t_min)


def _bvh_closest(scene: Scene, ro, rd, t_min, t_max) -> Hit:
    """Stack-based closest-hit over the 4-wide BVH (triangles only)."""
    bvh = scene.bvh
    tri = scene.triangles
    inv_d = 1.0 / rd  # IEEE inf for zero components is fine for slabs
    leaf_cap = 4      # builder caps leaves at LEAF_SIZE

    def cond(state):
        sp = state[1]
        return sp > 0

    def body(state):
        stack, sp, best = state
        node = stack[sp - 1]
        sp = sp - 1

        lo = bvh.child_lo[node]       # [4,3]
        hi = bvh.child_hi[node]
        cnode = bvh.child_node[node]  # [4]
        cfirst = bvh.child_first[node]
        ccount = bvh.child_count[node]

        cur_t_max = jnp.minimum(t_max, jnp.where(best.valid, best.t, INF_DISTANCE))
        box_hit = _slab_test(lo, hi, ro, inv_d, t_min, cur_t_max)

        # leaves: one vectorized test over all 4x4 candidate prims
        lane = jnp.arange(leaf_cap, dtype=jnp.int32)
        pj = (cfirst[:, None] + lane[None, :]).reshape(-1)            # [16]
        mask = ((ccount[:, None] > 0) & box_hit[:, None]
                & (lane[None, :] < ccount[:, None])).reshape(-1)       # [16]
        pj = jnp.where(mask, pj, 0)
        t, beta, gamma, valid = intersect_triangles(
            tri.v0[pj], tri.v1[pj], tri.v2[pj], ro, rd, t_min, cur_t_max)
        valid = valid & mask
        tm = jnp.where(valid, t, INF_DISTANCE)
        j = jnp.argmin(tm)
        cand = Hit(valid=valid[j], t=t[j],
                   kind=jnp.asarray(KIND_TRIANGLE, jnp.int32),
                   idx=pj[j].astype(jnp.int32),
                   beta=beta[j], gamma=gamma[j])
        best = _closer(best, cand)

        # internals: push hit children
        for w in range(4):
            push = (cnode[w] >= 0) & box_hit[w]
            stack = stack.at[sp].set(jnp.where(push, cnode[w], stack[sp]))
            sp = sp + push.astype(jnp.int32)

        return stack, sp, best

    stack0 = jnp.zeros(STACK_DEPTH, jnp.int32)
    sp0 = jnp.asarray(1, jnp.int32)
    _, _, best = jax.lax.while_loop(cond, body, (stack0, sp0, _miss()))
    return best


def _bvh_any(scene: Scene, ro, rd, t_min, t_max) -> Array:
    """Any-hit (occlusion) over the BVH with early exit."""
    bvh = scene.bvh
    tri = scene.triangles
    inv_d = 1.0 / rd
    leaf_cap = 4

    def cond(state):
        _, sp, found = state
        return (sp > 0) & ~found

    def body(state):
        stack, sp, found = state
        node = stack[sp - 1]
        sp = sp - 1
        lo = bvh.child_lo[node]
        hi = bvh.child_hi[node]
        cnode = bvh.child_node[node]
        cfirst = bvh.child_first[node]
        ccount = bvh.child_count[node]
        box_hit = _slab_test(lo, hi, ro, inv_d, t_min, t_max)

        lane = jnp.arange(leaf_cap, dtype=jnp.int32)
        pj = (cfirst[:, None] + lane[None, :]).reshape(-1)
        mask = ((ccount[:, None] > 0) & box_hit[:, None]
                & (lane[None, :] < ccount[:, None])).reshape(-1)
        pj = jnp.where(mask, pj, 0)
        _, _, _, valid = intersect_triangles(
            tri.v0[pj], tri.v1[pj], tri.v2[pj], ro, rd, t_min, t_max)
        found = found | jnp.any(valid & mask)

        for w in range(4):
            push = (cnode[w] >= 0) & box_hit[w]
            stack = stack.at[sp].set(jnp.where(push, cnode[w], stack[sp]))
            sp = sp + push.astype(jnp.int32)
        return stack, sp, found

    stack0 = jnp.zeros(STACK_DEPTH, jnp.int32)
    _, _, found = jax.lax.while_loop(cond, body, (stack0, jnp.asarray(1, jnp.int32),
                                                  jnp.asarray(False)))
    return found


# ---------------------------------------------------------- public API

def scene_intersect(scene: Scene, ro: Array, rd: Array, t_min: Array,
                    t_max: Array) -> Hit:
    """Closest geometry hit (Scene.h:74-77)."""
    best = _miss()
    if scene.static.num_triangles > 0:
        if scene.static.has_bvh:
            best = _closer(best, _bvh_closest(scene, ro, rd, t_min, t_max))
        else:
            best = _closer(best, _brute_triangles(scene, ro, rd, t_min, t_max))
    if scene.static.num_spheres > 0:
        best = _closer(best, _brute_spheres(scene, ro, rd, t_min, t_max))
    if scene.static.num_planes > 0:
        best = _closer(best, _brute_planes(scene, ro, rd, t_min, t_max))
    return best


def scene_intersect_geometry_p(scene: Scene, ro: Array, rd: Array, t_min: Array,
                               t_max: Array) -> Array:
    """Any geometry hit in (t_min, t_max)."""
    found = jnp.asarray(False)
    if scene.static.num_triangles > 0:
        if scene.static.has_bvh:
            found = found | _bvh_any(scene, ro, rd, t_min, t_max)
        else:
            tri = scene.triangles
            _, _, _, valid = intersect_triangles(tri.v0, tri.v1, tri.v2,
                                                 ro, rd, t_min, t_max)
            found = found | jnp.any(valid)
    if scene.static.num_spheres > 0:
        _, valid = intersect_spheres(scene.spheres, ro, rd, t_min, t_max)
        found = found | jnp.any(valid)
    if scene.static.num_planes > 0:
        _, valid = intersect_planes(scene.planes, ro, rd, t_min, t_max)
        found = found | jnp.any(valid)
    return found


def scene_intersect_lights(scene: Scene, ro: Array, rd: Array, t_min: Array,
                           t_max: Array) -> tuple[Array, Array, Array]:
    """Closest light hit → (hit, distance, L) (Scene.h:69-72).

    Sphere lights at their geometric distance; the environment light "hits"
    at infinity only when t_max is still infinite (Light.h:135-141).
    """
    from .lights import env_light_radiance, sphere_light_intersect

    hit = jnp.asarray(False)
    dist = jnp.asarray(INF_DISTANCE, jnp.float32)
    L = jnp.zeros(3, jnp.float32)

    for li in range(scene.static.num_sphere_lights):
        t, valid = sphere_light_intersect(scene.sphere_lights, li, ro, rd, t_min, t_max)
        closer = valid & (t < dist)
        dist = jnp.where(closer, t, dist)
        L = jnp.where(closer, scene.sphere_lights.radiance[li], L)
        hit = hit | valid

    if scene.static.env_kind != 0:
        env_ok = ~(t_max < INF_DISTANCE) & ~hit
        env_L = env_light_radiance(scene.env, scene.static.env_kind, rd)
        L = jnp.where(env_ok, env_L, L)
        dist = jnp.where(env_ok, INF_DISTANCE, dist)
        hit = hit | env_ok
    return hit, dist, L


def scene_intersect_p(scene: Scene, ro: Array, rd: Array, t_min: Array,
                      t_max: Array) -> Array:
    """Occlusion: geometry OR lights (Scene.h:79-82)."""
    from .lights import sphere_light_intersect_p

    found = scene_intersect_geometry_p(scene, ro, rd, t_min, t_max)
    for li in range(scene.static.num_sphere_lights):
        found = found | sphere_light_intersect_p(scene.sphere_lights, li,
                                                 ro, rd, t_min, t_max)
    return found


def hit_shading(scene: Scene, hit: Hit, ro: Array, rd: Array) -> tuple[Array, Array, Array]:
    """(point, shading normal, material_id) for a Hit; masked per kind."""
    point = ro + hit.t * rd
    n = jnp.zeros(3, jnp.float32)
    mid = jnp.asarray(0, jnp.int32)
    if scene.static.num_triangles > 0:
        is_tri = hit.kind == KIND_TRIANGLE
        i = jnp.where(is_tri, hit.idx, 0)
        n_tri = triangle_normal(scene.triangles, i, hit.beta, hit.gamma)
        n = jnp.where(is_tri, n_tri, n)
        mid = jnp.where(is_tri, scene.triangles.material_id[i], mid)
    if scene.static.num_spheres > 0:
        is_sph = hit.kind == KIND_SPHERE
        i = jnp.where(is_sph, hit.idx, 0)
        n_sph = sphere_normal(scene.spheres, i, ro, rd, hit.t)
        n = jnp.where(is_sph, n_sph, n)
        mid = jnp.where(is_sph, scene.spheres.material_id[i], mid)
    if scene.static.num_planes > 0:
        is_pl = hit.kind == KIND_PLANE
        i = jnp.where(is_pl, hit.idx, 0)
        n_pl = plane_normal(scene.planes, i)
        n = jnp.where(is_pl, n_pl, n)
        mid = jnp.where(is_pl, scene.planes.material_id[i], mid)
    return point, n, mid
