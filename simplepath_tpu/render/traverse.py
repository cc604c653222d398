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

STACK_DEPTH = 96


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

def _slab_test(box: Array, ro: Array, inv_d: Array,
               t_min: Array, t_max: Array) -> tuple[Array, Array]:
    """Ray-vs-W-boxes slab test (math/BBox.h:122-146), vectorized over the
    child axis.  box: [W,6] (lo,hi) → (hit [W], tnear [W])."""
    t0 = (box[:, :3] - ro) * inv_d          # [W,3]
    t1 = (box[:, 3:] - ro) * inv_d
    tnear = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tfar = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (jnp.maximum(tnear, t_min) <= jnp.minimum(tfar, t_max)) & (tfar >= t_min)
    return hit, tnear


def _visit_node(bvh, node, ro, inv_d, t_min, cur_t_max):
    """Shared node visit: gather, slab test, compact hit internal children
    (nearest LAST so the nearest pops first) and report leaf window.

    Returns (packed_children [W], n_push, leaf_mask [W], cfirst, ccount)."""
    box = bvh.child_box[node]        # [W,6]
    meta = bvh.child_meta[node]      # [W,3]
    cnode, cfirst, ccount = meta[:, 0], meta[:, 1], meta[:, 2]
    box_hit, tnear = _slab_test(box, ro, inv_d, t_min, cur_t_max)

    is_internal = (cnode >= 0) & box_hit
    # pack pushed children to the front in FAR-to-NEAR order: the stack is
    # LIFO so the nearest child (packed last) pops first, shrinking t_max
    # early.  Descending sort on where(pushed, tnear, -inf) puts non-pushed
    # slots at the tail.
    order = jnp.argsort(jnp.where(is_internal, tnear, -jnp.inf))[::-1]
    packed = cnode[order]
    n_push = jnp.sum(is_internal.astype(jnp.int32))
    leaf_mask = (ccount > 0) & box_hit
    return packed, n_push, leaf_mask, cfirst, ccount


def _leaf_prims(leaf_mask, cfirst, ccount, leaf_cap: int):
    """Flatten the node's leaf ranges into a [W*leaf_cap] padded index list."""
    lane = jnp.arange(leaf_cap, dtype=jnp.int32)
    pj = (cfirst[:, None] + lane[None, :]).reshape(-1)
    mask = (leaf_mask[:, None] & (lane[None, :] < ccount[:, None])).reshape(-1)
    return jnp.where(mask, pj, 0), mask


def _bvh_closest(scene: Scene, ro, rd, t_min, t_max) -> Hit:
    """Stack-based closest-hit over the wide BVH (triangles only).

    Children are visited nearest-first (t_max shrinks quickly → fewer node
    visits); pushes go through one dynamic_update_slice instead of W
    scatters.
    """
    bvh = scene.bvh
    tri = scene.triangles
    inv_d = 1.0 / rd  # IEEE inf for zero components is fine for slabs
    leaf_cap = 4      # builder caps leaves at LEAF_SIZE
    W = bvh.child_meta.shape[1]

    def cond(state):
        sp = state[1]
        return sp > 0

    def body(state):
        stack, sp, best = state
        node = stack[sp - 1]
        sp = sp - 1

        cur_t_max = jnp.minimum(t_max, jnp.where(best.valid, best.t, INF_DISTANCE))
        packed, n_push, leaf_mask, cfirst, ccount = _visit_node(
            bvh, node, ro, inv_d, t_min, cur_t_max)

        pj, mask = _leaf_prims(leaf_mask, cfirst, ccount, leaf_cap)
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

        # single-slice push of all hit children (stack size leaves W slack)
        sp_safe = jnp.minimum(sp, STACK_DEPTH - W)
        stack = jax.lax.dynamic_update_slice(
            stack, jnp.where(jnp.arange(W) < n_push, packed,
                             jax.lax.dynamic_slice(stack, (sp_safe,), (W,))),
            (sp_safe,))
        sp = sp_safe + n_push
        return stack, sp, best

    stack0 = jnp.zeros(STACK_DEPTH, jnp.int32)
    sp0 = jnp.asarray(1, jnp.int32)
    _, _, best = jax.lax.while_loop(cond, body, (stack0, sp0, _miss()))
    return best


def _bvh_any(scene: Scene, ro, rd, t_min, t_max) -> Array:
    """Any-hit (occlusion) over the wide BVH with early exit."""
    bvh = scene.bvh
    tri = scene.triangles
    inv_d = 1.0 / rd
    leaf_cap = 4
    W = bvh.child_meta.shape[1]

    def cond(state):
        _, sp, found = state
        return (sp > 0) & ~found

    def body(state):
        stack, sp, found = state
        node = stack[sp - 1]
        sp = sp - 1
        packed, n_push, leaf_mask, cfirst, ccount = _visit_node(
            bvh, node, ro, inv_d, t_min, t_max)

        pj, mask = _leaf_prims(leaf_mask, cfirst, ccount, leaf_cap)
        _, _, _, valid = intersect_triangles(
            tri.v0[pj], tri.v1[pj], tri.v2[pj], ro, rd, t_min, t_max)
        found = found | jnp.any(valid & mask)

        sp_safe = jnp.minimum(sp, STACK_DEPTH - W)
        stack = jax.lax.dynamic_update_slice(
            stack, jnp.where(jnp.arange(W) < n_push, packed,
                             jax.lax.dynamic_slice(stack, (sp_safe,), (W,))),
            (sp_safe,))
        sp = sp_safe + n_push
        return stack, sp, found

    stack0 = jnp.zeros(STACK_DEPTH, jnp.int32)
    _, _, found = jax.lax.while_loop(cond, body, (stack0, jnp.asarray(1, jnp.int32),
                                                  jnp.asarray(False)))
    return found


# ---------------------------------------------------------- public API

def scene_intersect(scene: Scene, ro: Array, rd: Array, t_min: Array,
                    t_max: Array) -> Hit:
    """Closest geometry hit (Scene.h:74-77).

    The SEARCH (which primitive wins) runs detached from autodiff — BVH
    traversal is a while-loop and hit selection is discrete anyway — and the
    winning primitive is then re-intersected differentiably, so dt/dθ flows
    through camera/geometry parameters (the standard detached-decision
    estimator for differentiable ray tracing).
    """
    sg = jax.lax.stop_gradient
    scene_d, ro_d, rd_d = sg(scene), sg(ro), sg(rd)
    t_min_d, t_max_d = sg(t_min), sg(t_max)
    best = _miss()
    if scene.static.num_triangles > 0:
        if scene.static.has_bvh:
            best = _closer(best, _bvh_closest(scene_d, ro_d, rd_d, t_min_d, t_max_d))
        else:
            best = _closer(best, _brute_triangles(scene_d, ro_d, rd_d, t_min_d, t_max_d))
    if scene.static.num_spheres > 0:
        best = _closer(best, _brute_spheres(scene_d, ro_d, rd_d, t_min_d, t_max_d))
    if scene.static.num_planes > 0:
        best = _closer(best, _brute_planes(scene_d, ro_d, rd_d, t_min_d, t_max_d))
    return _refine_hit(scene, best, ro, rd)


def _refine_hit(scene: Scene, hit: Hit, ro: Array, rd: Array) -> Hit:
    """Recompute t/beta/gamma of the winning primitive differentiably."""
    idx = hit.idx
    t = hit.t
    beta, gamma = hit.beta, hit.gamma
    big = jnp.asarray(3.4e38, jnp.float32)
    if scene.static.num_triangles > 0:
        is_tri = hit.kind == KIND_TRIANGLE
        i = jnp.where(is_tri, idx, 0)
        tri = scene.triangles
        tt, bb, gg, _ = intersect_triangles(tri.v0[i][None], tri.v1[i][None],
                                            tri.v2[i][None], ro, rd,
                                            -big, big)
        t = jnp.where(is_tri, tt[0], t)
        beta = jnp.where(is_tri, bb[0], beta)
        gamma = jnp.where(is_tri, gg[0], gamma)
    if scene.static.num_spheres > 0:
        is_sph = hit.kind == KIND_SPHERE
        i = jnp.where(is_sph, idx, 0)
        sph = scene.spheres
        o = jnp.einsum("ij,j->i", sph.w2o_l[i], ro) + sph.w2o_t[i]
        d = jnp.einsum("ij,j->i", sph.w2o_l[i], rd)
        a = jnp.sum(d * d)
        b = 2.0 * jnp.sum(d * o)
        c = jnp.sum(o * o) - 1.0
        disc = b * b - 4.0 * a * c
        # sqrt(0) has an infinite jacobian; keep a benign value on lanes that
        # didn't hit a sphere so 0-cotangents don't turn into NaNs
        disc = jnp.where(is_sph, jnp.maximum(disc, 1e-12), 1.0)
        sq = jnp.sqrt(disc)
        t0 = (-b - sq) / (2.0 * a)
        t1 = (-b + sq) / (2.0 * a)
        # pick the root the detached search selected
        pick0 = jnp.abs(jax.lax.stop_gradient(t0) - hit.t) <= \
            jnp.abs(jax.lax.stop_gradient(t1) - hit.t)
        t_sph = jnp.where(pick0, t0, t1)
        t = jnp.where(is_sph, t_sph, t)
    if scene.static.num_planes > 0:
        is_pl = hit.kind == KIND_PLANE
        i = jnp.where(is_pl, idx, 0)
        one = PlaneArraysView(scene.planes, i)
        tt, _ = intersect_planes(one, ro, rd, jnp.asarray(-big), big)
        t = jnp.where(is_pl, tt[0], t)
    return hit._replace(t=t, beta=beta, gamma=gamma)


def SphereArraysView(sph, i):
    from ..scene.types import SphereArrays
    return SphereArrays(o2w_l=sph.o2w_l[i][None], o2w_t=sph.o2w_t[i][None],
                        w2o_l=sph.w2o_l[i][None], w2o_t=sph.w2o_t[i][None],
                        material_id=sph.material_id[i][None])


def PlaneArraysView(pl, i):
    from ..scene.types import PlaneArrays
    return PlaneArrays(o2w_l=pl.o2w_l[i][None], o2w_t=pl.o2w_t[i][None],
                       w2o_l=pl.w2o_l[i][None], w2o_t=pl.w2o_t[i][None],
                       material_id=pl.material_id[i][None])


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
    """Occlusion: geometry OR lights (Scene.h:79-82).

    Fully detached — visibility is a discrete decision; its (measure-zero)
    boundary gradient is out of scope (BASELINE north star).
    """
    from .lights import sphere_light_intersect_p

    sg = jax.lax.stop_gradient
    scene, ro, rd, t_min, t_max = sg(scene), sg(ro), sg(rd), sg(t_min), sg(t_max)
    found = scene_intersect_geometry_p(scene, ro, rd, t_min, t_max)
    for li in range(scene.static.num_sphere_lights):
        found = found | sphere_light_intersect_p(scene.sphere_lights, li,
                                                 ro, rd, t_min, t_max)
    return found


def hit_shading(scene: Scene, hit: Hit, ro: Array, rd: Array) -> tuple[Array, Array, Array]:
    """(point, shading normal, material_id) for a Hit; masked per kind.

    NaN-safety for autodiff: missed lanes carry t=inf and no normal; naive
    masking still produces inf/0-vector intermediates whose backward
    jacobians are NaN even under ``where`` (0·NaN).  All inputs to nonlinear
    ops are therefore clamped to benign values on missed lanes BEFORE the
    math, and the defaults (t=1, n=+y) are only ever used masked.
    """
    t_safe = jnp.where(hit.valid & jnp.isfinite(hit.t), hit.t, 1.0)
    point = ro + t_safe * rd
    n = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)
    mid = jnp.asarray(0, jnp.int32)
    if scene.static.num_triangles > 0:
        is_tri = hit.kind == KIND_TRIANGLE
        i = jnp.where(is_tri, hit.idx, 0)
        beta = jnp.where(is_tri, hit.beta, 0.3)
        gamma = jnp.where(is_tri, hit.gamma, 0.3)
        n_tri = triangle_normal(scene.triangles, i, beta, gamma)
        n = jnp.where(is_tri, n_tri, n)
        mid = jnp.where(is_tri, scene.triangles.material_id[i], mid)
    if scene.static.num_spheres > 0:
        is_sph = hit.kind == KIND_SPHERE
        i = jnp.where(is_sph, hit.idx, 0)
        n_sph = sphere_normal(scene.spheres, i, ro, rd,
                              jnp.where(is_sph, t_safe, 1.0))
        n = jnp.where(is_sph, n_sph, n)
        mid = jnp.where(is_sph, scene.spheres.material_id[i], mid)
    if scene.static.num_planes > 0:
        is_pl = hit.kind == KIND_PLANE
        i = jnp.where(is_pl, hit.idx, 0)
        n_pl = plane_normal(scene.planes, i)
        n = jnp.where(is_pl, n_pl, n)
        mid = jnp.where(is_pl, scene.planes.material_id[i], mid)
    return point, n, mid
