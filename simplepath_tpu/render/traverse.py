"""Scene intersection: closest-hit, any-hit, and light-hit queries.

TPU-native replacement for the reference's accelerator stack
(``/root/reference/base/Scene.h:69-88``, ``shapes/ListAccelerator.h``,
``shapes/BVHAccelerator.h``): recursion and virtual dispatch become a
fixed-state ``lax.while_loop`` over a flattened 8-wide record BVH plus
vectorized brute-force scans for the (few) analytic primitives.  Each function is
written per-ray and vmapped by the integrators; XLA turns the vmapped
while-loop into a lock-step masked loop across the ray batch.

Primitive kind tags in Hit: 0 = triangle, 1 = sphere, 2 = plane.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from ..scene.types import Scene
from .intersect import (INF_DISTANCE, intersect_planes, intersect_spheres,
                        intersect_triangles, plane_normal, sphere_normal,
                        triangle_normal)

__all__ = ["Hit", "scene_intersect", "scene_intersect_batch",
           "scene_intersect_p", "scene_intersect_p_batch",
           "scene_intersect_lights", "hit_shading"]


def _pallas_enabled() -> bool:
    """Use the Pallas packet-traversal kernels for BVH closest-hit?

    Trace-time decision: on TPU the packet kernels are ~15x faster on
    primary rays and ~3x on incoherent bounces than the vmapped XLA
    while-loop (measured, tools/prof_pallas.py vs prof_traverse.py); on CPU
    the XLA path wins and keeps tests deterministic.  Override with
    SIMPLEPATH_PALLAS=0/1.
    """
    env = os.environ.get("SIMPLEPATH_PALLAS", "auto")
    if env == "0":
        return False
    if env == "1":
        return True
    return jax.default_backend() == "tpu"

KIND_TRIANGLE = 0
KIND_SPHERE = 1
KIND_PLANE = 2

from ..scene.bvh import (LEAF_ROWS as _LEAF_ROWS, LEAF_SIZE as _LEAF_K,
                         RECORD_WIDTH as _REC, WIDTH as _W)

# Worst-case stack: tree depth × (WIDTH-1) + 1.  Median splits keep the tree
# balanced, so depth ≈ ceil(log8(T/6)); 64 covers beyond lucy-scale (28M
# tris) at W=8.  Wider experimental trees push (W-1) per level, so they get
# a deeper stack (the one-hot push/pop cost scales with it — don't pay it
# in the default configuration).
STACK_DEPTH = 64 if _W <= 8 else 128


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
#
# The BVH is a unified f32[M,128] record table (scene/bvh.py): one 512-byte
# row per node, internal or leaf, tagged by the sign of the stack reference.
# Each loop iteration gathers exactly ONE row per ray — scattered small
# fetches (per-vertex gathers) run orders of magnitude below HBM bandwidth
# on TPU, wide contiguous rows stream near it.  Both interpretations of the
# row are computed every iteration (lock-step SIMD across the vmapped ray
# batch; ALU is ~300 flops and free next to the gather) and the tag selects.

def batcher_pairs(n: int) -> tuple[tuple[int, int], ...]:
    """Batcher odd-even mergesort compare-exchange network for n lanes
    (n a power of two): 19 CEs at n=8, 63 at n=16."""
    def merge(lo, hi, r):
        step = r * 2
        if step < hi - lo:
            yield from merge(lo, hi, step)
            yield from merge(lo + r, hi, step)
            for i in range(lo + r, hi - r, step):
                yield (i, i + r)
        else:
            yield (lo, lo + r)

    def sort(lo, hi):
        if hi - lo >= 1:
            mid = lo + (hi - lo) // 2
            yield from sort(lo, mid)
            yield from sort(mid + 1, hi)
            yield from merge(lo, hi, 1)

    return tuple(sort(0, n - 1))


_SORTW_PAIRS = batcher_pairs(_W)


def _sortw_desc(keys: Array, vals: Array) -> tuple[Array, Array]:
    """Sort W (key, val) pairs descending by key via a sorting network —
    cheap select chains instead of a general argsort in the hot loop."""
    for a, b in _SORTW_PAIRS:
        ka, kb = keys[a], keys[b]
        va, vb = vals[a], vals[b]
        swap = ka < kb
        keys = keys.at[a].set(jnp.where(swap, kb, ka))
        keys = keys.at[b].set(jnp.where(swap, ka, kb))
        vals = vals.at[a].set(jnp.where(swap, vb, va))
        vals = vals.at[b].set(jnp.where(swap, va, vb))
    return keys, vals


_NEG_BIG = -3.0e38  # plain float: a module-level jnp scalar would
                    # initialize the XLA backend at import time,
                    # locking the platform before the CLI's
                    # --platform flag can select one


def _visit_internal(rec: Array, is_leaf, ro, inv_d, t_min, cur_t_max):
    """Slab-test the W children of an internal record (math/BBox.h:122-146)
    and pack hit child refs far-to-near (LIFO stack → nearest pops first).

    Returns (packed_refs [W], n_push)."""
    W = _W
    t0x = (rec[0:W] - ro[0]) * inv_d[0]
    t0y = (rec[W:2 * W] - ro[1]) * inv_d[1]
    t0z = (rec[2 * W:3 * W] - ro[2]) * inv_d[2]
    t1x = (rec[3 * W:4 * W] - ro[0]) * inv_d[0]
    t1y = (rec[4 * W:5 * W] - ro[1]) * inv_d[1]
    t1z = (rec[5 * W:6 * W] - ro[2]) * inv_d[2]
    tnear = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                        jnp.minimum(t0z, t1z))
    tfar = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                       jnp.maximum(t0z, t1z))
    box_hit = (jnp.maximum(tnear, t_min) <= jnp.minimum(tfar, cur_t_max)) \
        & (tfar >= t_min)
    cref = rec[6 * W:7 * W].astype(jnp.int32)   # refs are exact f32 values
    push = box_hit & (cref != 0) & ~is_leaf
    key = jnp.where(push, tnear, -jnp.inf)
    skey, packed = _sortw_desc(key, cref)
    n_push = jnp.sum((skey > _NEG_BIG).astype(jnp.int32))
    return packed, n_push


def _visit_leaf(rec: Array, ro, rd, t_min, cur_t_max):
    """Shirley barycentric test (Triangle.h:97-162) on a leaf record's ≤K
    triangles.  A,B,C / D,E,F are the precomputed v0-v1 / v0-v2 edges —
    identical arithmetic to ``intersect_triangles``.  ``rec`` is the leaf's
    LEAF_ROWS rows flattened.

    Returns (t, beta, gamma, valid, tri_idx), each [K]."""
    K = _LEAF_K
    v0x, v0y, v0z = rec[0:K], rec[K:2 * K], rec[2 * K:3 * K]
    A, B, C = rec[3 * K:4 * K], rec[4 * K:5 * K], rec[5 * K:6 * K]
    D, E, F = rec[6 * K:7 * K], rec[7 * K:8 * K], rec[8 * K:9 * K]
    # leaf triangles are a contiguous range: index = base + lane (scene/bvh.py;
    # base split into two exact small floats lifts the 2^24 triangle ceiling)
    base = (rec[9 * K + 1].astype(jnp.int32) << 12) + rec[9 * K].astype(jnp.int32)
    lane = jnp.arange(K, dtype=jnp.int32)
    tri_idx = base + lane
    in_leaf = lane < rec[9 * K + 2].astype(jnp.int32)
    G, H, I = rd[0], rd[1], rd[2]
    J = v0x - ro[0]
    K = v0y - ro[1]
    L = v0z - ro[2]

    EIHF = E * I - H * F
    GFDI = G * F - D * I
    DHEG = D * H - E * G
    denom = A * EIHF + B * GFDI + C * DHEG
    # one reciprocal + 3 multiplies — keep bit-identical to the Pallas
    # kernel's _leaf_tri (pallas_traverse.py)
    inv = 1.0 / jnp.where(denom == 0.0, 1.0, denom)
    beta = (J * EIHF + K * GFDI + L * DHEG) * inv
    AKJB = A * K - J * B
    JCAL = J * C - A * L
    BLKC = B * L - K * C
    gamma = (I * AKJB + H * JCAL + G * BLKC) * inv
    t = -(F * AKJB + E * JCAL + D * BLKC) * inv
    valid = ((denom != 0.0) & in_leaf
             & (beta > 0.0) & (beta < 1.0)
             & (gamma > 0.0) & (beta + gamma < 1.0)
             & (t >= t_min) & (t <= cur_t_max))
    return t, beta, gamma, valid, tri_idx


def _pop(stack, sp):
    """Read stack[sp-1] as a dense one-hot reduction.

    Per-lane dynamic indexing (``stack[sp - 1]``) inside a vmapped
    while_loop lowers to a TPU scatter/gather path that is ~10^5× slower
    than dense VPU math (measured: 1.7 s vs 0.02 ms per iteration for a
    256k-ray batch); one-hot select-and-sum keeps the loop on the VPU."""
    oh = jnp.arange(STACK_DEPTH, dtype=jnp.int32) == sp - 1
    return jnp.sum(jnp.where(oh, stack, 0))


def _push(stack, sp, packed, n_push):
    """Write packed[0:n_push] at stack[sp:sp+n_push], densely (see _pop):
    each slot i takes packed[i - sp] via a [STACK_DEPTH, W] one-hot."""
    sp_safe = jnp.minimum(sp, STACK_DEPTH - _W)
    rel = jnp.arange(STACK_DEPTH, dtype=jnp.int32) - sp_safe
    sel = (rel >= 0) & (rel < n_push)
    ohw = rel[:, None] == jnp.arange(_W, dtype=jnp.int32)[None, :]
    gathered = jnp.sum(jnp.where(ohw, packed[None, :], 0), axis=1)
    return jnp.where(sel, gathered, stack), sp_safe + n_push


def _fetch_rows(records, ref):
    """The record row(s) for |ref|-1, flattened: one row at LEAF_ROWS=1
    (the default layout), LEAF_ROWS consecutive rows for multi-row leaves
    (internal visits then carry one junk row — harmless, they only read the
    first 7W floats)."""
    idx = jnp.abs(ref) - 1
    if _LEAF_ROWS == 1:
        return records[idx]
    return jax.lax.dynamic_slice_in_dim(records, idx, _LEAF_ROWS, 0).reshape(-1)


def _bvh_closest(scene: Scene, ro, rd, t_min, t_max) -> Hit:
    """Stack-based closest-hit over the record BVH (triangles only)."""
    records = scene.bvh.records
    inv_d = 1.0 / rd  # IEEE inf for zero components is fine for slabs

    def cond(state):
        return state[1] > 0

    def body(state):
        stack, sp, best = state
        ref = _pop(stack, sp)
        sp = sp - 1
        is_leaf = ref < 0
        rec = _fetch_rows(records, ref)
        cur_t_max = jnp.minimum(t_max, jnp.where(best.valid, best.t, INF_DISTANCE))

        packed, n_push = _visit_internal(rec, is_leaf, ro, inv_d, t_min, cur_t_max)
        t, beta, gamma, valid, tri_idx = _visit_leaf(rec, ro, rd, t_min, cur_t_max)
        valid = valid & is_leaf
        tm = jnp.where(valid, t, INF_DISTANCE)
        j = jnp.argmin(tm)
        cand = Hit(valid=valid[j], t=t[j],
                   kind=jnp.asarray(KIND_TRIANGLE, jnp.int32),
                   idx=tri_idx[j], beta=beta[j], gamma=gamma[j])
        best = _closer(best, cand)

        stack, sp = _push(stack, sp, packed, n_push)
        return stack, sp, best

    stack0 = jnp.zeros(STACK_DEPTH, jnp.int32).at[0].set(1)  # root ref = +1
    _, _, best = jax.lax.while_loop(cond, body,
                                    (stack0, jnp.asarray(1, jnp.int32), _miss()))
    return best


def _bvh_any(scene: Scene, ro, rd, t_min, t_max) -> Array:
    """Any-hit (occlusion) over the record BVH with early exit."""
    records = scene.bvh.records
    inv_d = 1.0 / rd

    def cond(state):
        _, sp, found = state
        return (sp > 0) & ~found

    def body(state):
        stack, sp, found = state
        ref = _pop(stack, sp)
        sp = sp - 1
        is_leaf = ref < 0
        rec = _fetch_rows(records, ref)

        packed, n_push = _visit_internal(rec, is_leaf, ro, inv_d, t_min, t_max)
        _, _, _, valid, _ = _visit_leaf(rec, ro, rd, t_min, t_max)
        found = found | jnp.any(valid & is_leaf)

        stack, sp = _push(stack, sp, packed, n_push)
        return stack, sp, found

    stack0 = jnp.zeros(STACK_DEPTH, jnp.int32).at[0].set(1)
    _, _, found = jax.lax.while_loop(cond, body,
                                     (stack0, jnp.asarray(1, jnp.int32),
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


def scene_intersect_batch(scene: Scene, ro: Array, rd: Array, t_min: Array,
                          t_max: Array) -> Hit:
    """Closest geometry hit for a flat ray batch (ro/rd [N,3], t_min/t_max
    [N]) → batched Hit.

    On TPU with a triangle BVH, the triangle search runs in the Pallas
    packet-traversal kernel (pallas_traverse.packet_closest) — one fused
    kernel instead of a lock-step vmapped while-loop; analytic primitives
    are merged in with vectorized brute force, and the winning primitive is
    re-intersected differentiably per ray (same detached-decision estimator
    as :func:`scene_intersect`).  Elsewhere this is exactly
    ``vmap(scene_intersect)``.
    """
    use_geom_shards = (scene.static.num_triangles > 0
                       and scene.static.geom_shards > 0)
    if not use_geom_shards and not (scene.static.num_triangles > 0
                                    and scene.static.has_bvh
                                    and _pallas_enabled()):
        return jax.vmap(lambda o, d, a, b: scene_intersect(scene, o, d, a, b))(
            ro, rd, t_min, t_max)

    from .pallas_traverse import packet_closest

    sg = jax.lax.stop_gradient
    scene_d, ro_d, rd_d = sg(scene), sg(ro), sg(rd)
    t_min_d, t_max_d = sg(t_min), sg(t_max)

    # off-TPU (SIMPLEPATH_PALLAS=1 on CPU tests) runs the kernel interpreted
    interpret = jax.default_backend() != "tpu"
    if use_geom_shards:
        from ..parallel.geom_shard import sharded_closest
        t, fi, beta, gamma, valid = sharded_closest(
            scene_d.bvh.records, ro_d, rd_d, t_min_d, t_max_d)
    else:
        t, fi, beta, gamma, valid = packet_closest(scene_d.bvh.records,
                                                   ro_d, rd_d,
                                                   t_min_d, t_max_d,
                                                   interpret=interpret)
    n = ro.shape[0]
    best = Hit(valid=valid,
               t=jnp.where(valid, t, INF_DISTANCE),
               kind=jnp.where(valid, KIND_TRIANGLE, -1).astype(jnp.int32),
               idx=jnp.where(valid, fi, -1),
               beta=beta, gamma=gamma)
    if scene.static.num_spheres > 0:
        sph = jax.vmap(lambda o, d, a, b: _brute_spheres(scene_d, o, d, a, b))(
            ro_d, rd_d, t_min_d, t_max_d)
        best = _closer(best, sph)
    if scene.static.num_planes > 0:
        pl = jax.vmap(lambda o, d, a, b: _brute_planes(scene_d, o, d, a, b))(
            ro_d, rd_d, t_min_d, t_max_d)
        best = _closer(best, pl)
    return jax.vmap(lambda h, o, d: _refine_hit(scene, h, o, d))(best, ro, rd)


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
        tt, bb, gg, _ = intersect_triangles(tri.gather_row("v0", i)[None],
                                            tri.gather_row("v1", i)[None],
                                            tri.gather_row("v2", i)[None],
                                            ro, rd, -big, big)
        t = jnp.where(is_tri, tt[0], t)
        beta = jnp.where(is_tri, bb[0], beta)
        gamma = jnp.where(is_tri, gg[0], gamma)
    if scene.static.num_spheres > 0:
        is_sph = hit.kind == KIND_SPHERE
        i = jnp.where(is_sph, idx, 0)
        sph = scene.spheres
        from ..core.vec import matvec3
        o = matvec3(sph.w2o_l[i], ro) + sph.w2o_t[i]
        d = matvec3(sph.w2o_l[i], rd)
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


def scene_intersect_p_batch(scene: Scene, ro: Array, rd: Array, t_min: Array,
                            t_max: Array) -> Array:
    """Occlusion (geometry OR lights) for a flat ray batch — the batched
    ``Scene::intersect_p`` (Scene.h:79-82) behind every NEE shadow ray.

    On TPU with a triangle BVH the triangle test runs in the Pallas packet
    any-hit kernel (``pallas_traverse.packet_anyhit``) — ONE fused kernel for
    the whole wavefront instead of a per-ray vmapped while-loop; analytic
    primitives and sphere lights are vectorized brute force.  Lanes whose
    result the caller will mask out should carry a collapsed interval
    (t_max = -inf): the packet kernel then culls them on the first visit.

    Fully detached — visibility is a discrete decision; its (measure-zero)
    boundary gradient is out of scope (BASELINE north star).
    """
    from .lights import sphere_light_intersect_p

    sg = jax.lax.stop_gradient
    scene, ro, rd = sg(scene), sg(ro), sg(rd)
    t_min, t_max = sg(t_min), sg(t_max)
    n = ro.shape[0]
    found = jnp.zeros(n, bool)
    if scene.static.num_triangles > 0:
        if scene.static.geom_shards > 0:
            from ..parallel.geom_shard import sharded_anyhit
            found = found | sharded_anyhit(scene.bvh.records, ro, rd,
                                           t_min, t_max)
        elif scene.static.has_bvh and _pallas_enabled():
            from .pallas_traverse import packet_anyhit
            interpret = jax.default_backend() != "tpu"
            found = found | packet_anyhit(scene.bvh.records, ro, rd,
                                          t_min, t_max, interpret=interpret)
        elif scene.static.has_bvh:
            found = found | jax.vmap(
                lambda o, d, a, b: _bvh_any(scene, o, d, a, b))(
                ro, rd, t_min, t_max)
        else:
            tri = scene.triangles

            def tri_any(o, d, a, b):
                _, _, _, valid = intersect_triangles(tri.v0, tri.v1, tri.v2,
                                                     o, d, a, b)
                return jnp.any(valid)
            found = found | jax.vmap(tri_any)(ro, rd, t_min, t_max)
    if scene.static.num_spheres > 0:
        found = found | jax.vmap(
            lambda o, d, a, b: jnp.any(intersect_spheres(scene.spheres, o, d,
                                                         a, b)[1]))(
            ro, rd, t_min, t_max)
    if scene.static.num_planes > 0:
        found = found | jax.vmap(
            lambda o, d, a, b: jnp.any(intersect_planes(scene.planes, o, d,
                                                        a, b)[1]))(
            ro, rd, t_min, t_max)
    for li in range(scene.static.num_sphere_lights):
        found = found | jax.vmap(
            lambda o, d, a, b: sphere_light_intersect_p(scene.sphere_lights,
                                                        li, o, d, a, b))(
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
