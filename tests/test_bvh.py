"""BVH correctness: traversal must agree exactly with brute force, and the
native C++ builder must agree with the numpy builder."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simplepath_tpu.io.meshgen import displaced_blob, icosphere
from simplepath_tpu.render.traverse import scene_intersect, scene_intersect_geometry_p
from simplepath_tpu.scene.bvh import build_bvh_wide, make_bvh_arrays
from simplepath_tpu.scene.types import (BVHArrays, CameraArrays, MaterialArrays,
                                        PlaneArrays, Scene, SceneStatic,
                                        SphereArrays, SphereLightArrays,
                                        TriangleArrays)


def tri_scene(v, f, use_bvh):
    v0 = v[f[:, 0]].astype(np.float32)
    v1 = v[f[:, 1]].astype(np.float32)
    v2 = v[f[:, 2]].astype(np.float32)
    n = np.zeros_like(v0)
    n[:, 1] = 1.0
    tm = np.zeros(len(f), np.int32)
    bvh = None
    if use_bvh:
        lo = np.minimum(np.minimum(v0, v1), v2)
        hi = np.maximum(np.maximum(v0, v1), v2)
        bvh, order = make_bvh_arrays(lo, hi, v0, v1, v2)
        v0, v1, v2 = v0[order], v1[order], v2[order]
    z33 = jnp.zeros((0, 3, 3), jnp.float32)
    z3 = jnp.zeros((0, 3), jnp.float32)
    zi = jnp.zeros((0,), jnp.int32)
    empty_x = dict(o2w_l=z33, o2w_t=z3, w2o_l=z33, w2o_t=z3, material_id=zi)
    static = SceneStatic(width=8, height=8, max_depth=2, russian_roulette_depth=3,
                         integrator="direct_lighting", num_spheres=0, num_planes=0,
                         num_triangles=len(f), num_sphere_lights=0, env_kind=0,
                         num_materials=1, has_bvh=use_bvh)
    mats = MaterialArrays(
        base_type=jnp.zeros(1, jnp.int32), albedo=jnp.full((1, 3), 0.5),
        roughness=jnp.full(1, 0.5), ior=jnp.full(1, 1.5),
        has_clearcoat=jnp.zeros(1, jnp.int32), cc_ior=jnp.full(1, 1.5),
        cc_color=jnp.ones((1, 3)))
    cam = CameraArrays(eye=jnp.zeros(3), to=jnp.asarray([0.0, 0.0, 1.0]),
                       up=jnp.asarray([0.0, 1.0, 0.0]),
                       fov=jnp.asarray(45.0), wh=jnp.ones(2))
    return Scene(
        static=static, spheres=SphereArrays(**empty_x),
        planes=PlaneArrays(**empty_x),
        triangles=TriangleArrays.from_rows(v0, v1, v2, n, n, n, tm),
        bvh=bvh, materials=mats,
        sphere_lights=SphereLightArrays(o2w_l=z33, o2w_t=z3, w2o_l=z33,
                                        w2o_t=z3, radiance=jnp.zeros((0, 3))),
        env=None, camera=cam)


@pytest.fixture(scope="module")
def mesh():
    return displaced_blob(3)  # 1280 tris


def random_rays(n, seed=0):
    rng = np.random.RandomState(seed)
    ro = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd)


def test_bvh_matches_bruteforce(mesh):
    v, f = mesh
    s_bvh = tri_scene(v, f, True)
    s_brute = tri_scene(v, f, False)
    ro, rd = random_rays(512)
    tmin = jnp.full(ro.shape[0], 1e-3)
    tmax = jnp.full(ro.shape[0], jnp.inf)

    hit_fn = jax.vmap(lambda scene, o, d, a, b: scene_intersect(scene, o, d, a, b),
                      in_axes=(None, 0, 0, 0, 0))
    h1 = hit_fn(s_bvh, ro, rd, tmin, tmax)
    h2 = hit_fn(s_brute, ro, rd, tmin, tmax)
    np.testing.assert_array_equal(np.asarray(h1.valid), np.asarray(h2.valid))
    np.testing.assert_allclose(np.asarray(h1.t)[np.asarray(h1.valid)],
                               np.asarray(h2.t)[np.asarray(h2.valid)], rtol=1e-5)


def test_bvh_anyhit_matches(mesh):
    v, f = mesh
    s_bvh = tri_scene(v, f, True)
    s_brute = tri_scene(v, f, False)
    ro, rd = random_rays(512, seed=1)
    tmin = jnp.full(ro.shape[0], 1e-3)
    tmax = jnp.full(ro.shape[0], 2.0)
    p = jax.vmap(lambda s, o, d, a, b: scene_intersect_geometry_p(s, o, d, a, b),
                 in_axes=(None, 0, 0, 0, 0))
    np.testing.assert_array_equal(np.asarray(p(s_bvh, ro, rd, tmin, tmax)),
                                  np.asarray(p(s_brute, ro, rd, tmin, tmax)))


def test_native_builder_matches_numpy(mesh):
    """Native and numpy builders produce valid (not identical) trees; both
    must give identical closest hits."""
    from simplepath_tpu.native import native_build_bvh_wide
    v, f = mesh
    v0 = v[f[:, 0]]; v1 = v[f[:, 1]]; v2 = v[f[:, 2]]
    lo = np.minimum(np.minimum(v0, v1), v2).astype(np.float32)
    hi = np.maximum(np.maximum(v0, v1), v2).astype(np.float32)
    from simplepath_tpu.scene.bvh import LEAF_SIZE
    result = native_build_bvh_wide(lo, hi, LEAF_SIZE)
    if result is None:
        pytest.skip("no native toolchain")
    nodes, order = result
    # structural sanity: every prim appears exactly once
    assert sorted(order.tolist()) == list(range(len(f)))
    counts = nodes["child_meta"][:, :, 2]
    assert (counts <= LEAF_SIZE).all()
    # leaves cover all prims
    assert counts.sum() == len(f)


def test_leaf_base_past_2pow24(mesh):
    """Triangle indices past 2^24 must survive the leaf record format.

    Regression: round-2 stored per-lane triangle indices as exact f32, which
    silently caps scenes at 16.7M triangles (lucy is ~28M).  The format now
    stores a per-leaf base index split into two small exact floats and
    reassembles base + lane in int32 on device; both traversal paths must
    return the exact large index.
    """
    from simplepath_tpu.render.pallas_traverse import packet_closest
    from simplepath_tpu.render.traverse import _visit_leaf
    from simplepath_tpu.scene.bvh import BASE_SHIFT, LEAF_ROWS, LEAF_SIZE
    if (LEAF_SIZE, LEAF_ROWS) != (12, 1):
        pytest.skip("test edits the default single-row leaf layout in place")

    v, f = mesh
    v0 = v[f[:, 0]].astype(np.float32)
    v1 = v[f[:, 1]].astype(np.float32)
    v2 = v[f[:, 2]].astype(np.float32)
    lo = np.minimum(np.minimum(v0, v1), v2)
    hi = np.maximum(np.maximum(v0, v1), v2)
    bvh, order = make_bvh_arrays(lo, hi, v0, v1, v2)
    rec = np.asarray(bvh.records).copy()

    # shift every leaf's base index up by BIG (as if this mesh's triangles
    # sat at the top of a 28M-triangle table)
    BIG = (1 << 24) + 54321
    is_leaf = rec[:, 110] > 0
    base = (rec[is_leaf, 109].astype(np.int64) << BASE_SHIFT) \
        + rec[is_leaf, 108].astype(np.int64) + BIG
    rec2 = rec.copy()
    rec2[is_leaf, 108] = (base & ((1 << BASE_SHIFT) - 1)).astype(np.float32)
    rec2[is_leaf, 109] = (base >> BASE_SHIFT).astype(np.float32)

    ro, rd = random_rays(256, seed=2)
    tmin = jnp.full(ro.shape[0], 1e-3)
    tmax = jnp.full(ro.shape[0], jnp.inf)
    t1, fi1, b1, g1, val1 = packet_closest(jnp.asarray(rec), ro, rd, tmin,
                                           tmax, interpret=True)
    t2, fi2, b2, g2, val2 = packet_closest(jnp.asarray(rec2), ro, rd, tmin,
                                           tmax, interpret=True)
    val1, val2 = np.asarray(val1), np.asarray(val2)
    np.testing.assert_array_equal(val1, val2)
    assert val1.any()
    np.testing.assert_array_equal(np.asarray(fi2)[val2],
                                  np.asarray(fi1)[val1] + BIG)
    np.testing.assert_allclose(np.asarray(t1)[val1], np.asarray(t2)[val2])

    # XLA leaf visit: same exact index arithmetic
    leaf_row = int(np.nonzero(is_leaf)[0][0])
    row = jnp.asarray(rec2[leaf_row])
    count = int(rec2[leaf_row, 110])
    base0 = (int(rec2[leaf_row, 109]) << BASE_SHIFT) + int(rec2[leaf_row, 108])
    _, _, _, _, tri_idx = _visit_leaf(row, jnp.zeros(3), jnp.asarray([0., 0., 1.]),
                                      jnp.asarray(1e-3), jnp.asarray(np.inf))
    np.testing.assert_array_equal(np.asarray(tri_idx)[:count],
                                  base0 + np.arange(count))


def test_pack_rejects_tree_deeper_than_traversal_stack(monkeypatch):
    """The pack-time stack-bound guard (scene/bvh.pack_records): a tree whose
    worst-case live stack depth*(W-1)+1 exceeds the traversal kernels' fixed
    stack capacity must FAIL AT PACK TIME — the alternative is a silent SMEM
    stack overflow corrupting the Pallas kernel.  Balanced proportional
    splits never get near the real limit, so the guard is exercised by
    shrinking the reported capacity (monkeypatching _stack_limit, the shared
    min of pallas MAX_STACK / XLA STACK_DEPTH)."""
    import simplepath_tpu.scene.bvh as B

    rng = np.random.default_rng(0)
    v0 = rng.standard_normal((600, 3)).astype(np.float32)
    v1 = v0 + 0.01
    v2 = v0 + 0.02
    lo = np.minimum(np.minimum(v0, v1), v2)
    hi = np.maximum(np.maximum(v0, v1), v2)
    # leaf_size=1 deepens the tree (~log8(600) = 3+ internal levels)
    nodes, order = B.build_bvh_wide(lo, hi, leaf_size=1)
    depth = B.tree_depth(nodes["child_meta"])
    assert depth >= 3

    # sanity: the real capacity admits this tree
    B.pack_records(nodes, v0[order], v1[order], v2[order], leaf_cap=1)

    # capacity below the tree's worst-case live stack -> pack must refuse
    monkeypatch.setattr(B, "_stack_limit", lambda: depth * (B.WIDTH - 1))
    with pytest.raises(AssertionError, match="stack"):
        B.pack_records(nodes, v0[order], v1[order], v2[order], leaf_cap=1)
