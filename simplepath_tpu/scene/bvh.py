"""Host-side 4-wide BVH builder over triangle soup.

TPU-native replacement for the reference's pointer-based binary BVH with
virtual-dispatch nodes (``/root/reference/shapes/BVHAccelerator.h:37-121``):
we build a shallow 4-ary BVH (two median splits per node, like the
reference's recursive median split on the widest centroid axis,
BVHAccelerator.h:175-209) and flatten it into SoA arrays for the device
traversal loop.  A wide branching factor trades pointer-chasing depth for
vectorized box tests, which is the right shape for the VPU.

The builder runs on host in numpy (an optional C++ fast path lives in
``simplepath_tpu/native``); triangles are reordered so every leaf references
a contiguous range of ``prim_order``.
"""

from __future__ import annotations

import numpy as np

from .types import BVHArrays

__all__ = ["build_bvh4", "LEAF_SIZE"]

LEAF_SIZE = 4   # k_max_leaf_elements (BVHAccelerator.h:211)
WIDTH = 4


def _median_split(idx: np.ndarray, centroids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Split on the widest centroid-bounds axis at the median (argpartition).

    Mirrors BVHAccelerator.h:175-209's strategy; argpartition makes halves
    always balanced so no axis-cycling fallback is needed.
    """
    c = centroids[idx]
    extent = c.max(axis=0) - c.min(axis=0)
    axis = int(np.argmax(extent))
    half = len(idx) // 2
    order = np.argpartition(c[:, axis], half)
    return idx[order[:half]], idx[order[half:]]


def build_bvh4(tri_lo: np.ndarray, tri_hi: np.ndarray,
               leaf_size: int = LEAF_SIZE) -> tuple[dict, np.ndarray]:
    """Returns (node arrays dict, prim_order).

    node arrays: child_lo/hi [N,4,3] f32, child_node/first/count [N,4] i32.
    Empty child slots have count == 0 and node == -1, with inverted boxes so
    every slab test misses.
    """
    T = tri_lo.shape[0]
    assert T > 0
    centroids = 0.5 * (tri_lo + tri_hi)

    child_lo, child_hi = [], []
    child_node, child_first, child_count = [], [], []
    prim_order: list[np.ndarray] = []
    prim_count = 0

    def alloc_node() -> int:
        child_lo.append(np.full((WIDTH, 3), np.inf, np.float32))
        child_hi.append(np.full((WIDTH, 3), -np.inf, np.float32))
        child_node.append(np.full(WIDTH, -1, np.int32))
        child_first.append(np.zeros(WIDTH, np.int32))
        child_count.append(np.zeros(WIDTH, np.int32))
        return len(child_lo) - 1

    def split4(idx: np.ndarray) -> list[np.ndarray]:
        if len(idx) <= 2:
            return [idx[i:i + 1] for i in range(len(idx))]
        l, r = _median_split(idx, centroids)
        groups = []
        for part in (l, r):
            if len(part) <= 1:
                groups.append(part)
            else:
                a, b = _median_split(part, centroids)
                groups.extend((a, b))
        return [g for g in groups if len(g)]

    root = alloc_node()
    # worklist of (node_id, slot-groups)
    stack: list[tuple[int, np.ndarray]] = []

    def fill_node(node_id: int, idx: np.ndarray) -> None:
        nonlocal prim_count
        groups = split4(idx)
        for w, g in enumerate(groups):
            glo = tri_lo[g].min(axis=0)
            ghi = tri_hi[g].max(axis=0)
            child_lo[node_id][w] = glo
            child_hi[node_id][w] = ghi
            if len(g) <= leaf_size:
                child_first[node_id][w] = prim_count
                child_count[node_id][w] = len(g)
                prim_order.append(g.astype(np.int32))
                prim_count += len(g)
            else:
                cid = alloc_node()
                child_node[node_id][w] = cid
                stack.append((cid, g))

    fill_node(root, np.arange(T, dtype=np.int64))
    while stack:
        node_id, idx = stack.pop()
        fill_node(node_id, idx)

    nodes = {
        "child_lo": np.stack(child_lo),
        "child_hi": np.stack(child_hi),
        "child_node": np.stack(child_node),
        "child_first": np.stack(child_first),
        "child_count": np.stack(child_count),
    }
    order = np.concatenate(prim_order) if prim_order else np.zeros(0, np.int32)
    assert order.shape[0] == T
    return nodes, order


NATIVE_MIN_TRIS = 20_000  # below this the numpy builder is fast enough


def make_bvh_arrays(tri_lo: np.ndarray, tri_hi: np.ndarray) -> tuple[BVHArrays, np.ndarray]:
    """Build and wrap as BVHArrays; also returns prim_order so the caller can
    reorder the triangle table itself (leaves then index contiguously).

    Uses the native C++ builder for large meshes (lucy-class inputs take
    minutes through the Python builder), numpy otherwise/as fallback."""
    import jax.numpy as jnp

    nodes = None
    if tri_lo.shape[0] >= NATIVE_MIN_TRIS:
        from ..native import native_build_bvh4
        result = native_build_bvh4(tri_lo.astype(np.float32),
                                   tri_hi.astype(np.float32), LEAF_SIZE)
        if result is not None:
            nodes, order = result
    if nodes is None:
        nodes, order = build_bvh4(tri_lo, tri_hi)
    bvh = BVHArrays(
        child_lo=jnp.asarray(nodes["child_lo"]),
        child_hi=jnp.asarray(nodes["child_hi"]),
        child_node=jnp.asarray(nodes["child_node"]),
        child_first=jnp.asarray(nodes["child_first"]),
        child_count=jnp.asarray(nodes["child_count"]),
        prim_kind=jnp.zeros(order.shape[0], jnp.int32),
        prim_idx=jnp.arange(order.shape[0], dtype=jnp.int32),
    )
    return bvh, order
