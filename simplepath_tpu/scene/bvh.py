"""Host-side wide-BVH builder over triangle soup.

TPU-native replacement for the reference's pointer-based binary BVH with
virtual-dispatch nodes (``/root/reference/shapes/BVHAccelerator.h:37-121``):
we build a shallow W-ary BVH (log2(W) levels of median splits per node, like
the reference's recursive median split on the widest centroid axis,
BVHAccelerator.h:175-209) and flatten it into packed SoA arrays for the
device traversal loop.  A wide branching factor trades pointer-chasing depth
for vectorized box tests, which is the right shape for the VPU.

The builder runs on host in numpy (an optional C++ fast path lives in
``simplepath_tpu/native``); triangles are reordered so every leaf references
a contiguous range of the triangle table.
"""

from __future__ import annotations

import numpy as np

from .types import BVHArrays

__all__ = ["build_bvh_wide", "make_bvh_arrays", "LEAF_SIZE", "WIDTH"]

LEAF_SIZE = 4   # k_max_leaf_elements (BVHAccelerator.h:211)
WIDTH = 8       # branching factor (power of two)


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


def build_bvh_wide(tri_lo: np.ndarray, tri_hi: np.ndarray,
                   leaf_size: int = LEAF_SIZE,
                   width: int = WIDTH) -> tuple[dict, np.ndarray]:
    """Returns (node arrays dict, prim_order).

    node arrays: child_box [N,W,6] f32 (lo,hi; empty slots inverted),
    child_meta [N,W,3] i32 (node, first, count).
    """
    T = tri_lo.shape[0]
    assert T > 0
    levels = int(np.log2(width))
    assert 2 ** levels == width
    centroids = 0.5 * (tri_lo + tri_hi)

    boxes, metas = [], []
    prim_order: list[np.ndarray] = []
    prim_count = 0

    def alloc_node() -> int:
        box = np.empty((width, 6), np.float32)
        box[:, :3] = np.inf
        box[:, 3:] = -np.inf
        boxes.append(box)
        metas.append(np.array([[-1, 0, 0]] * width, np.int32))
        return len(boxes) - 1

    def split_wide(idx: np.ndarray) -> list[np.ndarray]:
        groups = [idx]
        for _ in range(levels):
            nxt = []
            for g in groups:
                if len(g) <= 1:
                    nxt.append(g)
                else:
                    a, b = _median_split(g, centroids)
                    nxt.extend((a, b))
            groups = nxt
        return [g for g in groups if len(g)]

    root = alloc_node()
    stack: list[tuple[int, np.ndarray]] = []

    def fill_node(node_id: int, idx: np.ndarray) -> None:
        nonlocal prim_count
        for w, g in enumerate(split_wide(idx)):
            boxes[node_id][w, :3] = tri_lo[g].min(axis=0)
            boxes[node_id][w, 3:] = tri_hi[g].max(axis=0)
            if len(g) <= leaf_size:
                metas[node_id][w] = (-1, prim_count, len(g))
                prim_order.append(g.astype(np.int32))
                prim_count += len(g)
            else:
                cid = alloc_node()
                metas[node_id][w, 0] = cid
                stack.append((cid, g))

    fill_node(root, np.arange(T, dtype=np.int64))
    while stack:
        node_id, idx = stack.pop()
        fill_node(node_id, idx)

    nodes = {"child_box": np.stack(boxes), "child_meta": np.stack(metas)}
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
        from ..native import native_build_bvh_wide
        result = native_build_bvh_wide(tri_lo.astype(np.float32),
                                       tri_hi.astype(np.float32),
                                       LEAF_SIZE, WIDTH)
        if result is not None:
            nodes, order = result
    if nodes is None:
        nodes, order = build_bvh_wide(tri_lo, tri_hi)
    bvh = BVHArrays(child_box=jnp.asarray(nodes["child_box"]),
                    child_meta=jnp.asarray(nodes["child_meta"]))
    return bvh, order
