"""Persistent geometry cache: packed BVH records + reordered triangle tables.

The reference rebuilds its BVH every run (Scene.h:26-45 at parse time, a few
seconds for bunny-class, minutes for lucy-class); this framework persists
the expensive host-side build so warm starts skip mesh parsing, BVH
construction, and record packing entirely.  The cache lives in a
``.spcache/`` directory next to the scene file, keyed by a hash of every
geometry-relevant input: mesh file identity (path, size, mtime), bake
transform, material id, builder version/topology constants.  Uncompressed
``.npz`` — load time is disk-bandwidth-bound and far below rebuild time.

Disable with ``SIMPLEPATH_CACHE=0``.
"""

from __future__ import annotations

import hashlib
import logging
import os

import numpy as np

logger = logging.getLogger("simplepath_tpu")

__all__ = ["geometry_cache_key", "load_geometry", "save_geometry",
           "CACHE_MIN_TRIS"]

CACHE_VERSION = 5  # bump when the record layout or builder topology changes
                   # (v5: target-leaf-count splits -> near-full leaves)
CACHE_MIN_TRIS = 50_000  # below this a rebuild is faster than the disk trip

_FIELDS = ("records", "v0", "v1", "v2", "n0", "n1", "n2", "material_id")


def cache_enabled() -> bool:
    return os.environ.get("SIMPLEPATH_CACHE", "1") != "0"


def geometry_cache_key(mesh_jobs) -> str:
    """Hash of the geometry inputs.

    mesh_jobs: sequence of (path, linear[3,3], translation[3], material_id)
    describing every mesh block in scene order.  File identity is
    (abspath, size, mtime_ns) — content hashing a lucy-class 500 MB PLY
    would cost more than it saves.
    """
    from .bvh import LEAF_SIZE, RECORD_WIDTH, WIDTH

    h = hashlib.sha1()
    h.update(f"v{CACHE_VERSION}:{LEAF_SIZE}:{WIDTH}:{RECORD_WIDTH}".encode())
    for path, linear, translation, mat_id in mesh_jobs:
        st = os.stat(path)
        h.update(f"|{os.path.abspath(path)}:{st.st_size}:{st.st_mtime_ns}"
                 f":{mat_id}".encode())
        h.update(np.asarray(linear, np.float64).tobytes())
        h.update(np.asarray(translation, np.float64).tobytes())
    return h.hexdigest()


def _cache_path(base_dir: str, key: str) -> str:
    return os.path.join(base_dir, ".spcache", f"geom_{key}.npz")


def load_geometry(base_dir: str, key: str) -> dict | None:
    """Returns the cached geometry dict (records + reordered triangle
    tables) or None."""
    if not cache_enabled():
        return None
    path = _cache_path(base_dir, key)
    if not os.path.exists(path):
        return None
    try:
        with np.load(path) as z:
            out = {f: z[f] for f in _FIELDS}
        logger.info("geometry cache hit: %s", path)
        return out
    except Exception as e:  # corrupt/partial file: rebuild
        logger.warning("geometry cache unreadable (%s); rebuilding", e)
        return None


def save_geometry(base_dir: str, key: str, arrays: dict) -> None:
    if not cache_enabled():
        return
    if arrays["v0"].shape[0] < CACHE_MIN_TRIS:
        return
    path = _cache_path(base_dir, key)
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp{os.getpid()}.npz"  # .npz suffix: savez keeps it
        np.savez(tmp, **{f: arrays[f] for f in _FIELDS})
        os.replace(tmp, path)
        logger.info("geometry cache written: %s", path)
    except OSError as e:  # read-only scene dir etc.
        logger.info("geometry cache not written (%s)", e)
