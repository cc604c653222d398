"""Geometry ("model") sharding: the BVH record table split across the mesh.

The SURVEY §2 stress case: a scene whose acceleration structure exceeds
one chip's HBM.  Ray ("data") parallelism replicates the scene; this module
adds the orthogonal axis — the triangle soup is partitioned into D spatially
coherent slices (Morton order of centroids), each slice gets its OWN
sub-BVH (a forest), and the packed record tables are stacked [D, M, 128]
and sharded across a ``geom`` mesh axis.  At trace time every device
traverses the full ray wavefront against its local sub-BVH only
(``shard_map`` — no record table ever leaves its device), producing
per-shard closest hits that are combined by a min-t reduction; any-hit
combines by OR.  The reference has no counterpart (its BVH lives in one
address space, shapes/BVHAccelerator.h); this is the TPU-native equivalent
of out-of-core geometry.

Because each shard's leaves index its contiguous slice of the GLOBAL
reordered triangle table (pack_records(base_offset=...)), the combined Hit
carries ordinary global triangle indices and the entire downstream pipeline
(shading, NEE, autodiff) is unchanged.  Shading tables (vertices/normals)
stay replicated in this implementation — records are the dominant term
(e.g. 3.4 GB records vs 2.2 GB tables on the 28.9M-tri lucy scene); the
same contiguous-slice layout admits sharding them too if ever needed.

Composition with ray sharding: on a 2-D mesh ("rays", "geom") the ray
wavefront shards over "rays" AND the records over "geom" — each device
traverses only its ray block against its sub-forest, and the min-t/OR
combine is a collective over the "geom" axis only (pmin/psum/pmax riding
ICI inside shard_map).  This is the production dp x tp layout: R x G chips
hold G record shards and each record shard serves R ray blocks.
``make_geom_mesh(n_geom, n_rays)`` builds either layout.

Usage:
    mesh = make_geom_mesh(n_geom=4)                   # or (4, n_rays=2)
    scene_sh = shard_scene_geometry(scene, mesh)      # host: forest build
    with set_geom_mesh(mesh):
        img = render_image(scene_sh, spp=..., key=...)  # any integrator
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["shard_scene_geometry", "set_geom_mesh", "get_geom_mesh",
           "sharded_closest", "sharded_anyhit", "render_image_geom_sharded",
           "make_geom_mesh", "GEOM_AXIS", "RAY_AXIS"]

GEOM_AXIS = "geom"
RAY_AXIS = "rays"


def make_geom_mesh(n_geom: int, n_rays: int = 1, devices=None) -> Mesh:
    """A ("rays", "geom") device mesh.  n_rays=1 degenerates to pure
    geometry sharding; n_geom * n_rays devices are used."""
    devices = list(devices if devices is not None else jax.devices())
    need = n_geom * n_rays
    if len(devices) < need:
        raise ValueError(f"need {need} devices for a {n_rays}x{n_geom} "
                         f"rays x geom mesh, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(n_rays, n_geom)
    return Mesh(arr, (RAY_AXIS, GEOM_AXIS))

_GEOM_MESH: Mesh | None = None


@contextlib.contextmanager
def set_geom_mesh(mesh: Mesh):
    """Install the mesh the geometry-sharded traversal shard_maps over.

    Trace-time configuration (like SIMPLEPATH_PALLAS): the mesh object
    cannot ride in the hashable SceneStatic, so the render call is wrapped
    in this context."""
    global _GEOM_MESH
    prev = _GEOM_MESH
    _GEOM_MESH = mesh
    try:
        yield
    finally:
        _GEOM_MESH = prev


def get_geom_mesh() -> Mesh:
    if _GEOM_MESH is None:
        raise RuntimeError("geometry-sharded scene rendered outside "
                           "set_geom_mesh(mesh)")
    return _GEOM_MESH


def _part1by2_64(a: np.ndarray) -> np.ndarray:
    """Spread the low 21 bits with two zero bits between each (u64)."""
    a = np.asarray(a, np.uint64) & np.uint64(0x1FFFFF)
    a = (a | (a << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
    a = (a | (a << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
    a = (a | (a << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
    a = (a | (a << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
    a = (a | (a << np.uint64(2))) & np.uint64(0x1249249249249249)
    return a


def _morton_slices(v0, v1, v2, n_shards: int) -> list[np.ndarray]:
    """Partition triangle indices into n_shards spatially coherent,
    near-equal contiguous runs (3-D Morton order of quantized centroids —
    the 64-bit sibling of the coherence-sort key in render/integrators.py)."""
    c = ((v0 + v1 + v2) / 3.0).astype(np.float64)
    lo, hi = c.min(0), c.max(0)
    q = np.clip((c - lo) / np.maximum(hi - lo, 1e-30) * ((1 << 21) - 1),
                0, (1 << 21) - 1).astype(np.uint64)
    key = ((_part1by2_64(q[:, 0]) << np.uint64(2))
           | (_part1by2_64(q[:, 1]) << np.uint64(1)) | _part1by2_64(q[:, 2]))
    order = np.argsort(key, kind="stable")
    return np.array_split(order, n_shards)


def shard_scene_geometry(scene, mesh: Mesh, cache_dir: str | None = None):
    """Host-side forest build: returns a Scene whose bvh.records is
    [D, M, 128] sharded over mesh's GEOM_AXIS and whose triangle tables are
    globally reordered so each shard's leaves index a contiguous slice.

    The input scene must have triangles and may be freshly loaded with
    ``use_bvh=False`` (any existing mono-BVH ordering is discarded).

    With ``cache_dir`` the forest build (Morton sort + D sub-BVH builds,
    minutes of host time at lucy scale) is persisted in that directory's
    ``.spcache/``, keyed by the triangle CONTENT (sha1 of the baked vertex
    tables — the scene arrives already baked here, so the file-identity key
    scene/cache.py uses is not available) plus the shard count."""
    import dataclasses

    from ..scene.bvh import build_nodes, pack_records
    from ..scene.types import BVHArrays, TriangleArrays

    D = int(np.prod([mesh.shape[a] for a in (GEOM_AXIS,)]))
    tri = scene.triangles
    n_tris = int(np.asarray(tri.v0x).shape[0])
    if n_tris < D:
        raise ValueError(
            f"geometry sharding needs at least one triangle per shard: "
            f"scene has {n_tris} triangle(s), requested {D} shard(s)")
    v0 = np.stack([np.asarray(tri.v0x), np.asarray(tri.v0y), np.asarray(tri.v0z)], 1)
    v1 = np.stack([np.asarray(tri.v1x), np.asarray(tri.v1y), np.asarray(tri.v1z)], 1)
    v2 = np.stack([np.asarray(tri.v2x), np.asarray(tri.v2y), np.asarray(tri.v2z)], 1)
    n0 = np.stack([np.asarray(tri.n0x), np.asarray(tri.n0y), np.asarray(tri.n0z)], 1)
    n1 = np.stack([np.asarray(tri.n1x), np.asarray(tri.n1y), np.asarray(tri.n1z)], 1)
    n2 = np.stack([np.asarray(tri.n2x), np.asarray(tri.n2y), np.asarray(tri.n2z)], 1)
    mid = np.asarray(tri.material_id)

    key = None
    if cache_dir is not None:
        import hashlib

        from ..scene.bvh import LEAF_SIZE, RECORD_WIDTH, WIDTH
        from ..scene.cache import CACHE_VERSION, load_geometry, save_geometry
        # Full-content key: every table that determines the cached payload is
        # hashed in full (positions AND normals — normals ride the cache via
        # the reordered shading tables), salted with the same builder
        # version/topology constants as scene/cache.geometry_cache_key so a
        # record-layout bump invalidates forests too.  sha1 over 6 tables is
        # seconds even at lucy scale vs minutes of forest build.
        h = hashlib.sha1()
        h.update(f"forest:v{CACHE_VERSION}:{LEAF_SIZE}:{WIDTH}"
                 f":{RECORD_WIDTH}:{D}:".encode())
        for arr in (v0, v1, v2, n0, n1, n2, mid):
            h.update(np.ascontiguousarray(arr).tobytes())
        key = h.hexdigest()
        cached = load_geometry(cache_dir, key)
    else:
        cached = None

    if cached is not None:
        stacked = cached["records"]
        tv0, tv1, tv2 = cached["v0"], cached["v1"], cached["v2"]
        tn0, tn1, tn2 = cached["n0"], cached["n1"], cached["n2"]
        tmid = cached["material_id"]
    else:
        slices = _morton_slices(v0, v1, v2, D)
        recs, global_order = [], []
        off = 0
        for sl in slices:
            sv0, sv1, sv2 = v0[sl], v1[sl], v2[sl]
            lo = np.minimum(np.minimum(sv0, sv1), sv2)
            hi = np.maximum(np.maximum(sv0, sv1), sv2)
            nodes, order = build_nodes(lo, hi)  # native C++ at lucy scale
            recs.append(pack_records(nodes, sv0[order], sv1[order],
                                     sv2[order], base_offset=off))
            global_order.append(sl[order])
            off += len(sl)
        M = max(r.shape[0] for r in recs)
        stacked = np.zeros((D, M, recs[0].shape[1]), np.float32)
        for d, r in enumerate(recs):
            stacked[d, :r.shape[0]] = r
        order = np.concatenate(global_order)
        tv0, tv1, tv2 = v0[order], v1[order], v2[order]
        tn0, tn1, tn2 = n0[order], n1[order], n2[order]
        tmid = mid[order]
        if key is not None:
            save_geometry(cache_dir, key, dict(
                records=stacked, v0=tv0, v1=tv1, v2=tv2,
                n0=tn0, n1=tn1, n2=tn2, material_id=tmid))

    # make_array_from_callback instead of device_put: each process
    # materializes only its ADDRESSABLE shards, so the same call works on a
    # single-process mesh and on a mesh spanning processes (each host then
    # holds only its slice of the forest — geometry sharding over DCN)
    records = jax.make_array_from_callback(
        stacked.shape, NamedSharding(mesh, P(GEOM_AXIS)),
        lambda idx: stacked[idx])
    triangles = TriangleArrays.from_rows(tv0, tv1, tv2, tn0, tn1, tn2, tmid)
    static = dataclasses.replace(scene.static, has_bvh=True,
                                 geom_shards=D)
    return dataclasses.replace(scene, static=static, triangles=triangles,
                               bvh=BVHArrays(records=records))


def _mesh_is_multiprocess(mesh: Mesh) -> bool:
    return len({d.process_index for d in mesh.devices.flat}) > 1


def _frame_pixels(h: int, w: int, chunk_rays: int):
    """Flat pixel coordinates of the frame, zero-padded to whole chunks:
    (xs, ys, n, n_pad)."""
    ys_g, xs_g = np.meshgrid(np.arange(h, dtype=np.int32),
                             np.arange(w, dtype=np.int32), indexing="ij")
    xs_all, ys_all = xs_g.reshape(-1), ys_g.reshape(-1)
    n = xs_all.shape[0]
    n_pad = ((n + chunk_rays - 1) // chunk_rays) * chunk_rays
    return (np.pad(xs_all, (0, n_pad - n)), np.pad(ys_all, (0, n_pad - n)),
            n, n_pad)


def render_image_geom_sharded(scene, spp: int, key, mesh: Mesh,
                              integrator: str | None = None,
                              chunk_rays: int = 1 << 16,
                              spp_offset: int = 0):
    """Full-frame render of a geometry-sharded scene → [H, W, 3].

    The dual of parallel.mesh.render_image_sharded: here the RAY wavefront
    is replicated on every device and the BVH record table is what's
    sharded — every device traverses all rays against its sub-forest and
    the min-t/OR combine in sharded_closest/anyhit merges the shards.
    Rays are chunked on host to bound live-wavefront memory.

    The mesh may span PROCESSES (each host holding its forest shards, the
    min-t combine riding DCN): every process calls this with the same
    scene/key and receives the full film.  Multi-process support is
    currently 1-D (geom axis only; rays replicated)."""
    import jax.numpy as jnp

    from .mesh import _render_rays_jit, _spp_splits

    if _mesh_is_multiprocess(mesh):
        if RAY_AXIS in mesh.axis_names:
            r = int(mesh.shape[RAY_AXIS])
            chunk_rays = ((chunk_rays + r - 1) // r) * r
        return _render_geom_sharded_multiprocess(
            scene, spp, key, mesh, integrator, chunk_rays, spp_offset)

    h, w = scene.static.height, scene.static.width
    # on a 2-D mesh each pixel chunk is sharded over RAY_AXIS, so its length
    # must divide evenly; round up rather than fail with an opaque
    # device_put/shard_map sharding error deep in jax
    if RAY_AXIS in mesh.axis_names:
        r = int(mesh.shape[RAY_AXIS])
        chunk_rays = ((chunk_rays + r - 1) // r) * r
    xs_all, ys_all, n, n_pad = _frame_pixels(h, w, chunk_rays)

    # module-cached jit (shared with the ray-sharded path: repeated calls
    # reuse one compiled executable) + the TPU-fallback watchdog guard —
    # the slow vmapped path must split spp across dispatches here exactly
    # as in render_image_sharded (see mesh.MAX_FALLBACK_SPP_PER_DISPATCH)
    fn = _render_rays_jit()
    splits = _spp_splits(spp)
    # on a 2-D rays x geom mesh the pixel chunks are sharded over RAY_AXIS
    # (each device renders its block against its sub-forest); on a 1-D
    # geom mesh they are replicated and the forest combine does the work
    ray_sh = (NamedSharding(mesh, P(RAY_AXIS))
              if RAY_AXIS in mesh.axis_names else None)
    out = []
    with set_geom_mesh(mesh):
        for c0 in range(0, n_pad, chunk_rays):
            xs = jnp.asarray(xs_all[c0:c0 + chunk_rays])
            ys = jnp.asarray(ys_all[c0:c0 + chunk_rays])
            if ray_sh is not None:
                xs = jax.device_put(xs, ray_sh)
                ys = jax.device_put(ys, ray_sh)
            acc = None
            for off, cnt in splits:
                s0 = jnp.asarray(spp_offset + off, jnp.int32)
                part = fn(scene, xs, ys, spp=cnt, key=key,
                          integrator=integrator, spp_offset=s0) * (cnt / spp)
                acc = part if acc is None else acc + part
            out.append(acc)
        flat = jnp.concatenate(out, axis=0)
        return flat[:n].reshape(h, w, 3)


_MP_RENDER_JIT: dict = {}


def _mp_render_jit(mesh: Mesh):
    """Per-mesh cached jit whose output sharding matches the mesh's ray
    spec (the multi-process sibling of mesh._render_rays_jit — repeated
    calls must reuse one compiled executable, not retrace)."""
    fn = _MP_RENDER_JIT.get(mesh)
    if fn is None:
        from ..render.film import render_rays
        fn = jax.jit(render_rays, static_argnames=("spp", "integrator"),
                     out_shardings=NamedSharding(mesh, _ray_spec(mesh)))
        _MP_RENDER_JIT[mesh] = fn
    return fn


def _render_geom_sharded_multiprocess(scene, spp: int, key, mesh: Mesh,
                                      integrator, chunk_rays: int,
                                      spp_offset: int):
    """Multi-process leg of render_image_geom_sharded: the forest shards
    live on different HOSTS (sharded_closest's pmin/psum then ride DCN).
    On a 1-D geom mesh the rays and film are replicated, so each process
    reads the complete frame locally; on the 2-D rays x geom production
    layout the pixel chunks are additionally sharded over RAY_AXIS and the
    film shards are all-gathered across processes at the end."""
    from jax.experimental import multihost_utils

    from .mesh import _spp_splits
    from .multihost import _global_from_replicated, _global_key

    rays_sharded = RAY_AXIS in mesh.axis_names
    ray_sh = NamedSharding(mesh, _ray_spec(mesh))

    def globalize(a):
        if isinstance(a, jax.Array) and not a.is_fully_addressable:
            return a  # already global (the sharded record table)
        return _global_from_replicated(mesh, a)

    def globalize_rays(np_arr):
        return jax.make_array_from_callback(np_arr.shape, ray_sh,
                                            lambda idx: np_arr[idx])

    gscene = jax.tree_util.tree_map(globalize, scene)
    gkey = _global_key(mesh, key)
    fn = _mp_render_jit(mesh)

    h, w = scene.static.height, scene.static.width
    xs_all, ys_all, n, n_pad = _frame_pixels(h, w, chunk_rays)
    splits = _spp_splits(spp)
    out = []
    with set_geom_mesh(mesh):
        for c0 in range(0, n_pad, chunk_rays):
            xs = globalize_rays(xs_all[c0:c0 + chunk_rays])
            ys = globalize_rays(ys_all[c0:c0 + chunk_rays])
            acc = None
            for off, cnt in splits:
                s0 = globalize(np.asarray(spp_offset + off, np.int32))
                part = fn(gscene, xs, ys, spp=cnt, key=gkey,
                          integrator=integrator, spp_offset=s0) * (cnt / spp)
                acc = part if acc is None else acc + part
            if rays_sharded:
                out.append(np.asarray(
                    multihost_utils.process_allgather(acc, tiled=True)))
            else:
                out.append(np.asarray(acc.addressable_data(0)))
    flat = np.concatenate(out, axis=0)
    return flat[:n].reshape(h, w, 3)


def _local_closest(records, ro, rd, t_min, t_max, interpret: bool):
    """One shard's closest hit (runs per device under shard_map).
    records: [1, M, 128] (this device's block)."""
    from ..render.pallas_traverse import packet_closest
    from ..render.traverse import _bvh_closest, _pallas_enabled
    from ..scene.types import BVHArrays

    rec = records[0]
    if _pallas_enabled():
        t, fi, beta, gamma, valid = packet_closest(rec, ro, rd, t_min, t_max,
                                                   interpret=interpret)
    else:
        import dataclasses

        class _S:  # minimal scene view for _bvh_closest
            bvh = BVHArrays(records=rec)
        hit = jax.vmap(lambda o, d, a, b: _bvh_closest(_S, o, d, a, b))(
            ro, rd, t_min, t_max)
        t, fi, beta, gamma, valid = hit.t, hit.idx, hit.beta, hit.gamma, hit.valid
    inf = jnp.float32(3.4e38)
    t = jnp.where(valid, t, inf)
    return (t[None], fi[None], beta[None], gamma[None], valid[None])


def _ray_spec(mesh: Mesh):
    """Rays are sharded over RAY_AXIS when the mesh has one (the 2-D
    rays x geom production layout), else replicated on every geometry
    shard (the 1-D layout)."""
    return P(RAY_AXIS) if RAY_AXIS in mesh.axis_names else P()


def sharded_closest(records, ro, rd, t_min, t_max):
    """Closest triangle hit vs the sharded forest → (t, idx, beta, gamma,
    valid), combined ACROSS the geometry axis inside shard_map (pmin on t,
    lowest-shard-index tie-break, psum field gather from the unique
    winner).  Rides ICI; no [D, N] host-side materialization.  With a 2-D
    rays x geom mesh the ray wavefront is simultaneously sharded over
    RAY_AXIS — each device traverses only its ray block against its
    sub-forest."""
    shard_map = jax.shard_map

    mesh = get_geom_mesh()
    interpret = jax.default_backend() != "tpu"
    D = int(mesh.shape[GEOM_AXIS])
    rspec = _ray_spec(mesh)

    def local(rec, o, d, a, b):
        t, fi, beta, gamma, valid = (x[0] for x in _local_closest(
            rec, o, d, a, b, interpret))
        tmin = jax.lax.pmin(t, GEOM_AXIS)
        sidx = jax.lax.axis_index(GEOM_AXIS)
        win = valid & (t == tmin)
        # deterministic tie-break: the lowest shard index that achieves tmin
        winner = jax.lax.pmin(jnp.where(win, sidx, D), GEOM_AXIS)
        mine = win & (sidx == winner)
        pick = lambda x: jax.lax.psum(jnp.where(mine, x, jnp.zeros_like(x)),
                                      GEOM_AXIS)
        any_valid = jax.lax.pmax(valid.astype(jnp.int32), GEOM_AXIS) > 0
        t_out = jnp.where(any_valid, tmin, jnp.inf)
        fi_out = jnp.where(any_valid, pick(fi), -1)
        return t_out, fi_out, pick(beta), pick(gamma), any_valid

    return shard_map(local, mesh=mesh,
                     in_specs=(P(GEOM_AXIS), rspec, rspec, rspec, rspec),
                     out_specs=(rspec,) * 5, check_vma=False,
                     )(records, ro, rd, t_min, t_max)


def sharded_anyhit(records, ro, rd, t_min, t_max):
    """Occlusion vs the sharded forest (OR across the geometry axis)."""
    shard_map = jax.shard_map

    from ..render.pallas_traverse import packet_anyhit
    from ..render.traverse import _bvh_any, _pallas_enabled
    from ..scene.types import BVHArrays

    mesh = get_geom_mesh()
    interpret = jax.default_backend() != "tpu"
    rspec = _ray_spec(mesh)

    def local(records, ro, rd, a, b):
        rec = records[0]
        if _pallas_enabled():
            occ = packet_anyhit(rec, ro, rd, a, b, interpret=interpret)
        else:
            class _S:
                bvh = BVHArrays(records=rec)
            occ = jax.vmap(lambda o, d_, x, y: _bvh_any(_S, o, d_, x, y))(
                ro, rd, a, b)
        return jax.lax.pmax(occ.astype(jnp.int32), GEOM_AXIS) > 0

    return shard_map(local, mesh=mesh,
                     in_specs=(P(GEOM_AXIS), rspec, rspec, rspec, rspec),
                     out_specs=rspec, check_vma=False,
                     )(records, ro, rd, t_min, t_max)
