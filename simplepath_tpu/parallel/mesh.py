"""Device-mesh sharding for rendering and training.

TPU-native replacement for the reference's thread/tile work distribution
(``/root/reference/base/TileScheduler.h``, main.cpp:109-142): the flat
pixel/ray batch is sharded across a 1-D ``jax.sharding.Mesh`` ("rays" axis),
the scene pytree is replicated, and forward rendering needs ZERO collectives
— exactly like the reference's embarrassingly-parallel tiles, but across
chips over ICI instead of threads over a shared heap.  The differentiable
path's gradient all-reduce is inserted automatically by SPMD AD when the
scalar loss averages over the sharded ray axis.

Multi-host: call ``jax.distributed.initialize()`` before building the mesh;
every host parses the same scene (deterministic build) and owns its pixel
shard via ``host_local_array_to_global_array`` semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..scene.types import Scene

__all__ = ["make_ray_mesh", "shard_pixels", "replicate_scene",
           "render_image_sharded", "warmup_render", "pad_to_multiple"]


def make_ray_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=("rays",))


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def shard_pixels(mesh: Mesh, xs, ys):
    """Pad the flat pixel batch to a multiple of the mesh size and shard it."""
    n = xs.shape[0]
    n_dev = mesh.devices.size
    n_pad = pad_to_multiple(n, n_dev)
    xs = jnp.pad(xs, (0, n_pad - n))
    ys = jnp.pad(ys, (0, n_pad - n))
    sh = NamedSharding(mesh, P("rays"))
    return jax.device_put(xs, sh), jax.device_put(ys, sh), n


def replicate_scene(mesh: Mesh, scene: Scene) -> Scene:
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), scene)


# Per-chunk ray-batch cap (per device).  A full 1024² frame as ONE batch
# carries while-loop state ~[N, STACK] plus one-hot intermediates that blow
# past HBM at N=1M; fixed-size chunks bound memory AND reuse one compiled
# executable for every chunk.
CHUNK_RAYS_PER_DEVICE = 1 << 16

# The spp accumulation is a fori_loop INSIDE one dispatch (film.py).  On the
# slow vmapped-XLA fallback a 64k-ray x 32-spp chunk is a single ~13-minute
# device program, which trips the TPU's long-dispatch watchdog and kills the
# worker ("TPU device error", reproduced at 512^2/32spp; 8spp of the same
# chunk executes in ~190 s).  When the fallback is active on TPU, split spp
# across dispatches of at most this many samples; spp_offset carries absolute
# sample indices so the RNG stream — and hence the image — is identical.
MAX_FALLBACK_SPP_PER_DISPATCH = 4


def _spp_splits(spp: int) -> list[tuple[int, int]]:
    """(offset, count) dispatch pieces for the active traversal backend."""
    from ..render.traverse import _pallas_enabled
    if jax.default_backend() != "tpu" or _pallas_enabled():
        return [(0, spp)]
    step = MAX_FALLBACK_SPP_PER_DISPATCH
    return [(o, min(step, spp - o)) for o in range(0, spp, step)]


_RENDER_RAYS_JIT = None


def _render_rays_jit():
    """Module-cached jit of render_rays: repeated calls (progressive passes,
    chunked frames) reuse one compiled executable instead of re-jitting."""
    global _RENDER_RAYS_JIT
    if _RENDER_RAYS_JIT is None:
        from ..render.film import render_rays
        _RENDER_RAYS_JIT = jax.jit(render_rays,
                                   static_argnames=("spp", "integrator"))
    return _RENDER_RAYS_JIT


def warmup_render(scene: Scene, spp: int, mesh: Mesh | None = None,
                  chunk_rays: int | None = None) -> float:
    """Compile (or cache-deserialize) the EXACT executable(s) a subsequent
    ``render_image_sharded(scene, spp, mesh)`` call runs: one chunk-shaped
    call per spp-split piece, forced to completion with a value readback
    (through the axon tunnel ``block_until_ready`` is not a true barrier —
    PERF.md round 4).  The chunk shape and spp splitting are derived from
    the same constants/helpers the render path uses, so a chunking change
    here cannot silently diverge the warmed program from the timed one (the
    round-4 bench measurement bug).  Returns seconds spent."""
    import time

    mesh = mesh or make_ray_mesh()
    n_dev = mesh.devices.size
    n_frame = scene.static.width * scene.static.height
    n_chunk = (chunk_rays or CHUNK_RAYS_PER_DEVICE) * n_dev
    warm_n = n_chunk if n_frame > n_chunk else pad_to_multiple(n_frame, n_dev)
    sc = replicate_scene(mesh, scene)
    xs, ys, _ = shard_pixels(
        mesh, jnp.arange(warm_n, dtype=jnp.int32) % scene.static.width,
        jnp.arange(warm_n, dtype=jnp.int32) % scene.static.height)
    fn = _render_rays_jit()
    t0 = time.time()
    for off, cnt in _spp_splits(spp):
        out = fn(sc, xs, ys, spp=cnt, key=jax.random.PRNGKey(0),
                 integrator=None, spp_offset=jnp.asarray(off, jnp.int32))
        float(out.sum())  # true barrier (see docstring)
    return time.time() - t0


def render_image_sharded(scene: Scene, spp: int, key, mesh: Mesh | None = None,
                         integrator: str | None = None,
                         chunk_rays: int | None = None,
                         spp_offset: int = 0):
    """Full-frame render with the ray axis sharded across the mesh.

    Large frames are rendered in equal fixed-shape chunks of
    ``chunk_rays`` pixels (per device) so one compiled program serves any
    resolution and device memory stays bounded.  ``spp_offset`` renders
    absolute sample indices [offset, offset+spp) — see render_rays."""
    from ..render.film import render_rays

    mesh = mesh or make_ray_mesh()
    n_dev = mesh.devices.size
    h, w = scene.static.height, scene.static.width
    ys_g, xs_g = jnp.meshgrid(jnp.arange(h, dtype=jnp.int32),
                              jnp.arange(w, dtype=jnp.int32), indexing="ij")
    xs_all = xs_g.reshape(-1)
    ys_all = ys_g.reshape(-1)
    n = xs_all.shape[0]
    scene = replicate_scene(mesh, scene)
    sh = NamedSharding(mesh, P("rays"))

    chunk = (chunk_rays or CHUNK_RAYS_PER_DEVICE) * n_dev
    fn = _render_rays_jit()
    splits = _spp_splits(spp)

    def _render_chunk(xs, ys):
        acc = None
        for off, cnt in splits:
            s0 = jnp.asarray(spp_offset + off, jnp.int32)
            part = fn(scene, xs, ys, spp=cnt, key=key, integrator=integrator,
                      spp_offset=s0) * (cnt / spp)
            acc = part if acc is None else acc + part
        return acc

    if n <= chunk:
        xs, ys, _ = shard_pixels(mesh, xs_all, ys_all)
        return _render_chunk(xs, ys)[:n].reshape(h, w, 3)

    n_pad = pad_to_multiple(n, chunk)
    xs_all = jnp.pad(xs_all, (0, n_pad - n))
    ys_all = jnp.pad(ys_all, (0, n_pad - n))
    out = []
    for c0 in range(0, n_pad, chunk):
        xs = jax.device_put(xs_all[c0:c0 + chunk], sh)
        ys = jax.device_put(ys_all[c0:c0 + chunk], sh)
        out.append(_render_chunk(xs, ys))
    flat = jnp.concatenate(out, axis=0)
    return flat[:n].reshape(h, w, 3)
