"""Multi-process (multi-host) rendering over a global device mesh.

The distributed story SURVEY §5 calls for (the reference has none — one
process, shared memory, a jthread pool at ``main.cpp:109-142``): every
process calls :func:`init_distributed` (``jax.distributed.initialize``),
parses the same scene deterministically, and calls
:func:`render_image_multihost`.  The flat pixel batch is sharded over a 1-D
"rays" mesh spanning ALL processes' devices (ICI within a slice, DCN
across), the scene pytree is replicated, forward rendering needs zero
collectives, and the film is assembled with one all-gather at the end.

Tested with two CPU processes in tests/test_multihost.py: the 2-process
image equals the 1-process image exactly (same sample streams, same
accumulation, only the device partition differs).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..scene.types import Scene
from .mesh import CHUNK_RAYS_PER_DEVICE, make_ray_mesh, pad_to_multiple

__all__ = ["init_distributed", "render_image_multihost",
           "train_step_multihost"]


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None,
                     local_device_ids=None) -> None:
    """``jax.distributed.initialize`` with explicit or env-provided topology.

    On TPU pods the arguments are discovered automatically; on CPU/GPU test
    rigs pass coordinator_address ("host:port"), num_processes, process_id.
    Call before ANY other jax API touches devices.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)


def _global_from_replicated(mesh, arr) -> jax.Array:
    """Build a fully-replicated global array; every process holds (and must
    pass) identical data — true here because every host parses the scene."""
    np_arr = np.asarray(arr)
    sh = NamedSharding(mesh, P())
    return jax.make_array_from_callback(np_arr.shape, sh,
                                        lambda idx: np_arr[idx])


def _global_from_computed(mesh, np_arr) -> jax.Array:
    """Build a rays-sharded global array from data every process computes
    identically (each host materializes only its addressable shards)."""
    sh = NamedSharding(mesh, P("rays"))
    return jax.make_array_from_callback(np_arr.shape, sh,
                                        lambda idx: np_arr[idx])


def _global_key(mesh, key) -> jax.Array:
    """Replicate a PRNG key (new-style or legacy uint32[2]) over the mesh."""
    if jnp.issubdtype(jnp.asarray(key).dtype, jax.dtypes.prng_key):
        return jax.random.wrap_key_data(
            _global_from_replicated(mesh, jax.random.key_data(key)))
    return _global_from_replicated(mesh, key)


def _coordination_barrier(name: str, timeout_ms: int = 900_000) -> None:
    """Align all processes via the coordination service (NOT a device
    collective).  Needed before the FIRST collective execution of a large
    program: each process compiles independently, and on a loaded host the
    compile times can diverge by minutes while the CPU gloo collective
    context gives its key exchange only ~30 s — the fast process would
    start executing and time out waiting for its still-compiling sibling
    (observed as 'Gloo context initialization failed: DEADLINE_EXCEEDED').
    No-op single-process; tolerates older jax layouts."""
    if jax.process_count() <= 1:
        return
    try:
        from jax._src import distributed as _dist
        client = getattr(_dist.global_state, "client", None)
        if client is not None:
            client.wait_at_barrier(name, timeout_ms)
    except Exception:  # pragma: no cover - version-dependent internals
        pass


def train_step_multihost(scene: Scene, params, target_flat, xs, ys, spp: int,
                         key, integrator: str | None = None, lr: float = 0.05,
                         mesh=None):
    """One SGD train step with the pixel batch sharded across ALL
    processes' devices → (new_params numpy pytree, loss float).

    This is the BASELINE north star's distributed-training axis: the loss
    averages over the globally sharded ray axis, so SPMD AD inserts the
    scene-parameter gradient all-reduce across the process boundary (psum
    riding ICI within a host, DCN across hosts) — the multi-process
    sibling of tests/test_sharding.py::test_sharded_train_step.  Every
    process passes identical ``scene``/``params``/``target_flat``/``xs``/
    ``ys`` (host numpy or single-device arrays); results are returned as
    host-local numpy, identical on every process.
    """
    from ..diff.grad import make_train_step

    mesh = mesh or make_ray_mesh()
    n = int(np.asarray(xs).size)
    assert n % mesh.devices.size == 0, (
        f"pixel batch ({n}) must divide the global mesh "
        f"({mesh.devices.size} devices)")

    gscene = jax.tree_util.tree_map(
        lambda a: _global_from_replicated(mesh, a), scene)
    gparams = jax.tree_util.tree_map(
        lambda a: _global_from_replicated(mesh, a), params)
    gtarget = _global_from_computed(
        mesh, np.asarray(target_flat, np.float32))
    gxs = _global_from_computed(mesh, np.asarray(xs, np.int32))
    gys = _global_from_computed(mesh, np.asarray(ys, np.int32))
    gkey = _global_key(mesh, key)

    step = jax.jit(make_train_step(gscene, spp, integrator, lr))
    # AOT-compile, then align all processes BEFORE the first collective
    # executes (see _coordination_barrier)
    compiled = step.lower(gparams, gtarget, gxs, gys, gkey).compile()
    _coordination_barrier("train_step_compiled")
    new_params, loss = compiled(gparams, gtarget, gxs, gys, gkey)
    # params stay replicated (the psum'd gradient is identical everywhere),
    # so each process's local shard 0 IS the full value
    host_params = jax.tree_util.tree_map(
        lambda a: np.asarray(a.addressable_data(0)), new_params)
    return host_params, float(np.asarray(loss.addressable_data(0)))


def render_image_multihost(scene: Scene, spp: int, key,
                           integrator: str | None = None,
                           mesh=None, chunk_rays: int | None = None,
                           spp_offset: int = 0) -> np.ndarray:
    """Full-frame render across all processes → replicated numpy [H, W, 3].

    Every process must pass the same scene (deterministic parse/build) and
    the same key.  Pixel rows are sharded over the global mesh; the final
    film is all-gathered so each process returns the complete image.

    Like the single-process path (mesh.py), large frames render in equal
    fixed-shape chunks of ``chunk_rays`` pixels per device — one compiled
    program serves any resolution and per-host memory stays bounded (an
    elf/lucy-class 1350×2000 frame is 2.7M rays; unchunked while-loop state
    blows HBM near ~1M).  ``spp_offset`` renders absolute sample indices
    [offset, offset+spp), so progressive multihost passes compose exactly.
    """
    from jax.experimental import multihost_utils

    from ..render.film import render_rays

    mesh = mesh or make_ray_mesh()
    n_dev = mesh.devices.size
    h, w = scene.static.height, scene.static.width
    ys_g, xs_g = np.meshgrid(np.arange(h, dtype=np.int32),
                             np.arange(w, dtype=np.int32), indexing="ij")
    xs_all = xs_g.reshape(-1)
    ys_all = ys_g.reshape(-1)
    n = xs_all.size

    gscene = jax.tree_util.tree_map(lambda a: _global_from_replicated(mesh, a),
                                    scene)
    gkey = _global_key(mesh, key)

    fn = jax.jit(render_rays, static_argnames=("spp", "integrator"),
                 out_shardings=NamedSharding(mesh, P("rays")))
    s0 = jnp.asarray(spp_offset, jnp.int32)

    chunk = (chunk_rays or CHUNK_RAYS_PER_DEVICE) * n_dev
    n_pad = pad_to_multiple(n, n_dev if n <= chunk else chunk)
    xs_all = np.pad(xs_all, (0, n_pad - n))
    ys_all = np.pad(ys_all, (0, n_pad - n))

    pieces = []
    for c0 in range(0, n_pad, chunk):
        xs = _global_from_computed(mesh, xs_all[c0:c0 + chunk])
        ys = _global_from_computed(mesh, ys_all[c0:c0 + chunk])
        flat = fn(gscene, xs, ys, spp=spp, key=gkey, integrator=integrator,
                  spp_offset=s0)
        # gather each chunk's film shards host-side: bounded device memory,
        # and every process assembles the same full frame
        pieces.append(np.asarray(
            multihost_utils.process_allgather(flat, tiled=True)))
    full = np.concatenate(pieces) if len(pieces) > 1 else pieces[0]
    return full[:n].reshape(h, w, 3)
