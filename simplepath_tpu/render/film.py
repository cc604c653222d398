"""Film: flat ray-batch accumulation over samples-per-pixel.

TPU-native replacement for the Tile/TileScheduler machinery
(``/root/reference/base/Tile.h``, ``TileScheduler.h``, main.cpp:77-142):
instead of threads pulling 8×8 Morton tiles from an atomic counter, the whole
pixel grid is one flat batch dimension (shardable across a device mesh) and
spp is a ``lax.fori_loop`` accumulation.  Accumulation order differs from the
reference only by float associativity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from ..core.rng import pixel_jitter
from ..scene.types import Scene
from .camera import generate_ray
from .integrators import make_integrator
from .materials import build_rho_tables

__all__ = ["render_rays", "render_image"]


def render_rays(scene: Scene, xs: Array, ys: Array, spp: int, key: Array,
                integrator: str | None = None) -> Array:
    """Render a flat batch of pixels → [N, 3] radiance means.

    xs, ys: int32 pixel coordinates (flat).  Each sample s uses the
    reference's R-sequence pixel jitter (main.cpp:92-98) and a per
    (pixel, sample) threefry key for the integrator.
    """
    name = integrator or scene.static.integrator
    fn = make_integrator(name)
    rho = build_rho_tables(scene.materials)
    n = xs.shape[0]
    lin = ys.astype(jnp.uint32) * jnp.uint32(scene.static.width) + xs.astype(jnp.uint32)
    pix_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(lin)
    # The adaptive-RR integrator threads per-pixel per-depth Welford stats
    # across samples (the reference's Array2D<RunningStats> per depth,
    # Integrator.cpp:370-381).
    stateful = name == "brute_force_iterative_dynamic_rr"

    def sample_rays(s):
        jitter = pixel_jitter(xs, ys, jnp.full_like(xs, s))
        px = xs.astype(jnp.float32) + jitter[:, 0]
        py = ys.astype(jnp.float32) + jitter[:, 1]
        ro, rd = generate_ray(scene.camera, px, py)
        keys = jax.vmap(lambda k: jax.random.fold_in(k, s))(pix_keys)
        return ro, rd, keys, jnp.stack([px, py], axis=-1)

    if stateful:
        nd = max(1, scene.static.max_depth - scene.static.russian_roulette_depth)
        stats0 = (jnp.zeros((n, nd), jnp.float32), jnp.zeros((n, nd), jnp.int32))

        def one_sample(s, carry):
            film, stats = carry
            ro, rd, keys, pcoords = sample_rays(s)
            L, stats = fn(scene, rho, ro, rd, keys, pcoords, stats)
            return film + L, stats

        film, _ = jax.lax.fori_loop(0, spp, one_sample,
                                    (jnp.zeros((n, 3), jnp.float32), stats0))
        return film / spp

    def one_sample(s, film):
        ro, rd, keys, pcoords = sample_rays(s)
        L = fn(scene, rho, ro, rd, keys, pcoords)
        return film + L

    film = jax.lax.fori_loop(0, spp, one_sample, jnp.zeros((n, 3), jnp.float32))
    return film / spp


def render_image(scene: Scene, spp: int, key: Array,
                 integrator: str | None = None) -> Array:
    """Full-frame render → [H, W, 3]."""
    h, w = scene.static.height, scene.static.width
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.int32),
                          jnp.arange(w, dtype=jnp.int32), indexing="ij")
    flat = render_rays(scene, xs.reshape(-1), ys.reshape(-1), spp, key, integrator)
    return flat.reshape(h, w, 3)


def render_image_progressive(scene: Scene, spp: int, key: Array,
                             integrator: str | None = None,
                             chunk: int = 16,
                             checkpoint_path: str | None = None,
                             checkpoint_every: int = 64,
                             progress: bool = False):
    """Chunked render with optional checkpoint/resume.

    Renders in ``chunk``-spp passes, accumulating an unaveraged film sum;
    with ``checkpoint_path`` the film + completed-spp count is saved every
    ``checkpoint_every`` samples and resumed on restart — the
    capability the reference's multi-pass scaffolding never grew into
    (TileScheduler.h:12-16, num_passes=1 at main.cpp:111).  Sample streams
    are keyed by absolute sample index, so a resumed render is identical to
    an uninterrupted one.
    """
    import numpy as np

    from ..utils import ProgressBar, load_checkpoint, save_checkpoint

    h, w = scene.static.height, scene.static.width
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.int32),
                          jnp.arange(w, dtype=jnp.int32), indexing="ij")
    xs, ys = xs.reshape(-1), ys.reshape(-1)
    fn = make_integrator(integrator or scene.static.integrator)
    rho = build_rho_tables(scene.materials)
    lin = ys.astype(jnp.uint32) * jnp.uint32(w) + xs.astype(jnp.uint32)
    pix_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(lin)

    def render_range(s0: int, n: int):
        def one_sample(s, film):
            jitter = pixel_jitter(xs, ys, jnp.full_like(xs, s))
            px = xs.astype(jnp.float32) + jitter[:, 0]
            py = ys.astype(jnp.float32) + jitter[:, 1]
            ro, rd = generate_ray(scene.camera, px, py)
            keys = jax.vmap(lambda k: jax.random.fold_in(k, s))(pix_keys)
            pcoords = jnp.stack([px, py], axis=-1)
            L = fn(scene, rho, ro, rd, keys, pcoords)
            return film + L
        return jax.lax.fori_loop(s0, s0 + n,
                                 one_sample, jnp.zeros((xs.shape[0], 3), jnp.float32))

    render_range_jit = jax.jit(render_range, static_argnums=(1,))

    film_sum = np.zeros((xs.shape[0], 3), np.float32)
    done = 0
    if checkpoint_path:
        ck = load_checkpoint(checkpoint_path)
        if ck is not None:
            film_ck, done, meta = ck
            if meta.get("spp_target") == spp and film_ck.shape == film_sum.shape:
                film_sum = film_ck

    bar = ProgressBar(spp, "spp") if progress else None
    last_ck = done
    while done < spp:
        n = min(chunk, spp - done)
        film_sum = film_sum + np.asarray(render_range_jit(done, n))
        done += n
        if bar:
            bar.update(n)
            bar.draw()
        if checkpoint_path and (done - last_ck >= checkpoint_every or done == spp):
            save_checkpoint(checkpoint_path, film_sum, done,
                            {"spp_target": spp})
            last_ck = done
    if bar:
        bar.finish()
    return jnp.asarray(film_sum / spp).reshape(h, w, 3)
