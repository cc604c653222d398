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
                integrator: str | None = None, spp_offset=0) -> Array:
    """Render a flat batch of pixels → [N, 3] radiance means.

    xs, ys: int32 pixel coordinates (flat).  Each sample s uses the
    reference's R-sequence pixel jitter (main.cpp:92-98) and a per
    (pixel, sample) threefry key for the integrator.

    ``spp_offset`` renders absolute sample indices [offset, offset+spp) —
    sample streams are keyed by the absolute index, so chunked/progressive
    renders compose to exactly the same film as one uninterrupted render.
    It may be a traced scalar (one compiled program serves every chunk).
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

        def one_sample_stats(s, carry):
            film, stats = carry
            ro, rd, keys, pcoords = sample_rays(s)
            L, stats = fn(scene, rho, ro, rd, keys, pcoords, stats)
            return film + L, stats

    # reverse mode needs static fori bounds; the differentiable path always
    # renders from sample 0 (training consumes whole batches, not resumes)
    s0 = (int(spp_offset) if scene.static.differentiable
          else jnp.asarray(spp_offset, jnp.int32))

    if stateful:
        film, _ = jax.lax.fori_loop(s0, s0 + spp, one_sample_stats,
                                    (jnp.zeros((n, 3), jnp.float32), stats0))
        return film / spp

    def one_sample(s, film):
        ro, rd, keys, pcoords = sample_rays(s)
        L = fn(scene, rho, ro, rd, keys, pcoords)
        return film + L

    if scene.static.differentiable:
        # checkpoint each spp iteration too: with the per-bounce remat in
        # integrators._bounce_loop, reverse-mode memory is O(1) in both spp
        # and depth (the film sum is the only carried activation)
        one_sample = jax.checkpoint(one_sample)
    film = jax.lax.fori_loop(s0, s0 + spp, one_sample,
                             jnp.zeros((n, 3), jnp.float32))
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
                             progress: bool = False,
                             render_fn=None):
    """Chunked render with optional checkpoint/resume.

    Renders in ``chunk``-spp passes, accumulating an unaveraged film sum;
    with ``checkpoint_path`` the film + completed-spp count is saved every
    ``checkpoint_every`` samples and resumed on restart — the
    capability the reference's multi-pass scaffolding never grew into
    (TileScheduler.h:12-16, num_passes=1 at main.cpp:111).  Sample streams
    are keyed by absolute sample index, so a resumed render is identical to
    an uninterrupted one.

    ``render_fn(scene, spp, key, integrator=..., spp_offset=...)`` overrides
    the per-pass renderer (default: the ray-sharded path) — the CLI uses
    this to run geometry-sharded renders progressively.
    """
    import numpy as np

    from ..parallel.mesh import render_image_sharded
    from ..utils import ProgressBar, load_checkpoint, save_checkpoint

    if render_fn is None:
        render_fn = render_image_sharded

    h, w = scene.static.height, scene.static.width
    film_sum = np.zeros((h, w, 3), np.float32)
    done = 0
    if checkpoint_path:
        ck = load_checkpoint(checkpoint_path)
        if ck is not None:
            film_ck, done, meta = ck
            if meta.get("spp_target") == spp and film_ck.shape == film_sum.shape:
                film_sum = film_ck

    bar = ProgressBar(spp, "spp") if progress else None
    if bar and done:
        bar.update(done)
        bar.draw()
    last_ck = done
    while done < spp:
        n = min(chunk, spp - done)
        # each pass renders absolute samples [done, done+n) through the
        # sharded + ray-chunked path (bounded memory at any resolution); the
        # traced spp_offset means one compiled program serves every pass
        img = render_fn(scene, n, key, integrator=integrator,
                        spp_offset=done)
        film_sum = film_sum + np.asarray(img) * n
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
    return jnp.asarray(film_sum / spp)
