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
    fn = make_integrator(integrator or scene.static.integrator)
    rho = build_rho_tables(scene.materials)
    n = xs.shape[0]
    lin = ys.astype(jnp.uint32) * jnp.uint32(scene.static.width) + xs.astype(jnp.uint32)
    pix_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(lin)

    def one_sample(s, film):
        jitter = pixel_jitter(xs, ys, jnp.full_like(xs, s))
        px = xs.astype(jnp.float32) + jitter[:, 0]
        py = ys.astype(jnp.float32) + jitter[:, 1]
        ro, rd = generate_ray(scene.camera, px, py)
        keys = jax.vmap(lambda k: jax.random.fold_in(k, s))(pix_keys)
        pcoords = jnp.stack([px, py], axis=-1)
        L = jax.vmap(fn, in_axes=(None, None, 0, 0, 0, 0))(
            scene, rho, ro, rd, keys, pcoords)
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
