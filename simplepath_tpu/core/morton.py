"""Morton (Z-order) encode/decode, 32- and 64-bit.

TPU-native equivalent of ``/root/reference/math/Morton.h:12-93`` — the same
bit-interleave ladders, written over jnp unsigned arrays so they vectorize on
the VPU.  The reference uses Morton order to walk pixels within an 8x8 tile
(``base/Tile.h:49-142``); the TPU renderer uses a flat ray batch, so these are
provided for parity tooling (tile-order visualisations, cache-friendly ray
sorting experiments) rather than the hot path.

All functions accept scalars or arrays (numpy/jnp) and follow numpy
broadcasting.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "morton_encode32",
    "morton_decode32",
    "morton_encode64",
    "morton_decode64",
]


def _part1by1_32(a):
    """Spread the low 16 bits of ``a`` over the even bits of a uint32
    (Morton.h:49-56)."""
    a = jnp.asarray(a, jnp.uint32) & jnp.uint32(0x0000FFFF)
    a = (a | (a << 8)) & jnp.uint32(0x00FF00FF)
    a = (a | (a << 4)) & jnp.uint32(0x0F0F0F0F)
    a = (a | (a << 2)) & jnp.uint32(0x33333333)
    a = (a | (a << 1)) & jnp.uint32(0x55555555)
    return a


def _compact1by1_32(a):
    """Extract the even bits of a uint32 into the low 16 (Morton.h:67-75)."""
    a = jnp.asarray(a, jnp.uint32) & jnp.uint32(0x55555555)
    a = (a | (a >> 1)) & jnp.uint32(0x33333333)
    a = (a | (a >> 2)) & jnp.uint32(0x0F0F0F0F)
    a = (a | (a >> 4)) & jnp.uint32(0x00FF00FF)
    a = (a | (a >> 8)) & jnp.uint32(0x0000FFFF)
    return a


def morton_encode32(x, y):
    """Interleave two u16 coordinates into one u32 code (Morton.h:49-65)."""
    return _part1by1_32(x) | (_part1by1_32(y) << 1)


def morton_decode32(d):
    """Inverse of :func:`morton_encode32` → (x, y) (Morton.h:77-93)."""
    d = jnp.asarray(d, jnp.uint32)
    return _compact1by1_32(d), _compact1by1_32(d >> 1)


def _part1by1_64(a):
    """Spread the low 32 bits over the even bits of a uint64
    (Morton.h:12-29).  Host-side numpy: 64-bit codes are for host tooling
    (e.g. BVH build experiments); device code uses the 32-bit variants,
    which cover any renderable resolution."""
    a = np.asarray(a, np.uint64) & np.uint64(0x00000000FFFFFFFF)
    a = (a | (a << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    a = (a | (a << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    a = (a | (a << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    a = (a | (a << np.uint64(2))) & np.uint64(0x3333333333333333)
    a = (a | (a << np.uint64(1))) & np.uint64(0x5555555555555555)
    return a


def _compact1by1_64(a):
    """Extract the even bits of a uint64 into the low 32 (Morton.h:32-41)."""
    a = np.asarray(a, np.uint64) & np.uint64(0x5555555555555555)
    a = (a | (a >> np.uint64(1))) & np.uint64(0x3333333333333333)
    a = (a | (a >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    a = (a | (a >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    a = (a | (a >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    a = (a | (a >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return a


def morton_encode64(x, y):
    """Interleave two u32 coordinates into one u64 code (Morton.h:12-29)."""
    return _part1by1_64(x) | (_part1by1_64(y) << np.uint64(1))


def morton_decode64(d):
    """Inverse of :func:`morton_encode64` → (x, y) (Morton.h:43-47)."""
    d = np.asarray(d, np.uint64)
    return _compact1by1_64(d), _compact1by1_64(d >> np.uint64(1))
