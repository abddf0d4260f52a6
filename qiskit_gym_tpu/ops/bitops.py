"""Packed-uint32 GF(2) bit-matrix primitives.

A bit-matrix of logical size (dim x dim) is stored as uint32[R, W] with
W = ceil(dim / 32) words per row and R = 32 * W rows; bit c of row r lives at
word c // 32, bit position c % 32. Rows dim..R-1 carry identity padding so the
padded matrix stays invertible and bit-transposes stay exact (block-diag(M, I)
transposes/inverts blockwise).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def words_for(dim: int) -> int:
    return max((dim + 31) // 32, 1)


def padded_rows(dim: int) -> int:
    return 32 * words_for(dim)


def pack_bits(mat: np.ndarray) -> np.ndarray:
    """numpy bool/int [dim, dim] -> uint32 [R, W] with identity padding."""
    mat = np.asarray(mat)
    dim = mat.shape[0]
    W = words_for(dim)
    R = padded_rows(dim)
    full = np.eye(R, dtype=np.uint8)
    full[:dim, :dim] = (mat != 0).astype(np.uint8)
    full[:dim, dim:] = 0
    full[dim:, :dim] = 0
    # little-endian within each word
    words = full.reshape(R, W, 32)
    weights = (1 << np.arange(32, dtype=np.uint64)).astype(np.uint64)
    packed = (words.astype(np.uint64) * weights).sum(axis=2)
    return packed.astype(np.uint32)


def unpack_bits(packed: jnp.ndarray, dim: int) -> jnp.ndarray:
    """uint32 [..., R, W] -> uint8 [..., dim, dim]."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (packed[..., :dim, :, None] >> shifts) & jnp.uint32(1)
    flat = bits.reshape(*packed.shape[:-2], dim, -1)
    return flat[..., :dim].astype(jnp.uint8)


def packed_identity(dim: int) -> np.ndarray:
    return pack_bits(np.eye(dim, dtype=np.uint8))


def _tile_transpose32(a: jnp.ndarray) -> jnp.ndarray:
    """Transpose a 32x32 bit tile given as uint32[..., 32] (bit j of word r =
    element (r, j)). Butterfly network, 5 stages (classic bit-matrix
    transpose), fully vectorized over leading axes."""
    idx = jnp.arange(32)
    masks = [jnp.uint32(0x0000FFFF), jnp.uint32(0x00FF00FF), jnp.uint32(0x0F0F0F0F),
             jnp.uint32(0x33333333), jnp.uint32(0x55555555)]
    shifts = [16, 8, 4, 2, 1]
    for s, m in zip(shifts, masks):
        partner = a[..., idx ^ s]
        upper = (idx & s) == 0  # rows whose partner is s below
        # little-endian bits (bit c = column c): the upper row keeps its low
        # bits and takes the partner's low bits shifted up; the lower row
        # keeps its high bits and takes the partner's high bits shifted down.
        up_new = (a & m) | ((partner << s) & ~m)
        dn_new = (a & ~m) | ((partner >> s) & m)
        a = jnp.where(upper, up_new, dn_new)
    return a


def bit_transpose(packed: jnp.ndarray) -> jnp.ndarray:
    """Transpose uint32[..., R, W] (R = 32*W) as a bit matrix.

    Tiles: word (r, w) holds bits of columns 32w..32w+31 of row r. The
    transpose swaps 32x32 tiles across the grid diagonal and transposes each
    tile internally.
    """
    *lead, R, W = packed.shape
    assert R == 32 * W, (R, W)
    tiles = packed.reshape(*lead, W, 32, W)          # [.., tile_row, r, tile_col]
    tiles = jnp.moveaxis(tiles, -1, -2)              # [.., tile_row, tile_col, 32]
    tiles = _tile_transpose32(tiles)                 # transpose each tile
    tiles = jnp.swapaxes(tiles, -3, -2)              # swap tile grid indices
    tiles = jnp.moveaxis(tiles, -1, -2)              # [.., tile_row, r, tile_col]
    return tiles.reshape(*lead, R, W)


def popcount(x: jnp.ndarray) -> jnp.ndarray:
    """Per-word population count (uint32 -> int32)."""
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)
