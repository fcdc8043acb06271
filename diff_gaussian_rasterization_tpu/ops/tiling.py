"""Image <-> tile-major layout helpers.

The render core operates in tile-major layout ``[T, Q]`` where ``T`` is the
number of tiles (row-major over the tile grid) and ``Q = tile_h * tile_w``
pixels per tile — the TPU analogue of the reference's one-CUDA-block-per-tile
mapping (forward.cu:283-289).
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_dims(h: int, w: int, th: int, tw: int):
    return -(-w // tw), -(-h // th)  # tiles_x, tiles_y


def img_to_tiles(img, th: int, tw: int, pad_value=0.0):
    """[..., H, W] -> [..., T, Q] (padding partial tiles)."""
    *lead, h, w = img.shape
    tx, ty = grid_dims(h, w, th, tw)
    pad = [(0, 0)] * len(lead) + [(0, ty * th - h), (0, tx * tw - w)]
    x = jnp.pad(img, pad, constant_values=pad_value)
    x = x.reshape(*lead, ty, th, tx, tw)
    x = jnp.moveaxis(x, -2, -3)  # [..., ty, tx, th, tw]
    return x.reshape(*lead, ty * tx, th * tw)


def tiles_to_img(tiles, h: int, w: int, th: int, tw: int):
    """[..., T, Q] -> [..., H, W] (cropping padded tiles)."""
    *lead, t, q = tiles.shape
    tx, ty = grid_dims(h, w, th, tw)
    x = tiles.reshape(*lead, ty, tx, th, tw)
    x = jnp.moveaxis(x, -3, -2)  # [..., ty, th, tx, tw]
    x = x.reshape(*lead, ty * th, tx * tw)
    return x[..., :h, :w]
