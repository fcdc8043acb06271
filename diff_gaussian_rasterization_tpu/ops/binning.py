"""Tile binning: instance expansion, depth sort, per-tile ranges.

TPU-native replacement for the reference's dynamic-allocation pipeline
(``Rasterizer::forward``, light rasterizer_impl.cu:197-350):

  CUB InclusiveSum(tiles_touched)      -> jnp.cumsum
  cudaMemcpy(num_rendered) D->H sync   -> eliminated: static instance budget,
                                          overflow reported as data
  duplicateWithKeys kernel             -> closed-form instance->$(gaussian,
                                          tile) mapping via searchsorted
  CUB RadixSort on (tile<<32|depth)    -> stable multi-key lax.sort on
                                          (tile_id, depth); no bit-packing
                                          (the reference's float-bits trick,
                                          rasterizer_impl.cu:102-105, relies
                                          on positive depths; sorting floats
                                          directly is equivalent and clearer)
  identifyTileRanges kernel            -> two searchsorteds over the sorted
                                          tile ids

Everything is static-shape.  ``max_instances`` bounds the emitted
(gaussian, tile) pairs; when the true total exceeds it, the deepest excess
instances are dropped and ``overflow`` is set — never a silent cap.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import Preprocessed


class Binned(NamedTuple):
    gauss_id: jnp.ndarray    # (I,) int32 source Gaussian per instance
    tile_id: jnp.ndarray     # (I,) int32, sorted ascending; num_tiles where invalid
    valid: jnp.ndarray       # (I,) bool
    tile_start: jnp.ndarray  # (T,) int32 [start, stop) into the instance list
    tile_stop: jnp.ndarray   # (T,) int32
    num_rendered: jnp.ndarray  # scalar int32, true (uncapped) instance count
    overflow: jnp.ndarray    # scalar bool


INSTANCE_ALIGN = 128  # matches the Pallas kernels' DMA block (render_pallas.BLOCK)


def aligned_size(max_instances: int, num_tiles: int, align: int) -> int:
    """Static instance-array length when per-tile segments are align-padded."""
    if align <= 1:
        return max_instances
    return max_instances + align * num_tiles


def bin_gaussians(prep: Preprocessed, tiles_x: int, tiles_y: int,
                  max_instances: int, align: int = 1) -> Binned:
    p = prep.tiles_touched.shape[0]
    num_tiles = tiles_x * tiles_y
    tt = prep.tiles_touched.astype(jnp.int32)
    ends = jnp.cumsum(tt)                     # inclusive prefix sum
    starts = ends - tt                        # exclusive
    total = ends[-1]

    i = jnp.arange(max_instances, dtype=jnp.int32)
    # Instance i belongs to the Gaussian whose [start, end) covers i
    # (the reference writes at off = point_offsets[idx-1] + k,
    # rasterizer_impl.cu:89-105; this is its inverse map).
    g = jnp.searchsorted(ends, i, side="right").astype(jnp.int32)
    valid = i < jnp.minimum(total, max_instances)
    g = jnp.clip(g, 0, p - 1)

    local = i - starts[g]
    rect_w = (prep.rect_max[:, 0] - prep.rect_min[:, 0])[g]
    rect_w = jnp.maximum(rect_w, 1)
    dy = local // rect_w
    dx = local - dy * rect_w
    tx = prep.rect_min[g, 0] + dx
    ty = prep.rect_min[g, 1] + dy
    tile = jnp.where(valid, ty * tiles_x + tx, num_tiles)

    depth = jax.lax.stop_gradient(prep.depth)[g]
    # Stable two-key sort: (tile, depth); ties keep Gaussian-index order like
    # the reference's stable radix sort.
    tile_s, _, g_s, valid_s = jax.lax.sort(
        (tile, depth, g, valid), num_keys=2, is_stable=True
    )

    t = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(tile_s, t, side="left").astype(jnp.int32)
    tile_stop = jnp.searchsorted(tile_s, t, side="right").astype(jnp.int32)

    if align > 1:
        # Re-lay the sorted stream so every tile's segment starts at a
        # multiple of `align` (TPU DMA blocks are (align, features) tiles;
        # HBM lane tiling forbids unaligned dynamic slices).  Gaps between a
        # tile's stop and the next aligned start are never read.
        counts = tile_stop - tile_start
        padded = -(-counts // align) * align
        astart = (jnp.cumsum(padded) - padded).astype(jnp.int32)
        i_al = aligned_size(max_instances, num_tiles, align)
        tclip = jnp.clip(tile_s, 0, num_tiles - 1)
        rank = i - tile_start[tclip]
        ok = valid_s & (tile_s < num_tiles)
        newpos = jnp.where(ok, astart[tclip] + rank, i_al)
        g_al = jnp.zeros((i_al,), jnp.int32).at[newpos].set(g_s, mode="drop")
        v_al = jnp.zeros((i_al,), bool).at[newpos].set(valid_s, mode="drop")
        t_al = jnp.full((i_al,), num_tiles, jnp.int32).at[newpos].set(
            tile_s, mode="drop")
        return Binned(
            gauss_id=g_al,
            tile_id=t_al,
            valid=v_al,
            tile_start=astart,
            tile_stop=astart + counts,
            num_rendered=total,
            overflow=total > max_instances,
        )

    return Binned(
        gauss_id=g_s,
        tile_id=tile_s,
        valid=valid_s,
        tile_start=tile_start,
        tile_stop=tile_stop,
        num_rendered=total,
        overflow=total > max_instances,
    )


def default_max_instances(p: int, multiplier: int) -> int:
    """Round the instance budget up to a friendly power-of-two-ish size."""
    n = max(p * multiplier, 1024)
    # round up to a multiple of 1024 for clean tiling
    return -(-n // 1024) * 1024
