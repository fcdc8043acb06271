"""Pallas TPU tile-render kernels (forward + analytic backward).

TPU-native re-architecture of the reference's hot loops:

- ``renderCUDA`` forward (light forward.cu:261-412): one CUDA block per tile,
  one thread per pixel, 256-Gaussian shared-memory batches, sequential
  per-pixel blending.  Here: one grid step per tile, the *whole* tile's pixel
  vector processed as (chunk x Q) dense VPU math using the prefix-product
  formulation from ``ops.blend``; Gaussian blocks are DMA'd from HBM into
  VMEM scratch (the shared-memory staging pattern, forward.cu:329-343, maps
  onto explicit async copies); per-tile early termination skips remaining
  blocks once every pixel is saturated (forward.cu:368-373's done-voting).

- ``renderCUDA`` backward (light backward.cu:419-699): instead of
  back-to-front recurrences + atomicAdd scatter, a forward-ordered pass with
  prefix sums (see ops/blend.py) writing *per-instance gradient rows*.
  Instances of one tile are contiguous in the sorted stream, so each grid
  step DMA-writes a private, contiguous slice — no atomics, deterministic.

Data layout: TPU DMA requires 128-lane tiles, so the instance stream is laid
out in feature-planar blocks ``[n_blocks, FEAT, 128]`` (instance ``i`` lives
at ``[i // 128, :, i % 128]``) and binning aligns every tile's segment to a
multiple of 128 (``ops.binning align=128``).  One DMA moves one block; the
kernel then processes it in compute sub-chunks of ``cfg.chunk`` instances to
bound VMEM pressure.

Feature rows:        x, y, A, B, C, opac, r, g, b, depth, depth_med, (pad)
Gradient-row layout: dx, dy, dA, dB, dC, dopac, dr, dg, db, ddepth,
                     ddepth_var, ddepth_med, (pad)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import RasterConfig
from .. import blend
from ..tile_xla import CoreOutputs

BLOCK = 128  # instances per DMA block == binning alignment
FEAT = 16    # feature rows per block (11 used, padded to a sublane multiple)


def _is_cpu():
    return jax.devices()[0].platform == "cpu"


def _pixel_vectors(tile_idx, tiles_x, th, tw, height, width):
    """px, py [Q] float32 and pixel-validity mask [Q] for one tile.

    Built over a (Q//128, 128) grid (the native vreg layout, so the flatten
    is a no-op) rather than (th, tw), which Mosaic cannot reshape when
    tw != 128.
    """
    q = th * tw
    # (1, q)-shaped iota reshapes to 1-D; (q//128, 128) -> (q,) does not
    # lower in Mosaic for q < 1024
    qi = jax.lax.broadcasted_iota(jnp.int32, (1, q), 1).reshape(q)
    qx = qi % tw
    qy = qi // tw
    tx = tile_idx % tiles_x
    ty = tile_idx // tiles_x
    pxi = tx * tw + qx
    pyi = ty * th + qy
    mask = (pxi < width) & (pyi < height)
    return pxi.astype(jnp.float32), pyi.astype(jnp.float32), mask


def pack_instances(xy, conic, opac, color, depth, depth_med):
    """[I, features] -> [I // BLOCK + 1, FEAT, BLOCK] feature-planar blocks.

    Rows: x, y, A, B, C, opac, r, g, b, depth, depth_med, depth^2, 1, pad.
    Rows 6..12 are exactly the blend matmul's feature rows ([c.., depth,
    dmed, d^2, 1]) so kernels can slice them contiguously — Mosaic cannot
    concatenate freshly computed vectors in-kernel.

    One trailing zero block is appended: the kernels DMA two-block slabs
    (the lane-rotation read path for sort-domain segments), so the last
    live block's slab read must have a legal successor.
    """
    i = xy.shape[0]
    assert i % BLOCK == 0, "instance stream must be BLOCK-aligned"
    flat = jnp.concatenate(
        [xy, conic, opac[:, None], color, depth[:, None],
         depth_med[:, None], (depth * depth)[:, None],
         jnp.ones((i, 1), xy.dtype),
         jnp.zeros((i, FEAT - 13), xy.dtype)],
        axis=1,
    )
    blocks = jnp.transpose(flat.reshape(i // BLOCK, BLOCK, FEAT), (0, 2, 1))
    return jnp.concatenate(
        [blocks, jnp.zeros((1, FEAT, BLOCK), xy.dtype)], axis=0)


def pack_feature_table(full):
    """[I, FEAT] pre-assembled feature rows -> padded feature-planar blocks.

    The fused render path gathers the whole per-instance feature table in
    one row gather (sorted order) and packs it here — no per-column
    instance arrays are ever materialized.
    """
    i = full.shape[0]
    assert i % BLOCK == 0 and full.shape[1] == FEAT
    blocks = jnp.transpose(full.reshape(i // BLOCK, BLOCK, FEAT), (0, 2, 1))
    return jnp.concatenate(
        [blocks, jnp.zeros((1, FEAT, BLOCK), full.dtype)], axis=0)


def _rolled(slab, shift):
    """[2, F, BLOCK] slab -> the [F, BLOCK] window starting at lane
    ``shift`` of the concatenated pair: out[:, l] = flat[:, shift + l].

    This is how the kernels read *sort-domain* tile segments (arbitrary
    128-lane phase) out of the 128-aligned packed stream: two-block DMA +
    one dynamic lane rotation + select, instead of materializing a
    re-aligned copy of the whole instance stream (the round-3 aligned
    gather cost 1.9 ms/frame at bench scale).  ``shift`` is a traced
    scalar; shift == 0 (aligned callers) selects slab[0] exactly.
    """
    f = slab.shape[1]
    a = slab[0]
    b = slab[1]
    ra = pltpu.roll(a, BLOCK - shift, axis=1)
    rb = pltpu.roll(b, BLOCK - shift, axis=1)
    li = jax.lax.broadcasted_iota(jnp.int32, (f, BLOCK), 1)
    return jnp.where(li < BLOCK - shift, ra, rb)


def _sub(plane, c, size):
    return jax.lax.slice_in_dim(plane, c * size, (c + 1) * size, axis=-1)


def _features(block, c, size):
    """Extract one compute sub-chunk's per-instance vectors from a
    [FEAT, BLOCK] plane.  ``c`` is a static Python int."""
    xy = jnp.stack([_sub(block[0], c, size), _sub(block[1], c, size)], -1)
    conic = jnp.stack([_sub(block[2], c, size), _sub(block[3], c, size),
                       _sub(block[4], c, size)], -1)
    opac = _sub(block[5], c, size)
    color = jnp.stack([_sub(block[6], c, size), _sub(block[7], c, size),
                       _sub(block[8], c, size)], -1)
    depth = _sub(block[9], c, size)
    dmed = _sub(block[10], c, size)
    return xy, conic, opac, color, depth, dmed


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------


def _fwd_kernel(
    # scalar prefetch
    start_ref, stop_ref, tidx_ref,
    # inputs
    packed_hbm, gt_ref, basis_ref,
    # fused output block [batch, 12, q]: rows 0-2 color, 3 depth, 4 weight,
    # 5 median, 6 var, 7 t_final, 8 n_contrib(i32 bits), 9 n_valid(i32),
    # 10 midx(i32), 11 ucross.  One output stream instead of ten: per-tile
    # output-window DMA bookkeeping dominated the kernel (~10 ms at 836
    # tiles) when each quantity had its own stream.
    out_ref,
    # scratch
    data_scr, sems,
    *, cfg: RasterConfig, tiles_x: int, height: int, width: int, sub: int,
    n_tiles: int, batch: int,
):
    q = cfg.tile_px
    n_sub = BLOCK // sub
    bc = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)

    # ``batch`` tiles per grid step (statically unrolled) amortize the
    # per-step fixed costs; beyond-n_tiles padding tiles have empty segments
    # and their output rows are sliced off outside.
    for j in range(batch):
        t = pl.program_id(0) * batch + j
        start = start_ref[t]
        stop = stop_ref[t]
        base = start // BLOCK
        shift = jax.lax.rem(start, BLOCK)

        # tidx maps the local grid step to a global tile id (they differ
        # when the tile axis is sharded across devices)
        px, py, pixmask = _pixel_vectors(
            tidx_ref[t], tiles_x, cfg.tile_h, cfg.tile_w, height, width
        )
        gt = gt_ref[j, 0]
        if cfg.splat_basis_power:
            basis = basis_ref[:]
            tx = tidx_ref[t] % tiles_x
            ty = tidx_ref[t] // tiles_x
            origin = ((tx * cfg.tile_w).astype(jnp.float32),
                      (ty * cfg.tile_h).astype(jnp.float32))
        else:
            basis = origin = None

        carry0 = blend.init_carry(q, 3, jnp.float32)
        n_blocks = pl.cdiv(stop - start, BLOCK)

        # Two-block slab per chunk: segment starts live at arbitrary lane
        # phase in the sorted stream (sort-domain reads); _rolled()
        # reassembles the in-phase [FEAT, BLOCK] window.  Aligned callers
        # (shift == 0) read one extra block and select slab[0].
        def read_dma(k, base=base):
            return pltpu.make_async_copy(
                packed_hbm.at[pl.ds(base + k, 2)],
                data_scr.at[jax.lax.rem(k, 2)],
                sems.at[jax.lax.rem(k, 2)],
            )

        # block 0 of tile t > 0 was prefetched while finishing the previous
        # tile (the cross-tile pipeline below); only the very first tile
        # fetches its own
        @pl.when((t == 0) & (n_blocks > 0))
        def _():
            read_dma(0).start()

        def cond(state):
            k, carry = state
            return (k < n_blocks) & jnp.any(carry.prod >= cfg.t_terminate)

        def body(state, px=px, py=py, pixmask=pixmask, gt=gt, basis=basis,
                 origin=origin, start=start, stop=stop, shift=shift):
            k, carry = state

            # double buffering: next block's fetch overlaps this compute
            @pl.when(k + 1 < n_blocks)
            def _():
                read_dma(k + 1).start()

            read_dma(k).wait()
            block = _rolled(data_scr[jax.lax.rem(k, 2)], shift)
            for c in range(n_sub):
                xy, conic, opac, color, depth, dmed = _features(block, c,
                                                                sub)
                packed = jax.lax.slice(block,
                                       (6, c * sub), (13, (c + 1) * sub))
                off = k * BLOCK + c * sub
                gi = jax.lax.broadcasted_iota(jnp.int32, (sub, 1), 0)
                valid = ((off + gi) < (stop - start)) & pixmask[None, :]

                def live_chunk(carry, xy=xy, conic=conic, opac=opac,
                               color=color, depth=depth, dmed=dmed,
                               valid=valid, off=off, packed=packed):
                    out, _, _ = blend.blend_chunk_fwd(
                        carry, xy, conic, opac, color, depth, dmed, valid,
                        px, py, gt, off, cfg, global_base=start + off,
                        packed_rows=packed, want_instance_stats=False,
                        basis=basis, origin=origin,
                    )
                    return out

                if c == 0:
                    carry = live_chunk(carry)
                else:
                    # sub-chunks past a tile's last instance are all-padding
                    # (segments are 128-aligned but typically half-full);
                    # branch around their compute entirely
                    carry = jax.lax.cond(
                        off < stop - start, live_chunk, lambda cr: cr, carry)
            return k + 1, carry

        kf, carry = jax.lax.while_loop(cond, body, (jnp.int32(0), carry0))

        # early termination can leave one prefetched block in flight; drain
        # it so the semaphore is clean for the next tile
        @pl.when(kf < n_blocks)
        def _():
            read_dma(kf).wait()

        # cross-tile pipeline: at ~2 instance blocks per tile (post-culling)
        # the in-tile double buffer cannot hide the first DMA's latency, so
        # issue the next tile's block 0 now — it overlaps this tile's output
        # stores and the next tile's prologue.  Slot 0 is free: every
        # in-tile DMA was waited above, and block 0 always gets consumed
        # (the while condition is true at k=0), keeping the semaphore
        # balanced.
        nt = jnp.minimum(t + 1, n_tiles - 1)
        n_start = start_ref[nt]

        @pl.when((t + 1 < n_tiles) & (stop_ref[nt] > n_start))
        def _(n_start=n_start):
            pltpu.make_async_copy(
                packed_hbm.at[pl.ds(n_start // BLOCK, 2)],
                data_scr.at[0],
                sems.at[0],
            ).start()

        out_ref[j, 0:3] = carry.color
        out_ref[j, 3] = carry.depth
        out_ref[j, 4] = carry.weight
        out_ref[j, 5] = carry.median
        out_ref[j, 6] = blend.finish_var(carry, gt)
        out_ref[j, 7] = carry.t_final
        out_ref[j, 8] = bc(carry.n_contrib)
        out_ref[j, 9] = bc(carry.n_valid)
        out_ref[j, 10] = bc(carry.midx)
        out_ref[j, 11] = blend.finish_ucross(carry, gt)


def core_fwd(
    xy, conic, opac, color, depth, depth_med,
    tile_start, tile_stop, gt_tiles,
    *, cfg: RasterConfig, tiles_x: int, capacity: int,
    height: int, width: int, tile_batch: int = 0, interpret=None,
    tile_index=None, packed=None, i_total=None,
) -> CoreOutputs:
    del tile_batch  # XLA-backend knob; see cfg.kernel_tile_batch
    if interpret is None:
        interpret = _is_cpu()
    t = tile_start.shape[0]
    q = cfg.tile_px
    assert q % 128 == 0, "tile_h*tile_w must be a multiple of 128"
    sub = min(cfg.chunk, BLOCK)
    assert BLOCK % sub == 0
    if i_total is None:
        i_total = xy.shape[0]
    b = max(1, cfg.kernel_tile_batch)
    t_pad = -(-t // b) * b

    if packed is None:
        packed = pack_instances(xy, conic, opac, color, depth, depth_med)

    def pad_t(x, value=0):
        if t_pad == t:
            return x
        return jnp.pad(x, [(0, t_pad - t)] + [(0, 0)] * (x.ndim - 1),
                       constant_values=value)

    tile_start = pad_t(tile_start)
    tile_stop = pad_t(tile_stop)
    if tile_index is None:
        tile_index = jnp.arange(t_pad, dtype=jnp.int32)
    else:
        tile_index = pad_t(tile_index)

    # tile tensors travel as [T, k, q] (block dims equal to array dims are
    # always legal; in-kernel no reshapes are needed); the (th, tw) spatial
    # view is reassembled outside the kernel
    tile_spec = pl.BlockSpec((b, 1, q), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((b, 12, q), lambda i, *_: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    qx = jnp.tile(jnp.arange(cfg.tile_w, dtype=jnp.float32), cfg.tile_h)
    qy = jnp.repeat(jnp.arange(cfg.tile_h, dtype=jnp.float32), cfg.tile_w)
    basis = blend.moment_basis(qx, qy, origin=(0.0, 0.0))         # [6, q]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t_pad // b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # packed instance blocks
            tile_spec,                              # gt tiles
            pl.BlockSpec(memory_space=pltpu.VMEM),  # basis (shared)
        ],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((2, 2, FEAT, BLOCK), jnp.float32),  # 2-slab buffers
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = functools.partial(
        _fwd_kernel, cfg=cfg, tiles_x=tiles_x, height=height, width=width,
        sub=sub, n_tiles=t, batch=b,
    )
    f32 = jnp.float32
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_pad, 12, q), f32),
        interpret=interpret,
    )(tile_start, tile_stop, tile_index, packed,
      pad_t(gt_tiles.reshape(t, 1, q)), basis)[:t]

    ib = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
    c = out[:, 0:3]
    d, wgt, med, var, tf = (out[:, 3], out[:, 4], out[:, 5], out[:, 6],
                            out[:, 7])
    ncon, nval, midx = ib(out[:, 8]), ib(out[:, 9]), ib(out[:, 10])
    ucross = out[:, 11]
    flat = lambda x: x

    # Per-Gaussian uncertainty statistics (forward.cu:386-387) from the
    # per-pixel crossing index: a deterministic segment reduction.
    fm = midx.reshape(-1)
    fu = ucross.reshape(-1)
    safe = fm >= 0
    sidx = jnp.where(safe, fm, 0)
    u_inst = jnp.zeros((i_total,), f32).at[sidx].add(
        jnp.where(safe, fu, 0.0))
    npix_inst = jnp.zeros((i_total,), jnp.int32).at[sidx].add(
        safe.astype(jnp.int32))

    return CoreOutputs(flat(c), flat(d), flat(wgt), flat(med), flat(var),
                       flat(tf), flat(ncon), flat(nval), midx,
                       u_inst, npix_inst)


# --------------------------------------------------------------------------
# forward + pose tangents (dual forward)
# --------------------------------------------------------------------------

TAN_PER_K = 3  # light-variant tangent rows per direction: dx, dy, ddepth


def pack_tangents(tan_xy, tan_depth, tan_conic=()):
    """K-tuples of [I, 2] / [I] (+ optional [I, 3]) -> packed tangent planes
    [I // BLOCK + 1, TFEAT, BLOCK].

    Row layout per tangent k: ``per_k * k + (0: dx, 1: dy, 2: ddepth``
    ``[, 3: dA, 4: dB, 5: dC])`` — the conic rows carry the full variant's
    Sigma2D/EWA pose branch (full backward.cu:243-302 in forward mode);
    rows are padded up to a sublane multiple of 8.  A trailing zero block
    backs the two-block slab reads (see ``pack_instances``).
    """
    i = tan_xy[0].shape[0]
    assert i % BLOCK == 0
    k_t = len(tan_xy)
    per_k = 6 if len(tan_conic) else TAN_PER_K
    tfeat = -(-(per_k * k_t) // 8) * 8
    cols = []
    for k in range(k_t):
        cols += [tan_xy[k], tan_depth[k][:, None]]
        if len(tan_conic):
            cols.append(tan_conic[k])
    cols.append(jnp.zeros((i, tfeat - per_k * k_t), tan_xy[0].dtype))
    flat = jnp.concatenate(cols, axis=1)
    blocks = jnp.transpose(flat.reshape(i // BLOCK, BLOCK, tfeat), (0, 2, 1))
    return jnp.concatenate(
        [blocks, jnp.zeros((1, tfeat, BLOCK), flat.dtype)], axis=0)


def _jvp_kernel(
    start_ref, stop_ref, tidx_ref,
    packed_hbm, tan_hbm, gt_ref,
    # fused output block [batch, 12 + 6K, q]: rows 0-11 as _fwd_kernel;
    # then per tangent k: dcolor(3), ddepth, dweight, dt_final
    out_ref,
    data_scr, tan_scr, sems, tsems,
    *, cfg: RasterConfig, tiles_x: int, height: int, width: int, sub: int,
    n_tiles: int, batch: int, k_t: int, per_k: int = TAN_PER_K,
):
    q = cfg.tile_px
    n_sub = BLOCK // sub
    bc = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)

    for j in range(batch):
        t = pl.program_id(0) * batch + j
        start = start_ref[t]
        stop = stop_ref[t]
        base = start // BLOCK
        shift = jax.lax.rem(start, BLOCK)
        px, py, pixmask = _pixel_vectors(
            tidx_ref[t], tiles_x, cfg.tile_h, cfg.tile_w, height, width
        )
        gt = gt_ref[j, 0]

        carry0 = blend.init_jvp_carry(q, k_t, 3, jnp.float32)
        n_blocks = pl.cdiv(stop - start, BLOCK)

        def read_dma(k, base=base):
            return pltpu.make_async_copy(
                packed_hbm.at[pl.ds(base + k, 2)],
                data_scr.at[jax.lax.rem(k, 2)],
                sems.at[jax.lax.rem(k, 2)],
            )

        def read_tan_dma(k, base=base):
            return pltpu.make_async_copy(
                tan_hbm.at[pl.ds(base + k, 2)],
                tan_scr.at[jax.lax.rem(k, 2)],
                tsems.at[jax.lax.rem(k, 2)],
            )

        # block 0 of tile t > 0 was prefetched while finishing the previous
        # tile (cross-tile pipeline below, same as _fwd_kernel); only the
        # very first tile fetches its own
        @pl.when((t == 0) & (n_blocks > 0))
        def _():
            read_dma(0).start()
            read_tan_dma(0).start()

        def cond(state):
            k, carry = state
            return (k < n_blocks) & jnp.any(
                carry.primal.prod >= cfg.t_terminate)

        def body(state, px=px, py=py, pixmask=pixmask, gt=gt,
                 start=start, stop=stop, shift=shift):
            k, carry = state

            @pl.when(k + 1 < n_blocks)
            def _():
                read_dma(k + 1).start()
                read_tan_dma(k + 1).start()

            read_dma(k).wait()
            read_tan_dma(k).wait()
            block = _rolled(data_scr[jax.lax.rem(k, 2)], shift)
            tblock = _rolled(tan_scr[jax.lax.rem(k, 2)], shift)
            for c in range(n_sub):
                xy, conic, opac, color, depth, dmed = _features(block, c,
                                                                sub)
                packed = jax.lax.slice(block,
                                       (6, c * sub), (13, (c + 1) * sub))
                tan_xy = tuple(
                    jnp.stack([_sub(tblock[per_k * kk], c, sub),
                               _sub(tblock[per_k * kk + 1], c, sub)], -1)
                    for kk in range(k_t))
                tan_d = tuple(_sub(tblock[per_k * kk + 2], c, sub)
                              for kk in range(k_t))
                tan_c = tuple(
                    jnp.stack([_sub(tblock[per_k * kk + 3], c, sub),
                               _sub(tblock[per_k * kk + 4], c, sub),
                               _sub(tblock[per_k * kk + 5], c, sub)], -1)
                    for kk in range(k_t)) if per_k == 6 else ()
                off = k * BLOCK + c * sub
                gi = jax.lax.broadcasted_iota(jnp.int32, (sub, 1), 0)
                valid = ((off + gi) < (stop - start)) & pixmask[None, :]

                def live_chunk(carry, xy=xy, conic=conic, opac=opac,
                               color=color, depth=depth, dmed=dmed,
                               tan_xy=tan_xy, tan_d=tan_d, tan_c=tan_c,
                               valid=valid, off=off, packed=packed):
                    out, _, _ = blend.blend_chunk_fwd_jvp(
                        carry, xy, conic, opac, color, depth, dmed,
                        tan_xy, tan_d, valid, px, py, gt, off, cfg,
                        global_base=start + off, packed_rows=packed,
                        want_instance_stats=False, tan_conic=tan_c,
                    )
                    return out

                if c == 0:
                    carry = live_chunk(carry)
                else:
                    carry = jax.lax.cond(
                        off < stop - start, live_chunk, lambda cr: cr, carry)
            return k + 1, carry

        kf, carry = jax.lax.while_loop(cond, body, (jnp.int32(0), carry0))

        @pl.when(kf < n_blocks)
        def _():
            read_dma(kf).wait()
            read_tan_dma(kf).wait()

        # cross-tile pipeline: issue the next tile's block 0 (both streams)
        # now so it overlaps this tile's output stores and the next tile's
        # prologue; slot 0 is free (every in-tile DMA was waited above) and
        # block 0 is always consumed, keeping the semaphores balanced
        nt = jnp.minimum(t + 1, n_tiles - 1)
        n_start = start_ref[nt]

        @pl.when((t + 1 < n_tiles) & (stop_ref[nt] > n_start))
        def _(n_start=n_start):
            pltpu.make_async_copy(
                packed_hbm.at[pl.ds(n_start // BLOCK, 2)],
                data_scr.at[0],
                sems.at[0],
            ).start()
            pltpu.make_async_copy(
                tan_hbm.at[pl.ds(n_start // BLOCK, 2)],
                tan_scr.at[0],
                tsems.at[0],
            ).start()

        pc = carry.primal
        out_ref[j, 0:3] = pc.color
        out_ref[j, 3] = pc.depth
        out_ref[j, 4] = pc.weight
        out_ref[j, 5] = pc.median
        out_ref[j, 6] = blend.finish_var(pc, gt)
        out_ref[j, 7] = pc.t_final
        out_ref[j, 8] = bc(pc.n_contrib)
        out_ref[j, 9] = bc(pc.n_valid)
        out_ref[j, 10] = bc(pc.midx)
        out_ref[j, 11] = blend.finish_ucross(pc, gt)
        dtf = blend.finish_t_final_tangent(carry)
        for kk in range(k_t):
            r = 12 + 6 * kk
            out_ref[j, r:r + 3] = carry.color[kk]
            out_ref[j, r + 3] = carry.depth[kk]
            out_ref[j, r + 4] = carry.weight[kk]
            out_ref[j, r + 5] = dtf[kk]


def core_fwd_jvp(
    xy, conic, opac, color, depth, depth_med,
    tan_xy, tan_depth,
    tile_start, tile_stop, gt_tiles,
    *, cfg: RasterConfig, tiles_x: int, capacity: int,
    height: int, width: int, tile_batch: int = 0, interpret=None,
    tile_index=None, tan_conic=(),
):
    """Pallas dual forward: primal render + K exact pose tangents.

    Same grid/DMA structure as :func:`core_fwd` with a second feature-plane
    stream for the tangents; ~(1 + 0.4K)x the forward's per-block op count
    instead of K+1 full renders.  Returns (CoreOutputs, PoseTangents) like
    :func:`tile_xla.core_fwd_jvp_xla`.  The median tangent is structurally
    zero (the median stream reads the pose-stopped depth copy), so
    PoseTangents.median is zeros.  ``tan_conic`` (K-tuple of [I, 3])
    additionally propagates the Sigma2D/EWA pose branch — the full
    variant's Jacobian (full backward.cu:243-302 in forward mode) — as 3
    extra tangent rows per direction.
    """
    from ..tile_xla import PoseTangents

    del tile_batch
    if interpret is None:
        interpret = _is_cpu()
    t = tile_start.shape[0]
    q = cfg.tile_px
    assert q % 128 == 0
    sub = min(cfg.chunk, BLOCK)
    i_total = xy.shape[0]
    k_t = len(tan_xy)
    per_k = 6 if len(tan_conic) else TAN_PER_K
    b = max(1, cfg.kernel_tile_batch)
    t_pad = -(-t // b) * b

    packed = pack_instances(xy, conic, opac, color, depth, depth_med)
    tpacked = pack_tangents(tan_xy, tan_depth, tan_conic)
    tfeat = tpacked.shape[1]
    assert packed.shape[0] == tpacked.shape[0]

    def pad_t(x, value=0):
        if t_pad == t:
            return x
        return jnp.pad(x, [(0, t_pad - t)] + [(0, 0)] * (x.ndim - 1),
                       constant_values=value)

    tile_start = pad_t(tile_start)
    tile_stop = pad_t(tile_stop)
    if tile_index is None:
        tile_index = jnp.arange(t_pad, dtype=jnp.int32)
    else:
        tile_index = pad_t(tile_index)

    rows = 12 + 6 * k_t
    tile_spec = pl.BlockSpec((b, 1, q), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((b, rows, q), lambda i, *_: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t_pad // b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # packed primal blocks
            pl.BlockSpec(memory_space=pltpu.HBM),   # packed tangent blocks
            tile_spec,                               # gt tiles
        ],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((2, 2, FEAT, BLOCK), jnp.float32),
            pltpu.VMEM((2, 2, tfeat, BLOCK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = functools.partial(
        _jvp_kernel, cfg=cfg, tiles_x=tiles_x, height=height, width=width,
        sub=sub, n_tiles=t, batch=b, k_t=k_t, per_k=per_k,
    )
    f32 = jnp.float32
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_pad, rows, q), f32),
        interpret=interpret,
    )(tile_start, tile_stop, tile_index, packed, tpacked,
      pad_t(gt_tiles.reshape(t, 1, q)))[:t]

    ib = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
    c = out[:, 0:3]
    d, wgt, med, var, tf = (out[:, 3], out[:, 4], out[:, 5], out[:, 6],
                            out[:, 7])
    ncon, nval, midx = ib(out[:, 8]), ib(out[:, 9]), ib(out[:, 10])
    ucross = out[:, 11]

    fm = midx.reshape(-1)
    fu = ucross.reshape(-1)
    safe = fm >= 0
    sidx = jnp.where(safe, fm, 0)
    u_inst = jnp.zeros((i_total,), f32).at[sidx].add(
        jnp.where(safe, fu, 0.0))
    npix_inst = jnp.zeros((i_total,), jnp.int32).at[sidx].add(
        safe.astype(jnp.int32))

    primal = CoreOutputs(c, d, wgt, med, var, tf, ncon, nval, midx,
                         u_inst, npix_inst)
    zeros = tuple(jnp.zeros_like(d) for _ in range(k_t))
    tans = PoseTangents(
        color=tuple(out[:, 12 + 6 * k: 15 + 6 * k] for k in range(k_t)),
        depth=tuple(out[:, 15 + 6 * k] for k in range(k_t)),
        weight=tuple(out[:, 16 + 6 * k] for k in range(k_t)),
        median=zeros,
        t_final=tuple(out[:, 17 + 6 * k] for k in range(k_t)),
    )
    return primal, tans


# --------------------------------------------------------------------------
# backward
# --------------------------------------------------------------------------


def _bwd_kernel(
    start_ref, stop_ref, tidx_ref, astart_ref,
    packed_hbm, pixcot_ref, pixmat_ref, totall_ref, dm_ref,
    basis_ref,
    rows_init,
    rows_out,
    data_scr, rows_scr, sems, state_scr,
    *, cfg: RasterConfig, tiles_x: int, height: int, width: int, sub: int,
    n_tiles: int, batch: int, want_med: bool, want_var: bool,
):
    del rows_init
    q = cfg.tile_px
    n_sub = BLOCK // sub
    basis = basis_ref[:]

    for j in range(batch):
        t = pl.program_id(0) * batch + j
        start = start_ref[t]
        stop = stop_ref[t]
        base = start // BLOCK
        shift = jax.lax.rem(start, BLOCK)
        # reads walk the (possibly sort-domain) segment [start, stop);
        # gradient-row writes go to the 128-aligned output block astart//B+k
        # — the pre-sort -> slot map (binning's `inv`/`dst`) is defined as
        # slot = sorted_pos + (astart - start), so downstream reduction is
        # untouched.  Aligned callers pass astart == start.
        astart = astart_ref[t]

        px, py, pixmask = _pixel_vectors(
            tidx_ref[t], tiles_x, cfg.tile_h, cfg.tile_w, height, width
        )
        # moment-centering origin = tile corner (matches the shared basis)
        tx = tidx_ref[t] % tiles_x
        ty = tidx_ref[t] // tiles_x
        origin = ((tx * cfg.tile_w).astype(jnp.float32),
                  (ty * cfg.tile_h).astype(jnp.float32))
        # per-tile pixel constants, precomputed on the XLA side
        pix = (pixcot_ref[j], pixmat_ref[j], totall_ref[j, 0])
        dl_dm = dm_ref[j, 0]

        carry0 = blend.init_bwd_carry(q, 3, jnp.float32)
        n_blocks = pl.cdiv(stop - start, BLOCK)

        def read_dma(k, base=base):
            return pltpu.make_async_copy(
                packed_hbm.at[pl.ds(base + k, 2)],
                data_scr.at[jax.lax.rem(k, 2)],
                sems.at[jax.lax.rem(k, 2)],
            )

        def write_dma(k, astart=astart):
            return pltpu.make_async_copy(
                rows_scr.at[pl.ds(jax.lax.rem(k, 2), 1)],
                rows_out.at[pl.ds(astart // BLOCK + k, 1)],
                sems.at[2 + jax.lax.rem(k, 2)],
            )

        # Deferred drain of the previous tile's last row writes: instead of
        # stalling at the end of that tile, they complete during this tile's
        # prologue.  state_scr carries (prev astart, prev pending-writes) so
        # the exact descriptors can be reconstructed; the waits must precede
        # this tile's first rows_scr stores (slot reuse).
        p_astart = state_scr[0]
        p_kf = state_scr[1]

        def prev_write_dma(k, p_astart=p_astart):
            return pltpu.make_async_copy(
                rows_scr.at[pl.ds(jax.lax.rem(k, 2), 1)],
                rows_out.at[pl.ds(p_astart // BLOCK + k, 1)],
                sems.at[2 + jax.lax.rem(k, 2)],
            )

        @pl.when((t > 0) & (p_kf >= 2))
        def _(p_kf=p_kf, prev_write_dma=prev_write_dma):
            prev_write_dma(p_kf - 2).wait()

        @pl.when((t > 0) & (p_kf >= 1))
        def _(p_kf=p_kf, prev_write_dma=prev_write_dma):
            prev_write_dma(p_kf - 1).wait()

        # tile t > 0's block 0 was prefetched while finishing the previous
        # tile (the cross-tile pipeline below)
        @pl.when((t == 0) & (n_blocks > 0))
        def _(read_dma=read_dma):
            read_dma(0).start()

        def cond(state, n_blocks=n_blocks):
            k, carry = state
            return (k < n_blocks) & jnp.any(carry.prod >= cfg.t_terminate)

        def body(state, px=px, py=py, pixmask=pixmask, pix=pix, dl_dm=dl_dm,
                 origin=origin, start=start, stop=stop, n_blocks=n_blocks,
                 read_dma=read_dma, write_dma=write_dma, shift=shift):
            k, carry = state
            slot = jax.lax.rem(k, 2)

            @pl.when(k + 1 < n_blocks)
            def _():
                read_dma(k + 1).start()

            read_dma(k).wait()
            # the gradient-row write two blocks ago reused this slot
            @pl.when(k >= 2)
            def _():
                write_dma(k - 2).wait()

            block = _rolled(data_scr[slot], shift)
            for c in range(n_sub):
                xy, conic, opac, color, depth, _ = _features(block, c, sub)
                packed = jax.lax.slice(block,
                                       (6, c * sub), (13, (c + 1) * sub))
                off = k * BLOCK + c * sub
                gi = jax.lax.broadcasted_iota(jnp.int32, (sub, 1), 0)
                valid = ((off + gi) < (stop - start)) & pixmask[None, :]
                carry, rows = blend.blend_chunk_bwd(
                    carry, xy, conic, opac, color, depth, valid, px, py,
                    None, None, None, None, None, None,
                    None, None, None, None, dl_dm, None, cfg,
                    packed_rows=packed, pix=pix, basis=basis, origin=origin,
                    want_med=want_med, want_var=want_var,
                )
                d_xy, d_conic, d_opac, d_color, d_depth, d_dvar, d_dmed = \
                    rows
                sl = pl.ds(c * sub, sub)
                rows_scr[slot, 0, sl] = d_xy[:, 0]
                rows_scr[slot, 1, sl] = d_xy[:, 1]
                rows_scr[slot, 2, sl] = d_conic[:, 0]
                rows_scr[slot, 3, sl] = d_conic[:, 1]
                rows_scr[slot, 4, sl] = d_conic[:, 2]
                rows_scr[slot, 5, sl] = d_opac
                rows_scr[slot, 6, sl] = d_color[:, 0]
                rows_scr[slot, 7, sl] = d_color[:, 1]
                rows_scr[slot, 8, sl] = d_color[:, 2]
                rows_scr[slot, 9, sl] = d_depth
                rows_scr[slot, 10, sl] = d_dvar
                rows_scr[slot, 11, sl] = d_dmed
            write_dma(k).start()
            return k + 1, carry

        kf, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), carry0))

        # drain: an early-terminated loop leaves one read prefetch in
        # flight; the up-to-two outstanding row writes are deferred to the
        # next tile's prologue (state_scr), overlapping its DMA latency
        @pl.when(kf < n_blocks)
        def _(kf=kf, read_dma=read_dma):
            read_dma(kf).wait()

        # the last real tile has no successor to drain its writes; padding
        # tiles must then see zero pending writes (double-waiting deadlocks)
        last = t == n_tiles - 1
        state_scr[0] = astart
        state_scr[1] = jnp.where(last, 0, kf)

        @pl.when(last & (kf >= 2))
        def _(kf=kf, write_dma=write_dma):
            write_dma(kf - 2).wait()

        @pl.when(last & (kf >= 1))
        def _(kf=kf, write_dma=write_dma):
            write_dma(kf - 1).wait()

        # cross-tile pipeline: prefetch the next tile's block 0
        nt = jnp.minimum(t + 1, n_tiles - 1)
        n_start = start_ref[nt]

        @pl.when((t + 1 < n_tiles) & (stop_ref[nt] > n_start))
        def _(n_start=n_start):
            pltpu.make_async_copy(
                packed_hbm.at[pl.ds(n_start // BLOCK, 2)],
                data_scr.at[0],
                sems.at[0],
            ).start()


def core_bwd(
    xy, conic, opac, color, depth,
    tile_start, tile_stop, gt_tiles,
    tot_c, tot_d, tot_w, tot_v, t_final,
    dL_dc, dL_dd, dL_dw, dL_dvar, dL_dmed, dL_dtf,
    *, cfg: RasterConfig, tiles_x: int, capacity: int,
    height: int, width: int, tile_batch: int = 0, interpret=None,
    tile_index=None, packed=None, want_med: bool = True,
    want_var: bool = True, tile_astart=None, rows_capacity=None,
    return_flat: bool = False,
):
    del tile_batch
    cfg = cfg.bwd_view()  # per-pass scan/chunk overrides (chip A/B knobs)
    if interpret is None:
        interpret = _is_cpu()
    t = tile_start.shape[0]
    if tile_index is None:
        tile_index = jnp.arange(t, dtype=jnp.int32)
    if tile_astart is None:
        tile_astart = tile_start  # aligned callers: reads == writes domain
    th, tw = cfg.tile_h, cfg.tile_w
    sub = min(cfg.chunk, BLOCK)
    if rows_capacity is None:
        rows_capacity = xy.shape[0]
    i_total = rows_capacity
    n_rows = i_total // BLOCK

    if packed is None:
        packed = pack_instances(xy, conic, opac, color, depth,
                                jnp.zeros_like(depth))

    # per-tile pixel constants (fused cotangent stream inputs), computed once
    # here on the XLA side — in-kernel they would need vector concatenation,
    # which Mosaic cannot lower
    q = cfg.tile_px
    pixcot, pixmat, tot_all = jax.vmap(
        lambda gt_, tc, td, tw_, tv, tf, dc, dd, dw, dv, dtf:
        blend.bwd_pixel_inputs(gt_, tc, td, tw_, tv, tf, dc, dd, dw, dv,
                               dtf, with_med_row=True)
    )(gt_tiles.reshape(t, q), tot_c.reshape(t, 3, q), tot_d.reshape(t, q),
      tot_w.reshape(t, q), tot_v.reshape(t, q), t_final.reshape(t, q),
      dL_dc.reshape(t, 3, q), dL_dd.reshape(t, q), dL_dw.reshape(t, q),
      dL_dvar.reshape(t, q), dL_dtf.reshape(t, q))

    # shared tile-local moment basis (same pattern for every tile)
    qx = jnp.tile(jnp.arange(tw, dtype=jnp.float32), th)
    qy = jnp.repeat(jnp.arange(th, dtype=jnp.float32), tw)
    basis = blend.moment_basis(qx, qy, origin=(0.0, 0.0))         # [6, q]

    b = max(1, cfg.kernel_tile_batch)
    t_pad = -(-t // b) * b

    def pad_t(x, value=0):
        if t_pad == t:
            return x
        return jnp.pad(x, [(0, t_pad - t)] + [(0, 0)] * (x.ndim - 1),
                       constant_values=value)

    tile_start = pad_t(tile_start)
    tile_stop = pad_t(tile_stop)
    tile_index = pad_t(tile_index)
    tile_astart = pad_t(tile_astart)

    flat_spec = lambda k: pl.BlockSpec((b, k, q), lambda i, *_: (i, 0, 0),
                                       memory_space=pltpu.VMEM)
    tile_spec = flat_spec(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(t_pad // b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # packed
            flat_spec(7),                            # pixcot
            flat_spec(6),                            # pixmat
            tile_spec,                               # tot_all (incl. t_final
                                                     # cotangent term)
            tile_spec,                               # dL_dmed
            pl.BlockSpec(memory_space=pltpu.VMEM),  # basis (shared)
            pl.BlockSpec(memory_space=pltpu.HBM),   # rows init (zeros)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, 2, FEAT, BLOCK), jnp.float32),  # read 2-slab bufs
            pltpu.VMEM((2, FEAT, BLOCK), jnp.float32),  # write double-buffer
            pltpu.SemaphoreType.DMA((4,)),              # 2 read + 2 write
            pltpu.SMEM((2,), jnp.int32),                # (prev start, prev kf)
        ],
    )

    kernel = functools.partial(
        _bwd_kernel, cfg=cfg, tiles_x=tiles_x, height=height, width=width,
        sub=sub, n_tiles=t, batch=b, want_med=want_med, want_var=want_var,
    )
    rows = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, FEAT, BLOCK), jnp.float32),
        input_output_aliases={10: 0},
        interpret=interpret,
    )(
        tile_start, tile_stop, tile_index, tile_astart, packed,
        pad_t(pixcot), pad_t(pixmat),
        pad_t(tot_all.reshape(t, 1, q)),
        pad_t(dL_dmed.reshape(t, 1, q)), basis,
        jnp.zeros((n_rows, FEAT, BLOCK), jnp.float32),
    )
    flat = jnp.transpose(rows, (0, 2, 1)).reshape(i_total, FEAT)
    if return_flat:
        return flat
    return (flat[:, 0:2], flat[:, 2:5], flat[:, 5], flat[:, 6:9],
            flat[:, 9], flat[:, 10], flat[:, 11])
