"""XLA tile-render backend (no Pallas): dense masked math over tile batches.

Functionally identical to the Pallas kernels in ``kernels/`` and used as the
CPU-testable fallback.  Replaces the reference's render kernels
(forward.cu:261-412, backward.cu:419-699) with batched vector math built on
``ops.blend``; per-Gaussian gradients accumulate into per-instance rows via
deterministic scatter-add (instead of float atomics).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import RasterConfig
from . import blend


class CoreOutputs(NamedTuple):
    """Tile-major render-core outputs.

    ``color`` excludes the background composite (applied by the caller from
    ``t_final``, mirroring forward.cu:406 ``C[ch] + T * bg``); ``var`` is the
    true accumulated sum w*(d-gt)^2 — the caller zeroes it for reference
    parity (the reference forward never fills it, forward.cu:317,410).
    """

    color: jnp.ndarray     # [T, C, Q]
    depth: jnp.ndarray     # [T, Q]
    weight: jnp.ndarray    # [T, Q]  (silhouette / out_alpha)
    median: jnp.ndarray    # [T, Q]
    var: jnp.ndarray       # [T, Q]
    t_final: jnp.ndarray   # [T, Q]
    n_contrib: jnp.ndarray  # [T, Q] int32
    n_valid: jnp.ndarray   # [T, Q] int32
    midx: jnp.ndarray      # [T, Q] int32: instance index of median crossing
    u_inst: jnp.ndarray    # [I]
    npix_inst: jnp.ndarray  # [I] int32



def _vzero(ref, dtype):
    """A zero scalar that inherits `ref`'s varying-ness.

    Inside shard_map, loop carries initialized from plain zeros are
    'unvarying' while the loop body makes them 'varying'; lax.cond/lax.scan
    then reject the mismatched types.  Adding this zero (a no-op numerically)
    makes initializers consistently varying.
    """
    return (ref.reshape(-1)[0] * 0).astype(dtype)


def _pixel_coords(tidx, tiles_x: int, th: int, tw: int, dtype):
    q = jnp.arange(th * tw)
    qx = (q % tw).astype(dtype)
    qy = (q // tw).astype(dtype)
    tx = (tidx % tiles_x).astype(dtype)
    ty = (tidx // tiles_x).astype(dtype)
    px = tx[:, None] * tw + qx[None, :]
    py = ty[:, None] * th + qy[None, :]
    return px, py


def _pad_tiles(arrs, t, tile_batch):
    nb = -(-t // tile_batch)
    tpad = nb * tile_batch
    return nb, tpad, [
        jnp.pad(a, [(0, tpad - t)] + [(0, 0)] * (a.ndim - 1)) for a in arrs
    ]


def core_fwd_xla(
    xy, conic, opac, color, depth, depth_med,
    tile_start, tile_stop, gt_tiles,
    *, cfg: RasterConfig, tiles_x: int, capacity: int,
    height: int, width: int, tile_batch: int = 64, tile_index=None,
    want_med: bool = True, want_var: bool = True,
) -> CoreOutputs:
    i_total = xy.shape[0]
    t = tile_start.shape[0]
    q = cfg.tile_px
    g = min(cfg.chunk, capacity)
    n_chunks = -(-capacity // g)
    dtype = xy.dtype
    channels = color.shape[1]

    if tile_index is None:
        tile_index = jnp.arange(t, dtype=jnp.int32)
    nb, tpad, (starts, stops, gt_p, tidx) = _pad_tiles(
        [tile_start, tile_stop, gt_tiles, tile_index], t, tile_batch,
    )

    def blend_fn(carry, axy, aconic, aopac, acolor, adepth, admed, v,
                 px, py, gt, base, gbase):
        return blend.blend_chunk_fwd(
            carry, axy, aconic, aopac, acolor, adepth, admed, v,
            px, py, gt, base, cfg, global_base=gbase,
        )

    vblend = jax.vmap(
        blend_fn, in_axes=(0,) * 11 + (None, 0), out_axes=(0, 0, 0)
    )

    def batch_body(acc, args):
        u_acc, np_acc = acc
        start, stop, gt_t, ti = args
        tb = start.shape[0]
        px, py = _pixel_coords(ti, tiles_x, cfg.tile_h, cfg.tile_w, dtype)
        # pixels past the image edge are inactive (the reference's `inside`
        # test, forward.cu:293)
        pixmask = (px < width) & (py < height)
        vzf = _vzero(gt_t, dtype)
        vzi = _vzero(start, jnp.int32)
        z = jnp.zeros((tb, q), dtype) + vzf
        carry0 = blend.BlendCarry(
            prod=jnp.ones((tb, q), dtype) + vzf,
            t_final=jnp.ones((tb, q), dtype) + vzf,
            color=jnp.zeros((tb, channels, q), dtype) + vzf, depth=z,
            weight=z, median=z, var_dd=z, var_d=z,
            n_contrib=jnp.zeros((tb, q), jnp.int32) + vzi,
            n_valid=jnp.zeros((tb, q), jnp.int32) + vzi,
            midx=jnp.full((tb, q), -1, jnp.int32) + vzi,
            ucross_dd=z, ucross_d=z, ucross_w=z,
        )
        maxcnt = jnp.max(stop - start)

        def chunk_body(state, k0):
            carry, u_a, np_a = state

            def do(operand):
                carry, u_a, np_a = operand
                idx = start[:, None] + k0 + jnp.arange(g, dtype=jnp.int32)[None]
                v = (idx < stop[:, None])[:, :, None] & pixmask[:, None, :]
                idxc = jnp.clip(idx, 0, i_total - 1)
                new_carry, u_rows, np_rows = vblend(
                    carry, xy[idxc], conic[idxc], opac[idxc], color[idxc],
                    depth[idxc], depth_med[idxc], v, px, py, gt_t, k0,
                    start + k0,
                )
                return (
                    new_carry,
                    u_a.at[idxc].add(u_rows),
                    np_a.at[idxc].add(np_rows),
                )

            active = (k0 < maxcnt) & jnp.any(carry.prod >= cfg.t_terminate)
            state2 = jax.lax.cond(active, do, lambda s: s, (carry, u_a, np_a))
            return state2, None

        (carry, u_acc, np_acc), _ = jax.lax.scan(
            chunk_body, (carry0, u_acc, np_acc),
            jnp.arange(n_chunks, dtype=jnp.int32) * g,
        )
        ys = (carry.color, carry.depth, carry.weight, carry.median,
              blend.finish_var(carry, gt_t), carry.t_final,
              carry.n_contrib, carry.n_valid, carry.midx)
        return (u_acc, np_acc), ys

    vzf0 = _vzero(gt_p, dtype)
    vzi0 = _vzero(starts, jnp.int32)
    (u_inst, npix_inst), ys = jax.lax.scan(
        batch_body,
        (jnp.zeros((i_total,), dtype) + vzf0,
         jnp.zeros((i_total,), jnp.int32) + vzi0),
        tuple(a.reshape(nb, tile_batch, *a.shape[1:])
              for a in (starts, stops, gt_p, tidx)),
    )

    def unbatch(x):
        return x.reshape(tpad, *x.shape[2:])[:t]

    return CoreOutputs(*(unbatch(y) for y in ys), u_inst, npix_inst)


class PoseTangents(NamedTuple):
    """K pose-tangent streams of the render core (tile-major, like
    CoreOutputs).  Each field is a length-K tuple."""

    color: tuple    # K x [T, C, Q]
    depth: tuple    # K x [T, Q]
    weight: tuple   # K x [T, Q]
    median: tuple   # K x [T, Q]
    t_final: tuple  # K x [T, Q]


def core_fwd_jvp_xla(
    xy, conic, opac, color, depth, depth_med,
    tan_xy, tan_depth,
    tile_start, tile_stop, gt_tiles,
    *, cfg: RasterConfig, tiles_x: int, capacity: int,
    height: int, width: int, tile_batch: int = 64, tile_index=None,
    tan_conic=(),
):
    """Forward pass plus K exact pose tangents (``blend_chunk_fwd_jvp``).

    ``tan_xy``: K-tuple of [P-instances, 2]; ``tan_depth``: K-tuple of [I].
    ``tan_conic`` (optional K-tuple of [I, 3]) additionally propagates the
    Sigma2D/EWA pose branch — the full variant's Jacobian term (full
    backward.cu:243-302); empty = light-variant surface.
    Returns (CoreOutputs, PoseTangents).  Instance stats (u_inst/npix) are
    produced like the forward's; tangents cover the differentiable image
    outputs only.
    """
    i_total = xy.shape[0]
    t = tile_start.shape[0]
    q = cfg.tile_px
    g = min(cfg.chunk, capacity)
    n_chunks = -(-capacity // g)
    dtype = xy.dtype
    channels = color.shape[1]
    k_t = len(tan_xy)

    if tile_index is None:
        tile_index = jnp.arange(t, dtype=jnp.int32)
    nb, tpad, (starts, stops, gt_p, tidx) = _pad_tiles(
        [tile_start, tile_stop, gt_tiles, tile_index], t, tile_batch,
    )

    def blend_fn(carry, axy, aconic, aopac, acolor, adepth, admed,
                 atxy, atd, atc, v, px, py, gt, base, gbase):
        return blend.blend_chunk_fwd_jvp(
            carry, axy, aconic, aopac, acolor, adepth, admed, atxy, atd,
            v, px, py, gt, base, cfg, global_base=gbase,
            want_instance_stats=True, tan_conic=atc,
        )

    vblend = jax.vmap(
        blend_fn, in_axes=(0,) * 10 + (0, 0, 0, 0, None, 0),
        out_axes=(0, 0, 0),
    )

    def batch_body(acc, args):
        u_acc, np_acc = acc
        start, stop, gt_t, ti = args
        tb = start.shape[0]
        px, py = _pixel_coords(ti, tiles_x, cfg.tile_h, cfg.tile_w, dtype)
        pixmask = (px < width) & (py < height)
        vzf = _vzero(gt_t, dtype)
        vzi = _vzero(start, jnp.int32)
        z = lambda: jnp.zeros((tb, q), dtype) + vzf
        carry0 = blend.JvpCarry(
            primal=blend.BlendCarry(
                prod=jnp.ones((tb, q), dtype) + vzf,
                t_final=jnp.ones((tb, q), dtype) + vzf,
                color=jnp.zeros((tb, channels, q), dtype) + vzf, depth=z(),
                weight=z(), median=z(), var_dd=z(), var_d=z(),
                n_contrib=jnp.zeros((tb, q), jnp.int32) + vzi,
                n_valid=jnp.zeros((tb, q), jnp.int32) + vzi,
                midx=jnp.full((tb, q), -1, jnp.int32) + vzi,
                ucross_dd=z(), ucross_d=z(), ucross_w=z(),
            ),
            s=tuple(z() for _ in range(k_t)),
            color=tuple(jnp.zeros((tb, channels, q), dtype) + vzf
                        for _ in range(k_t)),
            depth=tuple(z() for _ in range(k_t)),
            weight=tuple(z() for _ in range(k_t)),
            median=tuple(z() for _ in range(k_t)),
        )
        maxcnt = jnp.max(stop - start)

        def chunk_body(state, k0):
            carry, u_a, np_a = state

            def do(operand):
                carry, u_a, np_a = operand
                idx = start[:, None] + k0 + jnp.arange(g, dtype=jnp.int32)[None]
                v = (idx < stop[:, None])[:, :, None] & pixmask[:, None, :]
                idxc = jnp.clip(idx, 0, i_total - 1)
                new_carry, u_rows, np_rows = vblend(
                    carry, xy[idxc], conic[idxc], opac[idxc], color[idxc],
                    depth[idxc], depth_med[idxc],
                    tuple(tx[idxc] for tx in tan_xy),
                    tuple(td[idxc] for td in tan_depth),
                    tuple(tc[idxc] for tc in tan_conic),
                    v, px, py, gt_t, k0, start + k0,
                )
                return (
                    new_carry,
                    u_a.at[idxc].add(u_rows),
                    np_a.at[idxc].add(np_rows),
                )

            active = (k0 < maxcnt) & jnp.any(
                carry.primal.prod >= cfg.t_terminate)
            state2 = jax.lax.cond(active, do, lambda s: s,
                                  (carry, u_a, np_a))
            return state2, None

        (carry, u_acc, np_acc), _ = jax.lax.scan(
            chunk_body, (carry0, u_acc, np_acc),
            jnp.arange(n_chunks, dtype=jnp.int32) * g,
        )
        pc = carry.primal
        ys = (pc.color, pc.depth, pc.weight, pc.median,
              blend.finish_var(pc, gt_t), pc.t_final,
              pc.n_contrib, pc.n_valid, pc.midx,
              carry.color, carry.depth, carry.weight, carry.median,
              blend.finish_t_final_tangent(carry))
        return (u_acc, np_acc), ys

    vzf0 = _vzero(gt_p, dtype)
    vzi0 = _vzero(starts, jnp.int32)
    (u_inst, npix_inst), ys = jax.lax.scan(
        batch_body,
        (jnp.zeros((i_total,), dtype) + vzf0,
         jnp.zeros((i_total,), jnp.int32) + vzi0),
        tuple(a.reshape(nb, tile_batch, *a.shape[1:])
              for a in (starts, stops, gt_p, tidx)),
    )

    def unbatch(x):
        return x.reshape(tpad, *x.shape[2:])[:t]

    def unbatch_t(xs):
        return tuple(unbatch(x) for x in xs)

    out = CoreOutputs(*(unbatch(y) for y in ys[:9]), u_inst, npix_inst)
    tans = PoseTangents(unbatch_t(ys[9]), unbatch_t(ys[10]),
                        unbatch_t(ys[11]), unbatch_t(ys[12]),
                        unbatch_t(ys[13]))
    return out, tans


def core_bwd_xla(
    xy, conic, opac, color, depth,
    tile_start, tile_stop, gt_tiles,
    # forward totals (tile-major)
    tot_c, tot_d, tot_w, tot_v, t_final,
    # incoming cotangents (tile-major)
    dL_dc, dL_dd, dL_dw, dL_dvar, dL_dmed, dL_dtf,
    *, cfg: RasterConfig, tiles_x: int, capacity: int,
    height: int, width: int, tile_batch: int = 64, tile_index=None,
    want_med: bool = True, want_var: bool = True,
):
    """Analytic backward: per-instance gradient rows via scatter-add.

    Returns (d_xy [I,2], d_conic [I,3], d_opac [I], d_color [I,C],
    d_depth [I], d_depth_var [I], d_depth_med [I]).
    """
    i_total = xy.shape[0]
    t = tile_start.shape[0]
    q = cfg.tile_px
    g = min(cfg.chunk, capacity)
    n_chunks = -(-capacity // g)
    dtype = xy.dtype
    channels = color.shape[1]

    # fold dL_dtf and the (caller-supplied) t_final bg-term together; the
    # reference's background term (backward.cu:620-623) arrives here as the
    # cotangent of the t_final output.
    if tile_index is None:
        tile_index = jnp.arange(t, dtype=jnp.int32)
    nb, tpad, padded = _pad_tiles(
        [tile_start, tile_stop, gt_tiles, tile_index,
         tot_c, tot_d, tot_w, tot_v, t_final,
         dL_dc, dL_dd, dL_dw, dL_dvar, dL_dmed, dL_dtf],
        t, tile_batch,
    )
    (starts, stops, gt_p, tidx, tot_c, tot_d, tot_w, tot_v, t_final,
     dL_dc, dL_dd, dL_dw, dL_dvar, dL_dmed, dL_dtf) = padded

    def blend_fn(carry, axy, aconic, aopac, acolor, adepth, v, px, py, gt,
                 tc, td, tw_, tv, tf, dc, dd, dw, dv, dm, dtf):
        return blend.blend_chunk_bwd(
            carry, axy, aconic, aopac, acolor, adepth, v, px, py, gt,
            tc, td, tw_, tv, tf, dc, dd, dw, dv, dm, dtf, cfg,
            want_med=want_med, want_var=want_var,
        )

    vblend = jax.vmap(blend_fn)

    vzf0 = _vzero(gt_p, dtype)
    zeros = lambda *shape: jnp.zeros(shape, dtype) + vzf0
    acc0 = (zeros(i_total, 2), zeros(i_total, 3), zeros(i_total),
            zeros(i_total, channels), zeros(i_total), zeros(i_total),
            zeros(i_total))

    def batch_body(acc, args):
        (start, stop, gt_t, ti, tc, td, tw_, tv, tf,
         dc, dd, dw, dv, dm, dtf) = args
        tb = start.shape[0]
        px, py = _pixel_coords(ti, tiles_x, cfg.tile_h, cfg.tile_w, dtype)
        pixmask = (px < width) & (py < height)
        vzf = _vzero(gt_t, dtype)
        carry0 = blend.BlendBwdCarry(
            prod=jnp.ones((tb, q), dtype) + vzf,
            pre_all=jnp.zeros((tb, q), dtype) + vzf,
        )
        maxcnt = jnp.max(stop - start)

        def chunk_body(state, k0):
            carry, acc = state

            def do(operand):
                carry, acc = operand
                idx = start[:, None] + k0 + jnp.arange(g, dtype=jnp.int32)[None]
                v = (idx < stop[:, None])[:, :, None] & pixmask[:, None, :]
                idxc = jnp.clip(idx, 0, i_total - 1)
                new_carry, rows = vblend(
                    carry, xy[idxc], conic[idxc], opac[idxc], color[idxc],
                    depth[idxc], v, px, py, gt_t,
                    tc, td, tw_, tv, tf, dc, dd, dw, dv, dm, dtf,
                )
                new_acc = tuple(a.at[idxc].add(r) for a, r in zip(acc, rows))
                return new_carry, new_acc

            active = (k0 < maxcnt) & jnp.any(carry.prod >= cfg.t_terminate)
            state2 = jax.lax.cond(active, do, lambda s: s, (carry, acc))
            return state2, None

        (carry, acc), _ = jax.lax.scan(
            chunk_body, (carry0, acc),
            jnp.arange(n_chunks, dtype=jnp.int32) * g,
        )
        return acc, None

    acc, _ = jax.lax.scan(
        batch_body, acc0,
        tuple(a.reshape(nb, tile_batch, *a.shape[1:]) for a in
              (starts, stops, gt_p, tidx, tot_c, tot_d, tot_w, tot_v,
               t_final, dL_dc, dL_dd, dL_dw, dL_dvar, dL_dmed, dL_dtf)),
    )
    return acc
