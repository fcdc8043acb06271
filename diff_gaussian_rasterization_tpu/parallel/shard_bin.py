"""Sharded binning: every device bins AND renders only its tile-row band.

The round-4 scaling report (SCALING_r04.json) proved communication is not
the multi-chip limiter — the limiter is Amdahl on the ~7.25 ms of
binning/sort/gather glue that :mod:`sharded`'s tile-sharded core leaves
REPLICATED (every chip re-bins the full frame, exactly like the reference
re-runs duplicateWithKeys + RadixSort per render,
rasterizer_impl.cu:283-324).  Here the whole pipeline downstream of the
per-Gaussian preprocess moves inside the tile shard_map:

  - the tile grid is split into contiguous bands of ``band_rows`` tile rows
    (one band per device);
  - each device runs :func:`ops.binning.bin_gaussians_band` — its splat
    rects are CLIPPED to the band, so its expansion, (tile, depth) sort and
    range extraction see only ~1/n of the instances (sort is O(I log I), so
    the per-shard win is super-linear);
  - each device gathers/packs only its own instance features and runs the
    render kernels on its own tiles;
  - the backward reduces per-Gaussian gradient rows with the local MXU
    segment-sum and one ``psum`` over ICI (the only cross-device traffic:
    [P, 16] f32 rows ≈ 6.4 MB at bench scale, <0.2 ms on ICI).

Per-tile instance segments are BIT-identical to the full-grid binning
(see ``bin_gaussians_band``), so the sharded render equals the unsharded
one exactly (modulo per-shard overflow semantics: each shard drops its own
deepest excess instances when its local budget saturates — never silent,
``overflow`` reports it).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import RasterConfig
from ..ops.binning import (INSTANCE_ALIGN, aligned_size, bin_gaussians_band)
from ..ops.projection import Preprocessed
from ..ops.tile_xla import CoreOutputs, core_bwd_xla, core_fwd_xla
from .mesh import shard_map_fn
from .sharded import _pin


def band_instance_counts(prep: Preprocessed, n_bands: int,
                         band_rows: int) -> jnp.ndarray:
    """True per-band instance counts ([n_bands] int32) for budget sizing.

    The sharded analogue of :func:`ops.rasterize.count_instances` — cheap
    (pure clipped-rect arithmetic on the preprocess output), used to size
    ``max_instances_per_shard`` and to report tile-band skew honestly
    (the deepest band bounds the shard time).
    """
    rmin_y = prep.rect_min[:, 1]
    rmax_y = prep.rect_max[:, 1]
    width = prep.rect_max[:, 0] - prep.rect_min[:, 0]
    live = prep.tiles_touched > 0

    def one(d):
        y0 = jnp.clip(rmin_y, d * band_rows, (d + 1) * band_rows)
        y1 = jnp.clip(rmax_y, d * band_rows, (d + 1) * band_rows)
        rows = jnp.maximum(y1 - y0, 0)
        return jnp.sum(jnp.where(live, rows * width, 0))

    return jax.vmap(one)(jnp.arange(n_bands, dtype=jnp.int32))


class ShardBinnedOut(NamedTuple):
    core: CoreOutputs      # 9 tile-major fields are GLOBAL [T_pad, ...];
                           # u_inst / npix_inst are per-GAUSSIAN [P]
                           # (scattered + psum'd inside the shard_map)
    num_rendered: jnp.ndarray   # scalar int32: true global instance count
    overflow: jnp.ndarray       # scalar bool: any shard over its budget


def make_shard_binned_core(mesh: Mesh, axis: str, prep: Preprocessed,
                           gt_tiles, *, cfg: RasterConfig, tiles_x: int,
                           tiles_y: int, cap_per_shard: int, height: int,
                           width: int, backend: str, tile_batch: int = 64):
    """Build ``core(feat) -> ShardBinnedOut`` with fully sharded binning.

    ``feat`` is the [P, 11] per-Gaussian feature table (xy, conic, opac,
    color, depth, depth_sgview) — the only differentiable operand, exactly
    like :func:`ops.rasterize._make_fused_core`.  Everything the binning
    consumes from ``prep`` is a constant of differentiation (the
    reference's saved binning buffers, ctx.save_for_backward).

    ``backend='pallas'`` runs the sort-domain fused kernels per shard
    (interpret mode on CPU); ``'xla'`` runs the dense masked cores —
    identical math, used by the CPU equivalence tests and the virtual-mesh
    scaling report.
    """
    n = mesh.shape[axis]
    band_rows = -(-tiles_y // n)
    t_local = band_rows * tiles_x
    t_pad = t_local * n
    t = tiles_x * tiles_y
    q = cfg.tile_px
    cap_l = cap_per_shard
    assert cap_l % INSTANCE_ALIGN == 0, cap_l
    rows_cap = aligned_size(cap_l, t_local, INSTANCE_ALIGN)
    p = prep.xy.shape[0]
    is_pallas = backend == "pallas"
    kw = dict(cfg=cfg, tiles_x=tiles_x, capacity=cap_l,
              height=height, width=width)
    tb = max(1, min(tile_batch, t_local))

    gt_pad = jnp.pad(gt_tiles.reshape(t, q), ((0, t_pad - t), (0, 0)))

    sg = jax.lax.stop_gradient
    bin_in = (prep.tiles_touched, prep.rect_min, prep.rect_max,
              sg(prep.depth), sg(prep.conic), sg(prep.xy), sg(prep.opacity))

    rep = P()
    shard = P(axis)

    def local_bin(tt, rmin, rmax, depth, conic, xy, opac):
        d = jax.lax.axis_index(axis)
        prep_loc = Preprocessed(
            mask=None, depth=depth, depth_sgview=None, xy=xy, conic=conic,
            color=None, opacity=opac, radius=None, rect_min=rmin,
            rect_max=rmax, tiles_touched=tt)
        binn = bin_gaussians_band(
            prep_loc, tiles_x, d * band_rows, band_rows, cap_l,
            align=INSTANCE_ALIGN, tile_w=cfg.tile_w, tile_h=cfg.tile_h,
            alpha_min=cfg.alpha_min, margin_px=cfg.bin_margin_px,
            row_gather=cfg.bin_row_gather)
        tidx = d * t_local + jnp.arange(t_local, dtype=jnp.int32)
        return binn, tidx

    def local_fwd(feat, tt, rmin, rmax, depth, conic, xy, opac, gt_loc):
        binn, tidx = local_bin(tt, rmin, rmax, depth, conic, xy, opac)
        if is_pallas:
            from ..ops.kernels import render_pallas as impl
            full = feat[binn.gauss_sorted]                   # [cap_l, 11]
            dd = full[:, 9:10]
            table = jnp.concatenate(
                [full, dd * dd, jnp.ones_like(dd),
                 jnp.zeros((cap_l, impl.FEAT - 13), full.dtype)], axis=1)
            packed = impl.pack_feature_table(table)
            out = impl.core_fwd(
                None, None, None, None, None, None,
                binn.sort_start, binn.sort_stop, gt_loc, packed=packed,
                i_total=cap_l, tile_index=tidx, **kw)
            ids = binn.gauss_sorted
            res = (packed, binn.sort_start, binn.sort_stop, binn.tile_start,
                   binn.inv, binn.gauss_start, binn.gauss_stop)
        else:
            ids = binn.gauss_id                              # aligned domain
            inst = feat[ids]
            out = core_fwd_xla(
                inst[:, 0:2], inst[:, 2:5], inst[:, 5], inst[:, 6:9],
                inst[:, 9], inst[:, 10],
                binn.tile_start, binn.tile_stop, gt_loc,
                tile_index=tidx, tile_batch=tb, **kw)
            res = (ids, binn.tile_start, binn.tile_stop)
        # per-Gaussian uncertainty stats: local scatter + one psum replaces
        # the reference's cross-pixel atomicAdd (forward.cu:386-387)
        gau_u = jax.lax.psum(
            jnp.zeros((p,), feat.dtype).at[ids].add(out.u_inst), axis)
        gau_np = jax.lax.psum(
            jnp.zeros((p,), jnp.int32).at[ids].add(out.npix_inst), axis)
        out = out._replace(u_inst=gau_u, npix_inst=gau_np)
        return out, res

    if is_pallas:
        res_specs = (shard,) * 7
    else:
        res_specs = (shard,) * 3
    fwd_sm = shard_map_fn(
        local_fwd, mesh,
        in_specs=(rep,) * 8 + (shard,),
        out_specs=(CoreOutputs(*([shard] * 9 + [rep, rep])), res_specs),
        check_rep=False,
    )

    def run_fwd(feat):
        rp = lambda x: _pin(mesh, rep, x)
        args = [rp(feat)] + [rp(a) for a in bin_in] + [rp(gt_pad)]
        return fwd_sm(*args)

    def local_bwd(feat, res, gt_loc, tot_c, tot_d, tot_w, tot_v, t_final,
                  dc, dd, dw, dv, dm, dtf, *, want_med, want_var):
        d = jax.lax.axis_index(axis)
        tidx = d * t_local + jnp.arange(t_local, dtype=jnp.int32)
        if is_pallas:
            from ..ops.kernels import render_pallas as impl
            from ..ops.kernels.segment_sum import segment_sum_rows
            (packed, ts, tp, astart, inv, gstart, gstop) = res
            flat = impl.core_bwd(
                None, None, None, None, None,
                ts, tp, gt_loc, tot_c, tot_d, tot_w, tot_v, t_final,
                dc, dd, dw, dv, dm, dtf,
                packed=packed, tile_astart=astart, rows_capacity=rows_cap,
                return_flat=True, tile_index=tidx,
                want_med=want_med, want_var=want_var, **kw)
            rows_u = flat[inv]                               # pre-sort order
            b = impl.BLOCK
            blocks = jnp.transpose(
                rows_u.reshape(cap_l // b, b, impl.FEAT), (0, 2, 1))
            g = segment_sum_rows(blocks, gstart, gstop)      # [P, 16]
            g = jax.lax.psum(g, axis)
            d_feat = jnp.concatenate(
                [g[:, 0:10], (g[:, 10] + g[:, 11])[:, None]], axis=1)
        else:
            (ids, tstart, tstop) = res
            inst = feat[ids]
            rows = core_bwd_xla(
                inst[:, 0:2], inst[:, 2:5], inst[:, 5], inst[:, 6:9],
                inst[:, 9],
                tstart, tstop, gt_loc, tot_c, tot_d, tot_w, tot_v, t_final,
                dc, dd, dw, dv, dm, dtf,
                tile_index=tidx, tile_batch=tb,
                want_med=want_med, want_var=want_var, **kw)
            d_xy, d_conic, d_opac, d_color, d_depth, d_dvar, d_dmed = rows
            loc = jnp.concatenate(
                [d_xy, d_conic, d_opac[:, None], d_color, d_depth[:, None],
                 (d_dvar + d_dmed)[:, None]], axis=1)        # [i_al, 11]
            d_feat = jax.lax.psum(
                jnp.zeros((p, 11), feat.dtype).at[ids].add(loc), axis)
        return d_feat

    def run_bwd(feat, res, tots, cots, want_med, want_var):
        import functools
        f = shard_map_fn(
            functools.partial(local_bwd, want_med=want_med,
                              want_var=want_var),
            mesh,
            in_specs=(rep, res_specs) + (shard,) * 12,
            out_specs=rep, check_rep=False,
        )
        # residuals were PRODUCED by the fwd shard_map with these exact
        # sharded out_specs, so pinning them to the same spec is a no-op;
        # everything else follows sharded._pin's replicated-materialization
        # rule (tile arrays arriving with auto-chosen shardings have been
        # observed to be consumed unresharded under check_vma=False)
        res_p = tuple(_pin(mesh, shard, r) for r in res)
        rp = lambda x: _pin(mesh, rep, x)
        return f(rp(feat), res_p, rp(gt_pad),
                 *[rp(x) for x in tots], *[rp(x) for x in cots])

    def _dead(x):
        if x is None or isinstance(x, jax.custom_derivatives.SymbolicZero):
            return True
        return hasattr(x, "dtype") and x.dtype == jax.dtypes.float0

    @jax.custom_vjp
    def core(feat):
        return run_fwd(feat)[0]

    def core_fwd(feat):
        feat = feat.value if hasattr(feat, "value") else feat
        out, res = run_fwd(feat)
        tots = (out.color, out.depth, out.weight, out.var, out.t_final)
        return out, (feat, res, tots)

    def core_bwd(resid, cot):
        feat, res, tots = resid
        tot_c, tot_d, tot_w, tot_v, t_final = tots
        zero = jnp.zeros_like(t_final)
        zero_c = jnp.zeros_like(tot_c)
        f = lambda x, like: like if _dead(x) else x
        cots = (f(cot.color, zero_c), f(cot.depth, zero),
                f(cot.weight, zero), f(cot.var, zero),
                f(cot.median, zero), f(cot.t_final, zero))
        d_feat = run_bwd(feat, res, tots, cots,
                         not _dead(cot.median), not _dead(cot.var))
        return (d_feat,)

    core.defvjp(core_fwd, core_bwd, symbolic_zeros=True)

    def call(feat):
        out = core(feat)
        # overflow / num_rendered are pure functions of the preprocess: the
        # per-band clipped instance counts (tiny arithmetic, replicated)
        counts = band_instance_counts(prep, n, band_rows)
        return ShardBinnedOut(core=out,
                              num_rendered=jnp.sum(counts),
                              overflow=jnp.any(counts > cap_l))

    return call


def default_cap_per_shard(max_instances: int, n: int,
                          skew: float = 2.0) -> int:
    """Per-shard instance budget: cap/n with slack for tile-band skew.

    Tile occupancy is not uniform — the deepest band bounds the shard
    budget.  ``skew=2`` covers typical scenes; production sizes from
    :func:`band_instance_counts` (the sharded probe), the same pattern as
    the single-device ``count_instances`` probe.
    """
    cap = max(int(max_instances * skew) // max(n, 1), INSTANCE_ALIGN)
    return -(-cap // 1024) * 1024
