"""The production rasterization op.

Pipeline (mirrors ``Rasterizer::forward``/``backward``,
light rasterizer_impl.cu:197-495, re-architected for XLA):

  preprocess (pure JAX, autodiff backward)          [forward.cu:156-256]
  -> bin_gaussians (static-shape sort)               [rasterizer_impl.cu:283-324]
  -> per-instance gathers (autodiff -> deterministic
     scatter-add, replacing atomicAdd)
  -> render core with jax.custom_vjp (Pallas or XLA) [forward.cu:261-412,
                                                      backward.cu:419-699]
  -> image assembly + background composite           [forward.cu:406]

Gradient routing notes (all verified against the oracle's autodiff):

- The core's analytic VJP covers only the blend; every other gradient —
  conic -> cov2D -> cov3D -> scale/rot/mean (computeCov2DCUDA,
  backward.cu:144-276), mean2D -> NDC -> mean3D & *view matrix*
  (backward.cu:348-416, 701-751), SH -> mean/campos — is JAX autodiff
  through ``preprocess``.
- ``track_off`` / ``map_off`` (reference backward gates,
  backward.cu:593-696) become ``stop_gradient`` on the view matrix or the
  Gaussian parameters: in a functional autodiff system the gates are just
  which leaves you differentiate.
- Median depth backpropagates into Gaussian means but not the pose, matching
  the reference's ``mid_once`` rule (backward.cu:654-664); the
  depth-variance output backpropagates via the reference's backward math
  even though its forward value is zero (quirk: forward.cu:317,410) — this
  is realized by exposing ``var - stop_gradient(var)``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..camera import Camera
from ..config import RasterConfig
from . import tile_xla
from .binning import (Binned, bin_gaussians, default_max_instances,
                      aligned_size, INSTANCE_ALIGN)
from .oracle import RenderOutputs
from .projection import preprocess
from .tiling import grid_dims, img_to_tiles, tiles_to_img


def _make_core(tile_start, tile_stop, gt_tiles, *, cfg: RasterConfig,
               tiles_x: int, capacity: int, height: int, width: int,
               tile_batch: int, backend: str, mesh=None, tile_axis="tile",
               use_custom_vjp: bool = True):
    """Build the custom-VJP render core.

    Closure-captured arrays (ranges, ground-truth depth) are constants w.r.t.
    differentiation, like the reference's saved buffers (ctx.save_for_backward,
    light __init__.py:104).
    """
    if backend == "pallas":
        from .kernels import render_pallas as impl
        fwd_impl = impl.core_fwd
        bwd_impl = impl.core_bwd
    else:
        fwd_impl = tile_xla.core_fwd_xla
        bwd_impl = tile_xla.core_bwd_xla
    kw = dict(cfg=cfg, tiles_x=tiles_x, capacity=capacity,
              height=height, width=width, tile_batch=tile_batch)
    if mesh is not None:
        from ..parallel.sharded import make_sharded_core
        fwd_call, bwd_call = make_sharded_core(
            mesh, tile_axis, fwd_impl, bwd_impl,
            capacity=capacity, height=height, width=width,
            tile_batch=tile_batch, tiles_x=tiles_x, cfg=cfg,
        )
    else:
        fwd_call = lambda *a: fwd_impl(*a, **kw)
        bwd_call = lambda *a, **k: bwd_impl(*a, **kw, **k)

    # the Pallas kernels consume the feature-planar packed layout; build it
    # once in the primal and reuse it in the backward through the residuals
    # (the dmed row differs between passes but the backward never reads it)
    can_share_pack = backend == "pallas" and mesh is None

    def _primal(xy, conic, opac, color, depth, depth_med, depth_var):
        del depth_var  # same values as depth; exists for gradient routing
        if can_share_pack:
            from .kernels.render_pallas import pack_instances
            packed = pack_instances(xy, conic, opac, color, depth, depth_med)
            return fwd_impl(xy, conic, opac, color, depth, depth_med,
                            tile_start, tile_stop, gt_tiles, packed=packed,
                            **kw), packed
        return fwd_call(xy, conic, opac, color, depth, depth_med,
                        tile_start, tile_stop, gt_tiles), None

    if not use_custom_vjp:
        # pure-JAX differentiation (supports jacfwd/jvp, e.g. for
        # Gauss-Newton pose tracking); XLA backend only
        assert backend != "pallas", "jvp mode requires the XLA backend"
        return lambda *a: _primal(*a)[0]

    @jax.custom_vjp
    def core(*args):
        return _primal(*args)[0]

    def core_fwd(xy, conic, opac, color, depth, depth_med, depth_var):
        # symbolic_zeros=True wraps each primal in a CustomVJPPrimal
        val = lambda x: x.value if hasattr(x, "value") else x
        xy, conic, opac, color, depth, depth_med, depth_var = (
            val(xy), val(conic), val(opac), val(color), val(depth),
            val(depth_med), val(depth_var))
        out, packed = _primal(xy, conic, opac, color, depth, depth_med,
                              depth_var)
        res = (xy, conic, opac, color, depth, packed,
               out.color, out.depth, out.weight, out.var, out.t_final)
        return out, res

    def core_bwd(res, cot):
        (xy, conic, opac, color, depth, packed,
         tot_c, tot_d, tot_w, tot_v, t_final) = res
        zero = jnp.zeros_like(t_final)
        zero_c = jnp.zeros_like(tot_c)

        def dead(x):
            # unused cotangents arrive as SymbolicZero (or float0 for the
            # integer outputs) — a TRACE-TIME (structural) property, so the
            # kernels drop the corresponding gradient streams entirely
            # (want_med/want_var): the compiler-era equivalent of the
            # reference multiplying by zero-filled dL tensors
            if x is None or isinstance(
                    x, jax.custom_derivatives.SymbolicZero):
                return True
            return hasattr(x, "dtype") and x.dtype == jax.dtypes.float0

        f = lambda x, like: like if dead(x) else x
        cots = (f(cot.color, zero_c), f(cot.depth, zero),
                f(cot.weight, zero), f(cot.var, zero),
                f(cot.median, zero), f(cot.t_final, zero))
        want = dict(want_med=not dead(cot.median), want_var=not dead(cot.var))
        if can_share_pack:
            rows = bwd_impl(xy, conic, opac, color, depth,
                            tile_start, tile_stop, gt_tiles,
                            tot_c, tot_d, tot_w, tot_v, t_final, *cots,
                            packed=packed, **want, **kw)
        else:
            rows = bwd_call(xy, conic, opac, color, depth,
                            tile_start, tile_stop, gt_tiles,
                            tot_c, tot_d, tot_w, tot_v, t_final, *cots,
                            **want)
        d_xy, d_conic, d_opac, d_color, d_depth, d_dvar, d_dmed = rows
        return d_xy, d_conic, d_opac, d_color, d_depth, d_dmed, d_dvar

    core.defvjp(core_fwd, core_bwd, symbolic_zeros=True)
    return core


def _make_fused_core(binn: Binned, gt_tiles, *, cfg: RasterConfig,
                     tiles_x: int, capacity: int, rows_capacity: int,
                     height: int, width: int):
    """Sort-domain fused render core: gather -> pack -> render -> reduce
    inside ONE custom_vjp over the per-Gaussian feature table ``feat``
    ([P, 11]: xy, conic, opac, color, depth, depth_sgview).

    Replaces the round-3 chain of (two-stage aligned gather -> per-column
    instance arrays -> pack_instances) with a single sorted-order row
    gather feeding the kernels directly: the Pallas kernels read tile
    segments at arbitrary 128-lane phase (two-block slab DMA + in-VMEM
    lane rotation, render_pallas._rolled), so the aligned re-layout of the
    instance stream — 1.9 ms/frame at bench scale — is never materialized.
    The backward still writes gradient rows in the *aligned* domain
    (disjoint per-tile regions; slot = sorted_pos + tile_start - sort_start)
    so the deterministic MXU segment reduction over pre-sort runs
    (kernels/segment_sum.py, replacing backward.cu:593-680's atomicAdd)
    consumes them through the same ``inv`` map as before.

    The returned gradient is d feat directly: column 10 (the pose-stopped
    depth copy) accumulates both the median-depth and depth-variance row
    gradients, exactly like the unfused path where ``inst_depth_med`` was
    passed for both operands.
    """
    from .kernels import render_pallas as impl
    from .kernels.segment_sum import segment_sum_rows

    ts, tp = binn.sort_start, binn.sort_stop
    astart = binn.tile_start
    kw = dict(cfg=cfg, tiles_x=tiles_x, capacity=capacity,
              height=height, width=width)
    b = impl.BLOCK
    f16 = impl.FEAT

    def build(feat):
        full = feat[binn.gauss_sorted]               # [cap, 11] row gather
        d = full[:, 9:10]
        table = jnp.concatenate(
            [full, d * d, jnp.ones_like(d),
             jnp.zeros((capacity, f16 - 13), full.dtype)], axis=1)
        return impl.pack_feature_table(table)

    none6 = (None,) * 6

    @jax.custom_vjp
    def core(feat):
        packed = build(feat)
        return impl.core_fwd(*none6, ts, tp, gt_tiles, packed=packed,
                             i_total=capacity, **kw)

    def core_fwd(feat):
        feat = feat.value if hasattr(feat, "value") else feat
        packed = build(feat)
        out = impl.core_fwd(*none6, ts, tp, gt_tiles, packed=packed,
                            i_total=capacity, **kw)
        res = (packed, out.color, out.depth, out.weight, out.var,
               out.t_final)
        return out, res

    def core_bwd(res, cot):
        packed, tot_c, tot_d, tot_w, tot_v, t_final = res
        zero = jnp.zeros_like(t_final)
        zero_c = jnp.zeros_like(tot_c)

        def dead(x):
            if x is None or isinstance(
                    x, jax.custom_derivatives.SymbolicZero):
                return True
            return hasattr(x, "dtype") and x.dtype == jax.dtypes.float0

        f = lambda x, like: like if dead(x) else x
        cots = (f(cot.color, zero_c), f(cot.depth, zero),
                f(cot.weight, zero), f(cot.var, zero),
                f(cot.median, zero), f(cot.t_final, zero))
        flat = impl.core_bwd(
            None, None, None, None, None,
            ts, tp, gt_tiles, tot_c, tot_d, tot_w, tot_v, t_final, *cots,
            packed=packed, tile_astart=astart, rows_capacity=rows_capacity,
            return_flat=True,
            want_med=not dead(cot.median), want_var=not dead(cot.var),
            **kw)                                     # [rows_capacity, 16]
        rows_u = flat[binn.inv]                       # pre-sort order [cap]
        blocks = jnp.transpose(
            rows_u.reshape(capacity // b, b, f16), (0, 2, 1))
        g = segment_sum_rows(blocks, binn.gauss_start, binn.gauss_stop)
        d_feat = jnp.concatenate(
            [g[:, 0:10], (g[:, 10] + g[:, 11])[:, None]], axis=1)
        return (d_feat,)

    core.defvjp(core_fwd, core_bwd, symbolic_zeros=True)
    return core


def count_instances(
    means3D,
    camera: Camera,
    cfg: RasterConfig = RasterConfig(),
    *,
    opacities,
    scales=None,
    rotations=None,
    cov3D_precomp=None,
    shs=None,
    sh_degree: int = 0,
    colors_precomp=None,
    scale_modifier: float = 1.0,
    **_unused,
):
    """True (uncapped) tile-instance count for this scene and view.

    Accepts (and ignores) the rest of :func:`rasterize`'s keyword surface
    (``bg``, ``gt_depth``, …) so the same kwargs dict can be passed to both.

    The cheap way to size ``max_instances`` before building a render graph:
    compiles only the preprocess, not the binning/render pipeline.  Replaces
    the reference's device→host read of ``num_rendered`` after the prefix
    sum (rasterizer_impl.cu:286-287) as a sizing mechanism.
    """
    prep = preprocess(
        means3D, camera, cfg,
        opacities=opacities, scales=scales, rotations=rotations,
        cov3D_precomp=cov3D_precomp, shs=shs, sh_degree=sh_degree,
        colors_precomp=colors_precomp, scale_modifier=scale_modifier,
    )
    return jnp.sum(prep.tiles_touched.astype(jnp.int32))


def bin_for_view(
    means3D,
    camera: Camera,
    cfg: RasterConfig = RasterConfig(),
    *,
    opacities,
    scales=None,
    rotations=None,
    cov3D_precomp=None,
    shs=None,
    sh_degree: int = 0,
    colors_precomp=None,
    scale_modifier: float = 1.0,
    max_instances=None,
    **_unused,
) -> Binned:
    """Precompute binning (expansion + sort + ranges) for reuse via
    ``rasterize(..., binn=...)``.

    Set ``cfg.bin_margin_px`` to the image motion the reuse must survive:
    GN pose tracking bins once per frame at the initial pose with a margin
    covering the expected inter-frame motion, then renders all iterations
    against the frozen instance assignment — the reference re-runs
    duplicateWithKeys + RadixSort per render (rasterizer_impl.cu:283-324);
    here that work amortizes across the whole GN solve.  Accepts (and
    ignores) the rest of :func:`rasterize`'s keyword surface.
    """
    prep = preprocess(
        means3D, camera, cfg,
        opacities=opacities, scales=scales, rotations=rotations,
        cov3D_precomp=cov3D_precomp, shs=shs, sh_degree=sh_degree,
        colors_precomp=colors_precomp, scale_modifier=scale_modifier,
    )
    h, w = camera.height, camera.width
    tiles_x, tiles_y = grid_dims(h, w, cfg.tile_h, cfg.tile_w)
    if max_instances is None:
        max_instances = cfg.max_instances or default_max_instances(
            means3D.shape[0], cfg.instance_multiplier
        )
    return bin_gaussians(prep, tiles_x, tiles_y, max_instances,
                         align=INSTANCE_ALIGN,
                         tile_w=cfg.tile_w, tile_h=cfg.tile_h,
                         alpha_min=cfg.alpha_min,
                         margin_px=cfg.bin_margin_px,
                         row_gather=cfg.bin_row_gather)


def rasterize(
    means3D,
    camera: Camera,
    cfg: RasterConfig = RasterConfig(),
    *,
    opacities,
    scales=None,
    rotations=None,
    cov3D_precomp=None,
    shs=None,
    sh_degree: int = 0,
    colors_precomp=None,
    scale_modifier: float = 1.0,
    bg=None,
    gt_depth=None,
    means2D=None,
    track_off: bool = False,
    map_off: bool = False,
    max_instances=None,
    tile_batch: int = 64,
    backend=None,
    mesh=None,
    tile_axis: str = "tile",
    use_custom_vjp: bool = True,
    binn: Binned = None,
    shard_binning: bool = False,
    max_instances_per_shard: int = None,
) -> RenderOutputs:
    """Render Gaussians; differentiable w.r.t. all parameters and the pose.

    Equivalent surface to the light variant's ``rasterize_gaussians``
    (light __init__.py:21-46) with ``track_off``/``map_off`` realized as
    stop-gradients (reference: backward gates at backward.cu:593-696).

    ``binn``: a precomputed :class:`Binned` (see :func:`bin_for_view`) to
    reuse — the expansion/sort/range stage is skipped and the instance ->
    (gaussian, tile) assignment, sort order, and segment ranges are taken
    as given, while per-instance *features* still come from this call's
    preprocess.  Valid when the geometry seen by the binning pose covers
    this call's pose (``cfg.bin_margin_px`` at bin time buys that slack);
    the blend's validity mask zeroes instances whose splat no longer
    reaches their tile, so at the binning pose the output is exact.

    ``shard_binning`` (requires ``mesh``): bin inside the tile shard_map —
    each device expands/sorts/gathers only its own tile-row band instead of
    replicating the full-frame binning (``parallel.shard_bin``).  Output
    matches the unsharded render exactly; ``max_instances_per_shard`` sizes
    each device's static budget (default cap * 2 / n; size from
    ``parallel.shard_bin.band_instance_counts`` in production).
    """
    h, w = camera.height, camera.width
    dtype = means3D.dtype
    sg = jax.lax.stop_gradient
    if bg is None:
        bg = jnp.zeros((3,), dtype)
    if gt_depth is None:
        gt_depth = jnp.zeros((h, w), dtype)
    gt_depth = sg(gt_depth.reshape(h, w))

    if track_off:
        camera = Camera(
            viewmatrix=sg(camera.viewmatrix), tanfovx=camera.tanfovx,
            tanfovy=camera.tanfovy, height=h, width=w,
            znear=camera.znear, zfar=camera.zfar,
        )
    if map_off:
        means3D = sg(means3D)
        means2D = None if means2D is None else sg(means2D)
        opacities = sg(opacities)
        scales = None if scales is None else sg(scales)
        rotations = None if rotations is None else sg(rotations)
        cov3D_precomp = None if cov3D_precomp is None else sg(cov3D_precomp)
        shs = None if shs is None else sg(shs)
        colors_precomp = (
            None if colors_precomp is None else sg(colors_precomp)
        )

    prep = preprocess(
        means3D, camera, cfg,
        opacities=opacities, scales=scales, rotations=rotations,
        cov3D_precomp=cov3D_precomp, shs=shs, sh_degree=sh_degree,
        colors_precomp=colors_precomp, scale_modifier=scale_modifier,
        means2D=means2D,
    )

    tiles_x, tiles_y = grid_dims(h, w, cfg.tile_h, cfg.tile_w)
    p = means3D.shape[0]
    if mesh is not None and shard_binning:
        if not use_custom_vjp:
            raise ValueError("shard_binning requires the custom-VJP path")
        if binn is not None:
            raise ValueError(
                "shard_binning bins per device inside the shard_map; a "
                "precomputed single-device Binned cannot be reused — drop "
                "binn= or shard_binning")
        if max_instances is None:
            max_instances = cfg.max_instances or default_max_instances(
                p, cfg.instance_multiplier)
        backend_sb = backend or cfg.backend
        if backend_sb == "auto":
            on_tpu = jax.devices()[0].platform in ("tpu", "axon")
            backend_sb = ("pallas" if on_tpu and cfg.tile_px % 128 == 0
                          else "xla")
        from ..parallel.shard_bin import (default_cap_per_shard,
                                          make_shard_binned_core)
        if max_instances_per_shard is None:
            max_instances_per_shard = default_cap_per_shard(
                max_instances, mesh.shape[tile_axis])
        feat = jnp.concatenate(
            [prep.xy, prep.conic, prep.opacity[:, None], prep.color,
             prep.depth[:, None], prep.depth_sgview[:, None]], axis=1)
        gt_tiles = img_to_tiles(gt_depth, cfg.tile_h, cfg.tile_w)
        core = make_shard_binned_core(
            mesh, tile_axis, prep, gt_tiles, cfg=cfg, tiles_x=tiles_x,
            tiles_y=tiles_y, cap_per_shard=max_instances_per_shard,
            height=h, width=w, backend=backend_sb, tile_batch=tile_batch)
        sb = core(feat)
        out = sb.core
        t = tiles_x * tiles_y
        trim = lambda x: x[:t]
        color_tiles = trim(out.color) + trim(out.t_final)[:, None, :] \
            * bg[None, :, None]
        color_img = tiles_to_img(
            jnp.moveaxis(color_tiles, 1, 0), h, w, cfg.tile_h, cfg.tile_w)
        to_img = lambda x: tiles_to_img(trim(x), h, w, cfg.tile_h, cfg.tile_w)
        var_tiles = trim(out.var)
        if cfg.ref_depth_var:
            var_tiles = var_tiles - sg(var_tiles)
        return RenderOutputs(
            color=color_img,
            radii=prep.radius,
            depth=to_img(out.depth)[None],
            depth_median=to_img(out.median)[None],
            depth_var=tiles_to_img(var_tiles, h, w, cfg.tile_h,
                                   cfg.tile_w)[None],
            opacity_map=to_img(out.weight)[None],
            gau_uncertainty=sg(out.u_inst)[:, None],
            gau_related_pixels=out.npix_inst[:, None],
            n_contrib=to_img(out.n_contrib),
            n_valid=to_img(out.n_valid),
            num_rendered=sb.num_rendered,
            overflow=sb.overflow,
        )
    if binn is None:
        if max_instances is None:
            max_instances = cfg.max_instances or default_max_instances(
                p, cfg.instance_multiplier
            )
        binn = bin_gaussians(prep, tiles_x, tiles_y, max_instances,
                             align=INSTANCE_ALIGN,
                             tile_w=cfg.tile_w, tile_h=cfg.tile_h,
                             alpha_min=cfg.alpha_min,
                             margin_px=cfg.bin_margin_px,
                             row_gather=cfg.bin_row_gather)
    else:
        max_instances = (binn.gauss_sorted if binn.gauss_sorted is not None
                         else binn.gauss_id).shape[0]

    backend = backend or cfg.backend
    if backend == "auto":
        # Pallas tiles must flatten to whole 128-lane vregs
        on_tpu = jax.devices()[0].platform in ("tpu", "axon")
        backend = "pallas" if on_tpu and cfg.tile_px % 128 == 0 else "xla"
    if not use_custom_vjp:
        backend = "xla"

    # One fused row gather for all per-instance features (6 separate gathers
    # measured ~16x slower on TPU).  On the Pallas path its VJP is the
    # deterministic MXU segment reduction (kernels/segment_sum.py) instead
    # of an XLA scatter-add (~14 ms at ~1M instances) — both replace the
    # reference's per-field atomicAdd accumulation (backward.cu:593-680).
    feat = jnp.concatenate(
        [prep.xy, prep.conic, prep.opacity[:, None], prep.color,
         prep.depth[:, None], prep.depth_sgview[:, None]], axis=1)

    gt_tiles = img_to_tiles(gt_depth, cfg.tile_h, cfg.tile_w)

    fused = (backend == "pallas" and binn.sort_start is not None
             and mesh is None and use_custom_vjp)
    if fused:
        # sort-domain fused path: one sorted-order gather feeds the kernels
        # directly; the aligned instance re-layout and its per-column
        # intermediates are never built (binning's aligned-slot products
        # are dead code here and DCE'd by XLA)
        ids = binn.gauss_sorted
        core = _make_fused_core(
            binn, gt_tiles, cfg=cfg, tiles_x=tiles_x,
            capacity=max_instances,
            rows_capacity=aligned_size(max_instances, tiles_x * tiles_y,
                                       INSTANCE_ALIGN),
            height=h, width=w,
        )
        out = core(feat)
    else:
        ids = binn.gauss_id
        inst = feat[ids]
        inst_xy = inst[:, 0:2]
        inst_conic = inst[:, 2:5]
        inst_opac = inst[:, 5]
        inst_color = inst[:, 6:9]
        inst_depth = inst[:, 9]
        inst_depth_med = inst[:, 10]

        core = _make_core(
            binn.tile_start, binn.tile_stop, gt_tiles,
            cfg=cfg, tiles_x=tiles_x, capacity=max_instances,
            height=h, width=w, tile_batch=tile_batch, backend=backend,
            mesh=mesh, tile_axis=tile_axis, use_custom_vjp=use_custom_vjp,
        )
        out = core(inst_xy, inst_conic, inst_opac, inst_color, inst_depth,
                   inst_depth_med, inst_depth_med)

    color_tiles = out.color + out.t_final[:, None, :] * bg[None, :, None]
    color_img = tiles_to_img(
        jnp.moveaxis(color_tiles, 1, 0), h, w, cfg.tile_h, cfg.tile_w
    )
    to_img = lambda x: tiles_to_img(x, h, w, cfg.tile_h, cfg.tile_w)

    var_tiles = out.var
    if cfg.ref_depth_var:
        # value 0 like the reference forward; gradient flows like its backward
        var_tiles = var_tiles - sg(var_tiles)

    u_inst = sg(out.u_inst)
    gau_u = jnp.zeros((p,), dtype).at[ids].add(u_inst)
    gau_npix = jnp.zeros((p,), jnp.int32).at[ids].add(out.npix_inst)

    return RenderOutputs(
        color=color_img,
        radii=prep.radius,
        depth=to_img(out.depth)[None],
        depth_median=to_img(out.median)[None],
        depth_var=to_img(var_tiles)[None],
        opacity_map=to_img(out.weight)[None],
        gau_uncertainty=gau_u[:, None],
        gau_related_pixels=gau_npix[:, None],
        n_contrib=to_img(out.n_contrib),
        n_valid=to_img(out.n_valid),
        num_rendered=binn.num_rendered,
        overflow=binn.overflow,
    )


class PoseJvpOutputs(NamedTuple):
    """Primal render plus K exact pose-directional derivatives.

    ``tangents["color"]`` is [K, C, H, W]; ``depth``/``opacity_map``/
    ``depth_median`` are [K, H, W].  Tangent selection rules follow the
    light variant's pose Jacobian: derivatives flow through splat centers
    and depths only (the Sigma2D/conic branch is dropped, README.md:53-58;
    median/termination selections are frozen, backward.cu:654-664).

    Approximation bound of the dropped Sigma2D branch (measured,
    test_pose_jvp_sigma2d_branch_bound): on a 13:1 anisotropic stress
    scene the omitted term is ~11% of the full pose Jacobian by Frobenius
    norm, concentrated in the roll twist (~43%); "exact GN" tracking is
    exact w.r.t. the light-variant Jacobian, not the full one.
    """

    out: RenderOutputs
    color: jnp.ndarray
    depth: jnp.ndarray
    opacity_map: jnp.ndarray
    depth_median: jnp.ndarray


def rasterize_with_pose_jvp(
    means3D,
    camera: Camera,
    cfg: RasterConfig,
    view_tangents,
    *,
    opacities,
    scales=None,
    rotations=None,
    cov3D_precomp=None,
    colors_precomp=None,
    shs=None,
    sh_degree: int = 0,
    scale_modifier: float = 1.0,
    bg=None,
    gt_depth=None,
    max_instances=None,
    tile_batch: int = 64,
    backend=None,
    mesh=None,
    tile_axis: str = "tile",
    binn: Binned = None,
) -> PoseJvpOutputs:
    """Render plus K exact pose-tangent images in ONE pass.

    ``view_tangents`` is [K, 4, 4] (directions in view-matrix space, e.g.
    the 6 twist-basis derivatives of ``lie.apply_twist``).  This is the
    forward-mode companion of the custom-VJP core: Gauss-Newton tracking
    gets the full (Npix x K) residual Jacobian for ~the cost of one dual
    render instead of K+1 finite-difference renders or a jacfwd through the
    dense XLA pipeline (reference cost shape: 13 FD renders/iteration).

    Binning (sort order, tile ranges, validity) is computed on the primal
    and frozen — its derivative is zero almost everywhere, exactly like the
    reference's saved-buffer backward (ctx.save_for_backward).
    """
    h, w = camera.height, camera.width
    dtype = means3D.dtype
    k_t = view_tangents.shape[0]
    if bg is None:
        bg = jnp.zeros((3,), dtype)
    if gt_depth is None:
        gt_depth = jnp.zeros((h, w), dtype)
    gt_depth = gt_depth.reshape(h, w)

    prep_kw = dict(
        opacities=opacities, scales=scales, rotations=rotations,
        cov3D_precomp=cov3D_precomp, shs=shs, sh_degree=sh_degree,
        colors_precomp=colors_precomp, scale_modifier=scale_modifier,
    )

    # full-variant pose Jacobian: additionally linearize the conic through
    # computeCov2D (the Sigma2D/EWA branch, full backward.cu:243-302 in
    # forward mode).  Light variant (default) linearizes centers + depths
    # only, matching the reference light README.md:53-58.
    full = bool(cfg.pose_cov2d_branch)

    def feats_of_view(vm):
        cam2 = Camera(viewmatrix=vm, tanfovx=camera.tanfovx,
                      tanfovy=camera.tanfovy, height=h, width=w,
                      znear=camera.znear, zfar=camera.zfar)
        p = preprocess(means3D, cam2, cfg, **prep_kw)
        if full:
            return p.xy, p.depth, p.conic
        return p.xy, p.depth

    # one linearization, K cheap tangent evaluations (the pose enters the
    # per-Gaussian features through projection only)
    _, lin = jax.linearize(feats_of_view, camera.viewmatrix)
    tans = [lin(view_tangents[k]) for k in range(k_t)]

    prep = preprocess(means3D, camera, cfg, **prep_kw)
    tiles_x, tiles_y = grid_dims(h, w, cfg.tile_h, cfg.tile_w)
    p = means3D.shape[0]
    if binn is None:
        if max_instances is None:
            max_instances = cfg.max_instances or default_max_instances(
                p, cfg.instance_multiplier
            )
        binn = bin_gaussians(prep, tiles_x, tiles_y, max_instances,
                             align=INSTANCE_ALIGN,
                             tile_w=cfg.tile_w, tile_h=cfg.tile_h,
                             alpha_min=cfg.alpha_min,
                             margin_px=cfg.bin_margin_px,
                             row_gather=cfg.bin_row_gather)
    else:
        max_instances = (binn.gauss_sorted if binn.gauss_sorted is not None
                         else binn.gauss_id).shape[0]
    backend = backend or cfg.backend
    if backend == "auto":
        on_tpu = jax.devices()[0].platform in ("tpu", "axon")
        backend = "pallas" if on_tpu and cfg.tile_px % 128 == 0 else "xla"

    # sort-domain on the single-device Pallas path (one sorted-order row
    # gather; the kernels handle arbitrary segment phase — see
    # _make_fused_core); aligned domain everywhere else
    fused = (backend == "pallas" and binn.sort_start is not None
             and mesh is None)
    if fused:
        ids = binn.gauss_sorted
        rng_start, rng_stop = binn.sort_start, binn.sort_stop
    else:
        ids = binn.gauss_id
        rng_start, rng_stop = binn.tile_start, binn.tile_stop

    step = 6 if full else 3
    feat = jnp.concatenate(
        [prep.xy, prep.conic, prep.opacity[:, None], prep.color,
         prep.depth[:, None], prep.depth_sgview[:, None]]
        + [t for tk in tans
           for t in ((tk[0], tk[1][:, None], tk[2]) if full
                     else (tk[0], tk[1][:, None]))], axis=1)
    inst = feat[ids]
    inst_xy = inst[:, 0:2]
    inst_conic = inst[:, 2:5]
    inst_opac = inst[:, 5]
    inst_color = inst[:, 6:9]
    inst_depth = inst[:, 9]
    inst_depth_med = inst[:, 10]
    tan_xy = tuple(inst[:, 11 + step * k: 13 + step * k]
                   for k in range(k_t))
    tan_depth = tuple(inst[:, 13 + step * k] for k in range(k_t))
    tan_conic = tuple(inst[:, 14 + step * k: 17 + step * k]
                      for k in range(k_t)) if full else ()

    gt_tiles = img_to_tiles(gt_depth, cfg.tile_h, cfg.tile_w)

    kw = dict(cfg=cfg, tiles_x=tiles_x, capacity=max_instances,
              height=h, width=w, tile_batch=tile_batch)
    if backend == "pallas":
        from .kernels import render_pallas
        jvp_impl = render_pallas.core_fwd_jvp
    else:
        jvp_impl = tile_xla.core_fwd_jvp_xla
    if full and mesh is not None:
        raise ValueError(
            "pose_cov2d_branch forward-mode (Sigma2D tangents) is "
            "implemented on the single-device jvp paths (XLA and Pallas) "
            "only — the sharded path implements the light-variant pose "
            "Jacobian (README.md:53-58)")
    if mesh is not None:
        from ..parallel.sharded import make_sharded_jvp_core
        call = make_sharded_jvp_core(mesh, tile_axis, jvp_impl, **kw)
        out, tano = call(
            inst_xy, inst_conic, inst_opac, inst_color, inst_depth,
            inst_depth_med, tan_xy, tan_depth,
            binn.tile_start, binn.tile_stop, gt_tiles)
    elif full:
        # full-variant Sigma2D tangents ride 3 extra rows per direction on
        # both single-device backends (Pallas: _jvp_kernel per_k=6)
        out, tano = jvp_impl(
            inst_xy, inst_conic, inst_opac, inst_color, inst_depth,
            inst_depth_med, tan_xy, tan_depth,
            rng_start, rng_stop, gt_tiles, tan_conic=tan_conic, **kw)
    else:
        out, tano = jvp_impl(
            inst_xy, inst_conic, inst_opac, inst_color, inst_depth,
            inst_depth_med, tan_xy, tan_depth,
            rng_start, rng_stop, gt_tiles, **kw)

    to_img = lambda x: tiles_to_img(x, h, w, cfg.tile_h, cfg.tile_w)
    color_tiles = out.color + out.t_final[:, None, :] * bg[None, :, None]
    color_img = tiles_to_img(
        jnp.moveaxis(color_tiles, 1, 0), h, w, cfg.tile_h, cfg.tile_w)

    sg = jax.lax.stop_gradient
    var_tiles = out.var
    if cfg.ref_depth_var:
        var_tiles = var_tiles - sg(var_tiles)
    u_inst = sg(out.u_inst)
    gau_u = jnp.zeros((p,), dtype).at[ids].add(u_inst)
    gau_npix = jnp.zeros((p,), jnp.int32).at[ids].add(out.npix_inst)
    primal = RenderOutputs(
        color=color_img,
        radii=prep.radius,
        depth=to_img(out.depth)[None],
        depth_median=to_img(out.median)[None],
        depth_var=to_img(var_tiles)[None],
        opacity_map=to_img(out.weight)[None],
        gau_uncertainty=gau_u[:, None],
        gau_related_pixels=gau_npix[:, None],
        n_contrib=to_img(out.n_contrib),
        n_valid=to_img(out.n_valid),
        num_rendered=binn.num_rendered,
        overflow=binn.overflow,
    )

    dcolor = jnp.stack([
        tiles_to_img(
            jnp.moveaxis(tano.color[k] + tano.t_final[k][:, None, :]
                         * bg[None, :, None], 1, 0),
            h, w, cfg.tile_h, cfg.tile_w)
        for k in range(k_t)])
    ddepth = jnp.stack([to_img(tano.depth[k]) for k in range(k_t)])
    dweight = jnp.stack([to_img(tano.weight[k]) for k in range(k_t)])
    dmed = jnp.stack([to_img(tano.median[k]) for k in range(k_t)])
    return PoseJvpOutputs(out=primal, color=dcolor, depth=ddepth,
                          opacity_map=dweight, depth_median=dmed)
