"""CG-SLAM-style tracking and mapping loops on the TPU rasterizer.

The reference documents (README.md:60-83) but does not ship this layer: a
``render`` wrapper called with ``track_off``/``map_off`` flags by a tracking
loop (pose-only gradients) and a mapping loop (Gaussian-only gradients).
Here both loops are pure JAX functions:

- **Tracking** (reference call stack §3.3): optimize a 6-DoF twist around the
  previous pose by gradient descent on an uncertainty-gated color+depth
  objective, with ``map_off=True`` (Gaussian parameters frozen via
  stop_gradient).  The reference's 12-element ``grad_viewmatrix`` is replaced
  by the better-conditioned SE(3) retraction (direct-matrix mode remains
  available through ``rasterize`` itself).
- **Mapping** (§3.4): Adam on the Gaussian parameters over a window of
  keyframes with ``track_off=True``, 3DGS densify/split/prune driven by the
  screen-gradient statistics, plus CG-SLAM's uncertainty-aware pruning from
  the per-Gaussian ``gau_uncertainty``/``gau_related_pixels`` outputs.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..camera import Camera
from ..config import RasterConfig
from ..ops.rasterize import rasterize
from . import lie
from .gaussians import DensifyState, GaussianModel, densify_and_prune


class Frame(NamedTuple):
    rgb: Any    # (3, H, W) in [0, 1]
    depth: Any  # (H, W) metric depth; 0 = invalid


def render_model(model: GaussianModel, camera: Camera, cfg: RasterConfig,
                 gt_depth=None, means2D=None, **kw):
    return rasterize(
        model.means3D, camera, cfg, gt_depth=gt_depth, means2D=means2D,
        **model.raster_kwargs(), **kw,
    )


def _mesh_kw(mesh, tile_axis):
    """rasterize() kwargs for tile-sharded rendering, when the mesh has a
    (non-trivial) tile axis."""
    if (mesh is not None and tile_axis and tile_axis in mesh.axis_names
            and mesh.shape[tile_axis] > 1):
        return dict(mesh=mesh, tile_axis=tile_axis)
    return {}


def _maybe_gather(model, view, mesh, map_axis, map_budget: int):
    """Gaussian-map sharding: frustum-gather the visible subset of a
    map-axis-sharded model into a replicated working model (parallel/
    sharded.gather_visible; markVisible semantics, rasterizer_impl.cu:54-66).
    Visibility is frozen at ``view``; gradients route back to the owning
    shards through the all_gather transpose."""
    if mesh is None or not map_axis:
        return model
    from ..parallel.sharded import gather_visible

    budget = map_budget or model.capacity // mesh.shape[map_axis]
    prm = {k: getattr(model, k) for k in PARAM_FIELDS}
    prm["active"] = model.active
    g, valid, _ = gather_visible(prm, view, mesh, map_axis,
                                 budget_per_shard=budget)
    return model.replace(**{k: g[k] for k in PARAM_FIELDS},
                         active=g["active"] & valid)


def rgbd_loss(out, frame: Frame, w_color: float = 1.0, w_depth: float = 0.5,
              sil_threshold: float = 0.99, tracking: bool = False):
    """L1 color + masked L1 depth.

    Depth is compared as *expected* depth (accumulated alpha-weighted depth
    normalized by the silhouette) — the geometric depth a sensor measures —
    matching the convention of the synthetic/Replica/TUM ground truth.

    For tracking, loss is restricted to well-reconstructed pixels
    (silhouette > threshold) so unmapped regions don't drag the pose —
    the role of CG-SLAM's uncertainty gating.
    """
    depth_valid = frame.depth > 0
    if tracking:
        sil = jax.lax.stop_gradient(out.opacity_map[0]) > sil_threshold
        depth_valid = depth_valid & sil
        color_mask = sil[None].astype(out.color.dtype)
    else:
        color_mask = jnp.ones((1, 1, 1), out.color.dtype)
    nc = jnp.maximum(jnp.sum(color_mask) * 3, 1.0) if tracking \
        else out.color.size
    l_color = jnp.sum(jnp.abs(out.color - frame.rgb) * color_mask) / nc
    nd = jnp.maximum(jnp.sum(depth_valid), 1)
    # Expected-depth divisor floored at 0.5: tracking pixels pass
    # sil > threshold anyway, and in mapping a barely-covered pixel
    # (sil -> 0) would otherwise get its gradient scaled by ~1/sil through
    # the quotient, destabilizing scene borders.  Below the floor this
    # degrades smoothly toward the unnormalized accumulated depth (x2).
    depth_est = out.depth[0] / jnp.maximum(out.opacity_map[0], 0.5)
    l_depth = jnp.sum(
        jnp.abs(depth_est - frame.depth) * depth_valid
    ) / nd
    loss = w_color * l_color + w_depth * l_depth
    if tracking:
        # an empty silhouette mask means the pose left the mapped region:
        # its loss (exactly 0) must not win a best-of comparison
        loss = jnp.where(jnp.sum(color_mask) > 0, loss, jnp.inf)
    return loss


@dataclasses.dataclass(frozen=True)
class TrackingConfig:
    iters: int = 12
    method: str = "gn"      # "gn" (exact fwd-mode Jacobian, XLA backend)
                            # | "gn_fd" (finite-difference Jacobian, Pallas
                            #   forward path — ~50x faster per iteration)
                            # | "adam" (1st-order, Pallas VJP path)
    lr: float = 2e-3        # adam only
    huber: float = 0.05     # gn robust-loss scale
    lam0: float = 1e-4      # gn initial LM damping
    fd_eps: float = 2e-3    # gn_fd twist perturbation (rad / m)
    # color-led weighting: the depth residual divides by the silhouette,
    # whose Jacobian is noisy at splat edges — keep it a mild regularizer
    w_color: float = 1.0
    w_depth: float = 0.25
    sil_threshold: float = 0.99
    # coarse-to-fine: track at 1/2^(L-1) ... 1/2, then full resolution.
    # Classic direct-method robustness: a coarse level's convergence basin
    # covers image motion 2^l times larger, and its renders cost 4^-l of
    # full res, so large inter-frame motion (rotation-heavy segments) is
    # absorbed before the full-res polish.  1 = off.
    pyramid: int = 1
    coarse_iters: int = 5   # iterations per coarse level
    # bin ONCE per frame (at the initial pose, with bin_margin_px of
    # footprint slack) and reuse the instance assignment across all GN
    # iterations — pose deltas within a solve are bounded by the
    # inter-frame motion, so a modest margin keeps the frozen binning
    # valid while the expansion/sort/range stage runs 1x instead of
    # 2x per iteration
    freeze_binning: bool = False
    bin_margin_px: float = 8.0
    # True: classic LM — every GN step is validated by a dedicated
    # residual render before acceptance (2 renders/iteration).  False
    # (default): deferred accept — the NEXT iteration's dual render
    # doubles as the evaluation of the previous trial step (reject =
    # halve the step), 1 dual render/iteration total.  Chip A/B at
    # 1200x680/100k (2026-08-19): 240 -> 174 ms/tracked frame at the
    # SAME converged pose error (4.1e-5)
    line_search: bool = False


@functools.partial(jax.jit, static_argnames=(
    "cfg", "tcfg", "height", "width", "tanfovx", "tanfovy",
    "mesh", "tile_axis", "map_axis", "map_budget"))
def _track_jit(model, view0, rgb, depth, cfg: RasterConfig,
               tcfg: TrackingConfig, height, width, tanfovx, tanfovy,
               mesh=None, tile_axis="tile", map_axis=None, map_budget=0):
    frame = Frame(rgb, depth)
    model = _maybe_gather(model, view0, mesh, map_axis, map_budget)
    mk = _mesh_kw(mesh, tile_axis)
    opt = optax.adam(tcfg.lr)

    def loss_fn(xi):
        view = lie.apply_twist(view0, xi)
        cam = Camera(viewmatrix=view, tanfovx=tanfovx, tanfovy=tanfovy,
                     height=height, width=width)
        out = render_model(model, cam, cfg, gt_depth=depth, map_off=True,
                           **mk)
        return rgbd_loss(out, frame, tcfg.w_color, tcfg.w_depth,
                         tcfg.sil_threshold, tracking=True)

    def step(carry, _):
        xi, opt_state, best_xi, best_loss = carry
        loss, g = jax.value_and_grad(loss_fn)(xi)
        updates, opt_state = opt.update(g, opt_state)
        better = loss < best_loss
        best_xi = jnp.where(better, xi, best_xi)
        best_loss = jnp.where(better, loss, best_loss)
        xi = optax.apply_updates(xi, updates)
        return (xi, opt_state, best_xi, best_loss), loss

    xi0 = jnp.zeros((6,), view0.dtype)
    init = (xi0, opt.init(xi0), xi0, jnp.asarray(jnp.inf, view0.dtype))
    (xi, _, best_xi, best_loss), losses = jax.lax.scan(
        step, init, None, length=tcfg.iters)
    final_loss = loss_fn(xi)
    better = final_loss < best_loss
    best_xi = jnp.where(better, xi, best_xi)
    best_loss = jnp.where(better, final_loss, best_loss)
    return lie.apply_twist(view0, best_xi), best_loss, losses


@functools.partial(jax.jit, static_argnames=(
    "cfg", "tcfg", "height", "width", "tanfovx", "tanfovy",
    "mesh", "tile_axis", "map_axis", "map_budget"))
def _track_gn_jit(model, view0, rgb, depth, cfg: RasterConfig,
                  tcfg: TrackingConfig, height, width, tanfovx, tanfovy,
                  mesh=None, tile_axis="tile", map_axis=None, map_budget=0):
    """Exact Gauss-Newton / Levenberg-Marquardt pose tracking.

    The 6-DoF pose is a textbook small-parameter least-squares problem; a
    damped normal-equations solve on Huber-weighted pixel residuals
    converges in ~10 iterations where first-order methods orbit the narrow
    valley of the silhouette-masked loss.  The (Npix x 6) residual Jacobian
    comes from ``rasterize_with_pose_jvp`` — ONE dual render propagating
    all 6 exact twist tangents through the blend (~3x one render), instead
    of 13 finite-difference renders (``gn_fd``) or a jacfwd through the
    dense XLA pipeline.
    """
    from ..ops.rasterize import rasterize_with_pose_jvp

    frame = Frame(rgb, depth)
    model = _maybe_gather(model, view0, mesh, map_axis, map_budget)
    mk = _mesh_kw(mesh, tile_axis)
    sqc = jnp.sqrt(tcfg.w_color)
    sqd = jnp.sqrt(tcfg.w_depth)
    kwm = model.raster_kwargs()

    def cam_of(view):
        return Camera(viewmatrix=view, tanfovx=tanfovx, tanfovy=tanfovy,
                      height=height, width=width)

    if tcfg.freeze_binning:
        from ..ops.rasterize import bin_for_view
        from ..ops.binning import default_max_instances
        # the margin dilates every footprint by up to margin px per side,
        # growing the instance count by ~(1 + m/tw)(1 + m/th); scale the
        # budget to match or the margin binning overflows and silently
        # drops the deepest REAL instances (budgets are typically sized
        # 1.1-2.5x the unmargined count)
        mi = cfg.max_instances or default_max_instances(
            model.means3D.shape[0], cfg.instance_multiplier)
        m = tcfg.bin_margin_px
        scale = (1.0 + m / cfg.tile_w) * (1.0 + m / cfg.tile_h)
        mi = int(-(-int(mi * scale) // 1024) * 1024)
        binn = bin_for_view(
            model.means3D, cam_of(view0),
            cfg.replace(bin_margin_px=m), max_instances=mi, **kwm)
        mk = dict(mk, binn=binn)

    def res_of(out, m):
        sil = out.opacity_map[0]
        rc = ((out.color - frame.rgb) * m[None]).reshape(-1)
        depth_est = out.depth[0] / jnp.maximum(sil, 1e-6)
        rd = ((depth_est - frame.depth) * m).reshape(-1)
        return jnp.concatenate([sqc * rc, sqd * rd])

    def mask_of(out):
        return ((out.opacity_map[0] > tcfg.sil_threshold)
                & (frame.depth > 0)).astype(rgb.dtype)

    def residuals(xi):
        out = render_model(model, cam_of(lie.apply_twist(view0, xi)), cfg,
                           gt_depth=depth, map_off=True, track_off=True,
                           **mk)
        return res_of(out, mask_of(out))

    def res_jac(xi):
        view = lie.apply_twist(view0, xi)
        # twist-basis tangents of the view matrix at the current xi
        tw = jax.jacfwd(lambda x: lie.apply_twist(view0, x))(xi)  # [4,4,6]
        j = rasterize_with_pose_jvp(
            model.means3D, cam_of(view), cfg, jnp.moveaxis(tw, -1, 0),
            gt_depth=depth, **kwm, **mk)
        out = j.out
        m = mask_of(out)
        r = res_of(out, m)
        sil = out.opacity_map[0]
        silc = jnp.maximum(sil, 1e-6)
        dsil = jnp.where(sil > 1e-6, j.opacity_map, 0.0)       # [6, H, W]
        jc = (j.color * m[None, None]).reshape(6, -1)
        jd = ((j.depth * silc[None] - out.depth[0][None] * dsil)
              / (silc * silc)[None] * m[None]).reshape(6, -1)
        jac = jnp.concatenate([sqc * jc, sqd * jd], axis=1)     # [6, N]
        return r, jac

    def cost_of(r):
        w = 1.0 / jnp.sqrt(1.0 + (r / tcfg.huber) ** 2)  # Huber IRLS weight
        return 0.5 * jnp.sum(w * r * r), w

    def gn_eval(xi):
        r, jac = res_jac(xi)
        cost, w = cost_of(r)
        jw = jac * w[None, :]
        return jw @ jac.T, jw @ r, cost

    def _solve(h, g, lam, dtype):
        return jnp.linalg.solve(
            h + lam * jnp.diag(jnp.diag(h))
            + 1e-9 * jnp.eye(6, dtype=dtype), -g)

    xi0 = jnp.zeros((6,), view0.dtype)

    if tcfg.line_search:
        def step(carry, _):
            xi, lam, best_xi, best_cost = carry
            h, g, cost = gn_eval(xi)
            better0 = cost < best_cost
            best_xi = jnp.where(better0, xi, best_xi)
            best_cost = jnp.where(better0, cost, best_cost)
            dx = _solve(h, g, lam, xi.dtype)
            xi2 = xi + dx
            cost2, _ = cost_of(residuals(xi2))
            accept = (cost2 < cost) & jnp.all(jnp.isfinite(dx))
            xi = jnp.where(accept, xi2, xi)
            lam = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-7),
                            jnp.minimum(lam * 5.0, 1e3))
            return (xi, lam, best_xi, best_cost), cost

        init = (xi0, jnp.asarray(tcfg.lam0, view0.dtype), xi0,
                jnp.asarray(jnp.inf, view0.dtype))
        (xi, _, best_xi, best_cost), costs = jax.lax.scan(
            step, init, None, length=tcfg.iters)
        final_cost, _ = cost_of(residuals(xi))
        better = final_cost < best_cost
        best_xi = jnp.where(better, xi, best_xi)
        best_cost = jnp.where(better, final_cost, best_cost)
        return lie.apply_twist(view0, best_xi), best_cost, costs

    # deferred accept: the NEXT iteration's dual render evaluates the
    # previous trial step — ONE render per iteration instead of two.
    # anchor = last accepted point, dx = pending trial step; a rejected
    # trial keeps the anchor and retries with half the step (backtracking)
    # and boosted damping.  best_* tracks every evaluated point, so the
    # returned pose never regresses versus the line-search variant's
    # guarantee.
    def step(carry, _):
        anchor, dx, cost_anchor, lam, best_xi, best_cost = carry
        xi_try = anchor + dx
        h, g, cost = gn_eval(xi_try)
        better = cost < best_cost
        best_xi = jnp.where(better, xi_try, best_xi)
        best_cost = jnp.where(better, cost, best_cost)
        accept = cost < cost_anchor
        lam = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-7),
                        jnp.minimum(lam * 5.0, 1e3))
        dx_new = _solve(h, g, lam, anchor.dtype)
        ok = jnp.all(jnp.isfinite(dx_new))
        dx = jnp.where(accept & ok, dx_new, 0.5 * dx)
        anchor = jnp.where(accept, xi_try, anchor)
        cost_anchor = jnp.where(accept, cost, cost_anchor)
        return (anchor, dx, cost_anchor, lam, best_xi, best_cost), cost

    init = (xi0, jnp.zeros((6,), view0.dtype),
            jnp.asarray(jnp.inf, view0.dtype),
            jnp.asarray(tcfg.lam0, view0.dtype), xi0,
            jnp.asarray(jnp.inf, view0.dtype))
    (_, _, _, _, best_xi, best_cost), costs = jax.lax.scan(
        step, init, None, length=tcfg.iters)
    return lie.apply_twist(view0, best_xi), best_cost, costs


@functools.partial(jax.jit, static_argnames=(
    "cfg", "tcfg", "height", "width", "tanfovx", "tanfovy",
    "mesh", "tile_axis", "map_axis", "map_budget"))
def _track_gn_fd_jit(model, view0, rgb, depth, cfg: RasterConfig,
                     tcfg: TrackingConfig, height, width, tanfovx, tanfovy,
                     mesh=None, tile_axis="tile", map_axis=None,
                     map_budget=0):
    """Gauss-Newton / LM tracking with finite-difference twist Jacobians.

    Same damped normal-equations solve as ``_track_gn_jit`` but the
    (Npix x 6) residual Jacobian comes from 6 forward-difference renders on
    the Pallas forward path instead of 6 forward-mode passes through the
    dense XLA backend — ~50x faster per iteration at SLAM resolutions.
    FD over a 6-dim twist is standard direct-method practice; the Huber
    IRLS weights and the silhouette/validity mask are frozen at the
    iteration's base pose so every column differentiates the same residual.
    """
    frame = Frame(rgb, depth)
    model = _maybe_gather(model, view0, mesh, map_axis, map_budget)
    mk = _mesh_kw(mesh, tile_axis)
    sqc = jnp.sqrt(tcfg.w_color)
    sqd = jnp.sqrt(tcfg.w_depth)
    eps = jnp.asarray(tcfg.fd_eps, view0.dtype)

    def render_out(xi):
        view = lie.apply_twist(view0, xi)
        cam = Camera(viewmatrix=view, tanfovx=tanfovx, tanfovy=tanfovy,
                     height=height, width=width)
        return render_model(model, cam, cfg, gt_depth=depth, map_off=True,
                            track_off=True, **mk)

    def res_with_mask(out, m):
        sil = out.opacity_map[0]
        rc = ((out.color - frame.rgb) * m[None]).reshape(-1)
        depth_est = out.depth[0] / jnp.maximum(sil, 1e-6)
        rd = ((depth_est - frame.depth) * m).reshape(-1)
        return jnp.concatenate([sqc * rc, sqd * rd])

    def base_eval(xi):
        out = render_out(xi)
        m = ((out.opacity_map[0] > tcfg.sil_threshold)
             & (frame.depth > 0)).astype(rgb.dtype)
        return res_with_mask(out, m), m

    def cost_of(r):
        w = 1.0 / jnp.sqrt(1.0 + (r / tcfg.huber) ** 2)
        return 0.5 * jnp.sum(w * r * r), w

    def step(carry, _):
        xi, lam, best_xi, best_cost = carry
        r0, m = base_eval(xi)
        cost, w = cost_of(r0)
        better0 = cost < best_cost
        best_xi = jnp.where(better0, xi, best_xi)
        best_cost = jnp.where(better0, cost, best_cost)

        def col(i):
            # central differences: secant bias is O(eps^2), which matters —
            # forward differences stall an order of magnitude earlier
            e = jnp.zeros((6,), xi.dtype).at[i].set(eps)
            return (res_with_mask(render_out(xi + e), m)
                    - res_with_mask(render_out(xi - e), m)) / (2.0 * eps)

        jac = jax.lax.map(col, jnp.arange(6))                  # [6, N]
        jw = jac * w[None, :]
        h = jw @ jac.T
        g = jw @ r0
        dx = jnp.linalg.solve(
            h + lam * jnp.diag(jnp.diag(h))
            + 1e-9 * jnp.eye(6, dtype=xi.dtype), -g)
        xi2 = xi + dx
        cost2, _ = cost_of(base_eval(xi2)[0])
        accept = (cost2 < cost) & jnp.all(jnp.isfinite(dx))
        xi = jnp.where(accept, xi2, xi)
        lam = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-7),
                        jnp.minimum(lam * 5.0, 1e3))
        return (xi, lam, best_xi, best_cost), cost

    xi0 = jnp.zeros((6,), view0.dtype)
    init = (xi0, jnp.asarray(tcfg.lam0, view0.dtype), xi0,
            jnp.asarray(jnp.inf, view0.dtype))
    (xi, _, best_xi, best_cost), costs = jax.lax.scan(
        step, init, None, length=tcfg.iters)
    final_cost, _ = cost_of(base_eval(xi)[0])
    better = final_cost < best_cost
    best_xi = jnp.where(better, xi, best_xi)
    best_cost = jnp.where(better, final_cost, best_cost)
    return lie.apply_twist(view0, best_xi), best_cost, costs


def downsample_frame(frame: Frame, s: int) -> Frame:
    """Mean-pool RGB by ``s``; depth pools only over valid (> 0) pixels so
    sensor holes don't bleed zeros into the pooled depth."""
    c, h, w = frame.rgb.shape
    rgb = frame.rgb.reshape(c, h // s, s, w // s, s).mean((2, 4))
    d = frame.depth.reshape(h // s, s, w // s, s)
    v = (d > 0).astype(d.dtype)
    nv = v.sum((1, 3))
    depth = jnp.where(nv > 0, (d * v).sum((1, 3)) / jnp.maximum(nv, 1), 0.0)
    return Frame(rgb=rgb, depth=depth)


def track_frame(model: GaussianModel, view0, frame: Frame,
                cfg: RasterConfig, tcfg: TrackingConfig,
                camera_template: Camera, mesh=None, tile_axis="tile",
                map_axis=None, map_budget: int = 0):
    """Pose-only optimization for one frame (reference §3.3 tracking step).

    With ``tcfg.pyramid > 1``: coarse-to-fine — the pose is first converged
    on mean-pooled half/quarter-res copies of the frame (same tanfov, so the
    camera model is exactly the downsampled one), then polished at full
    resolution.  Levels whose resolution the pooling cannot divide are
    skipped.

    With a ``mesh``: renders tile-shard over ``tile_axis`` (if present with
    size > 1) and, when ``map_axis`` is set, frustum-gathers the visible
    subset of a map-sharded model first (visibility frozen at ``view0``)."""
    impl = {"gn": _track_gn_jit, "gn_fd": _track_gn_fd_jit}.get(
        tcfg.method, _track_jit)
    h, w = camera_template.height, camera_template.width
    view = view0
    for lvl in range(max(tcfg.pyramid, 1) - 1, 0, -1):
        s = 2 ** lvl
        if h % s or w % s:
            continue
        tcfg_l = dataclasses.replace(tcfg, pyramid=1,
                                     iters=tcfg.coarse_iters)
        fl = downsample_frame(frame, s)
        view, _, _ = impl(
            model, view, fl.rgb, fl.depth, cfg, tcfg_l, h // s, w // s,
            camera_template.tanfovx, camera_template.tanfovy,
            mesh=mesh, tile_axis=tile_axis, map_axis=map_axis,
            map_budget=map_budget,
        )
    return impl(
        model, view, frame.rgb, frame.depth, cfg, tcfg,
        h, w,
        camera_template.tanfovx, camera_template.tanfovy,
        mesh=mesh, tile_axis=tile_axis, map_axis=map_axis,
        map_budget=map_budget,
    )


@dataclasses.dataclass(frozen=True)
class MappingConfig:
    iters: int = 40
    lr_means: float = 1e-4
    lr_scales: float = 5e-3
    lr_rotations: float = 1e-3
    lr_opacities: float = 5e-2
    lr_sh: float = 2.5e-3
    w_color: float = 1.0
    w_depth: float = 0.5
    densify_grad_threshold: float = 2e-4
    uncertainty_prune: float = 0.0  # 0 disables
    # Global exponential decay on the GEOMETRY learning rates (means,
    # scales, rotations): x lr_decay every lr_decay_steps map steps,
    # floored at lr_decay_floor of the initial rate.  1.0 = off.  The
    # 3DGS/CG-SLAM pattern: early steps move geometry freely while the map
    # is raw; as it matures, large geometry steps under a narrow keyframe
    # window destabilize previously-converged regions (the round-3
    # heavier-mapping divergence, BASELINE.md) — appearance leaves
    # (opacity, SH) keep their full rate throughout.
    lr_decay: float = 1.0
    lr_decay_steps: int = 500
    lr_decay_floor: float = 0.1


PARAM_FIELDS = ("means3D", "scales_log", "rotations", "opacities_logit",
                "sh")

GEOMETRY_FIELDS = ("means3D", "scales_log", "rotations")


def model_params(model: GaussianModel) -> dict:
    """The differentiable leaves of the model (excludes the active mask)."""
    return {k: getattr(model, k) for k in PARAM_FIELDS}


def make_map_optimizer(mcfg: MappingConfig):
    """Per-leaf learning rates like 3DGS's grouped Adam."""
    lrs = {
        "means3D": mcfg.lr_means,
        "scales_log": mcfg.lr_scales,
        "rotations": mcfg.lr_rotations,
        "opacities_logit": mcfg.lr_opacities,
        "sh": mcfg.lr_sh,
    }

    def rate(k):
        lr = lrs[k]
        if mcfg.lr_decay < 1.0 and k in GEOMETRY_FIELDS:
            return optax.exponential_decay(
                init_value=lr, transition_steps=mcfg.lr_decay_steps,
                decay_rate=mcfg.lr_decay, end_value=lr * mcfg.lr_decay_floor)
        return lr

    return optax.multi_transform(
        {k: optax.adam(rate(k)) for k in PARAM_FIELDS},
        {k: k for k in PARAM_FIELDS},
    )


@functools.partial(jax.jit, static_argnames=(
    "cfg", "mcfg", "height", "width", "tanfovx", "tanfovy", "n_frames",
    "mesh", "kf_axis", "tile_axis", "map_axis", "map_budget"))
def map_step(model: GaussianModel, opt_state, dstate: DensifyState,
             views, rgbs, depths, wts, cfg: RasterConfig,
             mcfg: MappingConfig, height, width, tanfovx, tanfovy,
             n_frames: int, mesh=None, kf_axis="kf", tile_axis="tile",
             map_axis=None, map_budget=0):
    """One mapping gradient step over a window of keyframes
    (reference §3.4 mapping step; multi-frame sum like CG-SLAM's mapper).

    ``wts`` [K] weights each keyframe (0 = padding); the loss normalizes by
    their sum, so padding a window never changes the objective.

    Distribution (all optional, driven by ``mesh``):
    - keyframe data parallelism over ``kf_axis`` (north-star layout:
      keyframe partitioning + per-Gaussian gradient psum over ICI);
    - tile-sharded rendering over ``tile_axis``;
    - Gaussian-map sharding over ``map_axis`` via frustum gather_visible
      (gradients reduce-scatter back to the owning shards through the
      all_gather transpose);
    - kf x map COMPOSED in one step (both axes > 1): one shard_map spans
      both axes — per-frame frustum gathers ride the map axis, keyframe
      gradients psum over the kf axis
      (parallel.sharded.sharded_kf_map_value_and_grad).
    """
    opt = make_map_optimizer(mcfg)
    params = model_params(model)
    zeros2d = jnp.zeros_like(model.means3D[:, :2])
    kf_sharded = (mesh is not None and kf_axis in (mesh.axis_names or ())
                  and mesh.shape[kf_axis] > 1)
    map_sharded = (mesh is not None and map_axis is not None
                   and mesh.shape[map_axis] > 1)
    mk = _mesh_kw(mesh, tile_axis)

    def cam_of(view):
        return Camera(viewmatrix=view, tanfovx=tanfovx, tanfovy=tanfovy,
                      height=height, width=width)

    want_stats = mcfg.uncertainty_prune > 0
    if kf_sharded and map_sharded:
        from ..parallel.sharded import sharded_kf_map_value_and_grad

        budget = map_budget or model.capacity // mesh.shape[map_axis]

        def loss_one_g(gathered, valid, view, rgb, depth, wt):
            m = model.replace(
                **{kk: gathered[kk] for kk in PARAM_FIELDS},
                active=gathered["active"] & valid)
            out = render_model(m, cam_of(view), cfg, gt_depth=depth,
                               means2D=gathered["__means2d"],
                               track_off=True)
            l = wt * rgbd_loss(out, Frame(rgb, depth), mcfg.w_color,
                               mcfg.w_depth)
            if not want_stats:
                return l
            # per-Gaussian stats of the GATHERED working set; the wrapper
            # routes them back to owning shards (inverse gather), padding
            # frames (wt == 0) excluded like the other paths
            return l, (out.gau_uncertainty * (wt > 0).astype(jnp.float32),
                       out.gau_related_pixels * (wt > 0).astype(jnp.int32))

        vag = sharded_kf_map_value_and_grad(
            loss_one_g, mesh, kf_axis, map_axis, budget_per_shard=budget,
            near=cfg.near, gau_stats=want_stats)
        res = vag({**params, "__means2d": zeros2d},
                  {"active": model.active},
                  views, rgbs, depths, wts)
        if want_stats:
            loss, grads, _, (gau_u, gau_np) = res
        else:
            loss, grads, _ = res
            gau_u = gau_np = None
        g2d = grads.pop("__means2d")
        # radii index the gathered working set, not global slots; received
        # screen gradient is the global visibility proxy
        visible = jnp.abs(g2d).sum(-1) > 0
    elif kf_sharded:
        from ..parallel.sharded import sharded_value_and_grad

        def loss_one(p, view, rgb, depth, wt):
            m = model.replace(**{k: p[k] for k in PARAM_FIELDS})
            # no tile sharding here: the render already runs inside the
            # keyframe shard_map (nesting would need manual-axes plumbing);
            # with a kf x tile mesh each device renders its keyframes whole
            out = render_model(m, cam_of(view), cfg, gt_depth=depth,
                               means2D=p["__means2d"], track_off=True)
            l = wt * rgbd_loss(out, Frame(rgb, depth), mcfg.w_color,
                               mcfg.w_depth)
            # window-summed stats, padding frames (wt == 0) excluded — the
            # same semantics as the unsharded path so pruning/densify
            # decisions stay mesh-invariant
            live = (wt > 0).astype(jnp.int32)
            aux = (((out.radii > 0).astype(jnp.int32)) * live,
                   out.gau_uncertainty * live,
                   out.gau_related_pixels * live)
            return l, aux

        vag = sharded_value_and_grad(loss_one, mesh, kf_axis, has_aux=True,
                                     n_extra=1, weighted=True)
        loss, grads, (vis, gau_u, gau_np) = vag(
            {**params, "__means2d": zeros2d}, views, rgbs, depths, wts)
        g2d = grads.pop("__means2d")
        visible = vis > 0
    else:
        def loss_fn(params, means2d):
            total = 0.0
            vis = gau_u = gau_np = None
            for i in range(n_frames):
                m = model.replace(**params)
                order = valid = None
                if map_axis is not None:
                    prm = {**params, "__means2d": means2d,
                           "active": model.active}
                    from ..parallel.sharded import gather_visible
                    budget = map_budget or model.capacity // mesh.shape[
                        map_axis]
                    g, valid, _, order = gather_visible(
                        prm, views[i], mesh, map_axis,
                        budget_per_shard=budget, with_order=True)
                    m = model.replace(
                        **{k: g[k] for k in PARAM_FIELDS},
                        active=g["active"] & valid)
                    m2d = g["__means2d"]
                else:
                    m2d = means2d
                out = render_model(m, cam_of(views[i]), cfg,
                                   gt_depth=depths[i], means2D=m2d,
                                   track_off=True, **mk)
                total = total + wts[i] * rgbd_loss(
                    out, Frame(rgbs[i], depths[i]), mcfg.w_color,
                    mcfg.w_depth)
                # window-summed per-Gaussian stats; padding frames excluded
                live = (wts[i] > 0)
                if map_axis is None:
                    v_i = (out.radii > 0) & live
                    u_i = out.gau_uncertainty * live.astype(jnp.float32)
                    n_i = out.gau_related_pixels * live.astype(jnp.int32)
                    vis = v_i if vis is None else (vis | v_i)
                elif want_stats:
                    # stats live on the gathered working set: route back
                    # to owning shards (inverse gather)
                    from ..parallel.sharded import scatter_gathered_stats
                    u_i = scatter_gathered_stats(
                        out.gau_uncertainty * live.astype(jnp.float32),
                        order, valid, mesh, map_axis,
                        p_global=model.capacity)
                    n_i = scatter_gathered_stats(
                        out.gau_related_pixels * live.astype(jnp.int32),
                        order, valid, mesh, map_axis,
                        p_global=model.capacity)
                else:
                    u_i = n_i = None
                if u_i is not None:
                    gau_u = u_i if gau_u is None else gau_u + u_i
                    gau_np = n_i if gau_np is None else gau_np + n_i
            return (total / jnp.maximum(jnp.sum(wts), 1e-9),
                    (vis, gau_u, gau_np))

        (loss, (vis, gau_u, gau_np)), (grads, g2d) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, zeros2d)
        if map_axis is not None:
            # radii refer to the gathered working set, not global slots;
            # "received screen gradient" is the global visibility proxy
            visible = jnp.abs(g2d).sum(-1) > 0
        else:
            visible = vis

    updates, opt_state = opt.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    model = model.replace(**params)
    # densification statistics: NDC-units screen gradient, the analogue of
    # the reference's grad_means2D output (backward.cu:668-670)
    dstate = dstate.update(g2d, visible=visible)
    return model, opt_state, dstate, loss, (gau_u, gau_np)


def mapping_round(model, opt_state, dstate, keyframes, cfg, mcfg, cam_t,
                  rng, densify_every: int = 0, mesh=None, kf_axis="kf",
                  tile_axis="tile", map_axis=None, map_budget: int = 0):
    """Run mcfg.iters map steps over the keyframe window; optionally densify.

    keyframes: (views [K,4,4], rgbs [K,3,H,W], depths [K,H,W]).
    Python-level loop (streaming SLAM); each step is jitted.  With a mesh
    whose ``kf_axis`` is non-trivial, the window is padded (weight 0) to a
    multiple of the axis size and keyframes run data-parallel.
    """
    views, rgbs, depths = keyframes
    n = views.shape[0]
    wts = jnp.ones((n,), jnp.float32)
    kf_sharded = (mesh is not None and kf_axis in (mesh.axis_names or ())
                  and mesh.shape[kf_axis] > 1)
    if kf_sharded:
        nd = mesh.shape[kf_axis]
        pad = (-n) % nd
        if pad:
            rep = lambda a: jnp.concatenate(
                [a] + [a[-1:]] * pad, axis=0)
            views, rgbs, depths = rep(views), rep(rgbs), rep(depths)
            wts = jnp.concatenate([wts, jnp.zeros((pad,), jnp.float32)])
            n = n + pad
    loss = stats = None
    for it in range(mcfg.iters):
        model, opt_state, dstate, loss, stats = map_step(
            model, opt_state, dstate, views, rgbs, depths, wts, cfg, mcfg,
            cam_t.height, cam_t.width, cam_t.tanfovx, cam_t.tanfovy, n,
            mesh=mesh, kf_axis=kf_axis, tile_axis=tile_axis,
            map_axis=map_axis, map_budget=map_budget,
        )
        if densify_every and (it + 1) % densify_every == 0:
            model, dstate, _ = densify_and_prune(
                model, dstate,
                grad_threshold=mcfg.densify_grad_threshold, rng=rng)
    if mcfg.uncertainty_prune > 0 and stats[0] is not None:
        from .gaussians import prune_by_uncertainty
        model = prune_by_uncertainty(
            model, stats[0], stats[1], mcfg.uncertainty_prune)
    return model, opt_state, dstate, loss
