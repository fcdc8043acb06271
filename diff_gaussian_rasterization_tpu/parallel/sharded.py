"""Multi-device rendering and training (shard_map over a device mesh).

All new TPU-native design — the reference has no distributed layer at all
(SURVEY.md §2.3).  Two composable strategies:

1. **Tile-sharded rendering** (``core_fwd_sharded``/``core_bwd_sharded``):
   the render core already operates tile-major, so sharding the tile axis is
   a pure data split.  Instance arrays are replicated (the splat working set
   per frame is small next to HBM); each device renders its tile shard; in
   the backward each device produces per-instance gradient rows that are
   nonzero only for its own tiles' instances, so a single ``psum`` over ICI
   yields the full rows.

2. **Keyframe-sharded mapping** (``sharded_value_and_grad``): data-parallel
   mapping across keyframes; Gaussian-parameter gradients ``psum`` over ICI,
   exactly the north-star layout (keyframe partitioning + gradient psum).

3. **Gaussian-sharded maps** (``gather_visible``): scale the map itself
   beyond one device's memory — Gaussian parameter arrays are sharded over a
   ``map`` axis; per frame each device frustum-tests its shard
   (``markVisible`` semantics, rasterizer_impl.cu:54-66), compacts the
   visible subset into a fixed per-shard budget, and ``all_gather``s the
   survivors over ICI.  Gradients route back to the owning shard through the
   all_gather transpose (a reduce_scatter) automatically under autodiff.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import RasterConfig
from ..ops.tile_xla import CoreOutputs
from .mesh import shard_map_fn


def _pin(mesh: Mesh, spec, x):
    """Constrain ``x`` (a pytree) to the sharding its shard_map in_spec
    expects.

    Operands computed inside an enclosing ``jit`` otherwise arrive with
    XLA-auto-chosen shardings, and the check-free (``check_vma=False``)
    shard_map path has been observed to consume them WITHOUT resharding —
    each device reads its local shard as if it were the spec'd layout,
    yielding silently wrong results (zeros / overcounts; reproduced on the
    8-device CPU mesh: jit(render) != eager(render)).  Pinning the
    producer's output sharding to the consumer's expectation removes the
    mismatch.  No-op for data already laid out correctly.
    """
    sh = NamedSharding(mesh, spec)
    return jax.tree.map(
        lambda v: jax.lax.with_sharding_constraint(v, sh), x)


def _pad_tiles_to(mesh_size: int, *arrs):
    t = arrs[0].shape[0]
    tpad = -(-t // mesh_size) * mesh_size
    return t, [jnp.pad(a, [(0, tpad - t)] + [(0, 0)] * (a.ndim - 1))
               for a in arrs]


def make_sharded_core(mesh: Mesh, axis: str, fwd_impl, bwd_impl, *,
                      tiles_x: int, cfg: RasterConfig, **kw):
    """Wrap raw core fwd/bwd impls with tile-axis sharding.

    Both wrapped functions keep the unsharded call signature; tile-major
    arrays are padded to the mesh size, split, and reassembled.  The local
    tile index is recovered from an explicit per-tile index vector so pixel
    coordinates stay global.
    """
    n = mesh.shape[axis]
    rep = P()
    shard = P(axis)

    def fwd(xy, conic, opac, color, depth, depth_med,
            tile_start, tile_stop, gt_tiles):
        t, (ts, tp, gt) = _pad_tiles_to(n, tile_start, tile_stop, gt_tiles)
        tidx = jnp.pad(jnp.arange(t, dtype=jnp.int32), (0, ts.shape[0] - t))

        def local(xy, conic, opac, color, depth, depth_med, ts, tp, gt, ti):
            out = fwd_impl(xy, conic, opac, color, depth, depth_med,
                           ts, tp, gt, cfg=cfg, tiles_x=tiles_x,
                           tile_index=ti, **kw)
            # per-instance stats exist only for local tiles -> psum
            return out._replace(
                u_inst=jax.lax.psum(out.u_inst, axis),
                npix_inst=jax.lax.psum(out.npix_inst, axis),
            )

        out_specs = CoreOutputs(*([shard] * 9 + [rep, rep]))
        # check_rep off: pallas_call cannot declare varying-mesh-axes
        # metadata (vma) for its outputs, so replication checking must be
        # disabled on the shard_map wrapping a Pallas kernel
        f = shard_map_fn(
            local, mesh,
            in_specs=(rep,) * 6 + (shard, shard, shard, shard),
            out_specs=out_specs, check_rep=False,
        )
        # ALL operands pinned replicated: pinning the tile arrays to
        # their (sharded) in_spec layout does NOT avoid the bug — only a
        # replicated materialization, which shard_map then slices, does
        rp = lambda *xs: [_pin(mesh, rep, x) for x in xs]
        out = f(*rp(xy, conic, opac, color, depth, depth_med),
                *rp(ts, tp, gt, tidx))
        trim = lambda x: x[:t]
        return CoreOutputs(*(trim(getattr(out, f_)) for f_ in
                             CoreOutputs._fields[:9]),
                           out.u_inst, out.npix_inst)

    def bwd(xy, conic, opac, color, depth, tile_start, tile_stop, gt_tiles,
            tot_c, tot_d, tot_w, tot_v, t_final,
            dL_dc, dL_dd, dL_dw, dL_dvar, dL_dmed, dL_dtf,
            want_med: bool = True, want_var: bool = True):
        t, padded = _pad_tiles_to(
            n, tile_start, tile_stop, gt_tiles, tot_c, tot_d, tot_w, tot_v,
            t_final, dL_dc, dL_dd, dL_dw, dL_dvar, dL_dmed, dL_dtf)
        tidx = jnp.pad(jnp.arange(t, dtype=jnp.int32),
                       (0, padded[0].shape[0] - t))

        def local(xy, conic, opac, color, depth, ts, tp, gt,
                  tc, td, tw_, tv, tf, dc, dd, dw, dv, dm, dtf, ti):
            rows = bwd_impl(xy, conic, opac, color, depth, ts, tp, gt,
                            tc, td, tw_, tv, tf, dc, dd, dw, dv, dm, dtf,
                            cfg=cfg, tiles_x=tiles_x, tile_index=ti,
                            want_med=want_med, want_var=want_var, **kw)
            return tuple(jax.lax.psum(r, axis) for r in rows)

        f = shard_map_fn(
            local, mesh,
            in_specs=(rep,) * 5 + (shard,) * 14 + (shard,),
            out_specs=(rep,) * 7, check_rep=False,
        )
        return f(*[_pin(mesh, rep, x) for x in
                   (xy, conic, opac, color, depth)],
                 *[_pin(mesh, rep, x) for x in padded],
                 _pin(mesh, rep, tidx))

    return fwd, bwd


def gather_visible(params: dict, viewmatrix, mesh: Mesh, axis: str = "map",
                   *, budget_per_shard: int, near: float = 0.2,
                   with_order: bool = False):
    """Frustum-cull a Gaussian-sharded map and all-gather the visible subset.

    ``params`` is a dict of per-Gaussian arrays with leading dim P, sharded
    over ``axis`` (P % mesh.shape[axis] == 0); ``params["means3D"]`` drives
    the near-plane test.  Each shard compacts its visible Gaussians (stable
    order) into ``budget_per_shard`` slots — static shapes, like the
    rasterizer's instance budget — and the shards' survivors are gathered to
    every device.

    Returns ``(gathered, valid, overflow)``: gathered arrays with leading
    dim ``n_shards * budget_per_shard``, a validity mask (feed
    ``opacities * valid`` to the rasterizer so padded slots render as
    nothing), and a per-shard overflow flag (never a silent cap).

    ``with_order=True`` additionally returns each shard's compaction
    index (``order``, [n_shards * budget_per_shard] sharded over ``axis``)
    — the handle for routing per-Gaussian render statistics back to their
    owning shards (:func:`scatter_gathered_stats`).
    """
    n = mesh.shape[axis]

    def local(prm, view):
        means = prm["means3D"]
        z = means @ view[:3, 2] + view[3, 2]
        vis = z > near
        count = jnp.sum(vis)
        # stable compaction: visible-first order
        order = jnp.argsort(~vis, stable=True)[:budget_per_shard]
        valid = (jnp.arange(budget_per_shard)
                 < jnp.minimum(count, budget_per_shard))
        picked = {k: v[order] for k, v in prm.items()}
        gathered = {k: jax.lax.all_gather(v, axis, tiled=True)
                    for k, v in picked.items()}
        valid_g = jax.lax.all_gather(valid, axis, tiled=True)
        overflow = jax.lax.pmax(
            (count > budget_per_shard).astype(jnp.int32), axis)
        return gathered, valid_g, overflow, order.astype(jnp.int32)

    # check_rep off: the varying-axis checker does not infer that a tiled
    # all_gather over `axis` makes its result replicated
    f = shard_map_fn(
        local, mesh,
        in_specs=(P(axis), P()),         # broadcast over the params dict
        out_specs=(P(), P(), P(), P(axis)),
        check_rep=False,
    )
    out = f(_pin(mesh, P(axis), params), _pin(mesh, P(), viewmatrix))
    return out if with_order else out[:3]


def scatter_gathered_stats(stats, order, valid_g, mesh: Mesh,
                           axis: str = "map", *, p_global: int):
    """Route per-Gaussian statistics of a gathered working set back to the
    owning map shards — the inverse of :func:`gather_visible`'s compaction.

    ``stats`` [n*budget, k] is computed on the gathered (replicated)
    working set, e.g. ``RenderOutputs.gau_uncertainty``; ``order`` is
    ``gather_visible(with_order=True)``'s index and ``valid_g`` its mask.
    Each shard takes ITS slice of the gathered rows and scatter-adds them
    at ``order`` into its local [P/n, k] block; invalid (padding) rows
    contribute zero.  Returns [P, k] sharded over ``axis``.  The reference
    accumulates the same statistics with atomicAdd across pixels
    (forward.cu:386-387); here the cross-device leg is a deterministic
    scatter per shard.
    """
    n = mesh.shape[axis]
    budget = order.shape[0] // n
    p_loc = p_global // n
    stats = jax.lax.stop_gradient(stats)

    def local(st, od, vl):
        mi = jax.lax.axis_index(axis)
        sl = jax.lax.dynamic_slice_in_dim(st, mi * budget, budget, 0)
        sl = jnp.where(vl[:, None], sl, 0)
        return jnp.zeros((p_loc, st.shape[1]), st.dtype).at[od].add(sl)

    f = shard_map_fn(
        local, mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=P(axis), check_rep=False,
    )
    return f(_pin(mesh, P(), stats), _pin(mesh, P(axis), order),
             _pin(mesh, P(axis), valid_g))


def sharded_value_and_grad(loss_one_frame: Callable, mesh: Mesh,
                           axis: str = "kf", has_aux: bool = False,
                           n_extra: int = 0, weighted: bool = False):
    """Data-parallel value_and_grad over a sharded keyframe batch.

    ``loss_one_frame(params, view, rgb, depth, *extra) -> scalar`` (or
    ``(scalar, aux)`` with ``has_aux``; aux is summed over frames and
    psum'd — use it for additive per-Gaussian statistics).  Returns
    ``f(params, views, rgbs, depths, *extra) -> (mean loss, grads[, aux])``
    with keyframes (and the ``n_extra`` trailing per-frame arrays) sharded
    over ``axis`` and gradients psum'd over ICI.

    ``weighted=True`` treats ``extra[0]`` as per-frame weights and
    normalizes by their global sum instead of the frame count — the way to
    pad a keyframe window to a multiple of the mesh axis (weight 0) without
    changing the objective.
    """
    def local(params, views, rgbs, depths, *extra):
        k = views.shape[0]
        # Mark the replicated parameters device-varying before
        # differentiating: shard_map's transpose auto-psums the cotangent of
        # an *unvarying* input, which would double-count with the explicit
        # psum below (observed: grads exactly n_devices too large).
        if hasattr(jax.lax, "pcast"):
            mark = lambda x: jax.lax.pcast(x, axis, to="varying")
        else:  # older JAX
            mark = lambda x: jax.lax.pvary(x, axis)
        params = jax.tree.map(mark, params)

        def batch_loss(p):
            total = 0.0
            auxes = None
            for i in range(k):  # local keyframes; k is static per shard
                out = loss_one_frame(p, views[i], rgbs[i], depths[i],
                                     *(e[i] for e in extra))
                if has_aux:
                    l_i, a_i = out
                    auxes = a_i if auxes is None else jax.tree.map(
                        jnp.add, auxes, a_i)
                else:
                    l_i = out
                total = total + l_i
            return total, auxes

        (loss, aux), grads = jax.value_and_grad(
            batch_loss, has_aux=True)(params)
        if weighted:
            denom = jnp.maximum(jax.lax.psum(jnp.sum(extra[0]), axis), 1e-9)
        else:
            denom = jnp.asarray(k * jax.lax.psum(1, axis), loss.dtype)
        loss = jax.lax.psum(loss, axis) / denom
        grads = jax.tree.map(
            lambda g: jax.lax.psum(g, axis) / denom, grads)
        if has_aux:
            aux = jax.tree.map(lambda a: jax.lax.psum(a, axis), aux)
            return loss, grads, aux
        return loss, grads

    out_specs = (P(), P(), P()) if has_aux else (P(), P())
    f = shard_map_fn(
        local, mesh,
        in_specs=(P(),) + (P(axis),) * (3 + n_extra),
        out_specs=out_specs,
    )

    def pinned(params, *batched):
        return f(_pin(mesh, P(), params),
                 *[_pin(mesh, P(axis), b) for b in batched])

    return pinned


def sharded_kf_map_value_and_grad(loss_one_frame: Callable, mesh: Mesh,
                                  kf_axis: str = "kf",
                                  map_axis: str = "map", *,
                                  budget_per_shard: int,
                                  near: float = 0.2, n_extra: int = 1,
                                  gau_stats: bool = False):
    """Keyframe x Gaussian-map sharding composed in ONE mapping step.

    The north-star topology (big map x many keyframes): ``params`` (dict of
    per-Gaussian float arrays, leading dim P with P % n_map == 0) live
    sharded over ``map_axis``; the keyframe batch (``views, rgbs, depths,
    *extra``) is data-parallel over ``kf_axis``.  One shard_map spans both
    axes: each device frustum-tests its map shard against each of its local
    frames, compacts to ``budget_per_shard`` slots, and ``all_gather``s the
    survivors across its *map row*; gradients return to the owning shard
    through the all_gather transpose (a psum_scatter over ``map_axis``) and
    keyframe contributions are psum'd over ``kf_axis``.

    Within a map row every device renders the same gathered working set, so
    each local loss is scaled by 1/n_map — that makes the both-axis loss
    psum exact AND cancels the n_map-fold cotangent duplication the
    all_gather transpose would otherwise introduce.

    ``loss_one_frame(gathered, valid, view, rgb, depth, *extra_i) ->
    scalar``; ``consts`` is a second dict of non-differentiable per-Gaussian
    arrays (e.g. the ``active`` mask) gathered alongside ``params``.
    ``extra[0]`` must be the per-frame weights; the result is normalized by
    their global sum (pad windows with weight 0).

    Returns ``f(params, consts, views, rgbs, depths, *extra) ->
    (loss, grads, overflow)``.

    ``gau_stats=True``: ``loss_one_frame`` returns ``(scalar, stats)``
    where stats is a tuple of [n_map*budget, k] per-Gaussian arrays on the
    GATHERED working set (e.g. the uncertainty outputs).  Each map shard
    routes its slice back through its compaction order (the inverse
    gather), frames sum, and the kf axis psums — so uncertainty pruning
    composes with map sharding.  Return becomes
    ``(loss, grads, overflow, stats)`` with stats [P, k] sharded over
    ``map_axis``.
    """
    nm = mesh.shape[map_axis]

    def local(params, consts, views, rgbs, depths, *extra):
        k = views.shape[0]
        wts = extra[0]
        p_loc = params["means3D"].shape[0]

        def gather(prm, view):
            means = prm["means3D"]
            z = means @ view[:3, 2] + view[3, 2]
            vis = z > near
            count = jnp.sum(vis)
            order = jnp.argsort(~vis, stable=True)[:budget_per_shard]
            valid = (jnp.arange(budget_per_shard)
                     < jnp.minimum(count, budget_per_shard))
            picked = {kk: v[order] for kk, v in prm.items()}
            gathered = {kk: jax.lax.all_gather(v, map_axis, tiled=True)
                        for kk, v in picked.items()}
            valid_g = jax.lax.all_gather(valid, map_axis, tiled=True)
            return (gathered, valid_g, (count > budget_per_shard),
                    order, valid)

        def scatter_back(st, order, lvalid):
            # inverse gather: my slice of the gathered stats, scattered at
            # my compaction order into my local [p_loc, k] block
            mi = jax.lax.axis_index(map_axis)
            sl = jax.lax.dynamic_slice_in_dim(
                jax.lax.stop_gradient(st), mi * budget_per_shard,
                budget_per_shard, 0)
            sl = jnp.where(lvalid[:, None], sl, 0)
            return jnp.zeros((p_loc, st.shape[1]), st.dtype).at[order].add(
                sl)

        def batch_loss(p):
            total = 0.0
            ovf = jnp.zeros((), jnp.int32)
            stats = None
            for i in range(k):  # local keyframes; k static per shard
                gathered, valid_g, o, order, lvalid = gather(
                    {**p, **consts}, views[i])
                out = loss_one_frame(
                    gathered, valid_g, views[i], rgbs[i], depths[i],
                    *(e[i] for e in extra))
                if gau_stats:
                    l_i, st_i = out
                    routed = tuple(scatter_back(s, order, lvalid)
                                   for s in st_i)
                    stats = routed if stats is None else jax.tree.map(
                        jnp.add, stats, routed)
                else:
                    l_i = out
                total = total + l_i
                ovf = jnp.maximum(ovf, o.astype(jnp.int32))
            return total / nm, (ovf, stats)

        (loss, (ovf, stats)), grads = jax.value_and_grad(
            batch_loss, has_aux=True)(params)
        denom = jnp.maximum(jax.lax.psum(jnp.sum(wts), kf_axis), 1e-9)
        loss = jax.lax.psum(loss, (kf_axis, map_axis)) / denom
        grads = jax.tree.map(
            lambda g: jax.lax.psum(g, kf_axis) / denom, grads)
        overflow = jax.lax.pmax(ovf, (kf_axis, map_axis))
        if gau_stats:
            stats = tuple(jax.lax.psum(s, kf_axis) for s in stats)
            return loss, grads, overflow, stats
        return loss, grads, overflow

    # check_rep off: tiled all_gather + value_and_grad inside the body; the
    # varying-axes checker cannot type this (same reason as gather_visible)
    n_stats = 2 if gau_stats else 0
    out_specs = (P(), P(map_axis), P())
    if gau_stats:
        out_specs = out_specs + ((P(map_axis),) * n_stats,)
    f = shard_map_fn(
        local, mesh,
        in_specs=(P(map_axis), P(map_axis)) + (P(kf_axis),) * (3 + n_extra),
        out_specs=out_specs, check_rep=False,
    )

    def pinned(params, consts, *batched):
        return f(_pin(mesh, P(map_axis), params),
                 _pin(mesh, P(map_axis), consts),
                 *[_pin(mesh, P(kf_axis), b) for b in batched])

    return pinned


def make_sharded_jvp_core(mesh: Mesh, axis: str, jvp_impl, *,
                          tiles_x: int, cfg: RasterConfig, **kw):
    """Tile-axis sharding for the dual-forward (pose-jvp) core.

    Same data split as :func:`make_sharded_core`'s forward — instances and
    tangent rows replicated, tile-major arrays sharded, per-instance stats
    psum'd; the K tangent image streams come back tile-sharded like the
    primal streams.
    """
    from ..ops.tile_xla import PoseTangents

    n = mesh.shape[axis]
    rep = P()
    shard = P(axis)

    def fwd(xy, conic, opac, color, depth, depth_med, tan_xy, tan_depth,
            tile_start, tile_stop, gt_tiles):
        t, (ts, tp, gt) = _pad_tiles_to(n, tile_start, tile_stop, gt_tiles)
        tidx = jnp.pad(jnp.arange(t, dtype=jnp.int32), (0, ts.shape[0] - t))

        def local(xy, conic, opac, color, depth, depth_med, txy, td,
                  ts, tp, gt, ti):
            out, tans = jvp_impl(xy, conic, opac, color, depth, depth_med,
                                 txy, td, ts, tp, gt, cfg=cfg,
                                 tiles_x=tiles_x, tile_index=ti, **kw)
            out = out._replace(
                u_inst=jax.lax.psum(out.u_inst, axis),
                npix_inst=jax.lax.psum(out.npix_inst, axis),
            )
            return out, tans

        out_specs = (CoreOutputs(*([shard] * 9 + [rep, rep])),
                     PoseTangents(shard, shard, shard, shard, shard))
        f = shard_map_fn(
            local, mesh,
            in_specs=(rep,) * 8 + (shard, shard, shard, shard),
            out_specs=out_specs, check_rep=False,
        )
        out, tans = f(*[_pin(mesh, rep, x) for x in
                        (xy, conic, opac, color, depth, depth_med,
                         tan_xy, tan_depth, ts, tp, gt, tidx)])
        trim = lambda x: x[:t]
        out = CoreOutputs(*(trim(getattr(out, f_)) for f_ in
                            CoreOutputs._fields[:9]),
                          out.u_inst, out.npix_inst)
        tans = PoseTangents(*(tuple(trim(x) for x in getattr(tans, f_))
                              for f_ in PoseTangents._fields))
        return out, tans

    return fwd


# ---------------------------------------------------------------------------
# 4. Distributed pose-graph refinement (Schur/normal equations over ICI)
# ---------------------------------------------------------------------------


def _se3_chordal_residual(xis, views, ei, ej, z):
    """Per-edge SE(3) residual [6] around the current estimates.

    Chordal form: with relative error E = Z^-1 (X_j X_i^-1) (row-convention
    matrices, matching ``runner.refine_keyframes``'s measurements), the
    residual stacks the skew part of E's rotation and its translation row —
    zero iff E = I, and smooth, so JAX autodiff supplies the Jacobians the
    native solver (csrc/pose_graph.cpp) hand-derives.
    """
    from ..models import lie

    xi_mat = lie.apply_twist(views[ei], xis[ei])
    xj_mat = lie.apply_twist(views[ej], xis[ej])
    rel = xj_mat @ jnp.linalg.inv(xi_mat)
    e = jnp.linalg.inv(z) @ rel
    r = e[:3, :3]
    skew = 0.5 * (r - r.T)
    return jnp.concatenate([
        jnp.stack([skew[2, 1], skew[0, 2], skew[1, 0]]),
        e[3, :3],
    ])


def refine_poses_sharded(views, edges, zs, mesh: Mesh = None,
                         axis: str = "kf", iters: int = 5,
                         weights=None, prior: float = 1e6):
    """Gauss-Newton pose-graph refinement with edge-sharded normal equations.

    The reference has no multi-device anything; this is the north-star
    "keyframe pose-graph refinement over collectives": each device builds
    the normal-equation contributions H = J^T J, b = J^T r of its *edge
    shard* (relinearized chordal SE(3) residuals, Jacobians by autodiff),
    one ``psum`` over ICI forms the global 6K x 6K system, and the damped
    solve + pose update run replicated.  Pose 0 carries a large prior
    (gauge fix).  ``mesh=None`` runs the identical math on one device.

    Args:
      views: [K, 4, 4] row-convention w2c poses.
      edges: [E, 2] int32 (i, j) pairs.
      zs:    [E, 4, 4] measured relative transforms  X_j X_i^-1.
      weights: optional [E] edge weights (use 0 to pad E to a multiple of
        the mesh axis size).
    Returns [K, 4, 4] refined poses.
    """
    from ..models import lie

    views = jnp.asarray(views, jnp.float32)
    edges = jnp.asarray(edges, jnp.int32)
    zs = jnp.asarray(zs, jnp.float32)
    k = views.shape[0]
    e = edges.shape[0]
    if weights is None:
        weights = jnp.ones((e,), jnp.float32)

    if mesh is not None:
        n = mesh.shape[axis]
        e_pad = -(-e // n) * n
        edges = jnp.pad(edges, ((0, e_pad - e), (0, 0)))
        zs = jnp.pad(zs, ((0, e_pad - e), (0, 0), (0, 0)),
                     constant_values=0.0)
        zs = zs.at[e:, jnp.arange(4), jnp.arange(4)].set(1.0)
        weights = jnp.pad(weights, (0, e_pad - e))

    def local_normal_eqs(vw, ed, z, w):
        def one(edge, zm, wt):
            def res(xis):
                return _se3_chordal_residual(xis, vw, edge[0], edge[1], zm)
            xis0 = jnp.zeros((k, 6), vw.dtype)
            r = res(xis0)
            jac = jax.jacfwd(res)(xis0).reshape(6, k * 6)
            return wt * (jac.T @ jac), wt * (jac.T @ r)
        hs, bs = jax.vmap(one)(ed, z, w)
        return jnp.sum(hs, axis=0), jnp.sum(bs, axis=0)

    def gn_step(vw, _):
        if mesh is None:
            h, b = local_normal_eqs(vw, edges, zs, weights)
        else:
            def local(vw_, ed, z, w):
                h, b = local_normal_eqs(vw_, ed, z, w)
                return (jax.lax.psum(h, axis), jax.lax.psum(b, axis))
            h, b = shard_map_fn(
                local, mesh,
                in_specs=(P(), P(axis), P(axis), P(axis)),
                out_specs=(P(), P()),
            )(_pin(mesh, P(), vw), _pin(mesh, P(axis), edges),
              _pin(mesh, P(axis), zs), _pin(mesh, P(axis), weights))
        # gauge fix + LM damping
        diag = jnp.arange(6)
        h = h.at[diag, diag].add(prior)
        h = h + 1e-6 * jnp.eye(k * 6, dtype=vw.dtype)
        dx = jnp.linalg.solve(h, -b).reshape(k, 6)
        vw = jax.vmap(lie.apply_twist)(vw, dx)
        vw = jax.vmap(lie.orthonormalize_view)(vw)
        return vw, None

    views, _ = jax.lax.scan(gn_step, views, None, length=iters)
    return views
