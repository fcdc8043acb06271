"""End-to-end Gaussian-splatting SLAM: tracking + mapping + keyframes.

The full pipeline CG-SLAM builds on top of the reference rasterizer
(reference README.md:60-83 documents only the render-wrapper contract; the
loops themselves live in the CG-SLAM repo).  This runner is the TPU-native
equivalent: stream RGB-D frames, track each frame's pose against the map
(pose-only gradients), maintain a keyframe window, periodically optimize the
map (Gaussian-only gradients) with densification and uncertainty pruning,
and optionally refine the keyframe graph with the native pose-graph solver.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..camera import Camera
from ..config import RasterConfig
from .gaussians import DensifyState, GaussianModel, init_model
from .slam import (Frame, MappingConfig, TrackingConfig, make_map_optimizer,
                   mapping_round, model_params, render_model, track_frame)


@dataclasses.dataclass
class SLAMConfig:
    raster: RasterConfig = dataclasses.field(default_factory=RasterConfig)
    tracking: TrackingConfig = dataclasses.field(
        default_factory=TrackingConfig)
    mapping: MappingConfig = dataclasses.field(default_factory=MappingConfig)
    capacity: int = 200_000
    keyframe_every: int = 8
    window: int = 4             # keyframes per mapping round
    map_every: int = 8
    seed_every_px: int = 16     # backproject every Nth pixel when seeding
    init_iters: int = 50        # bootstrap mapping steps on the first frame
    motion_model: bool = True   # constant-velocity tracking initialization
    pose_graph_refine: bool = False  # refine the keyframe chain at the end
    refine_every: int = 0       # also refine every N keyframes (0 = off)
    # Coverage-triggered keyframing: if the fraction of valid-depth pixels
    # whose rendered silhouette exceeds 0.5 drops below this, the camera has
    # entered sparsely-mapped territory — insert a keyframe (seeding the
    # holes) and run a mapping round IMMEDIATELY instead of waiting for the
    # periodic schedule.  Rotation-dominant pans expose new territory much
    # faster than translation does, and tracking quality is bounded by map
    # coverage (the sil-masked loss constrains the pose only through mapped
    # pixels).  0 disables (periodic-only keyframing).
    kf_min_coverage: float = 0.0
    # extra mapping iterations for a coverage-triggered round (0 = use
    # mapping.iters): fresh territory starts as raw backprojected blobs and
    # needs more optimization than a mature map's refresh round
    coverage_map_iters: int = 0
    # Cooldown on the coverage trigger: skip it within this many frames of
    # the last keyframe.  If seeding cannot raise coverage above the
    # threshold (e.g. the unmapped region has sparse valid depth), an
    # ungated trigger inserts a keyframe + full mapping round on EVERY
    # consecutive frame, bloating the keyframe list and wall time.  0 keeps
    # the trigger ungated (a pan one frame after a keyframe can still
    # fire); set to 2-3 when sequences stall in territory that seeding
    # cannot cover.
    kf_coverage_cooldown: int = 0
    # Relocalization on track loss: a frame is flagged lost when its
    # converged GN cost exceeds ``reloc_spike x`` the median cost of the
    # recent frames OR its rendered silhouette covers less than
    # ``reloc_min_coverage`` of the frame's valid-depth pixels.  The
    # coverage signal is essential: the GN cost is summed over
    # silhouette-MASKED pixels, so a badly lost pose (map rendered into
    # the wrong region -> mask collapse) can report a LOWER cost than
    # healthy tracking (measured: 0.88 lost vs 1.16 median healthy on the
    # procedural scene).  On loss, re-track the frame from up to
    # ``reloc_candidates`` alternative initializations — the nearest
    # keyframe poses by camera center/gaze — and keep the best candidate
    # by coverage-normalized cost (cost / coverage).  0 disables.  Costs
    # one coverage render per frame while enabled (shared with the
    # kf_min_coverage trigger's render) plus candidate re-tracks only on
    # flagged frames.
    reloc_spike: float = 0.0
    reloc_candidates: int = 2
    reloc_min_coverage: float = 0.5
    # GN iterations for candidate re-tracks (0 = tracking.iters).  A
    # relocalization starts far from the basin floor by construction, so
    # it deserves a heavier budget than the per-frame warm-started solve;
    # spikes are rare, so the extra renders do not affect steady-state
    # throughput (a nonzero value compiles one extra track graph variant,
    # once).
    reloc_track_iters: int = 0
    # mapping-window selection: "random" = latest + uniform random older;
    # "nearest" = latest + nearest older keyframes by camera pose (center
    # distance + gaze angle) with one random anti-forgetting slot — in new
    # territory the random window wastes most of its frames on views that
    # don't see the immature region
    window_select: str = "random"
    # --- distribution (BASELINE config 5: SLAM sharded over a mesh) ---
    # A jax.sharding.Mesh enables, per axis name present with size > 1:
    #   kf_axis:   data-parallel mapping over keyframes (grad psum)
    #   tile_axis: tile-sharded rendering in tracking and mapping
    #   map_axis:  Gaussian-map sharding with per-frame frustum
    #              gather_visible; composes with kf_axis in one mapping
    #              step (one shard_map over both axes)
    # and routes keyframe pose-graph refinement through the edge-sharded
    # collective solver (parallel.sharded.refine_poses_sharded) instead of
    # the native C++ one.
    mesh: object = None
    kf_axis: str = "kf"
    tile_axis: str = "tile"
    map_axis: object = None
    map_budget_per_shard: int = 0   # 0 = capacity / n_map_shards
    # Re-anchor map Gaussians after pose-graph corrections: each Gaussian
    # inherits the SE(3) correction of its nearest (pre-correction) keyframe,
    # so a map built from drifted poses moves WITH the corrected trajectory
    # instead of ghosting against post-correction observations.
    reanchor: bool = True
    # --- pose-graph refinement measurements ---
    # Odometry edges alone are consistent with the current chain (zero
    # residual), so refinement needs independent measurements: each
    # keyframe is re-tracked against the MATURED map (cheap with the
    # dual-render exact GN) and enters the graph as a map-anchored edge
    # from the gauge-fixed first pose, fused with the odometry chain.
    refine_track_iters: int = 4
    refine_abs_weight: float = 4.0
    # Quality gate on map-anchored edges: drop a keyframe's absolute edge
    # when its re-track cost exceeds ``gate x median`` over all keyframes
    # (0 = off).  A re-track against a region the map has not matured in
    # converges to a WRONG pose with a high residual; fusing it at
    # ``refine_abs_weight`` injects that error into the whole chain (and
    # re-anchoring then bakes it into the map) — measured on the
    # procedural benchmark: refine_every=2 without the gate degrades
    # 6.5 -> 33 cm ATE.  The odometry chain keeps gated keyframes
    # constrained.
    refine_cost_gate: float = 0.0
    # --- offline polish (0 = off) ---
    # After the sequence (and the last pose-graph refinement), re-track
    # EVERY frame's pose against the FINAL map with this many exact-GN
    # iterations — the offline-SLAM global-polish step: frames tracked
    # early against an immature map inherit the matured geometry.  Frame 0
    # stays fixed (trajectory gauge).  The pre-polish trajectory is kept
    # on ``state.online_views`` so benchmarks can report both.
    final_retrack_iters: int = 0

    def __post_init__(self):
        if self.window_select not in ("random", "nearest"):
            raise ValueError(
                f"window_select must be 'random' or 'nearest', got "
                f"{self.window_select!r}")
        # kf x map compose in ONE mapping step (one shard_map over both
        # axes, parallel.sharded.sharded_kf_map_value_and_grad); since
        # round 5 the uncertainty statistics compose with map sharding too:
        # each shard routes its slice of the gathered per-Gaussian stats
        # back through its compaction order (the inverse gather,
        # parallel.sharded.scatter_gathered_stats)


@dataclasses.dataclass
class SLAMState:
    model: GaussianModel
    opt_state: object
    dstate: DensifyState
    kf_views: List
    kf_frames: List
    est_views: List
    rng: jax.Array
    # frame index of each keyframe (trajectory-correction anchors)
    kf_idx: List = dataclasses.field(default_factory=lambda: [0])
    # per-frame converged tracking costs (relocalization spike baseline)
    track_costs: List = dataclasses.field(default_factory=list)
    # the run's RasterConfig with the instance budget sized from the
    # bootstrapped map (init_slam); kept here rather than written back into
    # the caller's SLAMConfig so a config object never acquires state
    raster: Optional[RasterConfig] = None
    # pre-polish trajectory (set by final_retrack; None until then)
    online_views: Optional[List] = None


def backproject(frame: Frame, view, cam_t: Camera, stride: int):
    """Seed Gaussians from an RGB-D frame: unproject every `stride`-th pixel."""
    h, w = cam_t.height, cam_t.width
    depth = np.asarray(frame.depth)
    rgb = np.asarray(frame.rgb)
    ys, xs = np.mgrid[0:h:stride, 0:w:stride]
    ys, xs = ys.ravel(), xs.ravel()
    d = depth[ys, xs]
    ok = d > 0
    ys, xs, d = ys[ok], xs[ok], d[ok]
    # pixel -> camera ray (pinhole, principal point at center)
    x_cam = (xs + 0.5 - w / 2) / cam_t.focal_x * d
    y_cam = (ys + 0.5 - h / 2) / cam_t.focal_y * d
    pts_cam = np.stack([x_cam, y_cam, d], -1)
    # camera -> world: p_view = p_world @ V[:3,:3] + V[3,:3]
    v = np.asarray(view)
    rot = v[:3, :3]
    pts_world = (pts_cam - v[3, :3]) @ np.linalg.inv(rot)
    colors = rgb[:, ys, xs].T
    # isotropic scale ~ pixel footprint at that depth
    scale = d / cam_t.focal_x * stride * 0.7
    scales = np.stack([scale] * 3, -1)
    return (jnp.asarray(pts_world, jnp.float32),
            jnp.asarray(colors, jnp.float32),
            jnp.asarray(scales, jnp.float32))


def add_gaussians(model: GaussianModel, means, colors, scales,
                  opacity_logit: float = 1.5):
    """Write new Gaussians into free slots (static shapes)."""
    from ..ops.sh import rgb_to_sh0
    n = means.shape[0]
    free = jnp.argsort(model.active)[:n]         # inactive slots first
    ok = ~model.active[free]
    put = lambda arr, rows: arr.at[free].set(
        jnp.where(ok.reshape((-1,) + (1,) * (rows.ndim - 1)), rows,
                  arr[free]))
    model = model.replace(
        means3D=put(model.means3D, means),
        scales_log=put(model.scales_log, jnp.log(jnp.maximum(scales, 1e-6))),
        sh=model.sh.at[free, 0].set(
            jnp.where(ok[:, None], rgb_to_sh0(colors), model.sh[free, 0])),
        opacities_logit=put(model.opacities_logit,
                            jnp.full((n, 1), opacity_logit)),
        rotations=put(model.rotations,
                      jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (n, 1))),
        active=model.active.at[free].set(model.active[free] | ok),
    )
    return model, int(jnp.sum(ok))


def init_slam(first_view, first_frame: Frame, cam_t: Camera,
              scfg: SLAMConfig) -> SLAMState:
    model = init_model(scfg.capacity, sh_degree=0)
    means, colors, scales = backproject(first_frame, first_view, cam_t,
                                        scfg.seed_every_px)
    model, _ = add_gaussians(model, means, colors, scales)
    opt = make_map_optimizer(scfg.mapping)
    state = SLAMState(
        model=model,
        opt_state=opt.init(model_params(model)),
        dstate=DensifyState.zero(scfg.capacity),
        kf_views=[first_view],
        kf_frames=[first_frame],
        est_views=[first_view],
        rng=jax.random.PRNGKey(0),
    )
    # Bootstrap mapping: optimize the freshly seeded Gaussians against the
    # first frame before any tracking happens — tracking accuracy is bounded
    # by map quality, and raw backprojected blobs are a poor map.
    if scfg.init_iters > 0:
        icfg = dataclasses.replace(scfg.mapping, iters=scfg.init_iters)
        kf = (jnp.asarray(first_view)[None],
              jnp.asarray(first_frame.rgb)[None],
              jnp.asarray(first_frame.depth)[None])
        state.rng, sub = jax.random.split(state.rng)
        state.model, state.opt_state, state.dstate, _ = mapping_round(
            state.model, state.opt_state, state.dstate, kf,
            scfg.raster, icfg, cam_t, sub, **_dist_kw(scfg))
    state.raster = scfg.raster
    if scfg.raster.max_instances is None:
        # Size the static instance budget from the bootstrapped map instead
        # of the 8x-capacity default, which is ~3x oversized after
        # exact-footprint culling and inflates every capacity-proportional
        # stage (gathers, sorts, kernels process padded slots).  2.5x the
        # observed count leaves headroom for densification; overflow is
        # reported data, never silent (SURVEY §7 "no silent caps").
        probe = render_model(state.model, Camera(
            viewmatrix=first_view, tanfovx=cam_t.tanfovx,
            tanfovy=cam_t.tanfovy, height=cam_t.height,
            width=cam_t.width), scfg.raster)
        budget = int(-(-int(probe.num_rendered) * 2.5 // 1024) * 1024)
        state.raster = scfg.raster.replace(
            max_instances=max(budget, 1024))
    return state


def slam_step(state: SLAMState, frame: Frame, cam_t: Camera,
              scfg: SLAMConfig, frame_idx: int):
    """Process one frame: track; maybe keyframe + map."""
    rcfg = state.raster if state.raster is not None else scfg.raster
    # constant-velocity motion model: extrapolate the last relative motion
    # (row-convention: X_pred = X_{k-1} X_{k-2}^{-1} X_{k-1})
    if scfg.motion_model and len(state.est_views) >= 2:
        x1 = np.asarray(state.est_views[-1], np.float64)
        x2 = np.asarray(state.est_views[-2], np.float64)
        pred = x1 @ np.linalg.inv(x2) @ x1
        from .lie import orthonormalize_view
        view0 = jnp.asarray(
            orthonormalize_view(jnp.asarray(pred, jnp.float32)))
    else:
        view0 = state.est_views[-1]
    view, loss, _ = track_frame(state.model, view0, frame, rcfg,
                                scfg.tracking, cam_t,
                                mesh=scfg.mesh, tile_axis=scfg.tile_axis,
                                map_axis=scfg.map_axis,
                                map_budget=scfg.map_budget_per_shard)

    def _coverage_render(v):
        out = render_model(state.model, Camera(
            viewmatrix=v, tanfovx=cam_t.tanfovx, tanfovy=cam_t.tanfovy,
            height=cam_t.height, width=cam_t.width), rcfg)
        sil = np.asarray(out.opacity_map[0])
        dv = np.asarray(frame.depth) > 0
        cov = float((sil > 0.5)[dv].mean()) if dv.any() else 1.0
        return out, cov

    # relocalization: flag the frame lost when the converged cost spikes
    # above the recent baseline OR the silhouette coverage collapses (a
    # lost pose masks away most residual pixels, so its COST can look
    # healthy — coverage is the reliable loss signal).  Retry from the
    # nearest keyframe poses; keep the best coverage-normalized cost.
    # Uses >= 4 frames of history so the very first spiky frames cannot
    # fire it with a meaningless baseline.
    out = cov = None
    if scfg.reloc_spike > 0 and len(state.track_costs) >= 4:
        base = float(np.median(state.track_costs[-8:]))
        out, cov = _coverage_render(view)
        if (float(loss) > scfg.reloc_spike * max(base, 1e-12)
                or cov < scfg.reloc_min_coverage):
            v0 = np.asarray(view0, np.float64)
            c0 = -v0[3, :3] @ np.linalg.inv(v0[:3, :3]).T
            ax0 = v0[:3, 2]

            def _dist(v):
                v = np.asarray(v, np.float64)
                c = -v[3, :3] @ np.linalg.inv(v[:3, :3]).T
                return (np.linalg.norm(c - c0)
                        + 2.0 * (1.0 - float(v[:3, 2] @ ax0)))

            nscore = lambda l, cv: float(l) / max(cv, 0.05)
            best = nscore(loss, cov)
            # candidate re-tracks start a keyframe-gap away from the
            # basin by construction — always coarse-to-fine (pyramid>=2
            # doubles the convergence basin per level; a single-level GN
            # from the nearest keyframe measured 0 improvement on the
            # procedural scene, pyramid 2 recovers it)
            tcfg_r = dataclasses.replace(
                scfg.tracking,
                iters=(scfg.reloc_track_iters
                       if scfg.reloc_track_iters > 0
                       else scfg.tracking.iters),
                pyramid=max(scfg.tracking.pyramid, 2))
            order = np.argsort([_dist(v) for v in state.kf_views])
            for i in order[:max(scfg.reloc_candidates, 0)]:
                v2, l2, _ = track_frame(
                    state.model, state.kf_views[i], frame, rcfg,
                    tcfg_r, cam_t, mesh=scfg.mesh,
                    tile_axis=scfg.tile_axis, map_axis=scfg.map_axis,
                    map_budget=scfg.map_budget_per_shard)
                out2, cov2 = _coverage_render(v2)
                s2 = nscore(l2, cov2)
                if s2 < best:
                    best, view, loss, out, cov = s2, v2, l2, out2, cov2
    state.track_costs.append(float(loss))
    state.est_views.append(view)

    kf_due = frame_idx % scfg.keyframe_every == 0
    cov_trigger = False
    cooled = (not state.kf_idx
              or frame_idx - state.kf_idx[-1] >= scfg.kf_coverage_cooldown)
    if scfg.kf_min_coverage > 0 and not kf_due and cooled:
        if cov is None:
            out, cov = _coverage_render(view)
        cov_trigger = cov < scfg.kf_min_coverage

    if kf_due or cov_trigger:
        state.kf_views.append(view)
        state.kf_frames.append(frame)
        state.kf_idx.append(frame_idx)
        # seed unobserved regions: pixels with low silhouette
        if out is None:
            out = render_model(state.model, Camera(
                viewmatrix=view, tanfovx=cam_t.tanfovx,
                tanfovy=cam_t.tanfovy, height=cam_t.height,
                width=cam_t.width), rcfg)
        # React to the instance budget filling up: ``num_rendered`` is the
        # TRUE (uncapped) count (ops/binning.py), so growing the budget when
        # a keyframe's view reaches 80% keeps the "overflow is reported,
        # never silent" contract *actionable* — without this, a scene that
        # outgrows the boot-time budget silently drops its deepest instances
        # for the rest of the run.  Growing max_instances re-jits the
        # track/map graphs once per growth (rare: counts rise with map
        # maturity, and 2.5x headroom matches init_slam's sizing).
        if (rcfg.max_instances is not None
                and int(out.num_rendered) > 0.8 * rcfg.max_instances):
            budget = int(-(-int(out.num_rendered) * 2.5 // 1024) * 1024)
            state.raster = rcfg = rcfg.replace(max_instances=budget)
        sil = np.asarray(out.opacity_map[0])
        holes = Frame(
            rgb=frame.rgb,
            depth=jnp.where(jnp.asarray(sil) < 0.5, frame.depth, 0.0),
        )
        means, colors, scales = backproject(holes, view, cam_t,
                                            scfg.seed_every_px)
        if means.shape[0] > 0:
            state.model, _ = add_gaussians(state.model, means, colors,
                                           scales)

    if (scfg.refine_every and len(state.kf_views) >= 3
            and frame_idx % (scfg.refine_every * scfg.keyframe_every) == 0):
        # periodic pose-graph refinement over the keyframe chain (CG-SLAM
        # runs this alongside mapping; the map itself lives in world frame
        # and adapts through subsequent mapping windows)
        state = refine_keyframes(state, scfg, cam_t)

    if ((frame_idx % scfg.map_every == 0 or cov_trigger)
            and len(state.kf_views) >= 1):
        # window: always the latest keyframe (anchors the map to the current
        # viewpoint) + older ones chosen per scfg.window_select
        idx = _select_window(state, scfg, frame_idx)
        kviews = jnp.stack([state.kf_views[i] for i in idx])
        krgbs = jnp.stack([state.kf_frames[i].rgb for i in idx])
        kdepths = jnp.stack([state.kf_frames[i].depth for i in idx])
        state.rng, sub = jax.random.split(state.rng)
        mcfg = scfg.mapping
        if cov_trigger and scfg.coverage_map_iters > 0:
            mcfg = dataclasses.replace(mcfg, iters=scfg.coverage_map_iters)
        state.model, state.opt_state, state.dstate, mloss = mapping_round(
            state.model, state.opt_state, state.dstate,
            (kviews, krgbs, kdepths), rcfg, mcfg, cam_t, sub,
            **_dist_kw(scfg))
    return state, float(loss)


def _select_window(state: SLAMState, scfg: SLAMConfig,
                   frame_idx: int) -> np.ndarray:
    """Keyframe indices for one mapping round (latest always included)."""
    k = len(state.kf_views)
    n_extra = min(scfg.window, k) - 1
    if k <= 1 or n_extra <= 0:
        return np.array([k - 1])
    rng = np.random.RandomState(frame_idx)
    if scfg.window_select == "nearest":
        # rank older keyframes by pose proximity to the current view:
        # camera-center distance + gaze-direction penalty (row convention:
        # center c = -t @ R^T, optical axis = column 2 of R)
        views = np.stack([np.asarray(v, np.float64)
                          for v in state.kf_views])
        rot, t = views[:, :3, :3], views[:, 3, :3]
        centers = -np.einsum("kj,kij->ki", t, rot)
        axes = rot[:, :, 2]
        score = (np.linalg.norm(centers[:-1] - centers[-1], axis=-1)
                 + 2.0 * (1.0 - axes[:-1] @ axes[-1]))
        order = np.argsort(score)
        n_near = n_extra - 1 if n_extra >= 2 and k - 1 > n_extra else n_extra
        older = list(order[:n_near])
        rest = [i for i in range(k - 1) if i not in older]
        if len(older) < n_extra and rest:
            older += list(rng.choice(rest, size=min(n_extra - len(older),
                                                    len(rest)),
                          replace=False))
    else:
        older = rng.choice(k - 1, size=min(n_extra, k - 1), replace=False)
    return np.concatenate([[k - 1], older]).astype(int)


def run_slam(dataset, scfg: SLAMConfig, cam_t: Camera,
             max_frames: Optional[int] = None, verbose: bool = False):
    """Track + map an RGB-D sequence.  `dataset` yields (gt_view, Frame).

    The first pose initializes the trajectory (standard SLAM evaluation
    protocol).  Returns (state, gt_views).
    """
    it = iter(dataset)
    gt0, f0 = next(it)
    state = init_slam(jnp.asarray(gt0), f0, cam_t, scfg)
    gt_views = [gt0]
    frames_kept = [f0] if scfg.final_retrack_iters > 0 else None
    for i, (gt, frame) in enumerate(it, start=1):
        if max_frames is not None and i >= max_frames:
            break
        state, loss = slam_step(state, frame, cam_t, scfg, i)
        gt_views.append(gt)
        if frames_kept is not None:
            frames_kept.append(frame)
        if verbose and i % 10 == 0:
            print(f"frame {i}: track loss {loss:.4f}, "
                  f"active {int(state.model.num_active)}")
    if scfg.pose_graph_refine and len(state.kf_views) >= 3:
        state = refine_keyframes(state, scfg, cam_t)
    if frames_kept is not None:
        state = final_retrack(state, frames_kept, scfg, cam_t,
                              verbose=verbose)
    return state, gt_views


def final_retrack(state: SLAMState, frames, scfg: SLAMConfig,
                  cam_t: Camera, verbose: bool = False) -> SLAMState:
    """Offline polish: re-track every frame against the FINAL map.

    The online trajectory tracked each frame against the map as it existed
    THEN; frames from the early, immature map carry that era's geometry
    error forever.  Re-tracking from the converged estimate against the
    final map (frozen; pose-only exact GN, one dual render/iteration) is
    the direct-method analogue of the global bundle-adjust polish every
    offline SLAM evaluation runs.  Frame 0 is the trajectory gauge and
    stays fixed.  The pre-polish trajectory is preserved on
    ``state.online_views``.
    """
    rcfg = state.raster if state.raster is not None else scfg.raster
    tcfg = dataclasses.replace(scfg.tracking,
                               iters=scfg.final_retrack_iters)
    state.online_views = list(state.est_views)
    for f in range(1, len(frames)):
        v, c, _ = track_frame(
            state.model, state.est_views[f], frames[f], rcfg, tcfg, cam_t,
            mesh=scfg.mesh, tile_axis=scfg.tile_axis,
            map_axis=scfg.map_axis, map_budget=scfg.map_budget_per_shard)
        state.est_views[f] = v
        if verbose and f % 20 == 0:
            print(f"polish frame {f}: cost {float(c):.4f}")
    return state


def _dist_kw(scfg: SLAMConfig) -> dict:
    """mapping_round distribution kwargs from the SLAM config."""
    return dict(mesh=scfg.mesh, kf_axis=scfg.kf_axis,
                tile_axis=scfg.tile_axis, map_axis=scfg.map_axis,
                map_budget=scfg.map_budget_per_shard)


def refine_keyframes(state: SLAMState, scfg: SLAMConfig = None,
                     cam_t: Camera = None):
    """Pose-graph refinement over the keyframe chain + trajectory update.

    Odometry edges are taken from the estimated chain, so by themselves
    they are residual-free; the *information* comes from re-tracking each
    keyframe against the matured map (``refine_track_iters`` exact-GN
    iterations via the dual-render Jacobian) — each re-tracked pose enters
    as a map-anchored edge from the gauge-fixed first pose, weighted
    ``refine_abs_weight``, and the solver fuses them with the odometry
    chain.  Corrections are then propagated to the full trajectory
    (``est_views``): every frame inherits the correction of its latest
    preceding keyframe, ``V_f' = V_f @ inv(V_kf) @ V_kf'``.

    Solvers: native C++ Gauss-Newton (csrc/pose_graph.cpp) on one device;
    the edge-sharded collective solver with ``scfg.mesh`` (same chordal
    SE(3) objective, normal equations psum'd over ICI).
    """
    from . import lie

    k = len(state.kf_views)
    old = np.stack([np.asarray(v, np.float64) for v in state.kf_views])
    edges, zs, ws = [], [], []
    for i in range(k - 1):
        edges.append((i, i + 1))
        # row-convention relative: Vj @ inv(Vi) == (Xi^-1 Xj)^T
        zs.append(old[i + 1] @ np.linalg.inv(old[i]))
        ws.append(1.0)
    if (scfg is not None and cam_t is not None
            and scfg.refine_track_iters > 0):
        rcfg = state.raster if state.raster is not None else scfg.raster
        tcfg = dataclasses.replace(scfg.tracking,
                                   iters=scfg.refine_track_iters)
        inv0 = np.linalg.inv(old[0])
        retracked = []
        for j in range(1, k):
            v2, c2, _ = track_frame(
                state.model, jnp.asarray(old[j], jnp.float32),
                state.kf_frames[j], rcfg, tcfg, cam_t,
                mesh=scfg.mesh, tile_axis=scfg.tile_axis,
                map_axis=scfg.map_axis,
                map_budget=scfg.map_budget_per_shard)
            retracked.append((j, np.asarray(v2, np.float64), float(c2)))
        # robust gate baseline: median of the LOWER HALF of costs.  The
        # plain median is contaminated when half or more of the keyframes
        # re-track badly (early runs, immature map) — it then lets every
        # wrong weight-4 absolute edge through; the lower-half median
        # tracks the well-re-tracked population instead, so mass-outlier
        # rounds degrade gracefully (most edges gated, odometry holds).
        if retracked:
            cs = np.sort([c for _, _, c in retracked])
            cmed = float(np.median(cs[:max(1, (len(cs) + 1) // 2)]))
        else:
            cmed = 0.0
        for j, v2, c in retracked:
            if (scfg.refine_cost_gate > 0
                    and c > scfg.refine_cost_gate * max(cmed, 1e-12)):
                continue        # immature-map re-track; odometry holds j
            edges.append((0, j))
            zs.append(v2 @ inv0)
            ws.append(scfg.refine_abs_weight)
    if scfg is not None:
        # the chordal GN solver runs the identical math on one device
        # (mesh=None) and edge-sharded over a mesh, so single- and
        # multi-device SLAM trajectories stay comparable
        from ..parallel.sharded import refine_poses_sharded
        mesh = scfg.mesh
        axis = "kf"
        if mesh is not None:
            axis = (scfg.kf_axis if scfg.kf_axis in mesh.axis_names
                    else mesh.axis_names[0])
        refined = refine_poses_sharded(
            old.astype(np.float32), np.asarray(edges, np.int32),
            np.stack(zs).astype(np.float32), mesh=mesh, axis=axis,
            iters=5, weights=np.asarray(ws, np.float32))
    else:
        # bare-state call: the native C++ Gauss-Newton solver
        # (csrc/pose_graph.cpp)
        from .. import native
        refined, _ = native.pose_graph_optimize(
            old, np.asarray(edges), np.stack(zs), iters=5,
            weights=np.asarray(ws))
    refined = [np.asarray(v, np.float64) for v in refined]
    state.kf_views = [jnp.asarray(v, jnp.float32) for v in refined]

    # move map content WITH the corrected keyframes (see reanchor_map);
    # bare-state calls (scfg=None) default to re-anchoring too
    if scfg is None or scfg.reanchor:
        state.model = reanchor_map(state.model, old, refined)

    # trajectory update: correction of the latest preceding keyframe
    if state.kf_idx and state.est_views:
        corr = [np.linalg.inv(o) @ r for o, r in zip(old, refined)]
        j = 0
        for f in range(len(state.est_views)):
            while j + 1 < len(state.kf_idx) and state.kf_idx[j + 1] <= f:
                j += 1
            v = np.asarray(state.est_views[f], np.float64) @ corr[j]
            state.est_views[f] = jnp.asarray(
                lie.orthonormalize_view(jnp.asarray(v, jnp.float32)))
    return state


def reanchor_map(model: GaussianModel, old_views, new_views):
    """Transform map Gaussians by their anchor keyframe's pose correction.

    After ``refine_keyframes`` moves keyframe poses, Gaussians created from
    the old poses are inconsistent with the corrected trajectory — on real
    loop closures this ghosts the map (the reference ships no mapping layer
    at all; CG-SLAM anchors map content to keyframes the same way).  Each
    active Gaussian is assigned to its nearest old keyframe camera center
    and moved so its *camera-frame* coordinates under that keyframe are
    preserved: row-convention ``[p', 1] = [p, 1] @ V_old @ inv(V_new)``.
    Covariances rotate along: ``R' = A @ R(q)`` with ``A`` the world-space
    rotation of the correction, applied as a quaternion composition
    (exact for unit quaternions; for the reference's unnormalized-quat
    convention the error is O((1 - |q|^2) * |correction|), second-order
    small for the near-unit quats mapping produces).

    Returns the re-anchored model (inactive slots untouched).
    """
    from . import lie

    old = jnp.stack([jnp.asarray(v, jnp.float32) for v in old_views])
    new = jnp.stack([jnp.asarray(v, jnp.float32) for v in new_views])
    # [p,1] @ V_old = [p',1] @ V_new  =>  M_k = V_old_k @ inv(V_new_k)
    corr = old @ jnp.linalg.inv(new)                        # [K, 4, 4]
    # camera centers of the OLD poses (row convention: 0 = c @ V[:3,:3]
    # + V[3,:3], rotation block orthonormal after refinement)
    centers = -jnp.einsum("kj,kij->ki", old[:, 3, :3],
                          old[:, :3, :3])                   # [K, 3]
    d2 = jnp.sum((model.means3D[:, None, :] - centers[None]) ** 2, -1)
    anchor = jnp.argmin(d2, axis=1)                          # [P]
    mg = corr[anchor]                                        # [P, 4, 4]
    means_new = (jnp.einsum("pi,pij->pj", model.means3D, mg[:, :3, :3])
                 + mg[:, 3, :3])
    # column-vector world rotation of the correction: p'_col = A p_col + b
    a_rot = jnp.swapaxes(mg[:, :3, :3], 1, 2)
    q_corr = lie.quat_from_rotmat(a_rot)
    quats_new = lie.quat_mul(q_corr, model.rotations)
    act = model.active
    return model.replace(
        means3D=jnp.where(act[:, None], means_new, model.means3D),
        rotations=jnp.where(act[:, None], quats_new, model.rotations),
    )


def save_slam(path: str, state: SLAMState):
    """Checkpoint the full SLAM session for resume (orbax).

    Persists the map, optimizer and densify state, keyframe window
    (poses + frames + frame indices), and the estimated trajectory —
    everything `slam_step` needs to continue.  Optimizer/densify pytrees
    are stored as flat leaf lists (their structure is code-defined and
    rebuilt at load; orbax's name-keyed dict round-trip would reorder
    namedtuple fields alphabetically).
    """
    from ..utils.checkpoint import _ckpt

    ocp = _ckpt()
    payload = {
        "model": state.model,
        # zero-padded keys: orbax round-trips lists as name-keyed dicts
        # whose restore order is lexicographic
        "opt_leaves": {f"{i:04d}": leaf for i, leaf in
                       enumerate(jax.tree.leaves(state.opt_state))},
        "dstate_leaves": {f"{i:04d}": leaf for i, leaf in
                          enumerate(jax.tree.leaves(state.dstate))},
        "est_views": jnp.stack([jnp.asarray(v) for v in state.est_views]),
        "kf_views": jnp.stack([jnp.asarray(v) for v in state.kf_views]),
        "kf_idx": jnp.asarray(state.kf_idx, jnp.int32),
        "kf_rgb": jnp.stack([jnp.asarray(f.rgb) for f in state.kf_frames]),
        "kf_depth": jnp.stack([jnp.asarray(f.depth)
                               for f in state.kf_frames]),
        "rng": state.rng,
        "max_instances": jnp.asarray(
            -1 if state.raster is None or state.raster.max_instances is None
            else state.raster.max_instances, jnp.int32),
    }
    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
        ckptr.save(path, payload, force=True)


def load_slam(path: str, scfg: SLAMConfig) -> SLAMState:
    """Restore a SLAM session saved by :func:`save_slam`.

    ``scfg`` must match the saved run's capacity and mapping config (the
    optimizer structure is rebuilt from it)."""
    import dataclasses as dc

    from ..utils.checkpoint import _ckpt
    from .gaussians import init_model
    from .slam import Frame, make_map_optimizer, model_params

    ocp = _ckpt()
    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
        p = ckptr.restore(path)
    model_like = init_model(scfg.capacity, sh_degree=0)
    model = dc.replace(model_like, **p["model"]) \
        if isinstance(p["model"], dict) else p["model"]
    def leaves_of(d):
        return [d[k] for k in sorted(d)]

    opt_like = make_map_optimizer(scfg.mapping).init(model_params(model))
    opt_state = jax.tree.unflatten(jax.tree.structure(opt_like),
                                   leaves_of(p["opt_leaves"]))
    d_like = DensifyState.zero(scfg.capacity)
    dstate = jax.tree.unflatten(jax.tree.structure(d_like),
                                leaves_of(p["dstate_leaves"]))
    mi = int(p["max_instances"])
    raster = None if mi < 0 else scfg.raster.replace(max_instances=mi)
    frames = [Frame(rgb=p["kf_rgb"][i], depth=p["kf_depth"][i])
              for i in range(p["kf_rgb"].shape[0])]
    return SLAMState(
        model=model, opt_state=opt_state, dstate=dstate,
        kf_views=[p["kf_views"][i] for i in range(p["kf_views"].shape[0])],
        kf_frames=frames,
        est_views=[p["est_views"][i]
                   for i in range(p["est_views"].shape[0])],
        rng=p["rng"],
        kf_idx=[int(i) for i in np.asarray(p["kf_idx"])],
        raster=raster,
    )
