"""Tracking & mapping loops on a synthetic RGB-D sequence.

BASELINE config 3 (pose-only tracking, map_off) and config 4 (mapping with
densify + uncertainty outputs) in miniature, CPU-sized.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diff_gaussian_rasterization_tpu.camera import Camera
from diff_gaussian_rasterization_tpu.config import RasterConfig
from diff_gaussian_rasterization_tpu.models import lie
from diff_gaussian_rasterization_tpu.models.gaussians import (
    DensifyState, init_model,
)
from diff_gaussian_rasterization_tpu.models.slam import (
    Frame, MappingConfig, TrackingConfig, make_map_optimizer, map_step,
    model_params, render_model, track_frame,
)
from diff_gaussian_rasterization_tpu.io.synthetic import (
    orbit_trajectory, random_room_model, render_sequence,
)

CFG = RasterConfig(tile_h=8, tile_w=8, chunk=16, instance_multiplier=12)
H, W = 48, 64
CAM_T = Camera(viewmatrix=jnp.eye(4), tanfovx=0.7, tanfovy=0.55,
               height=H, width=W)


def make_world(n=512, capacity=512):
    model = random_room_model(capacity=capacity, n=n, seed=0)
    views = orbit_trajectory(4)
    frames = render_sequence(model, views, CAM_T, CFG)
    return model, views, frames


def pose_error(view_a, view_b):
    """Rotation (rad) + translation (m) error between two row-convention
    view matrices."""
    ra = np.asarray(view_a)[:3, :3].T
    rb = np.asarray(view_b)[:3, :3].T
    dr = ra @ rb.T
    cos = np.clip((np.trace(dr) - 1) / 2, -1, 1)
    rot_err = float(np.arccos(cos))
    ta = np.asarray(view_a)[3, :3]
    tb = np.asarray(view_b)[3, :3]
    return rot_err, float(np.linalg.norm(ta - tb))


def test_tracking_recovers_pose():
    model, views, frames = make_world()
    true_view = views[1]
    # perturb the true pose and recover it by tracking
    xi = jnp.asarray([0.02, -0.015, 0.01, 0.008, -0.01, 0.006])
    view0 = lie.apply_twist(true_view, xi)
    r0, t0 = pose_error(view0, true_view)

    tcfg = TrackingConfig(iters=12, sil_threshold=0.95)
    view_opt, best_loss, losses = track_frame(
        model, view0, frames[1], CFG, tcfg, CAM_T)
    r1, t1 = pose_error(view_opt, true_view)
    assert r1 < r0 * 0.35, (r0, r1)
    assert t1 < t0 * 0.35, (t0, t1)
    assert float(best_loss) < float(losses[0])


def test_tracking_gn_fd_recovers_pose():
    # central-difference GN/LM on the fast forward path (TrackingConfig
    # method="gn_fd") must converge at least as tightly as exact GN
    model, views, frames = make_world()
    true_view = views[1]
    xi = jnp.asarray([0.02, -0.015, 0.01, 0.008, -0.01, 0.006])
    view0 = lie.apply_twist(true_view, xi)
    r0, t0 = pose_error(view0, true_view)

    tcfg = TrackingConfig(iters=8, method="gn_fd", sil_threshold=0.95)
    view_opt, best_loss, losses = track_frame(
        model, view0, frames[1], CFG, tcfg, CAM_T)
    r1, t1 = pose_error(view_opt, true_view)
    assert r1 < r0 * 0.35, (r0, r1)
    assert t1 < t0 * 0.35, (t0, t1)


def test_mapping_improves_model():
    gt_model, views, frames = make_world()
    # corrupt colors and opacities; mapping should pull them back
    rng = np.random.RandomState(1)
    bad = gt_model.replace(
        sh=gt_model.sh + jnp.asarray(
            rng.normal(scale=0.2, size=gt_model.sh.shape), jnp.float32),
        opacities_logit=gt_model.opacities_logit - 1.0,
    )
    mcfg = MappingConfig(iters=0, lr_means=0.0, lr_scales=1e-3,
                         lr_rotations=0.0, lr_opacities=5e-2, lr_sh=2e-2)
    opt = make_map_optimizer(mcfg)
    opt_state = opt.init(model_params(bad))
    dstate = DensifyState.zero(bad.capacity)

    kviews = jnp.stack([views[0], views[2]])
    krgbs = jnp.stack([frames[0].rgb, frames[2].rgb])
    kdepths = jnp.stack([frames[0].depth, frames[2].depth])

    model = bad
    losses = []
    for _ in range(25):
        model, opt_state, dstate, loss, _ = map_step(
            model, opt_state, dstate, kviews, krgbs, kdepths,
            jnp.ones((2,), jnp.float32), CFG, mcfg,
            H, W, CAM_T.tanfovx, CAM_T.tanfovy, 2)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.6, losses[:3] + losses[-3:]
    # densify statistics were accumulated
    assert float(dstate.denom.max()) > 0


def test_densify_clone_and_split():
    # regression: the split-source shrink used a (N,) mask against (N,3)
    from diff_gaussian_rasterization_tpu.models.gaussians import (
        densify_and_prune, init_model,
    )
    rng = np.random.RandomState(0)
    n, cap = 32, 128
    model = init_model(cap, sh_degree=0,
                       means=jnp.asarray(rng.normal(size=(n, 3)), jnp.float32),
                       colors=jnp.asarray(rng.uniform(0, 1, (n, 3)),
                                          jnp.float32),
                       scales=jnp.asarray(
                           np.where(rng.uniform(size=(n, 3)) < 0.5,
                                    0.002, 0.2), np.float32),
                       opacity=0.8)
    dstate = DensifyState(
        grad_accum=jnp.full((cap,), 1.0),   # everyone above threshold
        denom=jnp.ones((cap,)),
    )
    m2, dstate2, n_spawned = densify_and_prune(
        model, dstate, grad_threshold=1e-3, rng=jax.random.PRNGKey(0))
    assert int(n_spawned) > 0
    assert int(m2.num_active) == n + int(n_spawned)
    assert bool(jnp.all(jnp.isfinite(m2.means3D)))
    assert float(dstate2.grad_accum.max()) == 0.0


@pytest.mark.quick
def test_track_frame_is_jit_stable():
    model, views, frames = make_world(n=128, capacity=128)
    tcfg = TrackingConfig(iters=3)
    v1, l1, _ = track_frame(model, views[0], frames[0], CFG, tcfg, CAM_T)
    v2, l2, _ = track_frame(model, views[1], frames[1], CFG, tcfg, CAM_T)
    assert np.all(np.isfinite(np.asarray(v1)))
    assert np.all(np.isfinite(np.asarray(v2)))


@pytest.mark.quick
def test_downsample_frame_valid_aware():
    from diff_gaussian_rasterization_tpu.models.slam import downsample_frame

    rgb = jnp.arange(2 * 4 * 8, dtype=jnp.float32).reshape(2, 4, 8) / 64.0
    depth = jnp.asarray([[1.0, 0.0, 2.0, 2.0, 0.0, 0.0, 0.0, 0.0],
                         [3.0, 0.0, 2.0, 2.0, 0.0, 0.0, 0.0, 0.0],
                         [1.0, 1.0, 1.0, 1.0, 5.0, 5.0, 5.0, 5.0],
                         [1.0, 1.0, 1.0, 1.0, 5.0, 5.0, 5.0, 5.0]])
    f2 = downsample_frame(
        __import__("diff_gaussian_rasterization_tpu.models.slam",
                   fromlist=["Frame"]).Frame(rgb, depth), 2)
    assert f2.rgb.shape == (2, 2, 4) and f2.depth.shape == (2, 4)
    # rgb mean-pools every 2x2 window
    np.testing.assert_allclose(
        np.asarray(f2.rgb[0, 0, 0]), np.mean([0, 1, 8, 9]) / 64.0, rtol=1e-6)
    # depth pools only over valid (> 0) pixels; all-invalid windows stay 0
    np.testing.assert_allclose(np.asarray(f2.depth[0]), [2.0, 2.0, 0.0, 0.0])
    np.testing.assert_allclose(np.asarray(f2.depth[1]), [1.0, 1.0, 5.0, 5.0])


def test_tracking_pyramid_recovers_pose():
    """Coarse-to-fine tracking (pyramid=2): the coarse level must hand the
    full-res level a pose it can polish — end accuracy in the same class as
    single-level on a moderate perturbation, and strictly better than the
    perturbation."""
    model, views, frames = make_world()
    true_view = views[1]
    xi = jnp.asarray([0.02, -0.015, 0.01, 0.008, -0.01, 0.006])
    view0 = lie.apply_twist(true_view, xi)
    r0, t0 = pose_error(view0, true_view)

    tcfg = TrackingConfig(iters=12, sil_threshold=0.95, pyramid=2,
                          coarse_iters=5)
    view_opt, best_loss, losses = track_frame(
        model, view0, frames[1], CFG, tcfg, CAM_T)
    r1, t1 = pose_error(view_opt, true_view)
    assert r1 < r0 * 0.5, (r0, r1)
    assert t1 < t0 * 0.5, (t0, t1)


def test_tracking_pyramid_extends_convergence_basin():
    """The pyramid's reason to exist: an ~18 px pan (0.24 rad at 96x128)
    is outside single-level GN's basin but inside the half-res level's.
    Measured A/B (see BASELINE.md round 3): pyr=1 leaves >0.1 rad error,
    pyr=2 recovers to ~1e-3."""
    from diff_gaussian_rasterization_tpu.io.synthetic import (
        replica_like_model, walkthrough_trajectory,
    )

    h, w = 96, 128
    cam_t = Camera(viewmatrix=jnp.eye(4), tanfovx=0.82, tanfovy=0.62,
                   height=h, width=w)
    cfg = RasterConfig(tile_h=8, tile_w=16, chunk=32,
                       instance_multiplier=10)
    model = replica_like_model(wall_res=32, n_boxes=4)
    views = walkthrough_trajectory(3)
    frames = render_sequence(model, views, cam_t, cfg)
    true_view = views[1]
    xi = jnp.asarray([0.02, 0.0, 0.02, 0.02, 0.24, 0.0], jnp.float32)
    view0 = lie.apply_twist(true_view, xi)
    r0, _ = pose_error(view0, true_view)

    def run(pyr):
        tcfg = TrackingConfig(iters=10, sil_threshold=0.85, w_depth=1.5,
                              pyramid=pyr, coarse_iters=6)
        v, _, _ = track_frame(model, view0, frames[1], cfg, tcfg, cam_t)
        return pose_error(v, true_view)

    r_flat, t_flat = run(1)
    r_pyr, t_pyr = run(2)
    # bound is 0.02 (not 0.01): the deferred-accept default spends its
    # first iteration evaluating the anchor, so the same iteration budget
    # converges one step looser; the structural claim (pyramid recovers,
    # 18x down from 0.24, flat stays lost) is unchanged
    assert r_pyr < 0.02 and t_pyr < 0.02, (r_pyr, t_pyr)
    assert r_flat > 5 * r_pyr, (r_flat, r_pyr)  # flat stays lost


@pytest.mark.quick
def test_tracking_frozen_binning_deferred_accept():
    """freeze_binning (bin once per frame, margin slack) +
    line_search=False (deferred accept, one dual render per iteration)
    must still recover the pose — the per-frame fast path for GN
    tracking throughput."""
    model, views, frames = make_world()
    true_view = views[1]
    xi = jnp.asarray([0.02, -0.015, 0.01, 0.008, -0.01, 0.006])
    view0 = lie.apply_twist(true_view, xi)
    r0, t0 = pose_error(view0, true_view)

    tcfg = TrackingConfig(iters=12, sil_threshold=0.95,
                          freeze_binning=True, bin_margin_px=6.0,
                          line_search=False)
    view_opt, best_loss, losses = track_frame(
        model, view0, frames[1], CFG, tcfg, CAM_T)
    r1, t1 = pose_error(view_opt, true_view)
    assert r1 < r0 * 0.35, (r0, r1)
    assert t1 < t0 * 0.35, (t0, t1)
