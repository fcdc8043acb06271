"""Full SLAM pipeline (tracking + keyframes + mapping) on a tiny synthetic
sequence — BASELINE config 5 in miniature (single-host here; the sharded
variants are covered by test_sharding.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diff_gaussian_rasterization_tpu.camera import Camera
from diff_gaussian_rasterization_tpu.config import RasterConfig
from diff_gaussian_rasterization_tpu.io.replica import ate_rmse
from diff_gaussian_rasterization_tpu.io.synthetic import (
    orbit_trajectory, random_room_model, render_sequence,
)
from diff_gaussian_rasterization_tpu.models.runner import (
    SLAMConfig, run_slam,
)
from diff_gaussian_rasterization_tpu.models.slam import (
    Frame, MappingConfig, TrackingConfig,
)

H, W = 40, 56
CAM_T = Camera(viewmatrix=jnp.eye(4), tanfovx=0.7, tanfovy=0.55,
               height=H, width=W)


def test_slam_end_to_end_tracks_synthetic_sequence():
    cfg = RasterConfig(tile_h=8, tile_w=8, chunk=16, instance_multiplier=12)
    gt_model = random_room_model(capacity=768, n=768, seed=0)
    views = orbit_trajectory(9)
    frames = render_sequence(gt_model, views, CAM_T, cfg)

    scfg = SLAMConfig(
        raster=cfg,
        tracking=TrackingConfig(iters=10, sil_threshold=0.5),
        mapping=MappingConfig(iters=15),
        capacity=4096,
        keyframe_every=2,
        map_every=2,
        window=2,
        seed_every_px=2,
        init_iters=60,
        motion_model=False,  # amplifies map bias on this tiny scene
    )
    data = list(zip([np.asarray(v) for v in views], frames))
    state, gt_views = run_slam(data, scfg, CAM_T)

    assert len(state.est_views) == len(gt_views)
    ate = ate_rmse(state.est_views, [jnp.asarray(v) for v in gt_views])
    # identity (no-tracking) trajectory error for this orbit is ~0.2 m;
    # tracking must do much better.  On this 40x56 / 768-blob scene the
    # per-frame pose accuracy is bounded by single-view map bias (~0.045 m
    # even when tracking starts at the true pose), so the bound is 0.6x,
    # not an arbitrary tighter one.
    ate_static = ate_rmse([views[0]] * len(gt_views),
                          [jnp.asarray(v) for v in gt_views])
    assert ate < ate_static * 0.6, (ate, ate_static)
    assert int(state.model.num_active) > 0


def test_pose_graph_refine_recovers_injected_error():
    """Refinement re-tracks keyframes against the matured map and fuses
    them with odometry edges in the pose-graph solver; an injected
    keyframe pose error must shrink substantially, the correction must
    propagate to the trailing trajectory frames, and refinement of an
    unperturbed run must not blow the ATE up (it is map-anchored, so on
    this map-bias-limited toy it cannot *improve* it either)."""
    import copy
    from diff_gaussian_rasterization_tpu.models import lie
    from diff_gaussian_rasterization_tpu.models.runner import (
        refine_keyframes,
    )
    cfg = RasterConfig(tile_h=8, tile_w=8, chunk=16, instance_multiplier=12)
    gt_model = random_room_model(capacity=768, n=768, seed=0)
    views = orbit_trajectory(9)
    frames = render_sequence(gt_model, views, CAM_T, cfg)
    scfg = SLAMConfig(
        raster=cfg, tracking=TrackingConfig(iters=10, sil_threshold=0.5),
        mapping=MappingConfig(iters=15), capacity=4096, keyframe_every=2,
        map_every=2, window=2, seed_every_px=2, init_iters=60,
        motion_model=False, pose_graph_refine=False,
    )
    data = list(zip([np.asarray(v) for v in views], frames))
    state, gt_views = run_slam(data, scfg, CAM_T)
    gtv = [jnp.asarray(v) for v in gt_views]
    ate0 = ate_rmse(state.est_views, gtv)

    ref = refine_keyframes(copy.copy(state), scfg, CAM_T)
    for v in ref.kf_views:
        assert np.all(np.isfinite(np.asarray(v)))
    ate1 = ate_rmse(ref.est_views, gtv)
    assert ate1 < ate0 * 1.15, (ate0, ate1)

    bad = copy.copy(state)
    bad.kf_views = list(state.kf_views)
    bad.est_views = list(state.est_views)
    xi = jnp.asarray([0.03, -0.02, 0.015, 0.02, -0.015, 0.02], jnp.float32)
    pert = lie.apply_twist(bad.kf_views[-1], xi)
    err0 = float(jnp.abs(pert - state.kf_views[-1]).max())
    bad.kf_views[-1] = pert
    bad.est_views[-1] = lie.apply_twist(bad.est_views[-1], xi)
    fixed = refine_keyframes(bad, scfg, CAM_T)
    err1 = float(jnp.abs(fixed.kf_views[-1] - state.kf_views[-1]).max())
    assert err1 < err0 * 0.5, (err0, err1)
    # the correction reached the trailing est frame too
    traj_err = float(jnp.abs(fixed.est_views[-1]
                             - state.est_views[-1]).max())
    assert traj_err < err0 * 0.75, (err0, traj_err)


def test_run_slam_mesh_matches_single_device():
    """Full SLAM on an 8-device virtual mesh (keyframe-sharded mapping x
    tile-sharded rendering + collective pose-graph refinement) must
    reproduce the single-device trajectory within collective-summation
    tolerance (VERDICT r1 item 5 / BASELINE config 5)."""
    import jax
    from jax.sharding import Mesh

    cfg = RasterConfig(tile_h=8, tile_w=8, chunk=16, instance_multiplier=12)
    gt_model = random_room_model(capacity=768, n=768, seed=0)
    views = orbit_trajectory(7)
    frames = render_sequence(gt_model, views, CAM_T, cfg)

    def run(mesh):
        scfg = SLAMConfig(
            raster=cfg,
            tracking=TrackingConfig(iters=6, sil_threshold=0.5),
            mapping=MappingConfig(iters=8),
            capacity=4096,
            keyframe_every=2,
            map_every=2,
            window=2,
            seed_every_px=2,
            init_iters=20,
            motion_model=False,
            pose_graph_refine=True,
            mesh=mesh,
        )
        data = list(zip([np.asarray(v) for v in views], frames))
        state, gt_views = run_slam(data, scfg, CAM_T)
        return state, gt_views

    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("kf", "tile"))
    s1, gt_views = run(None)
    s2, _ = run(mesh)

    assert len(s1.est_views) == len(s2.est_views)
    for i, (a, b) in enumerate(zip(s1.est_views, s2.est_views)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3,
            err_msg=f"frame {i} pose diverged between mesh and single")
    ate1 = ate_rmse(s1.est_views, [jnp.asarray(v) for v in gt_views])
    ate2 = ate_rmse(s2.est_views, [jnp.asarray(v) for v in gt_views])
    assert abs(ate1 - ate2) < 2e-3, (ate1, ate2)


def test_reanchor_map_global_rigid_exact():
    """A single global SE(3) correction applied to every keyframe must move
    the map so renders are preserved exactly: render(new pose, re-anchored
    map) == render(old pose, old map) — camera-frame geometry (and the
    quaternion-rotated covariances) are invariant under re-anchoring."""
    from diff_gaussian_rasterization_tpu.models import lie
    from diff_gaussian_rasterization_tpu.models.runner import reanchor_map
    from diff_gaussian_rasterization_tpu.models.slam import render_model

    cfg = RasterConfig(tile_h=8, tile_w=8, chunk=16, instance_multiplier=12)
    gt_model = random_room_model(capacity=512, n=512, seed=1)
    views = [v for v in orbit_trajectory(3)]
    xi = jnp.asarray([0.05, -0.04, 0.03, 0.06, -0.05, 0.04], jnp.float32)
    # a WORLD-frame rigid remap shared by all keyframes (apply_twist would
    # left-apply in each camera's frame — a different world correction per
    # keyframe): V_new = inv(E) @ V_old gives correction M_k = E globally
    e_row = lie.exp_se3(xi).T
    e_inv = jnp.linalg.inv(e_row)
    new_views = [e_inv @ v for v in views]
    m2 = reanchor_map(gt_model, views, new_views)

    def cam(v):
        return Camera(viewmatrix=v, tanfovx=0.7, tanfovy=0.55,
                      height=H, width=W)

    for i in (0, 2):
        a = render_model(gt_model, cam(views[i]), cfg)
        b = render_model(m2, cam(new_views[i]), cfg)
        np.testing.assert_allclose(np.asarray(a.color), np.asarray(b.color),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(a.depth), np.asarray(b.depth),
                                   atol=2e-4)


def test_reanchor_fixes_map_built_from_drifted_pose():
    """Inject drift the way it happens in the wild: the last keyframe's pose
    is wrong AND the map content observed from it was placed using that
    wrong pose.  Pose-graph refinement corrects the keyframe; with
    ``reanchor=True`` the map must follow whatever correction refinement
    achieves so mapping continues without ghosting.  The ghost-free
    invariant (independent of how much of the injected drift the
    measurement-based solver actually removes): every Gaussian's
    coordinates in its anchor keyframe's CAMERA frame are preserved
    through refine+reanchor; without reanchor the poses move but the map
    does not, breaking that consistency."""
    import copy
    import dataclasses
    from diff_gaussian_rasterization_tpu.models import lie
    from diff_gaussian_rasterization_tpu.models.runner import (
        reanchor_map, refine_keyframes,
    )

    cfg = RasterConfig(tile_h=8, tile_w=8, chunk=16, instance_multiplier=12)
    gt_model = random_room_model(capacity=768, n=768, seed=0)
    views = orbit_trajectory(9)
    frames = render_sequence(gt_model, views, CAM_T, cfg)
    scfg = SLAMConfig(
        raster=cfg, tracking=TrackingConfig(iters=10, sil_threshold=0.5),
        mapping=MappingConfig(iters=15), capacity=4096, keyframe_every=2,
        map_every=2, window=2, seed_every_px=2, init_iters=60,
        motion_model=False,
    )
    data = list(zip([np.asarray(v) for v in views], frames))
    state, _ = run_slam(data, scfg, CAM_T)
    clean_means = np.asarray(state.model.means3D)
    act = np.asarray(state.model.active)

    # corrupt: last keyframe pose drifted by xi, and the Gaussians anchored
    # to it placed as if backprojected from the drifted pose
    xi = jnp.asarray([0.03, -0.02, 0.015, 0.02, -0.015, 0.02], jnp.float32)
    pert = lie.apply_twist(state.kf_views[-1], xi)
    pert_views = list(state.kf_views)
    pert_views[-1] = pert

    def corrupt():
        bad = copy.copy(state)
        bad.kf_views = list(pert_views)
        bad.est_views = list(state.est_views)
        bad.est_views[-1] = lie.apply_twist(bad.est_views[-1], xi)
        bad.model = reanchor_map(state.model, state.kf_views, pert_views)
        return bad

    err_corrupt = float(np.linalg.norm(
        np.asarray(corrupt().model.means3D) - clean_means, axis=1)[act]
        .mean())
    assert err_corrupt > 1e-3  # the corruption moved real mass

    # anchor assignment at the PRE-refinement poses (what refine_keyframes'
    # reanchor uses): nearest keyframe camera center, row convention
    kv = np.stack([np.asarray(v) for v in pert_views])
    centers = -np.einsum("kj,kij->ki", kv[:, 3, :3], kv[:, :3, :3])
    pts = np.asarray(corrupt().model.means3D)
    anchor = np.argmin(
        ((pts[:, None, :] - centers[None]) ** 2).sum(-1), axis=1)

    def cam_coords(model, views_list):
        v = np.stack([np.asarray(x) for x in views_list])[anchor]
        return np.einsum("pi,pij->pj", np.asarray(model.means3D),
                         v[:, :3, :3]) + v[:, 3, :3]

    c0 = cam_coords(corrupt().model, pert_views)
    fixed = refine_keyframes(corrupt(), scfg, CAM_T)
    no_re = refine_keyframes(
        corrupt(), dataclasses.replace(scfg, reanchor=False), CAM_T)

    # refinement moved the corrupted keyframe back toward truth
    kf_err = float(jnp.abs(fixed.kf_views[-1] - state.kf_views[-1]).max())
    pert_err = float(jnp.abs(pert - state.kf_views[-1]).max())
    assert kf_err < 0.75 * pert_err, (kf_err, pert_err)

    # ghost-free invariant: camera-frame geometry preserved through
    # refine+reanchor (to float32 transform tolerance) ...
    c_fixed = cam_coords(fixed.model, fixed.kf_views)
    dev_fixed = float(np.abs(c_fixed - c0)[act].max())
    assert dev_fixed < 1e-5, dev_fixed
    # ... and broken without reanchor: map stayed put while poses moved,
    # by about the size of the applied corrections
    corr_mag = max(
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(no_re.kf_views, pert_views))
    c_no_re = cam_coords(no_re.model, no_re.kf_views)
    dev_no_re = float(np.abs(c_no_re - c0)[act].max())
    assert dev_no_re > 10 * dev_fixed, (dev_no_re, dev_fixed)
    assert dev_no_re > 0.1 * corr_mag, (dev_no_re, corr_mag)


@pytest.mark.quick
def test_slam_loop_minimal_quick():
    """Minimal end-to-end slam_step coverage for the pre-commit tier: init,
    one tracked frame, one keyframe+mapping frame, finite outputs.  Tiny on
    purpose (the full loops are exercised by the long-tier tests above)."""
    from diff_gaussian_rasterization_tpu.models.runner import (
        init_slam, slam_step,
    )

    h, w = 24, 32
    cam = Camera(viewmatrix=jnp.eye(4), tanfovx=0.7, tanfovy=0.55,
                 height=h, width=w)
    cfg = RasterConfig(tile_h=8, tile_w=8, chunk=16, instance_multiplier=12)
    gt_model = random_room_model(capacity=256, n=256, seed=3)
    views = orbit_trajectory(3)
    frames = render_sequence(gt_model, views, cam, cfg)
    scfg = SLAMConfig(
        raster=cfg, tracking=TrackingConfig(iters=2, sil_threshold=0.5),
        mapping=MappingConfig(iters=2), capacity=1024, keyframe_every=2,
        map_every=2, window=2, seed_every_px=4, init_iters=2,
        motion_model=False,
    )
    state = init_slam(jnp.asarray(views[0]), frames[0], cam, scfg)
    state, loss1 = slam_step(state, frames[1], cam, scfg, 1)
    state, loss2 = slam_step(state, frames[2], cam, scfg, 2)  # kf + map
    assert np.isfinite(loss1) and np.isfinite(loss2)
    assert len(state.est_views) == 3 and len(state.kf_views) == 2
    for v in state.est_views:
        assert np.all(np.isfinite(np.asarray(v)))
    assert int(state.model.num_active) > 0


def test_slam_rebudgets_when_scene_outgrows_instance_budget():
    """The SLAM loop must react to the instance budget filling up: when a
    keyframe render's true instance count crosses 80% of ``max_instances``,
    the budget regrows (2.5x, like init_slam's sizing) BEFORE any render
    actually overflows — so the trajectory matches an oversized-budget run
    exactly (the budget only sizes masked padding until instances drop)."""
    from diff_gaussian_rasterization_tpu.models.runner import (
        init_slam, slam_step,
    )

    cfg = RasterConfig(tile_h=8, tile_w=8, chunk=16, instance_multiplier=12)
    gt_model = random_room_model(capacity=512, n=512, seed=2)
    views = orbit_trajectory(5)
    frames = render_sequence(gt_model, views, CAM_T, cfg)
    scfg = SLAMConfig(
        raster=cfg, tracking=TrackingConfig(iters=4, sil_threshold=0.5),
        mapping=MappingConfig(iters=4), capacity=2048, keyframe_every=2,
        map_every=2, window=2, seed_every_px=3, init_iters=10,
        motion_model=False,
    )

    def run(shrink_to):
        state = init_slam(jnp.asarray(views[0]), frames[0], CAM_T, scfg)
        budgets = [state.raster.max_instances]
        for i in range(1, 5):
            if shrink_to and i == 2:
                # simulate a scene that has outgrown its boot-time budget:
                # still >= the true count (~2.4k on this scene), but past
                # the 80% reaction threshold at the next keyframe
                state.raster = state.raster.replace(
                    max_instances=shrink_to)
            state, _ = slam_step(state, frames[i], CAM_T, scfg, i)
            budgets.append(state.raster.max_instances)
        return state, budgets

    base, b_budgets = run(shrink_to=0)
    tight, t_budgets = run(shrink_to=2560)

    # the reaction fired at the frame-2 keyframe and regrew the budget
    assert t_budgets[2] > 2560, t_budgets
    # never actually overflowed -> bit-comparable trajectory
    for i, (a, b) in enumerate(zip(base.est_views, tight.est_views)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6,
            err_msg=f"frame {i} diverged after re-budget")


def test_slam_session_checkpoint_resume(tmp_path):
    """save_slam/load_slam round-trip the full session (map, optimizer,
    densify stats, keyframes + frames, trajectory) and the restored state
    continues tracking identically to the uninterrupted run."""
    from diff_gaussian_rasterization_tpu.models.runner import (
        init_slam, load_slam, save_slam, slam_step,
    )

    cfg = RasterConfig(tile_h=8, tile_w=8, chunk=16, instance_multiplier=12)
    gt_model = random_room_model(capacity=512, n=512, seed=2)
    views = orbit_trajectory(5)
    frames = render_sequence(gt_model, views, CAM_T, cfg)
    scfg = SLAMConfig(
        raster=cfg, tracking=TrackingConfig(iters=4, sil_threshold=0.5),
        mapping=MappingConfig(iters=4), capacity=2048, keyframe_every=2,
        map_every=2, window=2, seed_every_px=3, init_iters=10,
        motion_model=False,
    )
    state = init_slam(jnp.asarray(views[0]), frames[0], CAM_T, scfg)
    state, _ = slam_step(state, frames[1], CAM_T, scfg, 1)
    state, _ = slam_step(state, frames[2], CAM_T, scfg, 2)

    path = str(tmp_path / "slam_ckpt")
    save_slam(path, state)
    restored = load_slam(path, scfg)

    np.testing.assert_array_equal(np.asarray(restored.model.means3D),
                                  np.asarray(state.model.means3D))
    assert restored.kf_idx == state.kf_idx
    assert len(restored.est_views) == len(state.est_views)
    assert restored.raster.max_instances == state.raster.max_instances

    # both continue on the next frame and agree
    a, _ = slam_step(state, frames[3], CAM_T, scfg, 3)
    b, _ = slam_step(restored, frames[3], CAM_T, scfg, 3)
    np.testing.assert_allclose(np.asarray(a.est_views[-1]),
                               np.asarray(b.est_views[-1]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.model.means3D),
                               np.asarray(b.model.means3D), atol=1e-6)


@pytest.mark.quick
def test_coverage_triggered_keyframe_fires_on_unmapped_territory():
    """A pan into unmapped territory must insert a keyframe + mapping round
    via ``kf_min_coverage`` even when the periodic schedule wouldn't fire
    (the round-3 drift fix: rotation-dominant segments expose new territory
    between periodic keyframes)."""
    from diff_gaussian_rasterization_tpu.camera import look_at
    from diff_gaussian_rasterization_tpu.models.runner import (
        init_slam, slam_step,
    )

    h, w = 24, 32
    cam = Camera(viewmatrix=jnp.eye(4), tanfovx=0.7, tanfovy=0.55,
                 height=h, width=w)
    cfg = RasterConfig(tile_h=8, tile_w=8, chunk=16, instance_multiplier=12)
    gt_model = random_room_model(capacity=512, n=512, seed=1)
    eye = (0.0, 0.0, -0.5)
    views = jnp.stack([look_at(eye, (0.0, 0.0, 2.0)),       # facing +z
                       look_at(eye, (2.0, 0.0, 0.3))])      # ~80 deg pan
    frames = render_sequence(gt_model, views, cam, cfg)

    def run(min_cov):
        scfg = SLAMConfig(
            raster=cfg, tracking=TrackingConfig(iters=0),
            mapping=MappingConfig(iters=2), capacity=2048,
            keyframe_every=100, map_every=100, window=2, seed_every_px=3,
            init_iters=2, motion_model=False, kf_min_coverage=min_cov,
        )
        state = init_slam(jnp.asarray(views[0]), frames[0], cam, scfg)
        # perfect odometry stand-in (iters=0 keeps the tracked pose at
        # est_views[-1]): the map, built from frame 0 only, covers little
        # of view 1's frustum
        state.est_views[-1] = views[1]
        state, _ = slam_step(state, frames[1], cam, scfg, 1)
        return state

    trig = run(min_cov=0.9)
    base = run(min_cov=0.0)
    assert len(base.kf_views) == 1          # periodic schedule never fires
    assert len(trig.kf_views) == 2          # coverage trigger inserted one
    assert trig.kf_idx[-1] == 1
    # the triggered keyframe seeded the unmapped territory
    assert int(trig.model.num_active) > int(base.model.num_active)


@pytest.mark.quick
def test_select_window_nearest_prefers_overlapping_keyframes():
    from diff_gaussian_rasterization_tpu.camera import look_at
    from diff_gaussian_rasterization_tpu.models.runner import (
        SLAMState, _select_window,
    )

    # keyframes along a line; the latest (x=5) is nearest to x=4, then x=3
    kf_views = [look_at((float(x), 0.0, 0.0), (float(x), 0.0, 2.0))
                for x in [0, 1, 2, 3, 4, 5]]
    state = SLAMState(model=None, opt_state=None, dstate=None,
                      kf_views=kf_views, kf_frames=[None] * 6,
                      est_views=[], rng=None)
    scfg = SLAMConfig(window=3, window_select="nearest")
    idx = _select_window(state, scfg, frame_idx=7)
    assert idx[0] == 5                       # latest always anchors
    assert 4 in idx                          # nearest older keyframe
    assert len(set(idx)) == 3
    scfg_r = SLAMConfig(window=3, window_select="random")
    idx_r = _select_window(state, scfg_r, frame_idx=7)
    assert idx_r[0] == 5 and len(set(idx_r)) == 3


@pytest.mark.quick
def test_refine_cost_gate_drops_outlier_absolute_edges(monkeypatch):
    """A keyframe whose re-track against the map converges badly (outlier
    cost) must NOT enter the pose graph as a map-anchored edge when
    ``refine_cost_gate`` is set — the odometry chain holds it instead.
    (Measured motivation: ungated refine_every=2 degrades the procedural
    ATE 6.5 -> 33 cm; see SLAMConfig.refine_cost_gate.)"""
    from diff_gaussian_rasterization_tpu.models import lie, runner

    views = orbit_trajectory(8)
    kf_views = [views[i] for i in range(0, 8, 2)]

    # fake re-track: keyframe 2 "converges" to a far-off pose with an
    # outlier cost; the others return their chain pose at nominal cost
    bogus = lie.apply_twist(kf_views[2],
                            jnp.asarray([0.3, -0.2, 0.25, 0.2, -0.15, 0.2],
                                        jnp.float32))

    def fake_track(model, view0, frame, rcfg, tcfg, cam_t, **kw):
        j = int(np.argmin([float(jnp.abs(view0 - v).max())
                           for v in kf_views]))
        if j == 2:
            return bogus, jnp.asarray(100.0), None
        return view0, jnp.asarray(1.0), None

    monkeypatch.setattr(runner, "track_frame", fake_track)

    def make_state():
        return runner.SLAMState(
            model=None, opt_state=None, dstate=None,
            kf_views=list(kf_views), kf_frames=[None] * 4,
            est_views=[views[i] for i in range(8)], rng=None,
            kf_idx=[0, 2, 4, 6],
        )

    base = dict(tracking=TrackingConfig(iters=2), reanchor=False,
                refine_track_iters=2)
    gated = runner.refine_keyframes(
        make_state(), SLAMConfig(refine_cost_gate=3.0, **base), CAM_T)
    ungated = runner.refine_keyframes(
        make_state(), SLAMConfig(refine_cost_gate=0.0, **base), CAM_T)

    dev_g = float(jnp.abs(gated.kf_views[2] - kf_views[2]).max())
    dev_u = float(jnp.abs(ungated.kf_views[2] - kf_views[2]).max())
    # ungated: the weight-4 bogus absolute edge drags keyframe 2; gated:
    # the edge is dropped and the odometry chain keeps it in place
    assert dev_u > 0.05, dev_u
    assert dev_g < dev_u * 0.2, (dev_g, dev_u)


@pytest.mark.quick
def test_refine_cost_gate_survives_mass_outliers(monkeypatch):
    """When HALF the keyframes re-track badly (immature map), the gate
    baseline must not be contaminated: the lower-half median tracks the
    well-re-tracked population, so the bad edges are still dropped."""
    from diff_gaussian_rasterization_tpu.models import lie, runner

    views = orbit_trajectory(8)
    kf_views = [views[i] for i in range(0, 8, 2)]
    bad = {2, 3}      # half of the 1..3 re-tracked keyframes +1 more
    bogus = {j: lie.apply_twist(
        kf_views[j], jnp.asarray([0.3, -0.2, 0.25, 0.2, -0.15, 0.2],
                                 jnp.float32)) for j in bad}

    def fake_track(model, view0, frame, rcfg, tcfg, cam_t, **kw):
        j = int(np.argmin([float(jnp.abs(view0 - v).max())
                           for v in kf_views]))
        if j in bad:
            return bogus[j], jnp.asarray(100.0), None
        return view0, jnp.asarray(1.0), None

    monkeypatch.setattr(runner, "track_frame", fake_track)
    state = runner.SLAMState(
        model=None, opt_state=None, dstate=None,
        kf_views=list(kf_views), kf_frames=[None] * 4,
        est_views=[views[i] for i in range(8)], rng=None,
        kf_idx=[0, 2, 4, 6])
    gated = runner.refine_keyframes(
        state, SLAMConfig(refine_cost_gate=3.0,
                          tracking=TrackingConfig(iters=2),
                          reanchor=False, refine_track_iters=2), CAM_T)
    # with a full-median baseline, 2 of 3 re-tracks at cost 100 put the
    # median at 100 and both bogus edges pass the gate; the lower-half
    # median (cost 1) gates them
    for j in bad:
        dev = float(jnp.abs(gated.kf_views[j] - kf_views[j]).max())
        assert dev < 0.02, (j, dev)


@pytest.mark.quick
def test_window_select_validated():
    with pytest.raises(ValueError, match="window_select"):
        SLAMConfig(window_select="nearset")


@pytest.mark.quick
def test_coverage_trigger_cooldown(monkeypatch):
    """With the coverage trigger persistently failing to raise coverage,
    the cooldown must prevent a keyframe on every consecutive frame."""
    from diff_gaussian_rasterization_tpu.models import runner

    inserted = []

    class FakeOut:
        opacity_map = jnp.zeros((1, CAM_T.height, CAM_T.width))
        num_rendered = jnp.asarray(0)

    def fake_render(model, cam, cfg, **kw):
        return FakeOut()

    def fake_track(model, view0, frame, rcfg, tcfg, cam_t, **kw):
        return view0, jnp.asarray(1.0), None

    def fake_mapping_round(model, opt_state, dstate, kf, rcfg, mcfg,
                           cam_t, rng, **kw):
        return model, opt_state, dstate, jnp.asarray(0.0)

    monkeypatch.setattr(runner, "render_model", fake_render)
    monkeypatch.setattr(runner, "track_frame", fake_track)
    monkeypatch.setattr(runner, "mapping_round", fake_mapping_round)
    monkeypatch.setattr(runner, "backproject",
                        lambda *a, **k: (jnp.zeros((0, 3)),
                                         jnp.zeros((0, 3)),
                                         jnp.zeros((0, 3))))

    frame = Frame(rgb=jnp.zeros((3, CAM_T.height, CAM_T.width)),
                  depth=jnp.ones((CAM_T.height, CAM_T.width)))
    scfg = SLAMConfig(keyframe_every=100, map_every=100,
                      kf_min_coverage=0.9, kf_coverage_cooldown=3,
                      motion_model=False)
    state = runner.SLAMState(
        model=None, opt_state=None, dstate=None,
        kf_views=[jnp.eye(4)], kf_frames=[frame],
        est_views=[jnp.eye(4)], rng=jax.random.PRNGKey(0), kf_idx=[0],
        raster=RasterConfig())
    for i in range(1, 10):
        state, _ = runner.slam_step(state, frame, CAM_T, scfg, i)
    # zero coverage every frame: without the cooldown this inserts 9
    # keyframes; with cooldown=3 only every 3rd frame triggers
    assert state.kf_idx == [0, 3, 6, 9], state.kf_idx


@pytest.mark.quick
def test_relocalization_rescues_bad_motion_init():
    """reloc_spike: when the motion-model init lands tracking in a wrong
    basin (cost spike vs the recent baseline), slam_step re-tracks from
    the nearest keyframe poses and keeps the best result."""
    from diff_gaussian_rasterization_tpu.models import lie
    from diff_gaussian_rasterization_tpu.models.runner import (
        init_slam, slam_step,
    )

    h, w = 24, 32
    cam = Camera(viewmatrix=jnp.eye(4), tanfovx=0.7, tanfovy=0.55,
                 height=h, width=w)
    cfg = RasterConfig(tile_h=8, tile_w=8, chunk=16, instance_multiplier=12)
    gt_model = random_room_model(capacity=256, n=256, seed=3)
    views = orbit_trajectory(8)
    frames = render_sequence(gt_model, views, cam, cfg)
    scfg = SLAMConfig(
        raster=cfg, tracking=TrackingConfig(iters=4, sil_threshold=0.5),
        mapping=MappingConfig(iters=2), capacity=1024, keyframe_every=2,
        map_every=2, window=2, seed_every_px=4, init_iters=10,
        motion_model=False, reloc_spike=3.0, reloc_candidates=2,
        reloc_track_iters=12,
    )
    state = init_slam(jnp.asarray(views[0]), frames[0], cam, scfg)
    for i in range(1, 6):
        state, _ = slam_step(state, frames[i], cam, scfg, i)
    base_costs = list(state.track_costs)

    # wreck the next frame's initialization: overwrite the last estimate
    # with a far-off pose so view0 starts outside the basin
    xi_bad = jnp.asarray([0.4, -0.3, 0.35, 0.25, -0.3, 0.2])
    state.est_views[-1] = lie.apply_twist(state.est_views[-1], xi_bad)

    import dataclasses as dc
    state2 = dc.replace(state)  # shallow copy is fine: we only read poses
    state2.est_views = list(state.est_views)
    state2.track_costs = list(state.track_costs)

    state, cost_reloc = slam_step(state, frames[6], cam, scfg, 6)

    # and the same wrecked init with relocalization off for comparison
    scfg_off = dc.replace(scfg, reloc_spike=0.0)
    state2, cost_noreloc = slam_step(state2, frames[6], cam, scfg_off, 6)

    def pose_err(a, b):
        ra = np.asarray(a)[:3, :3]
        rb = np.asarray(b)[:3, :3]
        cos = np.clip((np.trace(ra.T @ rb) - 1) / 2, -1, 1)
        return (float(np.arccos(cos)),
                float(np.linalg.norm(np.asarray(a)[3, :3]
                                     - np.asarray(b)[3, :3])))

    r_reloc, t_reloc = pose_err(state.est_views[-1], views[6])
    r_lost, t_lost = pose_err(state2.est_views[-1], views[6])
    assert np.isfinite(cost_reloc) and np.isfinite(cost_noreloc)
    # the un-relocalized track is LOST (that is the scenario; note its raw
    # cost looks healthy because the silhouette mask collapsed — exactly
    # why the detector uses coverage, not cost alone)
    assert r_lost > 0.2, (r_lost, t_lost)
    # relocalization from the nearest keyframe pose must recover it
    assert r_reloc < 0.3 * r_lost, (r_reloc, r_lost)
    assert t_reloc < 0.3 * t_lost, (t_reloc, t_lost)
    assert base_costs  # baseline history existed for the detector
