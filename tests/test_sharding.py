"""Multi-device rendering/training on the virtual 8-device CPU mesh.

N-device output must equal 1-device output (BASELINE-style equivalence test,
SURVEY.md §4 item 4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_gaussian_rasterization_tpu.camera import Camera
from diff_gaussian_rasterization_tpu.config import RasterConfig
from diff_gaussian_rasterization_tpu.ops.rasterize import rasterize
from diff_gaussian_rasterization_tpu.parallel.mesh import make_mesh
from diff_gaussian_rasterization_tpu.parallel.sharded import (
    gather_visible, sharded_value_and_grad,
)

from scenes import make_scene

CFG = RasterConfig(tile_h=8, tile_w=8, chunk=16)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multi-device (virtual) mesh"
)


def test_tile_sharded_render_matches_single_device():
    scene, cam = make_scene(p=96, h=32, w=40, seed=0)
    kw = {k: v for k, v in scene.items() if k != "means3D"}
    mesh = make_mesh(shape=(1, len(jax.devices())), axis_names=("kf", "tile"))

    def run(mesh_arg):
        return rasterize(scene["means3D"], cam, CFG, backend="xla",
                         tile_batch=4, mesh=mesh_arg, **kw)

    a = run(None)
    b = run(mesh)
    np.testing.assert_allclose(np.asarray(a.color), np.asarray(b.color),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.depth), np.asarray(b.depth),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.gau_uncertainty),
                               np.asarray(b.gau_uncertainty), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(a.gau_related_pixels),
                                  np.asarray(b.gau_related_pixels))


@pytest.mark.quick
def test_tile_sharded_gradients_match():
    scene, cam = make_scene(p=96, h=32, w=40, seed=3)
    kw = {k: v for k, v in scene.items() if k != "means3D"}
    mesh = make_mesh(shape=(1, len(jax.devices())), axis_names=("kf", "tile"))

    def loss(means, view, mesh_arg):
        cam2 = Camera(viewmatrix=view, tanfovx=cam.tanfovx,
                      tanfovy=cam.tanfovy, height=cam.height, width=cam.width)
        out = rasterize(means, cam2, CFG, backend="xla", tile_batch=4,
                        mesh=mesh_arg, **kw)
        return (jnp.sum(out.color) + 0.3 * jnp.sum(out.depth)
                + 0.1 * jnp.sum(out.depth_median))

    g1 = jax.grad(loss, argnums=(0, 1))(scene["means3D"], cam.viewmatrix,
                                        None)
    g2 = jax.grad(loss, argnums=(0, 1))(scene["means3D"], cam.viewmatrix,
                                        mesh)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               rtol=1e-5, atol=1e-6)


def test_tile_sharded_pallas_backend_matches_single_device():
    """The production Pallas kernels (interpret mode on CPU) under
    shard_map: fwd and bwd through make_sharded_core must match the
    unsharded Pallas render."""
    cfg = RasterConfig(tile_h=8, tile_w=16, chunk=32)  # tile_px % 128 == 0
    scene, cam = make_scene(p=96, h=32, w=64, seed=11)
    kw = {k: v for k, v in scene.items() if k != "means3D"}
    mesh = make_mesh(shape=(1, len(jax.devices())), axis_names=("kf", "tile"))

    def loss(means, view, mesh_arg):
        cam2 = Camera(viewmatrix=view, tanfovx=cam.tanfovx,
                      tanfovy=cam.tanfovy, height=cam.height, width=cam.width)
        out = rasterize(means, cam2, cfg, backend="pallas",
                        mesh=mesh_arg, **kw)
        return (jnp.sum(out.color) + 0.3 * jnp.sum(out.depth)
                + 0.1 * jnp.sum(out.depth_median)
                + 0.1 * jnp.sum(out.opacity_map))

    def render(mesh_arg):
        return rasterize(scene["means3D"], cam, cfg, backend="pallas",
                         mesh=mesh_arg, **kw)

    a = render(None)
    b = render(mesh)
    np.testing.assert_allclose(np.asarray(a.color), np.asarray(b.color),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.depth), np.asarray(b.depth),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.gau_uncertainty),
                               np.asarray(b.gau_uncertainty), atol=1e-5)

    g1 = jax.grad(loss, argnums=(0, 1))(scene["means3D"], cam.viewmatrix,
                                        None)
    g2 = jax.grad(loss, argnums=(0, 1))(scene["means3D"], cam.viewmatrix,
                                        mesh)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.quick
def test_shard_binned_render_and_grads_match_single_device():
    """Sharded binning (each device bins only its tile-row band,
    parallel.shard_bin) must reproduce the single-device render and every
    gradient EXACTLY at the values level — the per-tile instance segments
    are bit-identical by construction, so outputs match to collective-
    summation tolerance (the [P,16] gradient psum reorders additions)."""
    scene, cam = make_scene(p=96, h=32, w=40, seed=0)
    kw = {k: v for k, v in scene.items() if k != "means3D"}
    mesh = make_mesh(shape=(1, len(jax.devices())), axis_names=("kf", "tile"))

    def render(mesh_arg, sb):
        return rasterize(scene["means3D"], cam, CFG, backend="xla",
                         tile_batch=4, mesh=mesh_arg, shard_binning=sb, **kw)

    a = jax.jit(lambda: render(None, False))()
    b = jax.jit(lambda: render(mesh, True))()
    np.testing.assert_allclose(np.asarray(a.color), np.asarray(b.color),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.depth), np.asarray(b.depth),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.depth_median),
                               np.asarray(b.depth_median), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.opacity_map),
                               np.asarray(b.opacity_map), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.gau_uncertainty),
                               np.asarray(b.gau_uncertainty), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(a.gau_related_pixels),
                                  np.asarray(b.gau_related_pixels))
    assert int(a.num_rendered) == int(b.num_rendered)
    assert not bool(b.overflow)

    def loss(means, view, mesh_arg, sb):
        cam2 = Camera(viewmatrix=view, tanfovx=cam.tanfovx,
                      tanfovy=cam.tanfovy, height=cam.height,
                      width=cam.width)
        out = rasterize(means, cam2, CFG, backend="xla", tile_batch=4,
                        mesh=mesh_arg, shard_binning=sb, **kw)
        return (jnp.sum(out.color) + 0.3 * jnp.sum(out.depth)
                + 0.1 * jnp.sum(out.depth_median)
                + 0.1 * jnp.sum(out.opacity_map))

    g1 = jax.jit(jax.grad(loss, argnums=(0, 1)), static_argnums=(2, 3))(
        scene["means3D"], cam.viewmatrix, None, False)
    g2 = jax.jit(jax.grad(loss, argnums=(0, 1)), static_argnums=(2, 3))(
        scene["means3D"], cam.viewmatrix, mesh, True)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               rtol=1e-5, atol=1e-6)


def test_shard_binned_pallas_matches_single_device():
    """Sharded binning with the production Pallas kernels (interpret mode
    on CPU): fused sort-domain reads + per-shard MXU segment reduction."""
    cfg = RasterConfig(tile_h=8, tile_w=16, chunk=32)  # tile_px % 128 == 0
    scene, cam = make_scene(p=96, h=32, w=64, seed=11)
    kw = {k: v for k, v in scene.items() if k != "means3D"}
    mesh = make_mesh(shape=(1, len(jax.devices())), axis_names=("kf", "tile"))

    def loss(means, view, mesh_arg, sb):
        cam2 = Camera(viewmatrix=view, tanfovx=cam.tanfovx,
                      tanfovy=cam.tanfovy, height=cam.height,
                      width=cam.width)
        out = rasterize(means, cam2, cfg, backend="pallas",
                        mesh=mesh_arg, shard_binning=sb, **kw)
        return (jnp.sum(out.color) + 0.3 * jnp.sum(out.depth)
                + 0.1 * jnp.sum(out.depth_median)
                + 0.1 * jnp.sum(out.opacity_map))

    def render(mesh_arg, sb):
        return rasterize(scene["means3D"], cam, cfg, backend="pallas",
                         mesh=mesh_arg, shard_binning=sb, **kw)

    a = jax.jit(lambda: render(None, False))()
    b = jax.jit(lambda: render(mesh, True))()
    np.testing.assert_allclose(np.asarray(a.color), np.asarray(b.color),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.depth), np.asarray(b.depth),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.gau_uncertainty),
                               np.asarray(b.gau_uncertainty), atol=1e-5)
    assert int(a.num_rendered) == int(b.num_rendered)

    g1 = jax.grad(loss, argnums=(0, 1))(scene["means3D"], cam.viewmatrix,
                                        None, False)
    g2 = jax.grad(loss, argnums=(0, 1))(scene["means3D"], cam.viewmatrix,
                                        mesh, True)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.quick
def test_shard_binned_overflow_reports_per_shard():
    """A per-shard budget below the deepest band's true count must raise
    the overflow flag (never a silent cap), and band_instance_counts must
    sum to the global instance count."""
    from diff_gaussian_rasterization_tpu.parallel.shard_bin import (
        band_instance_counts,
    )
    from diff_gaussian_rasterization_tpu.ops.projection import preprocess
    from diff_gaussian_rasterization_tpu.ops.tiling import grid_dims

    scene, cam = make_scene(p=96, h=32, w=40, seed=2)
    kw = {k: v for k, v in scene.items() if k != "means3D"}
    n = len(jax.devices())
    mesh = make_mesh(shape=(1, n), axis_names=("kf", "tile"))

    prep = preprocess(scene["means3D"], cam, CFG,
                      opacities=kw["opacities"], scales=kw["scales"],
                      rotations=kw["rotations"],
                      colors_precomp=kw["colors_precomp"])
    tiles_x, tiles_y = grid_dims(cam.height, cam.width, CFG.tile_h,
                                 CFG.tile_w)
    band_rows = -(-tiles_y // n)
    counts = np.asarray(band_instance_counts(prep, n, band_rows))
    assert counts.sum() == int(np.asarray(prep.tiles_touched).sum())
    deepest = int(counts.max())
    assert deepest > 128, "scene too sparse for the overflow arm"

    out = rasterize(scene["means3D"], cam, CFG, backend="xla", tile_batch=4,
                    mesh=mesh, shard_binning=True,
                    max_instances_per_shard=128, **kw)
    assert bool(out.overflow)
    ok = rasterize(scene["means3D"], cam, CFG, backend="xla", tile_batch=4,
                   mesh=mesh, shard_binning=True,
                   max_instances_per_shard=-(-deepest // 128) * 128, **kw)
    assert not bool(ok.overflow)


def test_gaussian_sharded_gather_visible_matches_replicated():
    # map sharded over devices; frustum all-gather of the visible subset
    # must reproduce the replicated render and route gradients back to the
    # owning shard (SURVEY.md §5 "Gaussian-count scaling" axis)
    scene, cam = make_scene(p=128, h=24, w=32, seed=7)
    n = len(jax.devices())
    mesh = make_mesh(shape=(1, n), axis_names=("kf", "map"))
    # push some Gaussians behind the near plane so culling is exercised
    means = scene["means3D"].at[::5, 2].set(-1.0)
    params = {"means3D": means, "colors": scene["colors_precomp"],
              "opacities": scene["opacities"]}
    kw = dict(scales=scene["scales"], rotations=scene["rotations"],
              bg=scene["bg"])
    # scales/rotations ride along in the gather too
    params["scales"] = kw.pop("scales")
    params["rotations"] = kw.pop("rotations")

    def loss_gathered(prm):
        g, valid, overflow = gather_visible(
            prm, cam.viewmatrix, mesh, axis="map",
            budget_per_shard=128 // n)
        out = rasterize(
            g["means3D"], cam, CFG, backend="xla", tile_batch=4,
            opacities=g["opacities"] * valid[:, None],
            scales=g["scales"], rotations=g["rotations"],
            colors_precomp=g["colors"], **kw)
        return (jnp.sum(out.color) + 0.3 * jnp.sum(out.depth)), overflow

    def loss_direct(prm):
        out = rasterize(
            prm["means3D"], cam, CFG, backend="xla", tile_batch=4,
            opacities=prm["opacities"], scales=prm["scales"],
            rotations=prm["rotations"], colors_precomp=prm["colors"], **kw)
        return jnp.sum(out.color) + 0.3 * jnp.sum(out.depth)

    (l_g, overflow), g_g = jax.value_and_grad(loss_gathered, has_aux=True)(
        params)
    l_d, g_d = jax.value_and_grad(loss_direct)(params)
    assert int(overflow) == 0
    np.testing.assert_allclose(float(l_g), float(l_d), rtol=1e-5)
    for kk in ("means3D", "colors", "opacities", "scales", "rotations"):
        np.testing.assert_allclose(np.asarray(g_g[kk]), np.asarray(g_d[kk]),
                                   rtol=1e-4, atol=1e-5, err_msg=kk)


def test_keyframe_sharded_grads_match():
    scene, cam = make_scene(p=64, h=24, w=24, seed=5)
    kw = {k: v for k, v in scene.items()
          if k not in ("means3D", "gt_depth")}
    n = len(jax.devices())
    mesh = make_mesh(shape=(n, 1), axis_names=("kf", "tile"))
    rng = np.random.RandomState(0)
    k = n  # one keyframe per device
    views = jnp.stack([cam.viewmatrix] * k)
    rgbs = jnp.asarray(rng.uniform(0, 1, (k, 3, 24, 24)), jnp.float32)
    depths = jnp.asarray(rng.uniform(1, 3, (k, 24, 24)), jnp.float32)

    def loss_one(params, view, rgb, depth):
        cam2 = Camera(viewmatrix=view, tanfovx=cam.tanfovx,
                      tanfovy=cam.tanfovy, height=24, width=24)
        out = rasterize(params["means3D"], cam2, CFG, backend="xla",
                        tile_batch=4, gt_depth=depth,
                        colors_precomp=params["colors"], **kw)
        return jnp.mean((out.color - rgb) ** 2) + 0.3 * jnp.mean(
            (out.depth[0] - depth) ** 2)

    params = {"means3D": scene["means3D"], "colors": kw.pop("colors_precomp")}

    f = sharded_value_and_grad(loss_one, mesh, axis="kf")
    loss_s, grads_s = f(params, views, rgbs, depths)

    def direct(p):
        return sum(loss_one(p, views[i], rgbs[i], depths[i])
                   for i in range(k)) / k

    loss_d, grads_d = jax.value_and_grad(direct)(params)
    np.testing.assert_allclose(float(loss_s), float(loss_d), rtol=1e-5)
    for kk in params:
        np.testing.assert_allclose(np.asarray(grads_s[kk]),
                                   np.asarray(grads_d[kk]),
                                   rtol=1e-4, atol=1e-6, err_msg=kk)


def test_kf_x_map_composed_mapping_step_matches_single_device():
    """BOTH sharding axes > 1 in ONE mapping step (VERDICT r2 item 5 /
    north-star topology: big map x many keyframes): mapping_round on a
    (kf=2, map=4) mesh must match the single-device run — per-frame
    frustum gathers ride the map axis inside the same shard_map whose kf
    axis data-parallelizes the keyframes."""
    from diff_gaussian_rasterization_tpu.io.synthetic import (
        orbit_trajectory, random_room_model, render_sequence,
    )
    from diff_gaussian_rasterization_tpu.models.gaussians import DensifyState
    from diff_gaussian_rasterization_tpu.models.slam import (
        MappingConfig, make_map_optimizer, mapping_round, model_params,
    )

    h, w = 40, 56
    cam_t = Camera(viewmatrix=jnp.eye(4), tanfovx=0.7, tanfovy=0.55,
                   height=h, width=w)
    cfg = RasterConfig(tile_h=8, tile_w=8, chunk=16, instance_multiplier=12)
    gt_model = random_room_model(capacity=512, n=512, seed=0)
    views = orbit_trajectory(4)
    frames = render_sequence(gt_model, views, cam_t, cfg)
    # a slightly corrupted copy to optimize back toward the renders
    rng = np.random.RandomState(3)
    start = gt_model.replace(
        sh=gt_model.sh + jnp.asarray(
            rng.normal(scale=0.15, size=gt_model.sh.shape), jnp.float32),
        opacities_logit=gt_model.opacities_logit - 0.5,
    )
    kf = (jnp.stack([views[0], views[2], views[3]]),
          jnp.stack([frames[i].rgb for i in (0, 2, 3)]),
          jnp.stack([frames[i].depth for i in (0, 2, 3)]))
    # uncertainty_prune > 0 exercises the round-5 inverse gather: stats of
    # the gathered working set route back to owning shards, so pruning
    # decisions must be mesh-invariant (threshold chosen to prune SOME)
    mcfg = MappingConfig(iters=3, uncertainty_prune=0.05)

    def run(mesh, map_axis):
        opt = make_map_optimizer(mcfg)
        model, opt_state, dstate, loss = mapping_round(
            start, opt.init(model_params(start)),
            DensifyState.zero(start.capacity), kf, cfg, mcfg, cam_t,
            jax.random.PRNGKey(0), mesh=mesh, kf_axis="kf",
            tile_axis="tile", map_axis=map_axis,
            map_budget=512 // 4)
        return model, float(loss)

    m1, l1 = run(None, None)
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    m2, l2 = run(jax.sharding.Mesh(devs, ("kf", "map")), "map")
    # map-only sharding (kf axis trivial) takes the gather_visible path
    devs2 = np.array(jax.devices()[:4]).reshape(1, 4)
    m3, l3 = run(jax.sharding.Mesh(devs2, ("kf", "map")), "map")

    # the composed step pads the 3-frame window to 4 (weight 0) and
    # reorders Gaussians through the gather; results must still agree to
    # collective-summation tolerance
    assert abs(l1 - l2) < 1e-5, (l1, l2)
    assert abs(l1 - l3) < 1e-5, (l1, l3)
    # some pruning must actually have happened for this to test anything
    assert int(m1.num_active) < int(start.num_active), (
        "threshold pruned nothing; weaken it")
    np.testing.assert_array_equal(np.asarray(m1.active),
                                  np.asarray(m2.active))
    np.testing.assert_array_equal(np.asarray(m1.active),
                                  np.asarray(m3.active))
    for f in ("means3D", "sh", "opacities_logit", "scales_log",
              "rotations"):
        np.testing.assert_allclose(
            np.asarray(getattr(m1, f)), np.asarray(getattr(m2, f)),
            rtol=1e-4, atol=1e-5, err_msg=f)
        np.testing.assert_allclose(
            np.asarray(getattr(m1, f)), np.asarray(getattr(m3, f)),
            rtol=1e-4, atol=1e-5, err_msg=f)


def test_pose_graph_refine_sharded_matches_single_device():
    # north-star: keyframe pose-graph refinement over collectives — the
    # edge-sharded psum'd normal equations must match the single-device
    # solve, and both must pull a noisy chain toward the measurements
    from diff_gaussian_rasterization_tpu.parallel.sharded import (
        refine_poses_sharded)
    from diff_gaussian_rasterization_tpu.models import lie

    rng = np.random.RandomState(0)
    k = 7
    # ground-truth chain of poses
    gt = [jnp.eye(4, dtype=jnp.float32)]
    for i in range(1, k):
        xi = jnp.asarray(rng.uniform(-0.2, 0.2, 6), jnp.float32)
        gt.append(lie.apply_twist(gt[-1], xi))
    gt = jnp.stack(gt)
    # exact odometry measurements, noisy initial estimates
    edges = np.array([(i, i + 1) for i in range(k - 1)]
                     + [(0, k - 1)], np.int32)
    zs = jnp.stack([gt[j] @ jnp.linalg.inv(gt[i]) for i, j in edges])
    noisy = [gt[0]]
    for i in range(1, k):
        xi = jnp.asarray(rng.uniform(-0.05, 0.05, 6), jnp.float32)
        noisy.append(lie.apply_twist(gt[i], xi))
    noisy = jnp.stack(noisy)

    def chain_err(views):
        return float(jnp.mean(jnp.abs(views - gt)))

    single = refine_poses_sharded(noisy, edges, zs, mesh=None, iters=8)
    mesh = make_mesh(shape=(len(jax.devices()),), axis_names=("kf",))
    multi = refine_poses_sharded(noisy, edges, zs, mesh=mesh, iters=8)

    assert chain_err(single) < 0.25 * chain_err(noisy), (
        chain_err(noisy), chain_err(single))
    np.testing.assert_allclose(np.asarray(single), np.asarray(multi),
                               atol=1e-5)
