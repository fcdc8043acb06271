"""Production rasterize() (XLA tile backend) vs the oracle.

Forward parity and, crucially, *gradient* parity: the production backward is
an analytic custom VJP; the oracle's gradients are plain JAX autodiff.  They
must agree for every parameter and for the pose, in both light and full
branch configurations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_gaussian_rasterization_tpu.camera import Camera
from diff_gaussian_rasterization_tpu.config import RasterConfig
from diff_gaussian_rasterization_tpu.ops.oracle import render_oracle
from diff_gaussian_rasterization_tpu.ops.rasterize import rasterize

from scenes import make_scene

CFG = RasterConfig(tile_h=8, tile_w=8, chunk=16)


def run_both(scene, cam, cfg=CFG, **over):
    kw = dict(scene)
    kw.update(over)
    means = kw.pop("means3D")
    a = render_oracle(means, cam, cfg, **kw)
    b = rasterize(means, cam, cfg, backend="xla", tile_batch=4, **kw)
    return a, b


def assert_outputs_close(a, b, atol=1e-5):
    np.testing.assert_allclose(np.asarray(a.color), np.asarray(b.color),
                               atol=atol, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(a.depth), np.asarray(b.depth),
                               atol=atol, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(a.opacity_map),
                               np.asarray(b.opacity_map), atol=atol)
    np.testing.assert_allclose(np.asarray(a.depth_median),
                               np.asarray(b.depth_median), atol=atol)
    np.testing.assert_allclose(np.asarray(a.gau_uncertainty),
                               np.asarray(b.gau_uncertainty),
                               atol=atol, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(a.gau_related_pixels),
                                  np.asarray(b.gau_related_pixels))
    np.testing.assert_array_equal(np.asarray(a.radii), np.asarray(b.radii))


@pytest.mark.quick
def test_forward_parity_colors_precomp():
    scene, cam = make_scene(p=96, h=32, w=40, seed=0)
    a, b = run_both(scene, cam)
    assert not bool(b.overflow)
    assert int(b.num_rendered) == int(a.num_rendered)
    assert_outputs_close(a, b)


@pytest.mark.quick
def test_bin_row_gather_bit_identical():
    """The 1-column marks-scan + row-gather binning expansion
    (``RasterConfig.bin_row_gather``) must be BIT-identical to the
    12-column delta-scan through the full op — same instance stream in a
    different construction order, so forward outputs and every gradient
    must match exactly before the flag can be adopted on chip.

    Runs the XLA backend only: the flag changes ``bin_gaussians``'s
    expansion, which is shared code strictly UPSTREAM of both backend
    kernels (both consume the same ``Binned``), so XLA-path identity
    covers the Pallas chip path too.  (Chip A/B 2026-08-20: the variant
    LOST, 47.8 vs 51.3 renders/s — kept as a tested knob, not default.)"""
    scene, cam = make_scene(p=96, h=32, w=40, seed=1)
    kw = dict(scene)
    means = kw.pop("means3D")
    cfg_rg = RasterConfig(tile_h=8, tile_w=8, chunk=16, bin_row_gather=True)

    def loss(cfg, m, v):
        out = rasterize(m, Camera(viewmatrix=v, tanfovx=cam.tanfovx,
                                  tanfovy=cam.tanfovy, height=cam.height,
                                  width=cam.width),
                        cfg, backend="xla", tile_batch=4, **kw)
        return (jnp.sum(out.color * out.color) + jnp.sum(out.depth)
                + 0.5 * jnp.sum(out.opacity_map)), out

    v0 = jnp.asarray(cam.viewmatrix)
    (l_a, out_a), g_a = jax.value_and_grad(
        lambda m, v: loss(CFG, m, v), argnums=(0, 1), has_aux=True)(
            means, v0)
    (l_b, out_b), g_b = jax.value_and_grad(
        lambda m, v: loss(cfg_rg, m, v), argnums=(0, 1), has_aux=True)(
            means, v0)
    np.testing.assert_array_equal(np.asarray(out_a.color),
                                  np.asarray(out_b.color))
    np.testing.assert_array_equal(np.asarray(out_a.depth),
                                  np.asarray(out_b.depth))
    np.testing.assert_array_equal(np.asarray(out_a.radii),
                                  np.asarray(out_b.radii))
    assert int(out_a.num_rendered) == int(out_b.num_rendered)
    np.testing.assert_array_equal(np.asarray(l_a), np.asarray(l_b))
    for ga, gb in zip(g_a, g_b):
        np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))


def test_forward_parity_sh():
    scene, cam = make_scene(p=64, h=24, w=32, seed=4, sh_degree=3)
    a, b = run_both(scene, cam)
    assert_outputs_close(a, b)


def test_forward_parity_nontile_multiple_size():
    # H, W not multiples of the tile shape exercise padding/cropping
    scene, cam = make_scene(p=64, h=29, w=35, seed=8)
    a, b = run_both(scene, cam)
    assert_outputs_close(a, b)


def _loss(out, wc, include_var=True):
    l = (
        jnp.sum(wc * out.color)
        + 0.3 * jnp.sum(out.depth)
        + 0.2 * jnp.sum(out.opacity_map)
        + 0.15 * jnp.sum(out.depth_median)
    )
    if include_var:
        l = l + 0.1 * jnp.sum(out.depth_var)
    return l


@pytest.mark.parametrize("pose_full,ref_var", [
    (False, False), (True, False),
    # ref_var=True is the DEFAULT config: both oracle and production emit
    # the reference's phantom depth-var backward (value 0, gradient of the
    # true variance) and must agree on it.
    (False, True),
])
def test_gradient_parity_all_params(pose_full, ref_var):
    cfg = CFG.replace(
        pose_cov2d_branch=pose_full, pose_sh_branch=pose_full,
        ref_depth_var=ref_var,
    )
    scene, cam = make_scene(p=72, h=24, w=32, seed=13, sh_degree=1)
    wc = jnp.asarray(np.random.RandomState(1).uniform(0.5, 1, (3, 1, 1)),
                     jnp.float32)
    keys = ["means3D", "scales", "rotations", "opacities", "shs"]

    def make_loss(render_fn):
        def f(params, view):
            cam2 = Camera(viewmatrix=view, tanfovx=cam.tanfovx,
                          tanfovy=cam.tanfovy, height=cam.height,
                          width=cam.width)
            kw = dict(scene)
            kw.update(params)
            means = kw.pop("means3D")
            out = render_fn(means, cam2, cfg, **kw)
            return _loss(out, wc)
        return f

    params = {k: scene[k] for k in keys}
    f_oracle = make_loss(render_oracle)
    f_prod = make_loss(
        lambda *a, **k: rasterize(*a, backend="xla", tile_batch=4, **k)
    )
    g_oracle = jax.grad(f_oracle, argnums=(0, 1))(params, cam.viewmatrix)
    g_prod = jax.grad(f_prod, argnums=(0, 1))(params, cam.viewmatrix)

    for k in keys:
        np.testing.assert_allclose(
            np.asarray(g_oracle[0][k]), np.asarray(g_prod[0][k]),
            rtol=5e-4, atol=2e-5, err_msg=k,
        )
    np.testing.assert_allclose(
        np.asarray(g_oracle[1]), np.asarray(g_prod[1]),
        rtol=5e-4, atol=2e-5, err_msg="viewmatrix",
    )


def test_ref_depth_var_phantom_backward():
    """cfg.ref_depth_var=True: forward var is 0, backward matches the true
    gradient of the true-var render (reference quirk, forward.cu:317,410 vs
    backward.cu:608-611)."""
    scene, cam = make_scene(p=48, h=16, w=24, seed=3)

    def f(cfgv, means):
        out = rasterize(means, cam, CFG.replace(ref_depth_var=cfgv),
                        backend="xla", tile_batch=4,
                        **{k: v for k, v in scene.items() if k != "means3D"})
        return jnp.sum(out.depth_var), out

    (v_ref, out_ref) = f(True, scene["means3D"])
    (v_true, _) = f(False, scene["means3D"])
    assert float(v_ref) == 0.0
    assert float(v_true) > 0.0

    g_ref = jax.grad(lambda m: f(True, m)[0])(scene["means3D"])
    g_true = jax.grad(lambda m: f(False, m)[0])(scene["means3D"])
    np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_true),
                               rtol=1e-4, atol=1e-6)


def test_track_off_map_off_gates():
    scene, cam = make_scene(p=48, h=16, w=24, seed=6)

    def loss(means, view, **flags):
        cam2 = Camera(viewmatrix=view, tanfovx=cam.tanfovx,
                      tanfovy=cam.tanfovy, height=cam.height, width=cam.width)
        out = rasterize(means, cam2, CFG, backend="xla", tile_batch=4,
                        **{k: v for k, v in scene.items() if k != "means3D"},
                        **flags)
        return jnp.sum(out.color) + jnp.sum(out.depth)

    g_m, g_v = jax.grad(loss, argnums=(0, 1))(
        scene["means3D"], cam.viewmatrix, track_off=True)
    assert float(jnp.abs(g_v).max()) == 0.0       # pose gated off
    assert float(jnp.abs(g_m).max()) > 0.0

    g_m, g_v = jax.grad(loss, argnums=(0, 1))(
        scene["means3D"], cam.viewmatrix, map_off=True)
    assert float(jnp.abs(g_m).max()) == 0.0       # gaussian params gated off
    assert float(jnp.abs(g_v).max()) > 0.0


def test_forward_parity_nondefault_alpha_min():
    # the binning-level ellipse cull derives its level set from
    # cfg.alpha_min; with a lower threshold it must keep the extra
    # instances whose pixels now pass the blend skip test
    cfg = CFG.replace(alpha_min=1.0 / 255.0)
    scene, cam = make_scene(p=96, h=32, w=40, seed=0)
    a, b = run_both(scene, cam, cfg=cfg)
    assert_outputs_close(a, b)


def test_count_instances_matches_num_rendered():
    from diff_gaussian_rasterization_tpu.ops.rasterize import count_instances
    scene, cam = make_scene(p=96, h=32, w=40, seed=0)
    kw = {k: v for k, v in scene.items() if k != "means3D"}
    n = int(count_instances(scene["means3D"], cam, CFG, **kw))
    out = rasterize(scene["means3D"], cam, CFG, backend="xla", tile_batch=4,
                    **kw)
    assert n == int(out.num_rendered)


@pytest.mark.quick
def test_symbolic_zero_cotangent_gating():
    """A loss that never touches median/var must produce the same gradients
    as one that multiplies their cotangents by 0.0 — the former takes the
    symbolic-zero (want_med=want_var=False) kernel path."""
    scene, cam = make_scene(p=48, h=16, w=24, seed=6)
    kw = {k: v for k, v in scene.items() if k != "means3D"}

    def loss_min(m):
        out = rasterize(m, cam, CFG, backend="xla", tile_batch=4, **kw)
        return jnp.sum(out.color) + jnp.sum(out.opacity_map)

    def loss_zero(m):
        out = rasterize(m, cam, CFG, backend="xla", tile_batch=4, **kw)
        return (jnp.sum(out.color) + jnp.sum(out.opacity_map)
                + 0.0 * jnp.sum(out.depth_median)
                + 0.0 * jnp.sum(out.depth_var))

    g1 = jax.grad(loss_min)(scene["means3D"])
    g2 = jax.grad(loss_zero)(scene["means3D"])
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-6, atol=1e-8)


def test_overflow_reporting():
    scene, cam = make_scene(p=96, h=32, w=40, seed=0)
    out = rasterize(
        scene["means3D"], cam, CFG, backend="xla", tile_batch=4,
        max_instances=64,
        **{k: v for k, v in scene.items() if k != "means3D"},
    )
    assert bool(out.overflow)
    assert int(out.num_rendered) > 64


@pytest.mark.quick
def test_pose_jvp_matches_jacfwd():
    """rasterize_with_pose_jvp's exact one-pass tangents == jacfwd of the
    pure-XLA pipeline (the dense forward-mode reference), for all four
    tangent image streams and the primal outputs."""
    from diff_gaussian_rasterization_tpu.models import lie
    from diff_gaussian_rasterization_tpu.ops.rasterize import (
        rasterize_with_pose_jvp,
    )

    scene, cam = make_scene(p=96, h=32, w=40, seed=21)
    kw = {k: v for k, v in scene.items()
          if k not in ("means3D", "bg", "gt_depth")}
    view0 = cam.viewmatrix

    # twist-basis tangent matrices at xi=0
    tw_basis = jax.jacfwd(lambda xi: lie.apply_twist(view0, xi))(
        jnp.zeros((6,), jnp.float32))                  # [4, 4, 6]
    tangents = jnp.moveaxis(tw_basis, -1, 0)           # [6, 4, 4]

    j = rasterize_with_pose_jvp(
        scene["means3D"], cam, CFG, tangents, bg=scene["bg"],
        gt_depth=scene["gt_depth"], backend="xla", tile_batch=4, **kw)

    def render_of_xi(xi):
        view = lie.apply_twist(view0, xi)
        cam2 = Camera(viewmatrix=view, tanfovx=cam.tanfovx,
                      tanfovy=cam.tanfovy, height=cam.height,
                      width=cam.width)
        out = rasterize(scene["means3D"], cam2, CFG, backend="xla",
                        tile_batch=4, use_custom_vjp=False, bg=scene["bg"],
                        gt_depth=scene["gt_depth"], **kw)
        return (out.color, out.depth[0], out.opacity_map[0],
                out.depth_median[0])

    ref = render_of_xi(jnp.zeros((6,), jnp.float32))
    np.testing.assert_allclose(np.asarray(j.out.color), np.asarray(ref[0]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(j.out.depth[0]),
                               np.asarray(ref[1]), atol=1e-6)

    jac = jax.jacfwd(render_of_xi)(jnp.zeros((6,), jnp.float32))
    for got, want, name in (
            (j.color, jnp.moveaxis(jac[0], -1, 0), "color"),
            (j.depth, jnp.moveaxis(jac[1], -1, 0), "depth"),
            (j.opacity_map, jnp.moveaxis(jac[2], -1, 0), "opacity_map"),
            (j.depth_median, jnp.moveaxis(jac[3], -1, 0), "depth_median")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_pose_jvp_full_variant_matches_jacfwd():
    """cfg.pose_cov2d_branch=True: the one-pass JVP now ALSO propagates the
    Sigma2D/EWA conic tangents (full backward.cu:243-302 in forward mode)
    and must match jacfwd of the full-branch dense pipeline — the branch
    the light surface documents as dropped (~11% Frobenius on anisotropic
    scenes, test_pose_jvp_sigma2d_branch_bound)."""
    from diff_gaussian_rasterization_tpu.models import lie
    from diff_gaussian_rasterization_tpu.ops.rasterize import (
        rasterize_with_pose_jvp,
    )

    cfg = CFG.replace(pose_cov2d_branch=True)
    scene, cam = make_scene(p=96, h=32, w=40, seed=21)
    kw = {k: v for k, v in scene.items()
          if k not in ("means3D", "bg", "gt_depth")}
    view0 = cam.viewmatrix
    tw_basis = jax.jacfwd(lambda xi: lie.apply_twist(view0, xi))(
        jnp.zeros((6,), jnp.float32))
    tangents = jnp.moveaxis(tw_basis, -1, 0)

    j = rasterize_with_pose_jvp(
        scene["means3D"], cam, cfg, tangents, bg=scene["bg"],
        gt_depth=scene["gt_depth"], backend="xla", tile_batch=4, **kw)

    def render_of_xi(xi):
        view = lie.apply_twist(view0, xi)
        cam2 = Camera(viewmatrix=view, tanfovx=cam.tanfovx,
                      tanfovy=cam.tanfovy, height=cam.height,
                      width=cam.width)
        out = rasterize(scene["means3D"], cam2, cfg, backend="xla",
                        tile_batch=4, use_custom_vjp=False, bg=scene["bg"],
                        gt_depth=scene["gt_depth"], **kw)
        return (out.color, out.depth[0], out.opacity_map[0])

    jac = jax.jacfwd(render_of_xi)(jnp.zeros((6,), jnp.float32))
    for got, want, name in (
            (j.color, jnp.moveaxis(jac[0], -1, 0), "color"),
            (j.depth, jnp.moveaxis(jac[1], -1, 0), "depth"),
            (j.opacity_map, jnp.moveaxis(jac[2], -1, 0), "opacity_map")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5, err_msg=name)

    # the light surface must NOT silently masquerade as full on the one
    # remaining unsupported path (sharded mesh)
    if len(jax.devices()) > 1:
        from diff_gaussian_rasterization_tpu.parallel.mesh import make_mesh
        with pytest.raises(ValueError):
            rasterize_with_pose_jvp(
                scene["means3D"], cam, cfg, tangents,
                mesh=make_mesh(shape=(len(jax.devices()),),
                               axis_names=("tile",)), **kw)


@pytest.mark.quick
def test_pose_jvp_full_variant_pallas_matches_xla():
    """Round 5: the Sigma2D/EWA conic tangents now ride the Pallas
    _jvp_kernel too (3 extra tangent rows per twist, per_k=6) — the
    Pallas full-variant dual render must match the XLA JVP path, so
    exact full-Jacobian GN can run at bench scale."""
    from diff_gaussian_rasterization_tpu.models import lie
    from diff_gaussian_rasterization_tpu.ops.rasterize import (
        rasterize_with_pose_jvp,
    )

    cfg = RasterConfig(tile_h=8, tile_w=16, chunk=32,
                       pose_cov2d_branch=True)
    scene, cam = make_scene(p=96, h=32, w=64, seed=23)
    kw = {k: v for k, v in scene.items()
          if k not in ("means3D", "bg", "gt_depth")}
    view0 = cam.viewmatrix
    tw_basis = jax.jacfwd(lambda xi: lie.apply_twist(view0, xi))(
        jnp.zeros((6,), jnp.float32))
    tangents = jnp.moveaxis(tw_basis, -1, 0)

    def run(backend):
        return rasterize_with_pose_jvp(
            scene["means3D"], cam, cfg, tangents, bg=scene["bg"],
            gt_depth=scene["gt_depth"], backend=backend, tile_batch=4,
            **kw)

    a = run("xla")
    b = run("pallas")
    np.testing.assert_allclose(np.asarray(a.out.color),
                               np.asarray(b.out.color),
                               rtol=1e-4, atol=2e-5)
    for name in ("color", "depth", "opacity_map"):
        np.testing.assert_allclose(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
            rtol=2e-4, atol=5e-5, err_msg=name)


def test_pose_jvp_sigma2d_branch_bound():
    """Quantify the Σ2D/conic tangent branch the pose JVP drops by
    construction (light-variant semantics, reference README.md:53-58).

    On a strongly anisotropic stress scene (13:1 axis ratio — the worst
    realistic case for view-dependent projected covariance), the JVP must
    (a) match jacfwd of the LIGHT-branch path exactly, and (b) differ from
    jacfwd of the FULL-branch path (pose_cov2d_branch=True) by a bounded,
    *nonzero* relative amount — measured ~11% Frobenius overall, up to
    ~43% on the roll twist (rotation about the view axis moves projected
    covariances most while moving centers least).  This keeps the
    "exact GN" tracking claim honest: exact w.r.t. the light Jacobian."""
    from diff_gaussian_rasterization_tpu.models import lie
    from diff_gaussian_rasterization_tpu.ops.rasterize import (
        rasterize_with_pose_jvp,
    )

    rng = np.random.RandomState(5)
    p, h, w = 96, 32, 40
    means = rng.uniform(-1, 1, (p, 3))
    means[:, 2] = rng.uniform(1.0, 4.0, p)
    scales = np.stack([rng.uniform(0.3, 0.5, p),
                       rng.uniform(0.02, 0.04, p),
                       rng.uniform(0.02, 0.04, p)], -1)
    quats = rng.normal(size=(p, 4))
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    kw = dict(
        opacities=jnp.asarray(rng.uniform(0.3, 0.95, (p, 1)), jnp.float32),
        scales=jnp.asarray(scales, jnp.float32),
        rotations=jnp.asarray(quats, jnp.float32),
        colors_precomp=jnp.asarray(rng.uniform(0, 1, (p, 3)), jnp.float32),
    )
    bg = jnp.zeros(3, jnp.float32)
    gt = jnp.asarray(rng.uniform(1, 4, (h, w)), jnp.float32)
    cam = Camera(viewmatrix=jnp.eye(4), tanfovx=float(np.tan(0.5)),
                 tanfovy=float(np.tan(0.4)), height=h, width=w)
    m3 = jnp.asarray(means, jnp.float32)

    tw = jax.jacfwd(lambda xi: lie.apply_twist(cam.viewmatrix, xi))(
        jnp.zeros((6,), jnp.float32))
    j = rasterize_with_pose_jvp(m3, cam, CFG, jnp.moveaxis(tw, -1, 0),
                                bg=bg, gt_depth=gt, backend="xla",
                                tile_batch=4, **kw)

    def jac_of(cfg):
        def render_of_xi(xi):
            view = lie.apply_twist(cam.viewmatrix, xi)
            cam2 = Camera(viewmatrix=view, tanfovx=cam.tanfovx,
                          tanfovy=cam.tanfovy, height=h, width=w)
            out = rasterize(m3, cam2, cfg, backend="xla", tile_batch=4,
                            use_custom_vjp=False, bg=bg, gt_depth=gt, **kw)
            return out.color, out.depth[0]
        return jax.jacfwd(render_of_xi)(jnp.zeros((6,), jnp.float32))

    def rel(got, want):
        g, wt = np.asarray(got), np.asarray(jnp.moveaxis(want, -1, 0))
        overall = np.linalg.norm(g - wt) / np.linalg.norm(wt)
        per_tw = [np.linalg.norm(g[k] - wt[k])
                  / max(np.linalg.norm(wt[k]), 1e-12) for k in range(6)]
        return overall, max(per_tw)

    light = jac_of(CFG)
    assert rel(j.color, light[0])[0] < 1e-3
    assert rel(j.depth, light[1])[0] < 1e-3

    full = jac_of(CFG.replace(pose_cov2d_branch=True))
    for got, want, name in ((j.color, full[0], "color"),
                            (j.depth, full[1], "depth")):
        overall, worst = rel(got, want)
        # nonzero (the test can detect the branch) and bounded (the
        # documented approximation error of "exact GN")
        assert 0.02 < overall < 0.25, (name, overall)
        assert worst < 0.6, (name, worst)


def test_pose_jvp_overflow_reported():
    """rasterize_with_pose_jvp under an undersized instance budget must
    report overflow (never a silent cap), like rasterize."""
    from diff_gaussian_rasterization_tpu.models import lie
    from diff_gaussian_rasterization_tpu.ops.rasterize import (
        rasterize_with_pose_jvp,
    )

    scene, cam = make_scene(p=96, h=32, w=40, seed=0)
    kw = {k: v for k, v in scene.items()
          if k not in ("means3D", "bg", "gt_depth")}
    tw = jax.jacfwd(lambda xi: lie.apply_twist(cam.viewmatrix, xi))(
        jnp.zeros((6,), jnp.float32))
    j = rasterize_with_pose_jvp(
        scene["means3D"], cam, CFG, jnp.moveaxis(tw, -1, 0),
        max_instances=128, backend="xla", tile_batch=4, **kw)
    assert bool(j.out.overflow)
    assert np.all(np.isfinite(np.asarray(j.color)))


@pytest.mark.quick
def test_binning_reuse_exact_at_bin_pose():
    """rasterize(binn=precomputed) with a margin must reproduce a
    fresh-binning render at the binning pose to rounding: padded
    instances can never pass alpha >= alpha_min there, so they only
    insert exact-identity lanes into the prefix scans (the log-doubling
    scan tree re-associates around them -> ulp-level noise, nothing
    more).  A small pose delta must stay close (frozen sort order /
    instance set is the tracking approximation)."""
    from diff_gaussian_rasterization_tpu.models import lie
    from diff_gaussian_rasterization_tpu.ops.rasterize import bin_for_view

    scene, cam = make_scene(p=48, h=24, w=32, seed=13)
    kw = {k: v for k, v in scene.items() if k != "means3D"}
    m = scene["means3D"]

    base = rasterize(m, cam, CFG, backend="xla", tile_batch=4, **kw)
    cfgm = CFG.replace(bin_margin_px=5.0)
    binn = bin_for_view(m, cam, cfgm, max_instances=4096,
                        **{k: v for k, v in kw.items()
                           if k not in ("bg", "gt_depth")})
    # the margin must not overflow the budget, or real (deepest) instances
    # are dropped and the reuse is no longer exact
    assert not bool(binn.overflow)
    reused = rasterize(m, cam, CFG, backend="xla", tile_batch=4,
                       binn=binn, **kw)
    np.testing.assert_allclose(np.asarray(base.color),
                               np.asarray(reused.color), atol=5e-6)
    np.testing.assert_allclose(np.asarray(base.depth),
                               np.asarray(reused.depth), rtol=3e-6,
                               atol=5e-6)
    np.testing.assert_allclose(np.asarray(base.opacity_map),
                               np.asarray(reused.opacity_map), atol=5e-6)

    # gradients flow through the reused-binning render
    g = jax.grad(lambda mm: jnp.sum(rasterize(
        mm, cam, CFG, backend="xla", tile_batch=4, binn=binn,
        **kw).color))(m)
    g0 = jax.grad(lambda mm: jnp.sum(rasterize(
        mm, cam, CFG, backend="xla", tile_batch=4, **kw).color))(m)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g0),
                               rtol=1e-4, atol=1e-6)

    # nearby pose: frozen binning stays a close approximation (margin
    # covers the motion)
    xi = jnp.asarray([0.004, -0.003, 0.002, 0.001, -0.002, 0.001])
    cam2 = Camera(viewmatrix=lie.apply_twist(cam.viewmatrix, xi),
                  tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
                  height=cam.height, width=cam.width)
    fresh = rasterize(m, cam2, CFG, backend="xla", tile_batch=4, **kw)
    moved = rasterize(m, cam2, CFG, backend="xla", tile_batch=4,
                      binn=binn, **kw)
    err = float(jnp.abs(fresh.color - moved.color).max())
    assert err < 0.05, err
