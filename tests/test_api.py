"""Reference-compatible API surface (GaussianRasterizationSettings etc.)."""

import jax.numpy as jnp
import numpy as np
import pytest

import diff_gaussian_rasterization_tpu as dgr
from diff_gaussian_rasterization_tpu.config import RasterConfig

from scenes import make_scene

pytestmark = pytest.mark.quick

CFG = RasterConfig(tile_h=8, tile_w=8, chunk=16)


def make_settings(cam, scene, **over):
    kw = dict(
        image_height=cam.height, image_width=cam.width,
        tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
        bg=scene["bg"], scale_modifier=1.0,
        viewmatrix=cam.viewmatrix, projmatrix=None, sh_degree=0,
        campos=None, prefiltered=False, debug=False, perspec_matrix=None,
        track_off=False, map_off=False,
    )
    kw.update(over)
    return dgr.GaussianRasterizationSettings(**kw)


def test_rasterizer_eight_tuple():
    scene, cam = make_scene(p=48, h=24, w=32, seed=1)
    settings = make_settings(cam, scene)
    r = dgr.GaussianRasterizer(settings, config=CFG)
    out = r(
        means3D=scene["means3D"], opacities=scene["opacities"],
        colors_precomp=scene["colors_precomp"], scales=scene["scales"],
        rotations=scene["rotations"], viewmatrix=cam.viewmatrix,
        gt_depth=scene["gt_depth"],
    )
    (color, radii, depth, depth_median, depth_var, opacity_map,
     gau_uncertainty, gau_related_pixels) = out
    assert color.shape == (3, 24, 32)
    assert radii.shape == (48,)
    assert depth.shape == depth_median.shape == (1, 24, 32)
    assert np.all(np.asarray(depth_var) == 0.0)  # reference parity
    assert gau_uncertainty.shape == (48, 1)
    assert gau_related_pixels.dtype == jnp.int32

    # matches the native API exactly
    native = dgr.rasterize(
        scene["means3D"],
        dgr.Camera(viewmatrix=cam.viewmatrix, tanfovx=cam.tanfovx,
                   tanfovy=cam.tanfovy, height=24, width=32),
        CFG, opacities=scene["opacities"],
        colors_precomp=scene["colors_precomp"], scales=scene["scales"],
        rotations=scene["rotations"], bg=scene["bg"],
        gt_depth=scene["gt_depth"],
    )
    np.testing.assert_allclose(np.asarray(color), np.asarray(native.color),
                               atol=1e-6)


def test_full_variant_four_tuple():
    # full package forward returns (color, radii, depth, uncertainty) where
    # "uncertainty" is the silhouette map (full rasterize_points.cu:119,
    # forward.cu:367,394) and all pose-Jacobian branches are enabled
    scene, cam = make_scene(p=48, h=24, w=32, seed=1)
    settings = make_settings(cam, scene)
    r = dgr.GaussianRasterizer(settings, config=CFG, variant="full")
    assert r.config.pose_cov2d_branch and r.config.pose_sh_branch
    color, radii, depth, uncertainty = r(
        means3D=scene["means3D"], opacities=scene["opacities"],
        colors_precomp=scene["colors_precomp"], scales=scene["scales"],
        rotations=scene["rotations"], viewmatrix=cam.viewmatrix,
        gt_depth=scene["gt_depth"],
    )
    assert color.shape == (3, 24, 32)
    assert uncertainty.shape == (1, 24, 32)
    # the silhouette is a transmittance complement: in (0, 1]
    u = np.asarray(uncertainty)
    assert u.min() >= 0.0 and u.max() <= 1.0 + 1e-6


def test_debug_snapshot_dump(tmp_path, monkeypatch):
    # debug mode dumps inputs on failure (light __init__.py:90-97)
    monkeypatch.chdir(tmp_path)
    scene, cam = make_scene(p=16, h=16, w=16, seed=4)
    bad_means = scene["means3D"].at[0, 0].set(jnp.nan)
    settings = make_settings(cam, scene, debug=True)
    with pytest.raises(FloatingPointError, match="non-finite"):
        dgr.rasterize_gaussians(
            means3D=bad_means, colors_precomp=scene["colors_precomp"],
            opacities=scene["opacities"], scales=scene["scales"],
            rotations=scene["rotations"], viewmatrix=cam.viewmatrix,
            raster_settings=settings, config=CFG,
        )
    import pickle
    snap = pickle.load(open(tmp_path / "snapshot_fw.dump", "rb"))
    assert "means3D" in snap and np.isnan(snap["means3D"][0, 0])


def test_input_validation():
    scene, cam = make_scene(p=16, h=16, w=16)
    r = dgr.GaussianRasterizer(make_settings(cam, scene), config=CFG)
    with pytest.raises(ValueError, match="SHs or precomputed"):
        r(means3D=scene["means3D"], opacities=scene["opacities"],
          scales=scene["scales"], rotations=scene["rotations"])
    with pytest.raises(ValueError, match="scale/rotation pair"):
        r(means3D=scene["means3D"], opacities=scene["opacities"],
          colors_precomp=scene["colors_precomp"])


def test_mark_visible():
    scene, cam = make_scene(p=64, h=16, w=16, seed=2)
    r = dgr.GaussianRasterizer(make_settings(cam, scene), config=CFG)
    vis = r.markVisible(scene["means3D"])
    zs = np.asarray(scene["means3D"][:, 2])  # identity view: z is depth
    np.testing.assert_array_equal(np.asarray(vis), zs > 0.2)


def test_empty_tensor_convention():
    # the reference substitutes empty tensors for unused inputs
    # (light __init__.py:223-233); empty arrays must behave like None
    scene, cam = make_scene(p=16, h=16, w=16, seed=3)
    out = dgr.rasterize_gaussians(
        means3D=scene["means3D"],
        shs=jnp.zeros((0,)),
        colors_precomp=scene["colors_precomp"],
        opacities=scene["opacities"],
        scales=scene["scales"], rotations=scene["rotations"],
        cov3Ds_precomp=jnp.zeros((0,)),
        viewmatrix=cam.viewmatrix,
        gt_depth=scene["gt_depth"],
        raster_settings=make_settings(cam, scene),
        config=CFG,
    )
    assert out[0].shape == (3, 16, 16)


def _torch_scene(torch, p=64, h=32, w=48):
    g = torch.Generator().manual_seed(0)
    means = (torch.randn(p, 3, generator=g)
             + torch.tensor([0.0, 0.0, 3.0])).requires_grad_(True)
    scene = dict(
        means3D=means,
        means2D=torch.zeros(p, 3, requires_grad=True),
        scales=(0.05 * torch.rand(p, 3, generator=g)
                + 0.01).requires_grad_(True),
        rotations=torch.randn(p, 4, generator=g).requires_grad_(True),
        opacities=torch.rand(p, 1, generator=g).requires_grad_(True),
        colors_precomp=torch.rand(p, 3, generator=g).requires_grad_(True),
    )
    view = torch.eye(4).requires_grad_(True)
    settings = dgr.GaussianRasterizationSettings(
        image_height=h, image_width=w, tanfovx=0.7, tanfovy=0.5,
        bg=torch.zeros(3), scale_modifier=1.0, viewmatrix=view,
    )
    return scene, view, settings


def test_torch_autograd_bridge():
    # CG-SLAM callers pass torch tensors with requires_grad=True and call
    # loss.backward(); gradients must land on every input — including the
    # pose (light __init__.py:48-178) — and match jax.grad of the native op
    torch = pytest.importorskip("torch")
    scene, view, settings = _torch_scene(torch)
    # alpha_grad=True: the loss below touches opacity_map, and the jax.grad
    # comparison uses the full VJP; the reference-mirroring default (which
    # drops that cotangent, like the reference autograd.Function) is checked
    # at the end of this test
    r = dgr.GaussianRasterizer(settings, config=CFG, alpha_grad=True)
    out = r(means3D=scene["means3D"], means2D=scene["means2D"],
            opacities=scene["opacities"],
            colors_precomp=scene["colors_precomp"],
            scales=scene["scales"], rotations=scene["rotations"],
            viewmatrix=view)
    color, radii, depth = out[0], out[1], out[2]
    assert torch.is_tensor(color) and color.shape == (3, 32, 48)
    assert color.requires_grad
    loss = color.sum() + 0.3 * depth.sum() + 0.1 * out[5].sum()
    loss.backward()
    assert scene["means3D"].grad is not None
    assert view.grad is not None and view.grad.shape == (4, 4)
    # screen-space densification statistic (reference grad_means2D)
    assert scene["means2D"].grad is not None
    assert float(scene["means2D"].grad.abs().sum()) > 0

    # parity with the native JAX gradients
    import jax

    jview = jnp.asarray(view.detach().numpy())

    def jloss(means, v):
        native = dgr.rasterize(
            means,
            dgr.Camera(viewmatrix=v, tanfovx=0.7, tanfovy=0.5,
                       height=32, width=48),
            CFG,
            opacities=jnp.asarray(scene["opacities"].detach().numpy()),
            colors_precomp=jnp.asarray(
                scene["colors_precomp"].detach().numpy()),
            scales=jnp.asarray(scene["scales"].detach().numpy()),
            rotations=jnp.asarray(scene["rotations"].detach().numpy()),
        )
        return (jnp.sum(native.color) + 0.3 * jnp.sum(native.depth)
                + 0.1 * jnp.sum(native.opacity_map))

    gm, gv = jax.grad(jloss, argnums=(0, 1))(
        jnp.asarray(scene["means3D"].detach().numpy()), jview)
    np.testing.assert_allclose(scene["means3D"].grad.numpy(),
                               np.asarray(gm), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(view.grad.numpy(), np.asarray(gv),
                               rtol=1e-4, atol=1e-6)
    # forward values also match
    np.testing.assert_allclose(
        color.detach().numpy(),
        np.asarray(dgr.rasterize(
            jnp.asarray(scene["means3D"].detach().numpy()),
            dgr.Camera(viewmatrix=jview, tanfovx=0.7, tanfovy=0.5,
                       height=32, width=48),
            CFG,
            opacities=jnp.asarray(scene["opacities"].detach().numpy()),
            colors_precomp=jnp.asarray(
                scene["colors_precomp"].detach().numpy()),
            scales=jnp.asarray(scene["scales"].detach().numpy()),
            rotations=jnp.asarray(scene["rotations"].detach().numpy()),
        ).color), atol=1e-6)
    assert radii.shape == (64,)

    # default (alpha_grad=False) mirrors the reference: the opacity_map
    # cotangent is dropped, so the same loss yields the gradients of a loss
    # WITHOUT the alpha term (light __init__.py:107-152 never passes
    # grad_alpha to _C.rasterize_gaussians_backward)
    view2 = view.detach().clone().requires_grad_(True)
    r_ref = dgr.GaussianRasterizer(settings, config=CFG)
    out2 = r_ref(means3D=scene["means3D"].detach().requires_grad_(True),
                 means2D=torch.zeros(64, 3, requires_grad=True),
                 opacities=scene["opacities"].detach(),
                 colors_precomp=scene["colors_precomp"].detach(),
                 scales=scene["scales"].detach(),
                 rotations=scene["rotations"].detach(), viewmatrix=view2)
    (out2[0].sum() + 0.3 * out2[2].sum() + 0.1 * out2[5].sum()).backward()

    def jloss_noalpha(v):
        native = dgr.rasterize(
            jnp.asarray(scene["means3D"].detach().numpy()),
            dgr.Camera(viewmatrix=v, tanfovx=0.7, tanfovy=0.5,
                       height=32, width=48),
            CFG,
            opacities=jnp.asarray(scene["opacities"].detach().numpy()),
            colors_precomp=jnp.asarray(
                scene["colors_precomp"].detach().numpy()),
            scales=jnp.asarray(scene["scales"].detach().numpy()),
            rotations=jnp.asarray(scene["rotations"].detach().numpy()),
        )
        return jnp.sum(native.color) + 0.3 * jnp.sum(native.depth)

    gv_noalpha = jax.grad(jloss_noalpha)(jview)
    np.testing.assert_allclose(view2.grad.numpy(), np.asarray(gv_noalpha),
                               rtol=1e-4, atol=1e-6)


def test_torch_backward_snapshot_dump(tmp_path, monkeypatch):
    # light __init__.py:149-158: a failing backward writes
    # snapshot_bw.dump with the host-copied backward inputs
    torch = pytest.importorskip("torch")
    monkeypatch.chdir(tmp_path)
    scene, view, settings = _torch_scene(torch, p=16, h=16, w=16)
    settings = settings._replace(debug=True)
    r = dgr.GaussianRasterizer(settings, config=CFG)
    out = r(means3D=scene["means3D"], opacities=scene["opacities"],
            colors_precomp=scene["colors_precomp"],
            scales=scene["scales"], rotations=scene["rotations"],
            viewmatrix=view)
    # poison the cotangent: the backward must detect the non-finite
    # gradient stream and dump forensics
    bad = torch.full((3, 16, 16), float("nan"))
    with pytest.raises(FloatingPointError, match="non-finite"):
        (out[0] * bad).sum().backward()
    import pickle

    snap = pickle.load(open(tmp_path / "snapshot_bw.dump", "rb"))
    assert "means3D" in snap and "cotangents" in snap
    assert np.isnan(snap["cotangents"]["color"]).all()


def test_prefiltered_contract(tmp_path, monkeypatch):
    # auxiliary.h:156-160: prefiltered=True promises every Gaussian passes
    # the frustum test; the reference __trap()s UNCONDITIONALLY (the trap
    # is not gated on debug), so the check must fire without debug too
    monkeypatch.chdir(tmp_path)
    scene, cam = make_scene(p=16, h=16, w=16, seed=5)
    behind = scene["means3D"].at[3, 2].set(-1.0)  # fails z > 0.2 near cull
    for debug in (True, False):
        settings = make_settings(cam, scene, prefiltered=True, debug=debug)
        with pytest.raises(RuntimeError, match="prefiltered"):
            dgr.rasterize_gaussians(
                means3D=behind, colors_precomp=scene["colors_precomp"],
                opacities=scene["opacities"], scales=scene["scales"],
                rotations=scene["rotations"], viewmatrix=cam.viewmatrix,
                raster_settings=settings, config=CFG,
            )
    settings = make_settings(cam, scene, prefiltered=True, debug=True)
    # all-visible prefiltered scene renders fine
    out = dgr.rasterize_gaussians(
        means3D=scene["means3D"], colors_precomp=scene["colors_precomp"],
        opacities=scene["opacities"], scales=scene["scales"],
        rotations=scene["rotations"], viewmatrix=cam.viewmatrix,
        raster_settings=settings, config=CFG,
    )
    assert out[0].shape == (3, 16, 16)


def test_torch_bridge_sh_and_cov3d_paths():
    """The bridge must differentiate the SH-color and precomputed-cov3D
    input combinations too (light __init__.py's two one-of choices)."""
    torch = pytest.importorskip("torch")
    p = 32
    g = torch.Generator().manual_seed(2)
    means = (torch.randn(p, 3, generator=g)
             + torch.tensor([0.0, 0.0, 3.0])).requires_grad_(True)
    shs = torch.rand(p, 4, 3, generator=g).requires_grad_(True)
    ops = torch.rand(p, 1, generator=g).requires_grad_(True)
    # a valid covariance: diag(s^2)
    s2 = (0.05 * torch.rand(p, 3, generator=g) + 0.01) ** 2
    cov3d = torch.zeros(p, 6)
    cov3d[:, 0], cov3d[:, 3], cov3d[:, 5] = s2[:, 0], s2[:, 1], s2[:, 2]
    cov3d = cov3d.requires_grad_(True)
    settings = dgr.GaussianRasterizationSettings(
        image_height=16, image_width=24, tanfovx=0.7, tanfovy=0.5,
        bg=torch.zeros(3), scale_modifier=1.0, viewmatrix=torch.eye(4),
        sh_degree=1,
    )
    r = dgr.GaussianRasterizer(settings, config=CFG)
    out = r(means3D=means, opacities=ops, shs=shs, cov3D_precomp=cov3d)
    out[0].sum().backward()
    assert means.grad is not None and float(means.grad.abs().sum()) > 0
    assert shs.grad is not None and float(shs.grad.abs().sum()) > 0
    assert cov3d.grad is not None and float(cov3d.grad.abs().sum()) > 0
