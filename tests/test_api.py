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


def test_torch_tensor_inputs():
    # CG-SLAM callers pass torch tensors with requires_grad=True (the
    # reference is a torch extension); the compat surface must accept them
    torch = pytest.importorskip("torch")
    p = 64
    g = torch.Generator().manual_seed(0)
    means = torch.randn(p, 3, generator=g).requires_grad_(True)
    means = means + torch.tensor([0.0, 0.0, 3.0])
    means.retain_grad()
    scales = (0.05 * torch.rand(p, 3, generator=g) + 0.01).requires_grad_(True)
    rots = torch.randn(p, 4, generator=g).requires_grad_(True)
    ops = torch.rand(p, 1, generator=g).requires_grad_(True)
    cols = torch.rand(p, 3, generator=g).requires_grad_(True)
    settings = dgr.GaussianRasterizationSettings(
        image_height=32, image_width=48, tanfovx=0.7, tanfovy=0.5,
        bg=torch.zeros(3), scale_modifier=1.0,
        viewmatrix=torch.eye(4),
    )
    r = dgr.GaussianRasterizer(settings, config=CFG)
    out = r(means3D=means, opacities=ops, colors_precomp=cols,
            scales=scales, rotations=rots)
    color = np.asarray(out[0])
    assert color.shape == (3, 32, 48)
    assert np.all(np.isfinite(color))
