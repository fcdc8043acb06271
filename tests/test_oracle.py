"""Oracle renderer: forward properties and finite-difference gradient checks.

The reference ships zero tests (SURVEY.md §4); this file is the root of our
test pyramid — everything else is validated against the oracle, and the
oracle is validated here against finite differences and invariants.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_gaussian_rasterization_tpu.camera import Camera
from diff_gaussian_rasterization_tpu.config import RasterConfig
from diff_gaussian_rasterization_tpu.ops.oracle import render_oracle
from diff_gaussian_rasterization_tpu.utils.testing import enable_x64

from scenes import make_scene

CFG = RasterConfig(tile_h=8, tile_w=8)


def render(scene, cam, cfg=CFG, **over):
    kw = dict(scene)
    kw.update(over)
    means = kw.pop("means3D")
    return render_oracle(means, cam, cfg, **kw)


def test_forward_shapes_and_ranges():
    scene, cam = make_scene(p=96, h=32, w=40)
    out = render(scene, cam)
    assert out.color.shape == (3, 32, 40)
    assert out.depth.shape == (1, 32, 40)
    assert np.all(np.isfinite(np.asarray(out.color)))
    a = np.asarray(out.opacity_map)
    assert a.min() >= 0.0 and a.max() <= 1.0 + 1e-5
    assert np.all(np.asarray(out.depth) >= 0.0)
    # reference parity: depth_var is identically zero in the forward
    assert np.all(np.asarray(out.depth_var) == 0.0)
    assert int(out.gau_related_pixels.sum()) > 0
    # every crossing pixel has a median depth
    med = np.asarray(out.depth_median[0])
    assert (med > 0).sum() == int(out.gau_related_pixels.sum())


def test_median_is_a_rendered_gaussian_depth():
    scene, cam = make_scene(p=64, h=24, w=24, seed=3)
    out = render(scene, cam)
    med = np.asarray(out.depth_median[0])
    zs = np.asarray(
        scene["means3D"] @ np.asarray(cam.viewmatrix)[:3, 2]
        + np.asarray(cam.viewmatrix)[3, 2]
    )
    got = med[med > 0]
    # each median value equals some per-Gaussian view depth
    dist = np.abs(got[:, None] - zs[None, :]).min(axis=1)
    assert dist.max() < 1e-5


def test_background_composites_with_final_transmittance():
    scene, cam = make_scene(p=8, h=16, w=16, seed=1)
    out0 = render(scene, cam, bg=jnp.zeros(3))
    out1 = render(scene, cam, bg=jnp.ones(3))
    diff = np.asarray(out1.color - out0.color)
    # color difference is exactly T_final per channel, within [0, 1]
    assert diff.min() >= -1e-6 and diff.max() <= 1.0 + 1e-6
    assert np.allclose(diff[0], diff[1], atol=1e-6)
    # telescoping: T_final ~= 1 - opacity_map
    assert np.allclose(
        diff[0], 1.0 - np.asarray(out0.opacity_map[0]), atol=1e-4
    )


def _fd_check(f, x, eps, rtol, atol, n_probe=6, seed=0):
    """Compare jax.grad(f)(x) against central finite differences along
    random directions."""
    g = jax.grad(f)(x)
    rng = np.random.RandomState(seed)
    for _ in range(n_probe):
        v = jnp.asarray(rng.normal(size=x.shape), x.dtype)
        fd = (f(x + eps * v) - f(x - eps * v)) / (2 * eps)
        an = jnp.sum(g * v)
        np.testing.assert_allclose(
            np.asarray(fd), np.asarray(an), rtol=rtol, atol=atol
        )


@pytest.mark.parametrize(
    "param",
    ["means3D", "scales", "rotations", "opacities", "colors_precomp"],
)
def test_fd_gradients_gaussian_params(param):
    with enable_x64():
        scene, cam = make_scene(p=48, h=24, w=24, seed=7, dtype=jnp.float64)
        cam = Camera(
            viewmatrix=jnp.asarray(cam.viewmatrix, jnp.float64),
            tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
            height=cam.height, width=cam.width,
        )
        wc = jnp.asarray(np.random.RandomState(0).uniform(0.5, 1, (3, 1, 1)))

        def f(x):
            out = render(scene, cam, **{param: x})
            return (
                jnp.sum(wc * out.color)
                + 0.3 * jnp.sum(out.depth)
                + 0.2 * jnp.sum(out.opacity_map)
            )

        _fd_check(f, scene[param], eps=1e-6, rtol=2e-5, atol=1e-7)


@pytest.mark.quick
def test_fd_gradient_pose_full():
    """Pose gradient with ALL branches enabled == true derivative."""
    with enable_x64():
        cfg = CFG.replace(pose_cov2d_branch=True, pose_sh_branch=True)
        scene, cam0 = make_scene(p=48, h=24, w=24, seed=11, dtype=jnp.float64)

        def f(view):
            cam = Camera(
                viewmatrix=view, tanfovx=cam0.tanfovx, tanfovy=cam0.tanfovy,
                height=cam0.height, width=cam0.width,
            )
            out = render(scene, cam, cfg)
            return jnp.sum(out.color) + 0.3 * jnp.sum(out.depth)

        _fd_check(
            f, jnp.asarray(cam0.viewmatrix, jnp.float64),
            eps=1e-7, rtol=5e-5, atol=1e-6,
        )


def test_pose_grad_light_drops_cov2d_branch():
    scene, cam0 = make_scene(p=48, h=24, w=24, seed=5)

    def grad_for(cfg):
        def f(view):
            cam = Camera(
                viewmatrix=view, tanfovx=cam0.tanfovx, tanfovy=cam0.tanfovy,
                height=cam0.height, width=cam0.width,
            )
            return jnp.sum(render(scene, cam, cfg).color)

        return jax.grad(f)(cam0.viewmatrix)

    g_light = grad_for(CFG)
    g_full = grad_for(CFG.replace(pose_cov2d_branch=True))
    # branches differ => gradients differ, but both leave the projective
    # column untouched (reference: only v0..v14 minus v3,v7,v11 accumulate)
    assert not np.allclose(np.asarray(g_light), np.asarray(g_full))
    np.testing.assert_allclose(np.asarray(g_light[:, 3]), 0.0)
    np.testing.assert_allclose(np.asarray(g_full[:, 3]), 0.0)


def test_sh_color_rendering_and_grads():
    with enable_x64():
        scene, cam = make_scene(p=32, h=16, w=16, seed=9, sh_degree=2,
                                dtype=jnp.float64)

        def f(sh):
            out = render(scene, cam, shs=sh)
            return jnp.sum(out.color)

        out = render(scene, cam)
        assert np.all(np.isfinite(np.asarray(out.color)))
        _fd_check(f, scene["shs"], eps=1e-6, rtol=2e-5, atol=1e-7)


def test_tile_mask_matches_no_mask_closely():
    # with 3-sigma rects, tile masking only removes sub-threshold tails
    scene, cam = make_scene(p=96, h=32, w=40, seed=2)
    a = render(scene, cam, tile_mask=True)
    b = render(scene, cam, tile_mask=False)
    np.testing.assert_allclose(
        np.asarray(a.color), np.asarray(b.color), atol=2e-2
    )
