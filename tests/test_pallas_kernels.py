"""Pallas kernels vs the XLA tile backend (interpret mode on CPU).

The Pallas forward/backward must agree with the XLA backend bit-for-bit in
structure (same blend math module) and numerically to float32 tolerance.
On real TPU hardware the same comparison runs compiled (see bench/TPU CI).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_gaussian_rasterization_tpu.config import RasterConfig
from diff_gaussian_rasterization_tpu.ops import tile_xla
from diff_gaussian_rasterization_tpu.ops.binning import bin_gaussians
from diff_gaussian_rasterization_tpu.ops.kernels import render_pallas
from diff_gaussian_rasterization_tpu.ops.projection import preprocess
from diff_gaussian_rasterization_tpu.ops.rasterize import rasterize
from diff_gaussian_rasterization_tpu.ops.tiling import grid_dims, img_to_tiles

from scenes import make_scene

CFG = RasterConfig(tile_h=8, tile_w=16, chunk=8)


def setup(p=48, h=24, w=32, seed=13, capacity=1024):
    scene, cam = make_scene(p=p, h=h, w=w, seed=seed)
    prep = preprocess(
        scene["means3D"], cam, CFG, opacities=scene["opacities"],
        scales=scene["scales"], rotations=scene["rotations"],
        colors_precomp=scene["colors_precomp"],
    )
    tiles_x, tiles_y = grid_dims(h, w, CFG.tile_h, CFG.tile_w)
    binn = bin_gaussians(prep, tiles_x, tiles_y, capacity, align=128)
    ids = binn.gauss_id
    args = (prep.xy[ids], prep.conic[ids], prep.opacity[ids],
            prep.color[ids], prep.depth[ids], prep.depth_sgview[ids])
    gt_tiles = img_to_tiles(scene["gt_depth"], CFG.tile_h, CFG.tile_w)
    kw = dict(cfg=CFG, tiles_x=tiles_x, capacity=capacity, height=h, width=w)
    return scene, cam, binn, args, gt_tiles, kw


def test_pallas_fwd_matches_xla():
    scene, cam, binn, args, gt_tiles, kw = setup()
    a = tile_xla.core_fwd_xla(*args, binn.tile_start, binn.tile_stop,
                              gt_tiles, tile_batch=4, **kw)
    b = render_pallas.core_fwd(*args, binn.tile_start, binn.tile_stop,
                               gt_tiles, interpret=True, **kw)
    # the Pallas path evaluates the splat exponent via the MXU basis
    # expansion (blend.splat_power), the XLA path directly -> alpha differs
    # by ~1e-4 relative; threshold tests may flip for borderline instances
    for name in tile_xla.CoreOutputs._fields:
        x, y = np.asarray(getattr(a, name)), np.asarray(getattr(b, name))
        if x.dtype == np.int32:
            frac = np.mean(x != y)
            assert frac < 5e-3, (name, frac)
        else:
            np.testing.assert_allclose(x, y, rtol=1e-4, atol=2e-5,
                                       err_msg=name)


def test_pallas_bwd_matches_xla():
    scene, cam, binn, args, gt_tiles, kw = setup()
    fwd = tile_xla.core_fwd_xla(*args, binn.tile_start, binn.tile_stop,
                                gt_tiles, tile_batch=4, **kw)
    t, q = fwd.depth.shape
    rng = np.random.RandomState(0)
    cots = [jnp.asarray(rng.normal(size=s), jnp.float32) for s in
            [(t, 3, q), (t, q), (t, q), (t, q), (t, q), (t, q)]]
    common = (*args[:5], binn.tile_start, binn.tile_stop, gt_tiles,
              fwd.color, fwd.depth, fwd.weight, fwd.var, fwd.t_final,
              *cots)
    a = tile_xla.core_bwd_xla(*common, tile_batch=4, **kw)
    b = render_pallas.core_bwd(*common, interpret=True, **kw)
    names = ["d_xy", "d_conic", "d_opac", "d_color", "d_depth",
             "d_depth_var", "d_depth_med"]
    for n, x, y in zip(names, a, b):
        # packed (kernel) and concat (XLA) paths contract the fused cotangent
        # stream in different summation orders; the moment reconstruction
        # multiplies that few-ulp noise by xgl^2 for splats centered outside
        # the tile, so absolute error scales to ~1e-4 while relative error
        # stays a few 1e-4
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-3, atol=2e-4, err_msg=n)


@pytest.mark.quick
def test_rasterize_pallas_backend_end_to_end():
    scene, cam = make_scene(p=48, h=24, w=32, seed=13)
    kw = {k: v for k, v in scene.items() if k != "means3D"}
    # chunk=128 = one compute chunk per DMA block: sub-chunking is covered
    # by the kernel unit tests; interpret-mode wall time scales with the
    # Python-level chunk loop, so the e2e test runs the coarse config
    CFG = globals()["CFG"].replace(chunk=128)

    def loss(means, view, backend):
        from diff_gaussian_rasterization_tpu.camera import Camera
        cam2 = Camera(viewmatrix=view, tanfovx=cam.tanfovx,
                      tanfovy=cam.tanfovy, height=cam.height, width=cam.width)
        out = rasterize(means, cam2, CFG, backend=backend, tile_batch=4, **kw)
        return (jnp.sum(out.color) + 0.3 * jnp.sum(out.depth)
                + 0.1 * jnp.sum(out.depth_median)), out

    (l_x, out_x) = loss(scene["means3D"], cam.viewmatrix, "xla")
    (l_p, out_p) = loss(scene["means3D"], cam.viewmatrix, "pallas")
    np.testing.assert_allclose(float(l_x), float(l_p), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_x.color),
                               np.asarray(out_p.color), atol=2e-5)

    g_x = jax.grad(lambda m, v: loss(m, v, "xla")[0], argnums=(0, 1))(
        scene["means3D"], cam.viewmatrix)
    g_p = jax.grad(lambda m, v: loss(m, v, "pallas")[0], argnums=(0, 1))(
        scene["means3D"], cam.viewmatrix)
    np.testing.assert_allclose(np.asarray(g_x[0]), np.asarray(g_p[0]),
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(g_x[1]), np.asarray(g_p[1]),
                               rtol=1e-3, atol=2e-4)


@pytest.mark.quick
def test_pallas_jvp_matches_xla():
    """The dual-forward Pallas kernel (interpret mode) == the XLA jvp
    driver: primal streams and all K pose-tangent streams."""
    scene, cam, binn, args, gt_tiles, kw = setup()
    k_t = 6
    i = args[0].shape[0]
    rng = np.random.RandomState(3)
    tan_xy = tuple(jnp.asarray(rng.normal(size=(i, 2)), jnp.float32)
                   for _ in range(k_t))
    tan_d = tuple(jnp.asarray(rng.normal(size=(i,)), jnp.float32)
                  for _ in range(k_t))

    a = tile_xla.core_fwd_jvp_xla(
        *args, tan_xy, tan_d, binn.tile_start, binn.tile_stop, gt_tiles,
        tile_batch=4, **kw)
    b = render_pallas.core_fwd_jvp(
        *args, tan_xy, tan_d, binn.tile_start, binn.tile_stop, gt_tiles,
        interpret=True, **kw)

    for n in ("color", "depth", "weight", "median", "var", "t_final"):
        np.testing.assert_allclose(
            np.asarray(getattr(a[0], n)), np.asarray(getattr(b[0], n)),
            rtol=1e-5, atol=1e-6, err_msg=n)
    np.testing.assert_array_equal(np.asarray(a[0].n_valid),
                                  np.asarray(b[0].n_valid))
    for k in range(k_t):
        for n in ("color", "depth", "weight", "t_final"):
            np.testing.assert_allclose(
                np.asarray(getattr(a[1], n)[k]),
                np.asarray(getattr(b[1], n)[k]),
                rtol=1e-4, atol=1e-5, err_msg=f"tangent {n}[{k}]")
    for k in range(k_t):
        assert float(jnp.abs(b[1].median[k]).max()) == 0.0


def test_rasterize_pose_jvp_pallas_backend():
    from diff_gaussian_rasterization_tpu.models import lie
    from diff_gaussian_rasterization_tpu.ops.rasterize import (
        rasterize_with_pose_jvp,
    )

    scene, cam = make_scene(p=48, h=24, w=32, seed=13)
    kw = {k: v for k, v in scene.items()
          if k not in ("means3D", "bg", "gt_depth")}
    tw = jax.jacfwd(lambda xi: lie.apply_twist(cam.viewmatrix, xi))(
        jnp.zeros((6,), jnp.float32))
    tangents = jnp.moveaxis(tw, -1, 0)
    a = rasterize_with_pose_jvp(scene["means3D"], cam, CFG, tangents,
                                gt_depth=scene["gt_depth"], backend="xla",
                                **kw)
    b = rasterize_with_pose_jvp(scene["means3D"], cam, CFG, tangents,
                                gt_depth=scene["gt_depth"],
                                backend="pallas", **kw)
    np.testing.assert_allclose(np.asarray(a.out.color),
                               np.asarray(b.out.color), atol=1e-6)
    for n in ("color", "depth", "opacity_map"):
        np.testing.assert_allclose(np.asarray(getattr(a, n)),
                                   np.asarray(getattr(b, n)),
                                   rtol=1e-4, atol=1e-5, err_msg=n)


def test_pallas_scan_mm_flags_match():
    """cfg.scan_sum_mm / scan_prod_mm (MXU triangular-matmul scans) through
    the full Pallas fwd+bwd structure must match the log-doubling scans to
    rounding tolerance."""
    scene, cam = make_scene(p=48, h=24, w=32, seed=13)
    kw = {k: v for k, v in scene.items() if k != "means3D"}
    mm = CFG.replace(scan_sum_mm=True, scan_prod_mm=True)

    def grads(cfg):
        def loss(m):
            out = rasterize(m, cam, cfg, backend="pallas", **kw)
            return (jnp.sum(out.color) + 0.3 * jnp.sum(out.depth)
                    + 0.1 * jnp.sum(out.opacity_map))
        out = rasterize(scene["means3D"], cam, cfg, backend="pallas", **kw)
        return out, jax.grad(loss)(scene["means3D"])

    (oa, ga) = grads(CFG)
    (ob, gb) = grads(mm)
    np.testing.assert_allclose(np.asarray(oa.color), np.asarray(ob.color),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               rtol=1e-3, atol=1e-5)


@pytest.mark.quick
def test_pallas_bwd_override_knobs_match():
    """The per-pass backward knobs (cfg.bwd_scan_*_mm, cfg.bwd_chunk — the
    round-5 chip A/B campaign) must not change gradients beyond rounding:
    chunk width and the cumsum backend only regroup the scan's rounding
    (the masks themselves are unchanged)."""
    scene, cam = make_scene(p=48, h=24, w=32, seed=13)
    kw = {k: v for k, v in scene.items() if k != "means3D"}
    base = CFG.replace(scan_sum_mm=True, scan_prod_mm=True)

    def grads(cfg):
        def loss(m, v):
            from diff_gaussian_rasterization_tpu.camera import Camera
            cam2 = Camera(viewmatrix=v, tanfovx=cam.tanfovx,
                          tanfovy=cam.tanfovy, height=cam.height,
                          width=cam.width)
            out = rasterize(m, cam2, cfg, backend="pallas", **kw)
            return (jnp.sum(out.color) + 0.3 * jnp.sum(out.depth)
                    + 0.1 * jnp.sum(out.opacity_map))
        return jax.grad(loss, argnums=(0, 1))(scene["means3D"],
                                              cam.viewmatrix)

    ga = grads(base)
    gb = grads(base.replace(bwd_chunk=4))
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-3, atol=1e-5)
    gc = grads(base.replace(bwd_scan_sum_mm=False))
    for x, y in zip(ga, gc):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-3, atol=1e-5)


@pytest.mark.quick
def test_pallas_sort_domain_reads_match_aligned():
    """Kernel-level check of the sort-domain read path: core_fwd/core_bwd
    fed the SORTED stream with arbitrary-phase segment ranges (two-block
    slab DMA + lane rotation, render_pallas._rolled) must reproduce the
    aligned-stream results, and the backward's aligned-domain gradient rows
    must land on exactly the slots binning's ``inv`` map points at."""
    scene, cam, binn, args, gt_tiles, kw = setup()
    # sub-chunking is orthogonal to the read-path under test; the coarse
    # chunk cuts interpret-mode wall time ~10x
    kw = dict(kw, cfg=kw["cfg"].replace(chunk=128))
    cap = binn.gauss_sorted.shape[0]

    # nonzero shifts must actually occur or this test is vacuous
    shifts = np.asarray(binn.sort_start) % 128
    assert (shifts[np.asarray(binn.sort_stop) > np.asarray(
        binn.sort_start)] != 0).any()

    a = render_pallas.core_fwd(*args, binn.tile_start, binn.tile_stop,
                               gt_tiles, interpret=True, **kw)

    # sorted-domain inputs: one row gather in sorted order
    from diff_gaussian_rasterization_tpu.ops.projection import preprocess
    prep = preprocess(
        scene["means3D"], cam, CFG, opacities=scene["opacities"],
        scales=scene["scales"], rotations=scene["rotations"],
        colors_precomp=scene["colors_precomp"],
    )
    gs = binn.gauss_sorted
    sargs = (prep.xy[gs], prep.conic[gs], prep.opacity[gs],
             prep.color[gs], prep.depth[gs], prep.depth_sgview[gs])
    b = render_pallas.core_fwd(*sargs, binn.sort_start, binn.sort_stop,
                               gt_tiles, interpret=True, **kw)

    for name in ("color", "depth", "weight", "median", "var", "t_final",
                 "n_contrib", "n_valid"):
        np.testing.assert_allclose(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
            rtol=1e-6, atol=1e-7, err_msg=name)
    # per-Gaussian uncertainty stats live in different index domains but
    # must agree once scattered onto Gaussians
    p = scene["means3D"].shape[0]
    ua = np.zeros(p, np.float32)
    np.add.at(ua, np.asarray(binn.gauss_id), np.asarray(a.u_inst))
    ub = np.zeros(p, np.float32)
    np.add.at(ub, np.asarray(gs), np.asarray(b.u_inst))
    np.testing.assert_allclose(ua, ub, rtol=1e-5, atol=1e-6)

    t, q = a.depth.shape
    rng = np.random.RandomState(0)
    cots = [jnp.asarray(rng.normal(size=s), jnp.float32) for s in
            [(t, 3, q), (t, q), (t, q), (t, q), (t, q), (t, q)]]
    ra = render_pallas.core_bwd(
        *args[:5], binn.tile_start, binn.tile_stop, gt_tiles,
        a.color, a.depth, a.weight, a.var, a.t_final, *cots,
        interpret=True, **kw)
    i_al = args[0].shape[0]
    flat = render_pallas.core_bwd(
        *sargs[:5], binn.sort_start, binn.sort_stop, gt_tiles,
        a.color, a.depth, a.weight, a.var, a.t_final, *cots,
        tile_astart=binn.tile_start, rows_capacity=i_al, return_flat=True,
        interpret=True, **kw)
    # compare through the pre-sort map: slot rows of real instances only
    inv = np.asarray(binn.inv)
    ra_flat = np.concatenate(
        [np.asarray(ra[0]), np.asarray(ra[1]), np.asarray(ra[2])[:, None],
         np.asarray(ra[3]), np.asarray(ra[4])[:, None],
         np.asarray(ra[5])[:, None], np.asarray(ra[6])[:, None]], axis=1)
    total = int(binn.num_rendered)
    live = np.asarray(binn.gauss_start) < np.asarray(binn.gauss_stop)
    rows_sorted = np.asarray(flat)[inv][:min(total, cap)]
    rows_aligned = ra_flat[inv][:min(total, cap)]
    np.testing.assert_allclose(rows_sorted[:, :12], rows_aligned,
                               rtol=1e-5, atol=1e-6)
    assert live.any()
