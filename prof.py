"""Component-level timing of the rasterization pipeline on the live chip.

Times (amortized over INNER chained steps inside one executable):
  preprocess+binning+gathers (everything before the core)
  core forward alone
  full forward
  full forward+backward
"""

import sys
import time
import timeit

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from diff_gaussian_rasterization_tpu.camera import Camera
from diff_gaussian_rasterization_tpu.config import RasterConfig
from diff_gaussian_rasterization_tpu.ops import tile_xla
from diff_gaussian_rasterization_tpu.ops.binning import (
    bin_gaussians, default_max_instances, INSTANCE_ALIGN)
from diff_gaussian_rasterization_tpu.ops.kernels import render_pallas
from diff_gaussian_rasterization_tpu.ops.projection import preprocess
from diff_gaussian_rasterization_tpu.ops.rasterize import rasterize
from diff_gaussian_rasterization_tpu.ops.tiling import grid_dims, img_to_tiles

H, W = 680, 1200
P = 100_000
INNER = 8


def make_scene(seed=0, kind=None):
    """``kind``: "uniform" (default) or "room" (DGR_SCENE env) — the room
    variant is a Replica-like occlusion-heavy layout (box walls + interior
    clutter, camera inside) for A/B-ing early-termination optimizations
    that a uniform cloud cannot reward."""
    import os

    kind = kind or os.environ.get("DGR_SCENE", "uniform")
    rng = np.random.RandomState(seed)
    if kind == "room":
        n_wall = int(P * 0.75)
        walls = rng.uniform(-3, 3, (n_wall, 3))
        face = rng.randint(0, 6, n_wall)
        axis, sign = face // 2, (face % 2) * 2 - 1
        walls[np.arange(n_wall), axis] = sign * 3.0
        clutter = rng.uniform(-2.4, 2.4, (P - n_wall, 3))
        means = np.concatenate([walls, clutter])
        # camera at the origin looking +z: walls 3-6 m, clutter in front
        means = means + np.asarray([0.0, 0.0, 3.2])
        scales = np.exp(rng.uniform(np.log(0.03), np.log(0.12), (P, 3)))
        opac = rng.uniform(0.5, 0.99, (P, 1))
    else:
        means = rng.uniform(-2, 2, (P, 3))
        means[:, 2] = rng.uniform(0.8, 6.0, P)
        scales = np.exp(rng.uniform(np.log(0.01), np.log(0.05), (P, 3)))
        opac = rng.uniform(0.2, 0.95, (P, 1))
    quats = rng.normal(size=(P, 4))
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    return dict(
        means3D=jnp.asarray(means, jnp.float32),
        scales=jnp.asarray(scales, jnp.float32),
        rotations=jnp.asarray(quats, jnp.float32),
        opacities=jnp.asarray(opac, jnp.float32),
        colors_precomp=jnp.asarray(rng.uniform(0, 1, (P, 3)), jnp.float32),
        bg=jnp.zeros(3, jnp.float32),
        gt_depth=jnp.asarray(rng.uniform(0.8, 6, (H, W)), jnp.float32),
    )


def chain(f, *args):
    """Run f INNER times with a data dependency; returns jitted callable."""
    def many(*a):
        def body(carry, _):
            out = f(carry, *a[1:])
            # fold a scalar from out back into the first arg
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(l) * 1e-30 for l in leaves
                    if jnp.issubdtype(l.dtype, jnp.floating))
            return carry + s, None
        r, _ = jax.lax.scan(body, a[0], None, length=INNER)
        return r
    jf = jax.jit(many)
    o = jf(*args)
    jax.block_until_ready(o)
    run = lambda: jax.block_until_ready(jf(*args))
    run()
    n = 3
    t = timeit.timeit(run, number=n) / n / INNER
    return t


def main():
    scene = make_scene()
    cfg = RasterConfig(tile_h=32, tile_w=32)
    view = jnp.eye(4, dtype=jnp.float32)
    cam = Camera(viewmatrix=view, tanfovx=0.82, tanfovy=0.47, height=H,
                 width=W)
    kw = {k: v for k, v in scene.items()
          if k not in ("means3D", "bg", "gt_depth")}

    probe = rasterize(scene["means3D"], cam, cfg, backend="xla",
                      max_instances=1024, opacities=scene["opacities"],
                      scales=scene["scales"], rotations=scene["rotations"],
                      colors_precomp=scene["colors_precomp"])
    n_rend = int(probe.num_rendered)
    cap = int(-(-int(n_rend * 1.1) // 1024) * 1024)
    print(f"num_rendered={n_rend} capacity={cap}")

    tiles_x, tiles_y = grid_dims(H, W, cfg.tile_h, cfg.tile_w)

    # --- stage 1: preprocess + binning + gathers
    def prep_fn(means, *a):
        pr = preprocess(means, cam, cfg, opacities=scene["opacities"],
                        scales=scene["scales"],
                        rotations=scene["rotations"],
                        colors_precomp=scene["colors_precomp"])
        binn = bin_gaussians(pr, tiles_x, tiles_y, cap,
                             align=INSTANCE_ALIGN)
        ids = binn.gauss_id
        return (pr.xy[ids], pr.conic[ids], pr.opacity[ids], pr.color[ids],
                pr.depth[ids], binn.tile_start, binn.tile_stop)

    t_prep = chain(prep_fn, scene["means3D"])
    print(f"preprocess+binning+gather: {t_prep*1e3:8.2f} ms")

    # --- core alone (pallas)
    pr = preprocess(scene["means3D"], cam, cfg,
                    opacities=scene["opacities"], scales=scene["scales"],
                    rotations=scene["rotations"],
                    colors_precomp=scene["colors_precomp"])
    binn = bin_gaussians(pr, tiles_x, tiles_y, cap, align=INSTANCE_ALIGN)
    ids = binn.gauss_id
    xy, conic, opac = pr.xy[ids], pr.conic[ids], pr.opacity[ids]
    color, depth = pr.color[ids], pr.depth[ids]
    gt_tiles = img_to_tiles(scene["gt_depth"], cfg.tile_h, cfg.tile_w)
    ts, tp = binn.tile_start, binn.tile_stop

    kwc = dict(cfg=cfg, tiles_x=tiles_x, capacity=cap, height=H, width=W)

    def core_fn(xy, conic, opac, color, depth, ts, tp, gt):
        return render_pallas.core_fwd(xy, conic, opac, color, depth, depth,
                                      ts, tp, gt, **kwc)

    t_core = chain(core_fn, xy, conic, opac, color, depth, ts, tp, gt_tiles)
    print(f"pallas core fwd:           {t_core*1e3:8.2f} ms")

    def core_bwd_fn(xy, conic, opac, color, depth, ts, tp, gt):
        out = render_pallas.core_fwd(xy, conic, opac, color, depth, depth,
                                     ts, tp, gt, **kwc)
        zero = jnp.zeros_like(out.depth)
        one = jnp.ones_like(out.depth)
        onec = jnp.ones_like(out.color)
        return render_pallas.core_bwd(
            xy, conic, opac, color, depth, ts, tp, gt,
            out.color, out.depth, out.weight, out.var, out.t_final,
            onec, one, one, zero, one, zero, **kwc)

    t_core_fb = chain(core_bwd_fn, xy, conic, opac, color, depth, ts, tp,
                      gt_tiles)
    print(f"pallas core fwd+bwd:       {t_core_fb*1e3:8.2f} ms")

    # --- full forward
    kw_full = dict(opacities=scene["opacities"], scales=scene["scales"],
                   rotations=scene["rotations"],
                   colors_precomp=scene["colors_precomp"],
                   bg=scene["bg"], gt_depth=scene["gt_depth"],
                   max_instances=cap, backend="pallas")

    def fwd_fn(means, view):
        out = rasterize(means, Camera(viewmatrix=view, tanfovx=0.82,
                                      tanfovy=0.47, height=H, width=W),
                        cfg, **kw_full)
        return out.color

    t_fwd = chain(fwd_fn, scene["means3D"], view)
    print(f"full forward:              {t_fwd*1e3:8.2f} ms")

    def loss(means, v):
        out = rasterize(means, Camera(viewmatrix=v, tanfovx=0.82,
                                      tanfovy=0.47, height=H, width=W),
                        cfg, **kw_full)
        return (jnp.sum(out.color) + 0.3 * jnp.sum(out.depth)
                + 0.1 * jnp.sum(out.depth_median)
                + 0.1 * jnp.sum(out.opacity_map))

    grad_fn = jax.grad(loss, argnums=(0, 1))

    def fb_fn(means, v):
        return grad_fn(means, v)

    t_fb = chain(fb_fn, scene["means3D"], view)
    print(f"full fwd+bwd:              {t_fb*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
