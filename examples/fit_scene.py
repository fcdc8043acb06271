"""Fit a Gaussian splat scene to posed RGB-D views (classic 3DGS training).

The reference rasterizer family serves two workloads: SLAM (see
``models/runner.py``) and plain novel-view-synthesis training.  This example
is the latter: random-initialized Gaussians + Adam + densify/prune against a
set of posed views, reporting train/holdout PSNR.

Run (CPU or TPU):
    python examples/fit_scene.py [--iters 300] [--views 6] [--hw 64 96]
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from diff_gaussian_rasterization_tpu.camera import Camera
from diff_gaussian_rasterization_tpu.config import RasterConfig
from diff_gaussian_rasterization_tpu.io.synthetic import (
    orbit_trajectory, random_room_model, render_sequence,
)
from diff_gaussian_rasterization_tpu.io.ply import save_ply
from diff_gaussian_rasterization_tpu.models.gaussians import (
    DensifyState, densify_and_prune, init_model,
)
from diff_gaussian_rasterization_tpu.models.slam import (
    Frame, MappingConfig, make_map_optimizer, map_step, model_params,
)


def psnr(a, b):
    return -10.0 * np.log10(float(jnp.mean((a - b) ** 2)) + 1e-12)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--views", type=int, default=6)
    ap.add_argument("--hw", type=int, nargs=2, default=(48, 64))
    ap.add_argument("--capacity", type=int, default=4096)
    ap.add_argument("--densify-every", type=int, default=50)
    ap.add_argument("--out", type=str, default=None,
                    help="optional .ply to save the fitted model")
    args = ap.parse_args()

    h, w = args.hw
    cam_t = Camera(viewmatrix=jnp.eye(4), tanfovx=0.7, tanfovy=0.55,
                   height=h, width=w)
    on_cpu = jax.devices()[0].platform == "cpu"
    cfg = RasterConfig(tile_h=8, tile_w=8, chunk=16,
                       instance_multiplier=12) if on_cpu else RasterConfig()

    # ground truth: a synthetic room rendered from an orbit (+1 holdout view)
    gt = random_room_model(capacity=1024, n=1024, seed=0)
    views = orbit_trajectory(args.views + 1)
    frames = render_sequence(gt, views, cam_t, cfg)
    train_v, hold_v = views[:-1], views[-1]
    train_f, hold_f = frames[:-1], frames[-1]

    # random init inside the scene volume
    rng = np.random.RandomState(1)
    n0 = 512
    means = rng.uniform(-1.5, 1.5, (n0, 3))
    means[:, 2] = rng.uniform(1.0, 5.0, n0)
    model = init_model(
        args.capacity, sh_degree=0,
        means=jnp.asarray(means, jnp.float32),
        colors=jnp.asarray(rng.uniform(0.2, 0.8, (n0, 3)), jnp.float32),
        scales=jnp.full((n0, 3), 0.08, jnp.float32),
    )

    mcfg = MappingConfig(lr_means=2e-3, lr_scales=5e-3, lr_opacities=5e-2,
                         lr_sh=1e-2, w_depth=0.2)
    opt = make_map_optimizer(mcfg)
    opt_state = opt.init(model_params(model))
    dstate = DensifyState.zero(args.capacity)

    kviews = jnp.stack(list(train_v))
    krgbs = jnp.stack([f.rgb for f in train_f])
    kdepths = jnp.stack([f.depth for f in train_f])
    key = jax.random.PRNGKey(0)

    wts = jnp.ones((len(train_v),), jnp.float32)
    for it in range(args.iters):
        model, opt_state, dstate, loss, _ = map_step(
            model, opt_state, dstate, kviews, krgbs, kdepths, wts, cfg,
            mcfg, h, w, cam_t.tanfovx, cam_t.tanfovy, len(train_v))
        if args.densify_every and (it + 1) % args.densify_every == 0 \
                and it + 1 < args.iters:
            key, sub = jax.random.split(key)
            model, dstate, _ = densify_and_prune(
                model, dstate, grad_threshold=mcfg.densify_grad_threshold,
                rng=sub)
        if (it + 1) % 50 == 0 or it == 0:
            cam_last = Camera(viewmatrix=kviews[-1], tanfovx=cam_t.tanfovx,
                              tanfovy=cam_t.tanfovy, height=h, width=w)
            tr = psnr(render_model(model, cam_last, cfg).color, krgbs[-1])
            print(f"iter {it + 1:4d}  loss {float(loss):.4f}  "
                  f"train-view PSNR {tr:5.2f} dB  "
                  f"active {int(model.num_active)}")

    # holdout view
    from diff_gaussian_rasterization_tpu.models.slam import render_model
    cam_h = Camera(viewmatrix=hold_v, tanfovx=cam_t.tanfovx,
                   tanfovy=cam_t.tanfovy, height=h, width=w)
    out = render_model(model, cam_h, cfg)
    print(f"holdout PSNR: {psnr(out.color, hold_f.rgb):5.2f} dB")

    if args.out:
        save_ply(args.out, model)
        print(f"saved {int(model.num_active)} Gaussians to {args.out}")


if __name__ == "__main__":
    main()
