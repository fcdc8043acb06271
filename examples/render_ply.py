"""Render a 3DGS PLY from chosen viewpoints and save PNGs.

Completes the ecosystem loop: models trained anywhere in the 3DGS world
(or exported by examples/fit_scene.py / io.ply.save_ply) render on TPU
with this engine.

Usage:
  python examples/render_ply.py model.ply --out renders/ [--res 680x1200]
      [--fov 0.82x0.47] [--orbit 8 | --view v00,v01,...,v33] [--cpu]
      [--depth]
"""

import argparse
import os
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ply")
    ap.add_argument("--out", default="renders")
    ap.add_argument("--res", default="680x1200")
    ap.add_argument("--fov", default="0.82x0.47",
                    help="tanfovx x tanfovy")
    ap.add_argument("--orbit", type=int, default=8,
                    help="render N poses on the synthetic orbit")
    ap.add_argument("--view", default=None,
                    help="single 4x4 row-convention view matrix, 16 "
                         "comma-separated floats (overrides --orbit)")
    ap.add_argument("--sh-degree", type=int, default=None,
                    help="cap the SH degree (default: whatever the PLY has)")
    ap.add_argument("--depth", action="store_true",
                    help="also save normalized depth maps")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp
    from PIL import Image

    from diff_gaussian_rasterization_tpu.camera import Camera
    from diff_gaussian_rasterization_tpu.config import RasterConfig
    from diff_gaussian_rasterization_tpu.io.ply import load_ply
    from diff_gaussian_rasterization_tpu.io.synthetic import orbit_trajectory
    from diff_gaussian_rasterization_tpu.models.slam import render_model
    from diff_gaussian_rasterization_tpu.ops.rasterize import count_instances

    h, w = (int(x) for x in args.res.split("x"))
    tfx, tfy = (float(x) for x in args.fov.split("x"))
    model = load_ply(args.ply)
    print(f"{int(model.num_active)} Gaussians, SH degree "
          f"{int(round(model.sh.shape[1] ** 0.5)) - 1}")
    cfg = RasterConfig(tile_h=16, tile_w=16, instance_multiplier=12)

    if args.view:
        vals = [float(x) for x in args.view.split(",")]
        views = jnp.asarray(np.asarray(vals, np.float32).reshape(1, 4, 4))
    else:
        views = orbit_trajectory(args.orbit)

    cam0 = Camera(viewmatrix=views[0], tanfovx=tfx, tanfovy=tfy,
                  height=h, width=w)
    kw = model.raster_kwargs(sh_degree=args.sh_degree) \
        if args.sh_degree is not None else model.raster_kwargs()
    n_inst = int(count_instances(model.means3D, cam0, cfg, **kw))
    cfg = cfg.replace(max_instances=max(
        1024, int(-(-n_inst * 1.3 // 1024) * 1024)))

    os.makedirs(args.out, exist_ok=True)
    for i in range(views.shape[0]):
        cam = Camera(viewmatrix=views[i], tanfovx=tfx, tanfovy=tfy,
                     height=h, width=w)
        out = render_model(model, cam, cfg)
        if bool(out.overflow):
            print(f"view {i}: instance budget overflowed "
                  f"({int(out.num_rendered)} needed) — re-probing")
            cfg = cfg.replace(max_instances=int(
                -(-int(out.num_rendered) * 1.3 // 1024) * 1024))
            out = render_model(model, cam, cfg)
        rgb = np.clip(np.asarray(out.color), 0, 1)
        img = (np.moveaxis(rgb, 0, 2) * 255).round().astype(np.uint8)
        Image.fromarray(img).save(os.path.join(args.out, f"view{i:03d}.png"))
        if args.depth:
            sil = np.asarray(out.opacity_map[0])
            d = np.asarray(out.depth[0]) / np.maximum(sil, 1e-6)
            d = np.where(sil > 0.5, d, 0.0)
            dmax = max(d.max(), 1e-6)
            Image.fromarray((d / dmax * 255).astype(np.uint8)).save(
                os.path.join(args.out, f"depth{i:03d}.png"))
        print(f"view {i}: wrote {args.out}/view{i:03d}.png "
              f"({int(out.num_rendered)} instances)")


if __name__ == "__main__":
    main()
