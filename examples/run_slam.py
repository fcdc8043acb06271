"""End-to-end SLAM demo: track + map a synthetic RGB-D orbit, report ATE.

Runs the full pipeline (reference SURVEY §3.3/§3.4 loops on top of the
rasterizer): pose-only tracking per frame, keyframe selection, windowed
mapping with densification, optional native pose-graph refinement —
BASELINE config 3+4 on synthetic data (Replica/TUM readers in ``io``
accept the real datasets when present).

Usage:
  python examples/run_slam.py [--frames 32] [--res 120x168] [--gaussians 2000]
                              [--method gn|gn_fd|adam] [--cpu]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--res", default="120x168")
    ap.add_argument("--gaussians", type=int, default=2000)
    ap.add_argument("--method", default="gn",
                    choices=["gn", "gn_fd", "adam"])
    ap.add_argument("--cpu", action="store_true",
                    help="pin to CPU (before touching jax)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from diff_gaussian_rasterization_tpu.camera import Camera
    from diff_gaussian_rasterization_tpu.config import RasterConfig
    from diff_gaussian_rasterization_tpu.io.replica import ate_rmse
    from diff_gaussian_rasterization_tpu.io.synthetic import (
        orbit_trajectory, random_room_model, render_sequence)
    from diff_gaussian_rasterization_tpu.models.runner import (
        SLAMConfig, run_slam)
    from diff_gaussian_rasterization_tpu.models.slam import (
        MappingConfig, TrackingConfig)

    h, w = (int(x) for x in args.res.split("x"))
    cam_t = Camera(viewmatrix=jnp.eye(4, dtype=jnp.float32), tanfovx=0.7,
                   tanfovy=0.55, height=h, width=w)
    cfg = RasterConfig(tile_h=8, tile_w=16, instance_multiplier=12)

    print(f"rendering ground-truth sequence ({args.frames} frames, "
          f"{h}x{w}, {args.gaussians} blobs)...")
    gt_model = random_room_model(capacity=args.gaussians, n=args.gaussians,
                                 seed=0)
    views = orbit_trajectory(args.frames)
    frames = render_sequence(gt_model, views, cam_t, cfg)

    scfg = SLAMConfig(
        raster=cfg,
        tracking=TrackingConfig(iters=10, method=args.method,
                                sil_threshold=0.5),
        mapping=MappingConfig(iters=15),
        capacity=8 * args.gaussians,
        keyframe_every=2, map_every=2, window=3,
        seed_every_px=2, init_iters=60, motion_model=False,
    )
    data = list(zip([np.asarray(v) for v in views], frames))

    t0 = time.time()
    state, gt_views = run_slam(data, scfg, cam_t, verbose=True)
    dt = time.time() - t0

    ate = ate_rmse(state.est_views, [jnp.asarray(v) for v in gt_views])
    ate_static = ate_rmse([views[0]] * len(gt_views),
                          [jnp.asarray(v) for v in gt_views])
    print(f"\n{len(gt_views)} frames in {dt:.1f}s "
          f"({len(gt_views)/dt:.2f} fps incl. compile)")
    print(f"ATE RMSE: {ate:.4f} m   (static-pose baseline: "
          f"{ate_static:.4f} m)")
    print(f"active Gaussians: {int(state.model.num_active)}")


if __name__ == "__main__":
    main()
