"""End-to-end SLAM demo: track + map a synthetic RGB-D orbit, report ATE.

Runs the full pipeline (reference SURVEY §3.3/§3.4 loops on top of the
rasterizer): pose-only tracking per frame, keyframe selection, windowed
mapping with densification, optional native pose-graph refinement —
BASELINE config 3+4 on synthetic data (Replica/TUM readers in ``io``
accept the real datasets when present).

Usage:
  python examples/run_slam.py [--frames 32] [--res 120x168] [--gaussians 2000]
                              [--method gn|gn_fd|adam] [--cpu]
                              [--dataset replica:/path/to/scene |
                               tum:/path/to/scene]
                              [--mesh kf=2,tile=4] [--refine]
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
    ap.add_argument("--dataset", default=None,
                    help="replica:<dir> or tum:<dir> — run a real on-disk "
                         "sequence instead of the synthetic orbit")
    ap.add_argument("--mesh", default=None,
                    help="device-mesh axes, e.g. kf=2,tile=4 (must multiply "
                         "to the device count); enables distributed SLAM")
    ap.add_argument("--window-select", default="nearest",
                    choices=["nearest", "random"])
    ap.add_argument("--kf-coverage", type=float, default=0.0)
    ap.add_argument("--refine-cost-gate", type=float, default=3.0)
    ap.add_argument("--refine", action="store_true",
                    help="measurement-based pose-graph refinement at end")
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

    mesh = None
    if args.mesh:
        import jax
        from jax.sharding import Mesh
        axes = dict(kv.split("=") for kv in args.mesh.split(","))
        names = tuple(axes)
        shape = tuple(int(axes[n]) for n in names)
        mesh = Mesh(np.array(jax.devices()).reshape(shape), names)
        print(f"mesh: {dict(zip(names, shape))}")

    if args.dataset:
        kind, _, root = args.dataset.partition(":")
        if kind == "replica":
            from diff_gaussian_rasterization_tpu.io.replica import (
                ReplicaDataset)
            ds = ReplicaDataset(root)
        elif kind == "tum":
            from diff_gaussian_rasterization_tpu.io.tum import TUMDataset
            ds = TUMDataset(root)
        else:
            raise SystemExit(f"unknown dataset kind {kind!r}")
        cam_t = ds.camera_template()
        h, w = cam_t.height, cam_t.width
        # 16x16 tiles fit any resolution (tile_px % 128 == 0); the exact
        # footprint culling keeps the 12x multiplier honest and the probe
        # in init_slam rightsizes the budget after bootstrap
        cfg = RasterConfig(tile_h=16, tile_w=16, chunk=32,
                           instance_multiplier=12)
        data = ds
    else:
        h, w = (int(x) for x in args.res.split("x"))
        cam_t = Camera(viewmatrix=jnp.eye(4, dtype=jnp.float32),
                       tanfovx=0.7, tanfovy=0.55, height=h, width=w)
        cfg = RasterConfig(tile_h=8, tile_w=16, instance_multiplier=12)
        print(f"rendering ground-truth sequence ({args.frames} frames, "
              f"{h}x{w}, {args.gaussians} blobs)...")
        gt_model = random_room_model(capacity=args.gaussians,
                                     n=args.gaussians, seed=0)
        views = orbit_trajectory(args.frames)
        frames = render_sequence(gt_model, views, cam_t, cfg)
        data = list(zip([np.asarray(v) for v in views], frames))

    scfg = SLAMConfig(
        raster=cfg,
        tracking=TrackingConfig(iters=10, method=args.method,
                                sil_threshold=0.5),
        mapping=MappingConfig(iters=15),
        capacity=8 * args.gaussians,
        keyframe_every=2, map_every=2, window=3,
        seed_every_px=2, init_iters=60, motion_model=False,
        pose_graph_refine=args.refine,
        window_select=args.window_select,
        kf_min_coverage=args.kf_coverage,
        refine_cost_gate=args.refine_cost_gate,
        mesh=mesh,
    )

    t0 = time.time()
    state, gt_views = run_slam(
        data, scfg, cam_t, verbose=True,
        max_frames=args.frames if args.dataset else None)
    dt = time.time() - t0

    ate = ate_rmse(state.est_views, [jnp.asarray(v) for v in gt_views])
    ate_static = ate_rmse([gt_views[0]] * len(gt_views),
                          [jnp.asarray(v) for v in gt_views])
    print(f"\n{len(gt_views)} frames in {dt:.1f}s "
          f"({len(gt_views)/dt:.2f} fps incl. compile)")
    print(f"ATE RMSE: {ate:.4f} m   (static-pose baseline: "
          f"{ate_static:.4f} m)")
    print(f"active Gaussians: {int(state.model.num_active)}")


if __name__ == "__main__":
    main()
