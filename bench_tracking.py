"""Secondary benchmark: SLAM tracking throughput on the live chip.

CG-SLAM's tracking step (reference SURVEY §3.3: pose-only backward,
``map_off=True``) is the latency-critical inner loop of the system.  This
measures full tracking steps/sec — each step = ``TrackingConfig.iters``
Gauss-Newton/LM iterations of render + pose-gradient + damped solve — at
1200x680 against a synthetic RGB-D frame, and reports the pose error after
tracking a known perturbation.

Prints ONE JSON line (same shape as bench.py).
"""

import json
import sys
import timeit

sys.path.insert(0, "/root/repo")

from diff_gaussian_rasterization_tpu.utils.compile_cache import (
    enable_compile_cache,
)

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from diff_gaussian_rasterization_tpu.camera import Camera
from diff_gaussian_rasterization_tpu.config import RasterConfig
from diff_gaussian_rasterization_tpu.models import lie
from diff_gaussian_rasterization_tpu.models.gaussians import GaussianModel
from diff_gaussian_rasterization_tpu.models.slam import (
    Frame, TrackingConfig, render_model, track_frame)

H, W = 680, 1200
P = 100_000


def make_model(seed=0, p=P):
    rng = np.random.RandomState(seed)
    means = rng.uniform(-2, 2, (p, 3))
    means[:, 2] = rng.uniform(0.8, 6.0, p)
    quats = rng.normal(size=(p, 4))
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    sh = rng.uniform(0.1, 0.9, (p, 1, 3)) / 0.28209479177387814
    return GaussianModel(
        means3D=jnp.asarray(means, jnp.float32),
        scales_log=jnp.asarray(
            rng.uniform(np.log(0.01), np.log(0.05), (p, 3)), jnp.float32),
        rotations=jnp.asarray(quats, jnp.float32),
        opacities_logit=jnp.asarray(
            np.log(1.0 / np.clip(rng.uniform(0.2, 0.95, (p, 1)), 1e-5, 1)
                   - 1.0) * -1.0, jnp.float32),
        sh=jnp.asarray(sh, jnp.float32),
        active=jnp.ones((p,), bool),
    )


def main():
    platform = jax.devices()[0].platform
    model = make_model()
    cfg = RasterConfig(tile_h=32, tile_w=32)
    cam = Camera(viewmatrix=jnp.eye(4, dtype=jnp.float32), tanfovx=0.82,
                 tanfovy=0.47, height=H, width=W)
    # gn: exact Gauss-Newton/LM — the (Npix x 6) twist Jacobian comes from
    # ONE dual render per iteration (rasterize_with_pose_jvp's Pallas
    # _jvp_kernel: forward + all 6 exact tangents, ~3x one render) plus one
    # accept-check render.  Override with DGR_TRACK_METHOD=gn_fd (13
    # central-difference renders/iter) or adam (first-order VJP path).
    # DGR_TRACK_FREEZE=1: bin once per frame (margin DGR_TRACK_MARGIN px)
    # and reuse across GN iterations.  DGR_TRACK_LS=0: deferred accept —
    # one dual render per iteration instead of dual + accept-check.
    # Round-5 record defaults (chip_session12): 2 full-res + 3 coarse
    # pyramid iterations with frozen binning at margin 2 px — 7.87
    # tracked fps at 1.8e-5 pose error, beating the session-10 3+2
    # config (7.07 fps / 3.5e-5) on BOTH axes: once the coarse levels
    # put the pose inside the fine basin, a half-res iteration buys more
    # convergence per ms than a full-res one.  Session-13 bracketing:
    # 1+4 (6.90/4.6e-5) and 1+5 (6.85/3.9e-5) lose — one full-res
    # polish iteration is not enough; margin 1 px loses to 2 px
    # (7.45 fps, same error).  Fast-but-loose: 2+2 = 8.55 fps / 2.45e-4.
    import os
    tcfg = TrackingConfig(
        method=os.environ.get("DGR_TRACK_METHOD", "gn"),
        iters=int(os.environ.get("DGR_TRACK_ITERS", 2)),
        freeze_binning=os.environ.get("DGR_TRACK_FREEZE", "1") == "1",
        bin_margin_px=float(os.environ.get("DGR_TRACK_MARGIN", 2.0)),
        line_search=os.environ.get("DGR_TRACK_LS", "0") == "1",
        pyramid=int(os.environ.get("DGR_TRACK_PYR", 2)),
        coarse_iters=int(os.environ.get("DGR_TRACK_COARSE", 3)),
    )

    # ground-truth frame rendered at identity; initial guess = small twist.
    # The probe also sizes the static instance budget (see bench_mapping).
    gt = render_model(model, cam, cfg)
    cfg = cfg.replace(max_instances=int(
        -(-int(gt.num_rendered) * 1.1 // 1024) * 1024))
    frame = Frame(jax.lax.stop_gradient(gt.color),
                  jax.lax.stop_gradient(gt.depth[0]))
    xi_true = jnp.asarray([0.01, -0.008, 0.006, 0.004, -0.003, 0.005],
                          jnp.float32)
    view0 = lie.apply_twist(cam.viewmatrix, xi_true)

    view, loss, _ = track_frame(model, view0, frame, cfg, tcfg, cam)
    jax.block_until_ready(view)
    err0 = float(jnp.abs(view0 - cam.viewmatrix).max())
    err = float(jnp.abs(view - cam.viewmatrix).max())

    def run():
        v, l, _ = track_frame(model, view0, frame, cfg, tcfg, cam)
        jax.block_until_ready(v)

    run()
    n = 5
    t = timeit.timeit(run, number=n) / n
    print(json.dumps({
        "metric": "tracking_steps_per_sec_1200x680",
        "value": round(1.0 / t, 3),
        "unit": "tracked frames/s",
        "method": tcfg.method, "iters": tcfg.iters,
        "freeze_binning": tcfg.freeze_binning,
        "bin_margin_px": tcfg.bin_margin_px,
        "line_search": tcfg.line_search,
        "pyramid": tcfg.pyramid,
        "coarse_iters": tcfg.coarse_iters,
        "platform": platform,
        "gaussians": P,
        "ms_per_tracked_frame": round(t * 1e3, 3),
        "pose_err_before": round(err0, 6),
        "pose_err_after": round(err, 6),
    }))


if __name__ == "__main__":
    main()
