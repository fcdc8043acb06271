"""Secondary benchmark: mapping (Gaussian-optimization) throughput on chip.

CG-SLAM's mapping step (reference SURVEY §3.4: ``track_off=True``, full
Gaussian-parameter gradients feeding densify/prune) at BASELINE config-4
scale: 500k Gaussians, 1200x680, single keyframe window.  Measures mapping
gradient steps/sec and verifies the loss decreases.

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

from bench_tracking import make_model
from diff_gaussian_rasterization_tpu.camera import Camera
from diff_gaussian_rasterization_tpu.config import RasterConfig
from diff_gaussian_rasterization_tpu.models.gaussians import DensifyState
from diff_gaussian_rasterization_tpu.models.slam import (
    MappingConfig, make_map_optimizer, map_step, model_params, render_model)

H, W = 680, 1200
P = 500_000


def main():
    platform = jax.devices()[0].platform
    model = make_model(p=P)
    cfg = RasterConfig(tile_h=32, tile_w=32)
    cam = Camera(viewmatrix=jnp.eye(4, dtype=jnp.float32), tanfovx=0.82,
                 tanfovy=0.47, height=H, width=W)
    mcfg = MappingConfig()

    # target frame: the same scene rendered with perturbed colors, so the
    # optimizer has a real signal at step one.  The probe also sizes the
    # static instance budget (1.1x true count, like bench.py) — the default
    # 8x-capacity heuristic wastes ~3x at this density.
    gt = render_model(model, cam, cfg)
    cfg = cfg.replace(max_instances=int(
        -(-int(gt.num_rendered) * 1.1 // 1024) * 1024))
    rgbs = jnp.clip(jax.lax.stop_gradient(gt.color) * 0.9 + 0.05, 0, 1)[None]
    depths = jax.lax.stop_gradient(gt.depth[0])[None]
    views = cam.viewmatrix[None]

    opt = make_map_optimizer(mcfg)
    opt_state = opt.init(model_params(model))
    dstate = DensifyState.zero(model.capacity)

    args = (views, rgbs, depths, jnp.ones((1,), jnp.float32), cfg, mcfg,
            H, W, cam.tanfovx, cam.tanfovy, 1)
    m1, o1, d1, loss0, _ = map_step(model, opt_state, dstate, *args)
    jax.block_until_ready(m1.means3D)
    m2, o2, d2, loss1, _ = map_step(m1, o1, d1, *args)
    jax.block_until_ready(m2.means3D)

    # chain steps through real data dependencies and force a host read:
    # block_until_ready alone under-measures behind the axon relay
    def run():
        m, o, d = model, opt_state, dstate
        for _ in range(3):
            m, o, d, l, _ = map_step(m, o, d, *args)
        return float(l)

    run()
    n = 3
    t = timeit.timeit(run, number=n) / n / 3
    print(json.dumps({
        "metric": "mapping_steps_per_sec_1200x680_500k",
        "value": round(1.0 / t, 3),
        "unit": "map steps/s",
        "platform": platform,
        "gaussians": P,
        "ms_per_map_step": round(t * 1e3, 3),
        "loss_step0": round(float(loss0), 6),
        "loss_step1": round(float(loss1), 6),
    }))


if __name__ == "__main__":
    main()
