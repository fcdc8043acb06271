"""A/B a RasterConfig override against the default on the live chip.

Usage: python prof_ab.py key=value [key=value ...]
Times the bench loss fwd+bwd (amortized) for baseline vs override.
"""

import sys
import timeit

sys.path.insert(0, "/root/repo")

from diff_gaussian_rasterization_tpu.utils.compile_cache import (
    enable_compile_cache,
)

enable_compile_cache()

import jax
import jax.numpy as jnp

from prof import make_scene, H, W
from diff_gaussian_rasterization_tpu.camera import Camera
from diff_gaussian_rasterization_tpu.config import RasterConfig
from diff_gaussian_rasterization_tpu.ops.rasterize import (
    count_instances,
    rasterize,
)

INNER = 10


def time_cfg(cfg, scene, cap):
    kw = dict(opacities=scene["opacities"], scales=scene["scales"],
              rotations=scene["rotations"],
              colors_precomp=scene["colors_precomp"],
              bg=scene["bg"], gt_depth=scene["gt_depth"],
              backend="pallas", max_instances=cap)

    def loss(means, v):
        out = rasterize(means, Camera(viewmatrix=v, tanfovx=0.82,
                                      tanfovy=0.47, height=H, width=W),
                        cfg, **kw)
        return (jnp.sum(out.color) + 0.3 * jnp.sum(out.depth)
                + 0.1 * jnp.sum(out.depth_median)
                + 0.1 * jnp.sum(out.opacity_map))

    grad_fn = jax.grad(loss, argnums=(0, 1))

    def many(means, v):
        def body(carry, _):
            m, vv = carry
            gm, gv = grad_fn(m, vv)
            return (m + 1e-30 * gm, vv + 1e-30 * gv), None
        return jax.lax.scan(body, (means, v), None, length=INNER)[0]

    step = jax.jit(many)
    view = jnp.eye(4, dtype=jnp.float32)
    jax.block_until_ready(step(scene["means3D"], view))
    run = lambda: jax.block_until_ready(step(scene["means3D"], view))
    run()
    n = 3
    return timeit.timeit(run, number=n) / n / INNER


def main():
    over = {}
    for kv in sys.argv[1:]:
        k, v = kv.split("=")
        over[k] = {"true": True, "false": False}.get(
            v.lower(), None)
        if over[k] is None:
            over[k] = int(v) if v.isdigit() else float(v)
    scene = make_scene()
    # baseline matches bench.py's config of record (MXU scans measured on
    # chip round 3: 24.6 -> 22.7 ms, adopted as default)
    base = RasterConfig(tile_h=32, tile_w=32,
                        scan_sum_mm=True, scan_prod_mm=True)
    n_inst = int(count_instances(
        scene["means3D"],
        Camera(viewmatrix=jnp.eye(4, dtype=jnp.float32),
               tanfovx=0.82, tanfovy=0.47, height=H, width=W),
        base, opacities=scene["opacities"], scales=scene["scales"],
        rotations=scene["rotations"],
        colors_precomp=scene["colors_precomp"]))
    cap = int(-(-n_inst * 1.1 // 1024) * 1024)
    print(f"num_rendered={n_inst} cap={cap}", flush=True)
    tb = time_cfg(base, scene, cap)
    print(f"baseline: {tb*1e3:8.3f} ms", flush=True)
    ta = time_cfg(base.replace(**over), scene, cap)
    print(f"override {over}: {ta*1e3:8.3f} ms ({(tb-ta)*1e3:+.3f})",
          flush=True)


if __name__ == "__main__":
    main()
