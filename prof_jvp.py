"""Dual-render (pose-jvp) cost on the live chip.

Measures, at bench scale (1200x680 / 100k Gaussians):
  - plain Pallas forward render
  - rasterize_with_pose_jvp with K = 6 twist tangents (the exact-GN
    tracker's per-iteration Jacobian source)
and reports the dual/forward cost ratio (design target ~3x; the FD
alternative costs 13 forwards).
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
from diff_gaussian_rasterization_tpu.models import lie
from diff_gaussian_rasterization_tpu.ops.rasterize import (
    count_instances, rasterize, rasterize_with_pose_jvp,
)

INNER = 10


def main():
    scene = make_scene()
    cfg = RasterConfig(tile_h=32, tile_w=32)
    cam = Camera(viewmatrix=jnp.eye(4, dtype=jnp.float32), tanfovx=0.82,
                 tanfovy=0.47, height=H, width=W)
    kw = dict(opacities=scene["opacities"], scales=scene["scales"],
              rotations=scene["rotations"],
              colors_precomp=scene["colors_precomp"])
    n_inst = int(count_instances(scene["means3D"], cam, cfg, **kw))
    cap = int(-(-n_inst * 1.1 // 1024) * 1024)
    cfg = cfg.replace(max_instances=cap)
    print(f"instances={n_inst} cap={cap}", flush=True)

    tw = jax.jacfwd(lambda xi: lie.apply_twist(cam.viewmatrix, xi))(
        jnp.zeros((6,), jnp.float32))
    tangents = jnp.moveaxis(tw, -1, 0)

    def fwd_once(means, v):
        camv = Camera(viewmatrix=v, tanfovx=0.82, tanfovy=0.47,
                      height=H, width=W)
        out = rasterize(means, camv, cfg, backend="pallas",
                        gt_depth=scene["gt_depth"], track_off=True,
                        map_off=True, **kw)
        return out.color, out.depth

    def jvp_once(means, v):
        camv = Camera(viewmatrix=v, tanfovx=0.82, tanfovy=0.47,
                      height=H, width=W)
        j = rasterize_with_pose_jvp(means, camv, cfg, tangents,
                                    gt_depth=scene["gt_depth"],
                                    backend="pallas", **kw)
        return j.out.color, jnp.stack(
            [j.depth, j.opacity_map]).sum(0)

    def chained(f):
        def many(means, v):
            def body(carry, _):
                c, d = f(means, v + carry * 1e-30)
                return jnp.sum(c) * 1e-30 + jnp.sum(d) * 1e-30, None
            s, _ = jax.lax.scan(body, jnp.float32(0), None, length=INNER)
            return s
        return jax.jit(many)

    for name, f in (("fwd  ", fwd_once), ("jvp6 ", jvp_once)):
        g = chained(f)
        r = g(scene["means3D"], cam.viewmatrix)
        jax.block_until_ready(r)
        run = lambda: jax.block_until_ready(g(scene["means3D"],
                                              cam.viewmatrix))
        run()
        t = timeit.timeit(run, number=3) / (3 * INNER)
        print(f"{name}: {t * 1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
