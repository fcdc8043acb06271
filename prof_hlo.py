"""Compile the bench fwd+bwd on the chip and print the big HLO ops by name
so trace op names (fusion.N, transpose_jvp, ...) can be matched to source.
Usage: python prof_hlo.py [regex...]
"""

import re
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from prof import make_scene, H, W
from diff_gaussian_rasterization_tpu.camera import Camera
from diff_gaussian_rasterization_tpu.config import RasterConfig
from diff_gaussian_rasterization_tpu.ops.rasterize import rasterize


def main():
    pats = sys.argv[1:] or [
        r"^\s*%?(fusion\.(2|3|4|5|6|7|8|10|18|26)|transpose_jvp\S*|jvp__\S*|"
        r"sort\.1[23]|copy\.(138|151)|slice_reduce_fusion)\b"
    ]
    scene = make_scene()
    cfg = RasterConfig(tile_h=32, tile_w=32)
    view = jnp.eye(4, dtype=jnp.float32)
    kw_full = dict(opacities=scene["opacities"], scales=scene["scales"],
                   rotations=scene["rotations"],
                   colors_precomp=scene["colors_precomp"],
                   bg=scene["bg"], gt_depth=scene["gt_depth"],
                   backend="pallas")
    probe = rasterize(scene["means3D"],
                      Camera(viewmatrix=view, tanfovx=0.82, tanfovy=0.47,
                             height=H, width=W),
                      cfg, backend="xla", max_instances=1024, **{
                          k: v for k, v in kw_full.items()
                          if k != "backend"})
    kw_full["max_instances"] = int(
        -(-int(probe.num_rendered) * 1.1 // 1024) * 1024)

    def loss(means, v):
        out = rasterize(means, Camera(viewmatrix=v, tanfovx=0.82,
                                      tanfovy=0.47, height=H, width=W),
                        cfg, **kw_full)
        return (jnp.sum(out.color) + 0.3 * jnp.sum(out.depth)
                + 0.1 * jnp.sum(out.depth_median)
                + 0.1 * jnp.sum(out.opacity_map))

    grad_fn = jax.jit(jax.grad(loss, argnums=(0, 1)))
    txt = grad_fn.lower(scene["means3D"], view).compile().as_text()
    with open("/tmp/hlo.txt", "w") as f:
        f.write(txt)
    print(f"HLO dumped to /tmp/hlo.txt ({len(txt.splitlines())} lines)")
    rx = [re.compile(p) for p in pats]
    for line in txt.splitlines():
        if any(r.search(line) for r in rx):
            print(line[:400])


if __name__ == "__main__":
    main()
