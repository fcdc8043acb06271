"""Shared synthetic test scenes."""
import jax
import jax.numpy as jnp
import numpy as np

from diff_gaussian_rasterization_tpu.camera import Camera, look_at
from diff_gaussian_rasterization_tpu.ops.sh import num_sh_coeffs, rgb_to_sh0


def make_scene(p=64, h=32, w=40, seed=0, sh_degree=None, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    means = rng.uniform(-1.0, 1.0, (p, 3))
    means[:, 2] = rng.uniform(1.0, 4.0, p)  # in front of camera
    scales = rng.uniform(0.05, 0.25, (p, 3))
    quats = rng.normal(size=(p, 4))
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    quats *= rng.uniform(0.7, 1.3, (p, 1))  # deliberately unnormalized
    opac = rng.uniform(0.2, 0.95, (p, 1))
    colors = rng.uniform(0.0, 1.0, (p, 3))

    view = jnp.eye(4, dtype=dtype)  # identity w2c: camera at origin looking +z
    cam = Camera(viewmatrix=view, tanfovx=float(np.tan(0.5)),
                 tanfovy=float(np.tan(0.4)), height=h, width=w)
    out = dict(
        means3D=jnp.asarray(means, dtype),
        scales=jnp.asarray(scales, dtype),
        rotations=jnp.asarray(quats, dtype),
        opacities=jnp.asarray(opac, dtype),
        colors_precomp=jnp.asarray(colors, dtype),
        bg=jnp.asarray(rng.uniform(0, 1, 3), dtype),
        gt_depth=jnp.asarray(rng.uniform(1.0, 4.0, (h, w)), dtype),
    )
    if sh_degree is not None:
        m = num_sh_coeffs(sh_degree)
        sh = rng.normal(scale=0.3, size=(p, m, 3))
        sh[:, 0] = np.asarray(rgb_to_sh0(jnp.asarray(colors)))
        out["shs"] = jnp.asarray(sh, dtype)
        out["sh_degree"] = sh_degree
        del out["colors_precomp"]
    return out, cam
