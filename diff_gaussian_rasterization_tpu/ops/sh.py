"""Spherical-harmonics color evaluation (degrees 0..3).

Equivalent of the reference's ``computeColorFromSH`` (light forward.cu:20-71):
real SH basis up to degree 3, ``+0.5`` offset, per-channel clamp at zero whose
mask gates the backward (PyTorch clamp rule, backward.cu:31-34).  Here the
clamp is expressed with ``jnp.maximum`` so JAX autodiff applies the same rule
for free; no explicit mask bookkeeping is needed.
"""

from __future__ import annotations

import jax.numpy as jnp

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def num_sh_coeffs(degree: int) -> int:
    return (degree + 1) ** 2


def eval_sh(sh, dirs, degree: int):
    """Evaluate SH colors.

    Args:
      sh: (P, M, 3) coefficients with M >= (degree+1)^2.
      dirs: (P, 3) *unnormalized* view directions (mean - campos); normalized
        here exactly as forward.cu:26-27.
      degree: active SH degree (0..3); static.

    Returns:
      (P, 3) colors, clamped at zero after the +0.5 offset (forward.cu:63-70).
    """
    norm = jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    d = dirs / jnp.where(norm > 0, norm, 1.0)
    x, y, z = d[:, 0:1], d[:, 1:2], d[:, 2:3]

    result = SH_C0 * sh[:, 0]
    if degree > 0:
        result = (
            result
            - SH_C1 * y * sh[:, 1]
            + SH_C1 * z * sh[:, 2]
            - SH_C1 * x * sh[:, 3]
        )
    if degree > 1:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        result = (
            result
            + SH_C2[0] * xy * sh[:, 4]
            + SH_C2[1] * yz * sh[:, 5]
            + SH_C2[2] * (2.0 * zz - xx - yy) * sh[:, 6]
            + SH_C2[3] * xz * sh[:, 7]
            + SH_C2[4] * (xx - yy) * sh[:, 8]
        )
    if degree > 2:
        result = (
            result
            + SH_C3[0] * y * (3.0 * xx - yy) * sh[:, 9]
            + SH_C3[1] * xy * z * sh[:, 10]
            + SH_C3[2] * y * (4.0 * zz - xx - yy) * sh[:, 11]
            + SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * sh[:, 12]
            + SH_C3[4] * x * (4.0 * zz - xx - yy) * sh[:, 13]
            + SH_C3[5] * z * (xx - yy) * sh[:, 14]
            + SH_C3[6] * x * (xx - 3.0 * yy) * sh[:, 15]
        )
    result = result + 0.5
    return jnp.maximum(result, 0.0)


def rgb_to_sh0(rgb):
    """Inverse of the degree-0 band: color -> DC coefficient."""
    return (rgb - 0.5) / SH_C0
