"""SE(3) utilities for pose optimization.

The reference optimizes the 12 derivative-carrying entries of the 4x4
world-to-camera matrix directly (grad_viewmatrix, light __init__.py:160-176),
which drifts off the SE(3) manifold.  We support that mode for parity and a
better-conditioned retraction: parametrize the pose update as a twist
``xi in R^6`` applied to a base pose, ``w2c(xi) = exp(xi^) @ w2c_0``, and
optimize ``xi`` — gradients flow through ``exp`` by autodiff.

All public functions speak the row-vector convention used across this
package (matrices are transposed w2c transforms; see camera.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hat(w):
    """(..., 3) -> (..., 3, 3) skew-symmetric."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], -1),
            jnp.stack([wz, zeros, -wx], -1),
            jnp.stack([-wy, wx, zeros], -1),
        ],
        -2,
    )


def _rot_coeffs(w):
    """Taylor-safe (a, b, c) = (sin t/t, (1-cos t)/t^2, (t-sin t)/t^3).

    Differentiable at w = 0: the norm is never taken of a (near-)zero vector
    (``sqrt`` at 0 has an infinite derivative and 0/0 slope -> NaN grads; the
    standard double-where guard routes the small case through polynomials in
    ``t2 = |w|^2`` instead).
    """
    t2 = jnp.sum(w * w)
    small = t2 < 1e-12
    t2s = jnp.where(small, 1.0, t2)          # safe sqrt argument
    theta = jnp.sqrt(t2s)
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(theta)) / t2s)
    c = jnp.where(small, 1.0 / 6.0 - t2 / 120.0,
                  (theta - jnp.sin(theta)) / (t2s * theta))
    return a, b, c


def exp_so3(w):
    """Rodrigues: (3,) rotation vector -> (3,3) rotation matrix."""
    a, b, _ = _rot_coeffs(w)
    k = hat(w)
    return jnp.eye(3, dtype=w.dtype) + a * k + b * (k @ k)


def exp_se3(xi):
    """(6,) twist (v, w) -> (4,4) rigid transform (column-vector convention)."""
    v, w = xi[:3], xi[3:]
    k = hat(w)
    rot = exp_so3(w)
    _, b, c = _rot_coeffs(w)
    vmat = jnp.eye(3, dtype=xi.dtype) + b * k + c * (k @ k)
    m = jnp.eye(4, dtype=xi.dtype)
    m = m.at[:3, :3].set(rot)
    m = m.at[:3, 3].set(vmat @ v)
    return m


def apply_twist(viewmatrix, xi):
    """Left-apply a twist to a row-convention view matrix.

    ``w2c' = exp(xi) @ w2c``  =>  ``V' = V @ exp(xi)^T``.
    """
    return viewmatrix @ exp_se3(xi).T


def quat_mul(a, b):
    """Hamilton product of (..., 4) quaternions in (r, x, y, z) order."""
    ar, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    br, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        ar * br - ax * bx - ay * by - az * bz,
        ar * bx + ax * br + ay * bz - az * by,
        ar * by - ax * bz + ay * br + az * bx,
        ar * bz + ax * by - ay * bx + az * br,
    ], -1)


def quat_from_rotmat(m):
    """(..., 3, 3) rotation matrix -> (..., 4) unit quaternion (r, x, y, z).

    Branch-free Shepperd selection (the four squared components from the
    diagonal, signs from the off-diagonals, pick the largest for stability)
    so it vectorizes over leading axes under jit.
    """
    m00, m11, m22 = m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]
    tr = m00 + m11 + m22
    # candidate quaternions, one per dominant component (each valid when its
    # pivot is the largest; unnormalized)
    qr = jnp.stack([1.0 + tr,
                    m[..., 2, 1] - m[..., 1, 2],
                    m[..., 0, 2] - m[..., 2, 0],
                    m[..., 1, 0] - m[..., 0, 1]], -1)
    qx = jnp.stack([m[..., 2, 1] - m[..., 1, 2],
                    1.0 + m00 - m11 - m22,
                    m[..., 0, 1] + m[..., 1, 0],
                    m[..., 0, 2] + m[..., 2, 0]], -1)
    qy = jnp.stack([m[..., 0, 2] - m[..., 2, 0],
                    m[..., 0, 1] + m[..., 1, 0],
                    1.0 - m00 + m11 - m22,
                    m[..., 1, 2] + m[..., 2, 1]], -1)
    qz = jnp.stack([m[..., 1, 0] - m[..., 0, 1],
                    m[..., 0, 2] + m[..., 2, 0],
                    m[..., 1, 2] + m[..., 2, 1],
                    1.0 - m00 - m11 + m22], -1)
    pivots = jnp.stack([tr, m00, m11, m22], -1)
    best = jnp.argmax(pivots, axis=-1)
    q = jnp.stack([qr, qx, qy, qz], -2)   # (..., 4 candidates, 4)
    q = jnp.take_along_axis(q, best[..., None, None].repeat(4, -1),
                            axis=-2)[..., 0, :]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def orthonormalize_view(viewmatrix):
    """Project the rotation block of a row-convention view matrix back onto
    SO(3) (for direct-matrix optimization, which drifts off the manifold)."""
    r = viewmatrix[:3, :3].T  # actual w2c rotation
    u, _, vt = jnp.linalg.svd(r)
    det = jnp.linalg.det(u @ vt)
    r_on = u @ jnp.diag(jnp.array([1.0, 1.0, det], viewmatrix.dtype)) @ vt
    out = viewmatrix.at[:3, :3].set(r_on.T)
    return out
