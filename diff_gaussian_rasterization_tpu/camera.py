"""Camera model.

The reference threads three separate matrices through its API
(light ``__init__.py:180-195``): ``viewmatrix`` (the differentiated
world-to-camera transform), ``projmatrix`` (the full view*projection product
used for NDC), and ``perspec_matrix`` (the intrinsics-only perspective matrix
whose [0][0]/[1][1] entries feed the pose-NDC Jacobian,
``backward.cu:725-739``).  Here they collapse into one dataclass: the
perspective matrix is derived from the field of view, and the projection
matrix is *computed from the live view matrix*, so JAX autodiff through it
reproduces the reference's hand-written ``d(ndc)/d(view)`` tables
(``pose_gradient_preCUDA``, backward.cu:701-751) exactly.

Matrix convention
-----------------
All 4x4 matrices use the same layout the reference receives from CG-SLAM:
the array is the *transpose* of the usual column-vector transform, i.e.
points transform as row vectors::

    p_view = [p, 1] @ viewmatrix          # transformPoint4x3, auxiliary.h:58-66
    p_hom  = [p, 1] @ projmatrix          # transformPoint4x4, auxiliary.h:68-77
    projmatrix = viewmatrix @ perspective

The flat element ``v_k`` referenced throughout the reference backward
(``dL_dv0 .. dL_dv14``) is ``viewmatrix[k // 4, k % 4]``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp


def perspective_matrix(tanfovx, tanfovy, znear=0.01, zfar=100.0, dtype=jnp.float32):
    """3DGS-style symmetric perspective matrix, row-vector convention.

    Matches the CG-SLAM ``getProjectionMatrix`` the reference expects:
    ``perspec[0] = 1/tanfovx``, ``perspec[5] = 1/tanfovy``
    (consumed at backward.cu:725,736), w = view-space z.
    """
    z_sign = 1.0
    p = jnp.zeros((4, 4), dtype=dtype)
    p = p.at[0, 0].set(1.0 / tanfovx)
    p = p.at[1, 1].set(1.0 / tanfovy)
    # column-vector K[2,2], K[2,3], K[3,2] transposed into row convention
    p = p.at[2, 2].set(z_sign * zfar / (zfar - znear))
    p = p.at[3, 2].set(-(zfar * znear) / (zfar - znear))
    p = p.at[2, 3].set(z_sign)
    return p


def look_at(eye, target, up=(0.0, 1.0, 0.0), dtype=jnp.float32):
    """World-to-camera matrix (row-vector convention) looking from eye to target."""
    eye = jnp.asarray(eye, dtype)
    target = jnp.asarray(target, dtype)
    up = jnp.asarray(up, dtype)
    fwd = target - eye
    fwd = fwd / jnp.linalg.norm(fwd)
    right = jnp.cross(fwd, up)
    right = right / jnp.linalg.norm(right)
    cup = jnp.cross(fwd, right)
    # rows of the (column-vector) w2c rotation
    rot = jnp.stack([right, cup, fwd])  # (3,3): camera axes in world coords
    trans = -rot @ eye
    w2c = jnp.eye(4, dtype=dtype)
    w2c = w2c.at[:3, :3].set(rot)
    w2c = w2c.at[:3, 3].set(trans)
    return w2c.T  # row-vector convention


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """Pinhole camera.  ``viewmatrix`` is the only differentiable leaf."""

    viewmatrix: Any  # (4,4) w2c in row-vector convention (differentiable)
    tanfovx: float = dataclasses.field(metadata=dict(static=True))
    tanfovy: float = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))
    width: int = dataclasses.field(metadata=dict(static=True))
    znear: float = dataclasses.field(default=0.01, metadata=dict(static=True))
    zfar: float = dataclasses.field(default=100.0, metadata=dict(static=True))

    @classmethod
    def from_fov(cls, viewmatrix, fovx, fovy, height, width, **kw):
        return cls(
            viewmatrix=viewmatrix,
            tanfovx=math.tan(fovx * 0.5),
            tanfovy=math.tan(fovy * 0.5),
            height=height,
            width=width,
            **kw,
        )

    @classmethod
    def from_intrinsics(cls, viewmatrix, fx, fy, height, width, **kw):
        return cls(
            viewmatrix=viewmatrix,
            tanfovx=width / (2.0 * fx),
            tanfovy=height / (2.0 * fy),
            height=height,
            width=width,
            **kw,
        )

    @property
    def focal_x(self):
        # rasterizer_impl.cu:375-376: focal = size / (2 * tanfov)
        return self.width / (2.0 * self.tanfovx)

    @property
    def focal_y(self):
        return self.height / (2.0 * self.tanfovy)

    @property
    def perspective(self):
        return perspective_matrix(
            self.tanfovx, self.tanfovy, self.znear, self.zfar,
            dtype=self.viewmatrix.dtype,
        )

    @property
    def projmatrix(self):
        """Full view*projection product, row-vector convention.

        Computed from the live view matrix so that ``jax.grad`` through NDC
        coordinates yields the pose-NDC Jacobian the reference precomputes in
        ``pose_gradient_preCUDA`` (backward.cu:723-744).
        """
        return self.viewmatrix @ self.perspective

    @property
    def campos(self):
        """Camera center in world coordinates (differentiable w.r.t. view)."""
        v = self.viewmatrix
        # actual w2c: R = v[:3,:3].T, t = v[3,:3]; center = -R^{-1} t = -v[:3,:3] @ t
        return -v[:3, :3] @ v[3, :3]

    def world_to_view(self, points):
        """(N,3) world points -> (N,3) view-space points."""
        return points @ self.viewmatrix[:3, :3] + self.viewmatrix[3, :3]

    def project(self, points, w_eps=1e-7):
        """(N,3) world points -> ((N,4) hom, (N,3) ndc)."""
        pm = self.projmatrix
        hom = points @ pm[:3, :] + pm[3, :]
        p_w = 1.0 / (hom[:, 3:4] + w_eps)
        return hom, hom[:, :3] * p_w
