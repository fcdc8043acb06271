"""Per-Gaussian preprocessing: culling, projection, covariance, footprint.

TPU-native equivalent of ``FORWARD::preprocess`` (light forward.cu:156-256)
and its helpers ``computeCov3D`` (forward.cu:118-152) and ``computeCov2D``
(forward.cu:74-113).  The CUDA design runs one thread per Gaussian with early
returns; here everything is a vectorized masked computation over the whole
Gaussian set — XLA maps it onto the VPU/MXU with no divergence.

The backward of this module is **pure JAX autodiff**.  That single fact
replaces three reference kernels:

- ``computeCov2DCUDA`` (backward.cu:144-276): conic -> cov2D -> cov3D / mean
  gradients, including the 1.3*tanfov clamp's gradient gate
  (``x_grad_mul``, backward.cu:175-176), which falls out of
  ``jnp.clip`` automatically.
- the backward ``preprocessCUDA`` (backward.cu:348-416): mean gradients
  through the projection and through the per-Gaussian depth.
- ``pose_gradient_preCUDA`` (backward.cu:701-751): the d(ndc)/d(view) and
  d(depth)/d(view) tables exist implicitly because ``Camera.projmatrix`` is a
  function of the live view matrix.

The light-vs-full pose-branch split (reference README.md:53-58) is realized
with ``stop_gradient`` on the view matrix in the branches the light variant
drops (2D covariance, SH view direction).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..camera import Camera
from ..config import RasterConfig
from . import sh as sh_mod


class Preprocessed(NamedTuple):
    """Per-Gaussian screen-space quantities (all shape (P, ...))."""

    mask: jnp.ndarray          # (P,) bool: survives culling and has a footprint
    depth: jnp.ndarray         # (P,) view-space z (differentiable: mean & pose)
    depth_sgview: jnp.ndarray  # (P,) same value, pose gradient stopped
    xy: jnp.ndarray            # (P, 2) pixel-space center
    conic: jnp.ndarray         # (P, 3) inverse 2D covariance (A, B, C)
    color: jnp.ndarray         # (P, 3) RGB (from SH or precomputed)
    opacity: jnp.ndarray       # (P,) raw opacity
    radius: jnp.ndarray        # (P,) int32 pixel radius (0 where masked)
    rect_min: jnp.ndarray      # (P, 2) int32 (tx, ty) inclusive tile bounds
    rect_max: jnp.ndarray      # (P, 2) int32 exclusive tile bounds
    tiles_touched: jnp.ndarray  # (P,) int32


def quat_to_rotmat(q):
    """(P,4) quaternion (r,x,y,z) -> (P,3,3) rotation matrix.

    Matches forward.cu:134-138; the reference does *not* normalize
    (forward.cu:127) — normalization is the caller's choice via config.
    """
    r, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return jnp.stack(
        [
            jnp.stack([1.0 - 2.0 * (y * y + z * z), 2.0 * (x * y - r * z), 2.0 * (x * z + r * y)], -1),
            jnp.stack([2.0 * (x * y + r * z), 1.0 - 2.0 * (x * x + z * z), 2.0 * (y * z - r * x)], -1),
            jnp.stack([2.0 * (x * z - r * y), 2.0 * (y * z + r * x), 1.0 - 2.0 * (x * x + y * y)], -1),
        ],
        -2,
    )


def compute_cov3d(scales, quats, scale_modifier, normalize_quaternions=False):
    """(P,3) scales + (P,4) quats -> (P,6) packed world covariance.

    Sigma = R diag(s^2) R^T, packed (xx, xy, xz, yy, yz, zz) exactly as the
    reference stores it (forward.cu:140-151).
    """
    if normalize_quaternions:
        quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    s = scales * scale_modifier
    rot = quat_to_rotmat(quats)  # (P,3,3)
    m = rot * s[:, None, :]      # R @ diag(s)
    sigma = m @ jnp.swapaxes(m, -1, -2)
    return jnp.stack(
        [sigma[:, 0, 0], sigma[:, 0, 1], sigma[:, 0, 2],
         sigma[:, 1, 1], sigma[:, 1, 2], sigma[:, 2, 2]],
        -1,
    )


def unpack_cov3d(cov6):
    """(P,6) packed -> (P,3,3) symmetric."""
    xx, xy, xz, yy, yz, zz = (cov6[:, i] for i in range(6))
    return jnp.stack(
        [
            jnp.stack([xx, xy, xz], -1),
            jnp.stack([xy, yy, yz], -1),
            jnp.stack([xz, yz, zz], -1),
        ],
        -2,
    )


def compute_cov2d(means, cov3d_packed, viewmatrix, focal_x, focal_y,
                  tanfovx, tanfovy, cfg: RasterConfig, valid=None):
    """EWA projection of the 3D covariance to screen space.

    Equivalent of ``computeCov2D`` (forward.cu:74-113): view-space point
    clamped to ``1.3*tanfov``, perspective Jacobian J, cov2D = J W Sigma W^T J^T
    with the 0.3 low-pass on the diagonal.  Returns (P,3) packed (a, b, c).

    ``valid`` masks culled Gaussians: the reference's per-thread early
    return (forward.cu:193) means their covariance is never computed; here
    their view depth is replaced by 1 so no inf/NaN can leak into gradients
    through the masked-out lanes (the `where` gradient trap).
    """
    t = means @ viewmatrix[:3, :3] + viewmatrix[3, :3]
    tz = t[:, 2]
    if valid is not None:
        tz = jnp.where(valid, tz, 1.0)
    limx = cfg.fov_clamp * tanfovx
    limy = cfg.fov_clamp * tanfovy
    # clip gives exactly the reference's x_grad_mul/y_grad_mul zero-gradient
    # gate (backward.cu:175-176) under autodiff.
    tx = jnp.clip(t[:, 0] / tz, -limx, limx) * tz
    ty = jnp.clip(t[:, 1] / tz, -limy, limy) * tz

    inv_tz = 1.0 / tz
    inv_tz2 = inv_tz * inv_tz
    # Rows of the 2x3 perspective Jacobian (EWA Splatting eq. 29/31).
    j0 = jnp.stack([focal_x * inv_tz, jnp.zeros_like(tz), -focal_x * tx * inv_tz2], -1)
    j1 = jnp.stack([jnp.zeros_like(tz), focal_y * inv_tz, -focal_y * ty * inv_tz2], -1)

    # World-to-view rotation block: rows of the (column-vector) w2c rotation
    # are columns of our row-convention matrix.
    w = viewmatrix[:3, :3].T  # (3,3) actual w2c rotation
    m0 = j0 @ w  # (P,3)
    m1 = j1 @ w

    sigma = unpack_cov3d(cov3d_packed)  # (P,3,3)
    s_m0 = jnp.einsum("pij,pj->pi", sigma, m0)
    s_m1 = jnp.einsum("pij,pj->pi", sigma, m1)
    a = jnp.einsum("pi,pi->p", m0, s_m0) + cfg.lowpass
    b = jnp.einsum("pi,pi->p", m0, s_m1)
    c = jnp.einsum("pi,pi->p", m1, s_m1) + cfg.lowpass
    return jnp.stack([a, b, c], -1)


def ndc2pix(v, size):
    """auxiliary.h:41-44: ((v + 1) * S - 1) / 2."""
    return ((v + 1.0) * size - 1.0) * 0.5


def tile_rect(xy, radius_x, tiles_x, tiles_y, tile_w, tile_h,
              radius_y=None):
    """Tile-aligned bounding rectangle of a splat (auxiliary.h:46-56).

    ``radius_x``/``radius_y`` may differ: the binning footprint uses the
    alpha-level ellipse's axis-aligned extents rather than the reference's
    bounding circle (see ``preprocess``), which is strictly tighter for
    anisotropic splats.
    """
    if radius_y is None:
        radius_y = radius_x
    # Exclusive max = floor(v/t) + 1 (tile of the last covered pixel).  The
    # reference's ``(v + BLOCK - 1) / BLOCK`` ceil idiom (auxiliary.h:46-56)
    # is an *integer* trick that silently undercovers for fractional v
    # (e.g. v = 8.96, t = 8 gives 1, dropping live pixels in tile row 1) —
    # a reference artifact its 3-sigma slack usually hides; not reproduced.
    rmin_x = jnp.clip(jnp.floor((xy[:, 0] - radius_x) / tile_w), 0, tiles_x).astype(jnp.int32)
    rmin_y = jnp.clip(jnp.floor((xy[:, 1] - radius_y) / tile_h), 0, tiles_y).astype(jnp.int32)
    rmax_x = jnp.clip(jnp.floor((xy[:, 0] + radius_x) / tile_w) + 1, 0, tiles_x).astype(jnp.int32)
    rmax_y = jnp.clip(jnp.floor((xy[:, 1] + radius_y) / tile_h) + 1, 0, tiles_y).astype(jnp.int32)
    return jnp.stack([rmin_x, rmin_y], -1), jnp.stack([rmax_x, rmax_y], -1)


def preprocess(
    means3D,
    camera: Camera,
    cfg: RasterConfig,
    *,
    opacities,
    scales=None,
    rotations=None,
    cov3D_precomp=None,
    shs=None,
    sh_degree: int = 0,
    colors_precomp=None,
    scale_modifier: float = 1.0,
    means2D=None,
) -> Preprocessed:
    """Vectorized per-Gaussian preprocessing (forward.cu:156-256).

    ``means2D`` is an optional (P, 2) NDC-units offset added to the projected
    centers.  Pass zeros to read screen-space position gradients from it —
    the role of the reference's ``means2D`` input, whose only purpose is to
    receive ``dL/d(mean2D)`` for the densification policy (its value is
    ignored by the CUDA kernels; grads emitted at backward.cu:668-670 carry
    the 0.5*W/H NDC scaling, which this formulation reproduces since
    ndc2Pix is linear).
    """
    view = camera.viewmatrix
    sg = jax.lax.stop_gradient
    view_depth = view if cfg.pose_depth_branch else sg(view)
    view_cov = view if cfg.pose_cov2d_branch else sg(view)
    view_ndc = view if cfg.pose_ndc_branch else sg(view)
    cam_ndc = Camera(
        viewmatrix=view_ndc, tanfovx=camera.tanfovx, tanfovy=camera.tanfovy,
        height=camera.height, width=camera.width, znear=camera.znear,
        zfar=camera.zfar,
    )

    p_view_z = means3D @ view_depth[:3, 2] + view_depth[3, 2]
    p_view_z_sg = means3D @ sg(view)[:3, 2] + sg(view)[3, 2]
    visible = p_view_z > cfg.near  # in_frustum, auxiliary.h:154

    # homogeneous divide, guarded for culled Gaussians (w ~ 0 behind the
    # camera would otherwise inject inf into gradients of masked lanes)
    pm = cam_ndc.projmatrix
    hom = means3D @ pm[:3, :] + pm[3, :]
    hom_w = jnp.where(visible, hom[:, 3], 1.0)
    ndc = hom[:, :3] / (hom_w + cfg.w_eps)[:, None]

    if cov3D_precomp is not None:
        cov3d = cov3D_precomp
    else:
        cov3d = compute_cov3d(scales, rotations, scale_modifier,
                              cfg.normalize_quaternions)

    cov2d = compute_cov2d(
        means3D, cov3d, view_cov, camera.focal_x, camera.focal_y,
        camera.tanfovx, camera.tanfovy, cfg, valid=visible,
    )
    a, b, c = cov2d[:, 0], cov2d[:, 1], cov2d[:, 2]
    det = a * c - b * b
    det_ok = det != 0.0
    safe_det = jnp.where(det_ok, det, 1.0)
    inv_det = 1.0 / safe_det
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], -1)

    mid = 0.5 * (a + c)
    lam = mid + jnp.sqrt(jnp.maximum(cfg.eig_clamp, mid * mid - det))
    sigma = jnp.sqrt(lam)
    radius = jnp.ceil(cfg.radius_sigma * sigma)

    if cfg.opacity_cull:
        # Exact-footprint binning extents: pixels where
        # alpha = opac*exp(power) < alpha_min can never pass the reference's
        # alpha >= 15/255 test (forward.cu:359-366), so binning them is pure
        # waste — the reference's fixed 3-sigma bounding-circle rect
        # (forward.cu:229-232) includes up to ~60% dead area (and entire
        # Gaussians with opac < alpha_min).  The alpha_min level set is the
        # ellipse {power = ln(alpha_min/opac)} whose axis-aligned extents
        # are cut*sqrt(cov_xx) / cut*sqrt(cov_yy) with
        # cut = sqrt(2 ln(opac/alpha_min)) — per-axis, strictly inside the
        # bounding circle cut*sigma_max for anisotropic splats.  Rendered
        # output is bit-identical; only instance-stream diagnostics
        # (num_rendered, n_contrib indices) shrink.
        op = jnp.reshape(jax.lax.stop_gradient(opacities), (-1,))
        ratio = op / cfg.alpha_min
        cut = jnp.sqrt(2.0 * jnp.log(jnp.maximum(ratio, 1.0)))
        cut = jnp.minimum(cfg.radius_sigma, cut)
        live = ratio > 1.0
        # +1e-3 px guards the f32 extent rounding against the (exact) f32
        # alpha >= alpha_min test at pixels sitting on the level set
        rx_bin = jnp.where(live, jnp.ceil(
            cut * jnp.sqrt(jnp.maximum(a, 0.0)) + 1e-3), 0.0)
        ry_bin = jnp.where(live, jnp.ceil(
            cut * jnp.sqrt(jnp.maximum(c, 0.0)) + 1e-3), 0.0)
    else:
        rx_bin = ry_bin = radius

    if cfg.bin_margin_px:
        # dilate live footprints only: a zero footprint means the splat can
        # never pass alpha_min anywhere, which no pose change alters
        m = float(cfg.bin_margin_px)
        rx_bin = jnp.where(rx_bin > 0, rx_bin + m, rx_bin)
        ry_bin = jnp.where(ry_bin > 0, ry_bin + m, ry_bin)

    ndc_xy = ndc[:, :2] if means2D is None else ndc[:, :2] + means2D
    xy = jnp.stack(
        [ndc2pix(ndc_xy[:, 0], camera.width),
         ndc2pix(ndc_xy[:, 1], camera.height)], -1
    )

    tiles_x = -(-camera.width // cfg.tile_w)
    tiles_y = -(-camera.height // cfg.tile_h)
    rect_min, rect_max = tile_rect(xy, rx_bin, tiles_x, tiles_y,
                                   cfg.tile_w, cfg.tile_h, radius_y=ry_bin)
    ext = rect_max - rect_min
    tiles_touched = ext[:, 0] * ext[:, 1]

    mask = visible & det_ok & (tiles_touched > 0)

    if colors_precomp is not None:
        color = colors_precomp
    else:
        campos = camera.campos if cfg.pose_sh_branch else sg(camera.campos)
        color = sh_mod.eval_sh(shs, means3D - campos[None, :], sh_degree)

    tiles_touched = jnp.where(mask, tiles_touched, 0)
    radius = jnp.where(mask, radius, 0.0).astype(jnp.int32)

    return Preprocessed(
        mask=mask,
        depth=p_view_z,
        depth_sgview=p_view_z_sg,
        xy=xy,
        conic=conic,
        color=color,
        opacity=jnp.reshape(opacities, (-1,)),
        radius=radius,
        rect_min=rect_min,
        rect_max=rect_max,
        tiles_touched=tiles_touched,
    )


def mark_visible(positions, viewmatrix, near=0.2):
    """Frustum-culling predicate (``markVisible``/``checkFrustum``,
    rasterizer_impl.cu:54-66 + auxiliary.h:139-164: near-plane-only test)."""
    z = positions @ viewmatrix[:3, 2] + viewmatrix[3, 2]
    return z > near
