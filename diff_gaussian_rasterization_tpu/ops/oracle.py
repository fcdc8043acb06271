"""Oracle renderer: pure-JAX, fully differentiable, no binning, no kernels.

Small and slow by design.  Every pixel considers *every* Gaussian in global
depth order, with an optional per-pixel tile-membership mask that makes its
output bit-comparable to the tiled production path.  Because it is plain JAX,
``jax.grad`` through it provides ground truth for every analytic gradient in
the production backward — including the pose (view-matrix) gradient chain the
reference hand-derives across ~1,500 lines of backward.cu.  This realizes the
test strategy the reference lacks entirely (it ships zero tests; see
SURVEY.md §4).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..camera import Camera
from ..config import RasterConfig
from . import blend
from .projection import preprocess


class RenderOutputs(NamedTuple):
    """Mirrors the light variant's 8 forward outputs (__init__.py:105) plus
    diagnostics."""

    color: jnp.ndarray            # (3, H, W)
    radii: jnp.ndarray            # (P,) int32
    depth: jnp.ndarray            # (1, H, W)  sum d*alpha*T
    depth_median: jnp.ndarray     # (1, H, W)
    depth_var: jnp.ndarray        # (1, H, W)  zeros when cfg.ref_depth_var
    opacity_map: jnp.ndarray      # (1, H, W)  sum alpha*T (silhouette)
    gau_uncertainty: jnp.ndarray  # (P, 1)
    gau_related_pixels: jnp.ndarray  # (P, 1) int32
    n_contrib: jnp.ndarray        # (H, W) int32 (per-pixel last contributor)
    n_valid: jnp.ndarray          # (H, W) int32 (full variant's valid count)
    num_rendered: jnp.ndarray     # scalar int32: emitted (gaussian,tile) pairs
    overflow: jnp.ndarray         # scalar bool: instance budget exceeded


def render_oracle(
    means3D,
    camera: Camera,
    cfg: RasterConfig = RasterConfig(),
    *,
    opacities,
    scales=None,
    rotations=None,
    cov3D_precomp=None,
    shs=None,
    sh_degree: int = 0,
    colors_precomp=None,
    scale_modifier: float = 1.0,
    bg=None,
    gt_depth=None,
    tile_mask: bool = True,
    pixel_chunk: int = 8192,
) -> RenderOutputs:
    """Render with O(P * pixels) brute force.

    ``tile_mask=True`` restricts each pixel to Gaussians whose tile rectangle
    covers the pixel's tile, reproducing the production binning exactly.
    """
    h, w = camera.height, camera.width
    p = means3D.shape[0]
    dtype = means3D.dtype
    if bg is None:
        bg = jnp.zeros((3,), dtype)
    if gt_depth is None:
        gt_depth = jnp.zeros((h, w), dtype)
    gt_depth = gt_depth.reshape(h, w)

    prep = preprocess(
        means3D, camera, cfg,
        opacities=opacities, scales=scales, rotations=rotations,
        cov3D_precomp=cov3D_precomp, shs=shs, sh_degree=sh_degree,
        colors_precomp=colors_precomp, scale_modifier=scale_modifier,
    )

    # Global front-to-back order (the production path sorts per tile, but the
    # relative order of any two Gaussians agrees).  The sort order itself is
    # non-differentiable, as in the reference.
    sort_key = jnp.where(prep.mask, jax.lax.stop_gradient(prep.depth), jnp.inf)
    order = jnp.argsort(sort_key)

    xy = prep.xy[order]
    conic = prep.conic[order]
    opacity = prep.opacity[order]
    color = prep.color[order]
    depth = prep.depth[order]
    depth_med = prep.depth_sgview[order]
    valid_g = prep.mask[order]
    rect_min = prep.rect_min[order]
    rect_max = prep.rect_max[order]

    yy = jnp.arange(h, dtype=dtype)
    xx = jnp.arange(w, dtype=dtype)
    px_all = jnp.tile(xx, h)
    py_all = jnp.repeat(yy, w)
    gt_all = gt_depth.reshape(-1)

    q_total = h * w
    chunk = min(pixel_chunk, q_total)
    n_chunks = -(-q_total // chunk)
    pad = n_chunks * chunk - q_total
    px_all = jnp.pad(px_all, (0, pad), constant_values=-1e9)
    py_all = jnp.pad(py_all, (0, pad), constant_values=-1e9)
    gt_all = jnp.pad(gt_all, (0, pad))

    def body(args):
        px, py, gt = args
        if tile_mask:
            tx = jnp.floor(px / cfg.tile_w).astype(jnp.int32)
            ty = jnp.floor(py / cfg.tile_h).astype(jnp.int32)
            in_tile = (
                (rect_min[:, 0:1] <= tx[None, :]) & (tx[None, :] < rect_max[:, 0:1])
                & (rect_min[:, 1:2] <= ty[None, :]) & (ty[None, :] < rect_max[:, 1:2])
            )
            valid = valid_g[:, None] & in_tile
        else:
            valid = valid_g
        carry = blend.init_carry(px.shape[0], 3, dtype)
        carry, u_inst, npix_inst = blend.blend_chunk_fwd(
            carry, xy, conic, opacity, color, depth, depth_med, valid,
            px, py, gt, jnp.int32(0), cfg, depth_var=depth_med,
        )
        return carry, u_inst, npix_inst

    carries, u_parts, npix_parts = jax.lax.map(
        body,
        (px_all.reshape(n_chunks, chunk), py_all.reshape(n_chunks, chunk),
         gt_all.reshape(n_chunks, chunk)),
    )

    def unchunk(x):
        flat = x.reshape(n_chunks * chunk, *x.shape[2:])
        return flat[:q_total].reshape(h, w)

    t_final = unchunk(carries.t_final)
    color_img = jnp.moveaxis(
        carries.color, 1, 2
    ).reshape(n_chunks * chunk, 3)[:q_total].reshape(h, w, 3)
    color_img = jnp.transpose(color_img, (2, 0, 1)) + t_final[None] * bg[:, None, None]

    u_sorted = jnp.sum(u_parts, axis=0)
    npix_sorted = jnp.sum(npix_parts, axis=0)
    gau_u = jnp.zeros((p,), dtype).at[order].add(jax.lax.stop_gradient(u_sorted))
    gau_npix = jnp.zeros((p,), jnp.int32).at[order].add(npix_sorted)

    depth_var = unchunk(blend.finish_var(
        carries, gt_all.reshape(n_chunks, chunk)))
    if cfg.ref_depth_var:
        # light forward.cu:317,410: D_var is declared but never accumulated,
        # yet the backward consumes dL_dout_depth_var meaningfully
        # (light backward.cu:608,611).  Match the production op
        # (rasterize.py) exactly: value 0, gradient of the true variance —
        # so default-config gradients are oracle-checkable.
        depth_var = depth_var - jax.lax.stop_gradient(depth_var)

    return RenderOutputs(
        color=color_img,
        radii=prep.radius,
        depth=unchunk(carries.depth)[None],
        depth_median=unchunk(carries.median)[None],
        depth_var=depth_var[None],
        opacity_map=unchunk(carries.weight)[None],
        gau_uncertainty=gau_u[:, None],
        gau_related_pixels=gau_npix[:, None],
        n_contrib=unchunk(carries.n_contrib),
        n_valid=unchunk(carries.n_valid),
        num_rendered=jnp.sum(prep.tiles_touched).astype(jnp.int32),
        overflow=jnp.array(False),
    )
