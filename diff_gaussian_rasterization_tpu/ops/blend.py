"""Front-to-back alpha blending as masked parallel prefix products.

The reference rasterizes sequentially: one CUDA thread per pixel walks its
depth-sorted Gaussian list, updating transmittance ``T`` step by step
(light forward.cu:261-412) and re-walks it back-to-front in the backward with
running recurrences (backward.cu:419-699).  That control flow is hostile to
TPUs.  Here the same semantics are reformulated so that a whole chunk of
Gaussians x a whole tile of pixels is processed as dense vector math:

Forward (per pixel, instances sorted front-to-back):
  ``a_i = 1 - alpha_i`` where the instance passes the reference's validity
  tests (power <= 0, alpha >= 15/255; forward.cu:356-366), else 1.  The
  inclusive prefix product ``P_i = prod_{j<=i} a_j`` equals the reference's
  ``test_T`` at step i.  Because ``P`` is non-increasing, the reference's
  early-termination (stop *before* accumulating once ``test_T < 1e-4``,
  forward.cu:368-373) is exactly the mask ``contrib_i = valid_i & (P_i >=
  1e-4)``, and the frozen final transmittance is ``min over contributing i of
  P_i`` (or 1).  Blend weights are ``w_i = alpha_i * P_{i-1} * contrib_i``;
  every output is then a plain (MXU-friendly) contraction of ``w`` with
  per-instance features.  The median-depth crossing (T > 0.5 && test_T < 0.5,
  forward.cu:381-388) is the mask ``contrib & (P_{i-1} > 0.5) & (P_i < 0.5)``,
  which fires at most once per pixel by monotonicity.

Backward: the reference's back-to-front recurrences ``accum_rec``
(backward.cu:584-612) satisfy ``accum_rec_i = S_i / (T_i (1-alpha_i))`` where
``S_i`` is the *strict suffix* sum of ``w*feature`` — proved by induction on
the recurrence.  Suffix sums are forward totals minus inclusive prefix sums,
and the totals are the forward outputs themselves, so the whole backward is a
single forward-ordered pass with prefix sums: no sequential dependency, no
atomics.  Per-Gaussian gradients leave as *per-instance rows* (each instance
belongs to exactly one tile) and are segment-summed outside — a deterministic
replacement for the reference's float atomicAdd scatter.

All functions are pure jnp on arrays shaped [G (instances), Q (pixels)] and
are used verbatim by the oracle renderer, the XLA tile backend, and inside
the Pallas kernels.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import RasterConfig


def cumprod_incl(a, axis=0):
    """Inclusive cumulative product via log-doubling (Pallas-safe)."""
    n = a.shape[axis]
    assert axis == 0
    s = 1
    while s < n:
        ones = jnp.ones_like(jax.lax.slice_in_dim(a, 0, s, axis=0))
        shifted = jnp.concatenate(
            [ones, jax.lax.slice_in_dim(a, 0, n - s, axis=0)], axis=0
        )
        a = a * shifted
        s *= 2
    return a


def cumsum_incl(a, axis=0):
    """Inclusive cumulative sum via log-doubling (Pallas-safe)."""
    n = a.shape[axis]
    assert axis == 0
    s = 1
    while s < n:
        zeros = jnp.zeros_like(jax.lax.slice_in_dim(a, 0, s, axis=0))
        shifted = jnp.concatenate(
            [zeros, jax.lax.slice_in_dim(a, 0, n - s, axis=0)], axis=0
        )
        a = a + shifted
        s *= 2
    return a


def splat_alpha(xy, conic, opacity, px, py, cfg: RasterConfig):
    """Per (instance, pixel) Gaussian falloff and alpha.

    Args:
      xy: [G, 2] splat centers (pixel units); conic: [G, 3]; opacity: [G].
      px, py: [Q] pixel coordinates.

    Returns:
      alpha [G, Q], ok [G, Q] (power<=0 and alpha>=alpha_min;
      forward.cu:356-366).
    """
    dx = xy[:, 0:1] - px[None, :]
    dy = xy[:, 1:2] - py[None, :]
    A, B, C = conic[:, 0:1], conic[:, 1:2], conic[:, 2:3]
    power = -0.5 * (A * dx * dx + C * dy * dy) - B * dx * dy
    g = jnp.exp(power)
    alpha = jnp.minimum(cfg.alpha_cap, opacity[:, None] * g)
    ok = (power <= 0.0) & (alpha >= cfg.alpha_min)
    return alpha, ok


class BlendCarry(NamedTuple):
    """Running per-pixel state across instance chunks (all [Q])."""

    prod: jnp.ndarray      # running product of a_eff over all valid instances
    t_final: jnp.ndarray   # min of P over contributing instances (frozen T)
    color: jnp.ndarray     # [C, Q] accumulated sum w * color
    depth: jnp.ndarray     # accumulated sum w * depth
    weight: jnp.ndarray    # accumulated sum w  (the reference's out_alpha)
    median: jnp.ndarray    # depth at the T=0.5 crossing (0 if none)
    var: jnp.ndarray       # accumulated sum w * (depth - gt)^2
    n_contrib: jnp.ndarray  # int32, 1-based global index of last contributor
    n_valid: jnp.ndarray   # int32, number of contributors
    midx: jnp.ndarray      # int32, global instance index of the median
                           # crossing (-1 if none yet)
    ucross: jnp.ndarray    # (d-gt)^2 * alpha * T at the crossing (per pixel)


def init_carry(q: int, channels: int = 3, dtype=jnp.float32) -> BlendCarry:
    z = jnp.zeros((q,), dtype)
    return BlendCarry(
        prod=jnp.ones((q,), dtype),
        t_final=jnp.ones((q,), dtype),
        color=jnp.zeros((channels, q), dtype),
        depth=z,
        weight=z,
        median=z,
        var=z,
        n_contrib=jnp.zeros((q,), jnp.int32),
        n_valid=jnp.zeros((q,), jnp.int32),
        midx=jnp.full((q,), -1, jnp.int32),
        ucross=jnp.zeros((q,), dtype),
    )


def blend_chunk_fwd(
    carry: BlendCarry,
    xy, conic, opacity, color, depth, depth_med, valid,
    px, py, gt,
    base_index: jnp.ndarray,
    cfg: RasterConfig,
    depth_var=None,
    global_base=None,
):
    """Blend one front-to-back chunk of instances into the carry.

    Args:
      xy [G,2], conic [G,3], opacity [G], color [G,C], depth [G],
      depth_med [G] (same values as depth, possibly different gradient
      routing), valid [G] or [G,Q] bool (a [G,Q] mask expresses per-pixel
      tile membership, used by the oracle to reproduce tile binning).
      px, py, gt: [Q].
      base_index: scalar int32, global index of this chunk's first instance.

    Returns:
      (new_carry, u_inst [G], npix_inst [G]) — per-instance uncertainty and
      related-pixel counts from the median crossing (forward.cu:386-387).
    """
    alpha, ok = splat_alpha(xy, conic, opacity, px, py, cfg)
    v = (valid if valid.ndim == 2 else valid[:, None]) & ok
    a_eff = jnp.where(v, 1.0 - alpha, 1.0)
    p_incl = carry.prod[None, :] * cumprod_incl(a_eff)           # [G, Q]
    t_excl = jnp.concatenate(
        [carry.prod[None, :], jax.lax.slice_in_dim(p_incl, 0, p_incl.shape[0] - 1, axis=0)], axis=0
    )
    contrib = v & (p_incl >= cfg.t_terminate)
    w = jnp.where(contrib, alpha * t_excl, 0.0)                   # [G, Q]

    cross = contrib & (t_excl > 0.5) & (p_incl < 0.5)
    crossf = cross.astype(w.dtype)

    g = xy.shape[0]
    gi = jax.lax.broadcasted_iota(jnp.int32, (g, 1), 0)
    idx = base_index + 1 + gi
    gidx = (base_index if global_base is None else global_base) + gi

    # The depth-variance (and uncertainty) value path may use a separately
    # gradient-routed copy of the depths: the reference backprops the
    # 2(d-gt) w term into Gaussian means but NOT into the pose
    # (backward.cu:611 feeds dL_ddepths -> preprocess mean path only).
    d_for_var = depth if depth_var is None else depth_var
    du = d_for_var[:, None] - gt[None, :]
    var_rows = w * du * du            # depth variance: every contributor
    u_rows = crossf * var_rows        # per-Gaussian uncertainty: only the
    # median-crossing contributor (forward.cu:386-387)

    last = p_incl.shape[0] - 1  # static index (negative indexing does not
    # lower on Pallas TPU)
    new_carry = BlendCarry(
        prod=p_incl[last],
        t_final=jnp.minimum(
            carry.t_final, jnp.min(jnp.where(contrib, p_incl, 1.0), axis=0)
        ),
        color=carry.color + jnp.einsum(
            "gc,gq->cq", color, w, preferred_element_type=w.dtype
        ),
        depth=carry.depth + jnp.sum(w * depth[:, None], axis=0),
        weight=carry.weight + jnp.sum(w, axis=0),
        median=carry.median + jnp.sum(crossf * depth_med[:, None], axis=0),
        var=carry.var + jnp.sum(var_rows, axis=0),
        n_contrib=jnp.maximum(
            carry.n_contrib,
            jnp.max(jnp.where(contrib, idx, 0), axis=0).astype(jnp.int32),
        ),
        n_valid=carry.n_valid + jnp.sum(contrib, axis=0).astype(jnp.int32),
        midx=jnp.maximum(
            carry.midx,
            jnp.max(jnp.where(cross, gidx, -1), axis=0).astype(jnp.int32),
        ),
        ucross=carry.ucross + jnp.sum(u_rows, axis=0),
    )
    u_inst = jnp.sum(u_rows, axis=1)
    npix_inst = jnp.sum(cross, axis=1).astype(jnp.int32)
    return new_carry, u_inst, npix_inst


class BlendBwdCarry(NamedTuple):
    """Running inclusive prefix sums for the backward pass (all [Q])."""

    prod: jnp.ndarray    # same running product as forward
    pre_c: jnp.ndarray   # [C, Q] prefix of w*color
    pre_d: jnp.ndarray   # prefix of w*depth
    pre_w: jnp.ndarray   # prefix of w
    pre_v: jnp.ndarray   # prefix of w*(d-gt)^2


def init_bwd_carry(q: int, channels: int = 3, dtype=jnp.float32) -> BlendBwdCarry:
    z = jnp.zeros((q,), dtype)
    return BlendBwdCarry(
        prod=jnp.ones((q,), dtype),
        pre_c=jnp.zeros((channels, q), dtype),
        pre_d=z, pre_w=z, pre_v=z,
    )


def blend_chunk_bwd(
    carry: BlendBwdCarry,
    xy, conic, opacity, color, depth, valid,
    px, py, gt,
    # forward totals / residuals (per pixel)
    tot_c, tot_d, tot_w, tot_v, t_final,
    # incoming cotangents (per pixel)
    dL_dc, dL_dd, dL_dw, dL_dvar, dL_dmed, dL_dtf,
    cfg: RasterConfig,
):
    """One forward-ordered backward chunk.

    Implements exactly the gradient flow of BACKWARD::render
    (backward.cu:419-699) in closed form.  Returns
    (new_carry, per-instance gradient rows): d_xy [G,2] (pixel units),
    d_conic [G,3] (true symmetric-matrix gradient), d_opac [G],
    d_color [G,C], d_depth [G] (depth-output term, backward.cu:573),
    d_depth_var [G] (the 2(d-gt) w dL_dvar term, backward.cu:611),
    d_depth_med [G] (median crossing, backward.cu:654-664).
    """
    dx = xy[:, 0:1] - px[None, :]
    dy = xy[:, 1:2] - py[None, :]
    A, B, C_ = conic[:, 0:1], conic[:, 1:2], conic[:, 2:3]
    power = -0.5 * (A * dx * dx + C_ * dy * dy) - B * dx * dy
    g = jnp.exp(power)
    alpha = jnp.minimum(cfg.alpha_cap, opacity[:, None] * g)
    v = (valid if valid.ndim == 2 else valid[:, None]) \
        & (power <= 0.0) & (alpha >= cfg.alpha_min)

    a_eff = jnp.where(v, 1.0 - alpha, 1.0)
    p_incl = carry.prod[None, :] * cumprod_incl(a_eff)
    t_excl = jnp.concatenate(
        [carry.prod[None, :], jax.lax.slice_in_dim(p_incl, 0, p_incl.shape[0] - 1, axis=0)], axis=0
    )
    contrib = v & (p_incl >= cfg.t_terminate)
    contribf = contrib.astype(g.dtype)
    w = contribf * alpha * t_excl

    du = depth[:, None] - gt[None, :]
    varrow = du * du

    # Inclusive prefix sums (within the full instance stream).
    wc = w[:, None, :] * color[:, :, None]                  # [G, C, Q]
    pre_c = carry.pre_c[None] + cumsum_incl(wc)             # [G, C, Q]
    pre_d = carry.pre_d[None] + cumsum_incl(w * depth[:, None])
    pre_w = carry.pre_w[None] + cumsum_incl(w)
    pre_v = carry.pre_v[None] + cumsum_incl(w * varrow)

    one_m_a = 1.0 - alpha
    inv_oma = 1.0 / jnp.where(v, one_m_a, 1.0)

    # dL/dalpha_i, multiplied by T_i, with strict-suffix sums S = tot - prefix.
    # Color channels: sum_ch dL_dc_ch * (T c_ch - S_ch/(1-a))
    suf_c = tot_c[None] - pre_c                             # [G, C, Q]
    # channel contraction as multiply+reduce (a [G,C,Q]x[C,Q] batched matmul
    # does not lower on Mosaic)
    d_alpha = jnp.sum(
        dL_dc[None]
        * (t_excl[:, None, :] * color[:, :, None]
           - suf_c * inv_oma[:, None, :]),
        axis=1,
    )
    d_alpha = d_alpha + dL_dd[None, :] * (
        t_excl * depth[:, None] - (tot_d[None, :] - pre_d) * inv_oma
    )
    d_alpha = d_alpha + dL_dvar[None, :] * (
        t_excl * varrow - (tot_v[None, :] - pre_v) * inv_oma
    )
    d_alpha = d_alpha + dL_dw[None, :] * (
        t_excl - (tot_w[None, :] - pre_w) * inv_oma
    )
    # t_final cotangent: d t_final / d alpha_i = -t_final/(1-alpha_i) for
    # contributing i.  With dL_dtf = bg . dL_dcolor this is exactly the
    # reference's background term (backward.cu:620-623).
    d_alpha = d_alpha - (t_final[None, :] * inv_oma) * dL_dtf[None, :]
    d_alpha = contribf * d_alpha

    # alpha = min(cap, op*G): like the reference, the cap is ignored in the
    # backward (backward.cu:627,678).
    dL_dG = opacity[:, None] * d_alpha
    gdx = g * dx
    gdy = g * dy
    dG_dx = -(gdx * A + gdy * B)   # d exp(power) / d xy.x
    dG_dy = -(gdy * C_ + gdx * B)

    d_xy = jnp.stack(
        [jnp.sum(dL_dG * dG_dx, axis=1), jnp.sum(dL_dG * dG_dy, axis=1)], -1
    )
    # True gradient w.r.t. the packed conic (A, B, C); the off-diagonal entry
    # appears once in power with coefficient -dx dy.
    d_conic = jnp.stack(
        [
            jnp.sum(-0.5 * gdx * dx * dL_dG, axis=1),
            jnp.sum(-gdx * dy * dL_dG, axis=1),
            jnp.sum(-0.5 * gdy * dy * dL_dG, axis=1),
        ],
        -1,
    )
    d_opac = jnp.sum(g * d_alpha, axis=1)
    d_color = jnp.einsum("gq,cq->gc", w, dL_dc, preferred_element_type=g.dtype)
    d_depth = jnp.sum(w * dL_dd[None, :], axis=1)
    d_depth_var = jnp.sum(w * 2.0 * du * dL_dvar[None, :], axis=1)

    cross = contribf * (t_excl > 0.5) * (p_incl < 0.5)
    d_depth_med = jnp.sum(cross * dL_dmed[None, :], axis=1)

    last = p_incl.shape[0] - 1
    new_carry = BlendBwdCarry(
        prod=p_incl[last],
        pre_c=pre_c[last],
        pre_d=pre_d[last],
        pre_w=pre_w[last],
        pre_v=pre_v[last],
    )
    return new_carry, (d_xy, d_conic, d_opac, d_color, d_depth,
                       d_depth_var, d_depth_med)
