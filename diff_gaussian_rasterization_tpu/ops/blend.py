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
  P_i`` (or 1).  Blend weights are ``w_i = alpha_i * P_{i-1} * contrib_i``.
  Every accumulated output is then one MXU contraction: stacking the
  per-instance features ``[color_c.., depth, depth^2, 1]`` into a matrix F,
  ``F @ w`` yields color/depth/weight sums and — because
  ``(d-gt)^2 = d^2 - 2 gt d + gt^2`` with gt constant per pixel — the
  depth-variance sum as a per-pixel recombination.  The median-depth crossing
  (T > 0.5 && test_T < 0.5, forward.cu:381-388) is the mask
  ``contrib & (P_{i-1} > 0.5) & (P_i < 0.5)``, which fires at most once per
  pixel by monotonicity.

Backward: the reference's back-to-front recurrences ``accum_rec``
(backward.cu:584-612) satisfy ``accum_rec_i = S_i / (T_i (1-alpha_i))`` where
``S_i`` is the *strict suffix* sum of ``w*feature`` — proved by induction on
the recurrence.  Suffix sums are forward totals minus inclusive prefix sums,
and the totals are the forward outputs themselves.  Moreover, because the
incoming cotangents are constants along the instance axis, the four feature
streams (color channels, depth, weight, depth-variance) collapse into ONE
scalar stream ``s_i = <features_i, pixel_cotangents>`` (an MXU matmul), so
the whole backward is a single forward-ordered pass with ONE prefix sum —
no [G, C, Q] tensors, no sequential dependency, no atomics.  Per-instance
gradient reductions over pixels are expressed as moment matmuls against the
tile-centered pixel basis ``[1, x, y, x^2, y^2, xy]`` (centering keeps the
f32 cancellation bounded).  Per-Gaussian gradients leave as *per-instance
rows* (each instance belongs to exactly one tile) and are segment-summed
outside — a deterministic replacement for the reference's float atomicAdd
scatter.

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


def _dot(a, b):
    return jnp.matmul(a, b, preferred_element_type=a.dtype)


def _tri(n, dtype):
    """Lower-triangular ones [n, n] (generated inline; 16k elements is
    noise next to a [G, Q] pass, and Mosaic lowers the iota compare)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (r >= c).astype(dtype)


def cumsum_incl_mm(a):
    """Inclusive cumsum over axis 0 as one triangular MXU contraction
    (cfg.scan_sum_mm): trades log2(G) VPU shift+add rounds for matrix-unit
    time."""
    return _dot(_tri(a.shape[0], a.dtype), a)


def cumprod_incl_mm(a):
    """Inclusive cumprod over axis 0 as exp(tri @ log(a))
    (cfg.scan_prod_mm).  Requires a > 0 — guaranteed here because
    a_eff = 1 - alpha >= 1 - alpha_cap > 0 on valid lanes and exactly 1 on
    masked ones (log(1) == 0 exactly, so masked lanes stay neutral)."""
    return jnp.exp(_dot(_tri(a.shape[0], a.dtype), jnp.log(a)))


def splat_power(xy, conic, px, py, basis=None, origin=None):
    """Per (instance, pixel) Gaussian exponent ``power`` [G, Q].

    Direct form: ``-0.5(A dx^2 + C dy^2) - B dx dy`` (forward.cu:351-353).

    With ``basis`` (the [6, Q] tile-local pixel basis from
    ``moment_basis``): the same quadratic expanded in pixel coordinates,
    ``power = coeffs[G, 6] @ basis`` — one MXU contraction instead of ~9
    VPU ops per (instance, pixel).  ``origin`` must match the basis
    centering; tile-local coordinates bound the f32 cancellation of the
    expansion to ~1e-4 in power (i.e. ~1e-4 relative in alpha).
    """
    A, B, C = conic[:, 0], conic[:, 1], conic[:, 2]
    if basis is None:
        dx = xy[:, 0:1] - px[None, :]
        dy = xy[:, 1:2] - py[None, :]
        return (-0.5 * (A[:, None] * dx * dx + C[:, None] * dy * dy)
                - B[:, None] * dx * dy)
    xg = xy[:, 0] - origin[0]
    yg = xy[:, 1] - origin[1]
    coeffs = jnp.stack(
        [-0.5 * A * xg * xg - 0.5 * C * yg * yg - B * xg * yg,
         A * xg + B * yg,
         C * yg + B * xg,
         -0.5 * A,
         -0.5 * C,
         -B], axis=1)                                             # [G, 6]
    return _dot(coeffs, basis)                                    # [G, Q]


def splat_alpha(xy, conic, opacity, px, py, cfg: RasterConfig,
                basis=None, origin=None):
    """Per (instance, pixel) Gaussian falloff and alpha.

    Args:
      xy: [G, 2] splat centers (pixel units); conic: [G, 3]; opacity: [G].
      px, py: [Q] pixel coordinates.

    Returns:
      alpha [G, Q], ok [G, Q] (power<=0 and alpha>=alpha_min;
      forward.cu:356-366).
    """
    power = splat_power(xy, conic, px, py, basis, origin)
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
    var_dd: jnp.ndarray    # sum w * d_var^2   (raw moment; see finish_var)
    var_d: jnp.ndarray     # sum w * d_var
    n_contrib: jnp.ndarray  # int32, 1-based global index of last contributor
    n_valid: jnp.ndarray   # int32, number of contributors
    midx: jnp.ndarray      # int32, global instance index of the median
                           # crossing (-1 if none yet)
    ucross_dd: jnp.ndarray  # sum cross*w * d_var^2 (raw; see finish_ucross)
    ucross_d: jnp.ndarray   # sum cross*w * d_var
    ucross_w: jnp.ndarray   # sum cross*w


def init_carry(q: int, channels: int = 3, dtype=jnp.float32) -> BlendCarry:
    z = jnp.zeros((q,), dtype)
    return BlendCarry(
        prod=jnp.ones((q,), dtype),
        t_final=jnp.ones((q,), dtype),
        color=jnp.zeros((channels, q), dtype),
        depth=z,
        weight=z,
        median=z,
        var_dd=z,
        var_d=z,
        n_contrib=jnp.zeros((q,), jnp.int32),
        n_valid=jnp.zeros((q,), jnp.int32),
        midx=jnp.full((q,), -1, jnp.int32),
        ucross_dd=z,
        ucross_d=z,
        ucross_w=z,
    )


def finish_var(carry: BlendCarry, gt):
    """sum w*(d-gt)^2 from the raw moments: exact per-pixel recombination
    (kept out of the chunk loop so chunking stays bit-invariant)."""
    return carry.var_dd - 2.0 * gt * carry.var_d + gt * gt * carry.weight


def finish_ucross(carry: BlendCarry, gt):
    """The median-crossing uncertainty (d-gt)^2*alpha*T from raw moments."""
    return (carry.ucross_dd - 2.0 * gt * carry.ucross_d
            + gt * gt * carry.ucross_w)


def chunk_weights(prod_in, xy, conic, opacity, valid, px, py,
                  cfg: RasterConfig, basis=None, origin=None):
    """The forward chunk's shared first half: alphas, transmittances, blend
    weights and the median-crossing mask for one [G, Q] block.

    Returns (alpha, v, p_incl, t_excl, contrib, w, cross); used by
    :func:`blend_chunk_fwd` and :func:`blend_chunk_fwd_jvp` so the dual
    (tangent) pass shares the primal intermediates instead of recomputing
    them."""
    alpha, ok = splat_alpha(xy, conic, opacity, px, py, cfg, basis, origin)
    v = (valid if valid.ndim == 2 else valid[:, None]) & ok
    a_eff = jnp.where(v, 1.0 - alpha, 1.0)
    cprod = cumprod_incl_mm if cfg.scan_prod_mm else cumprod_incl
    p_incl = prod_in[None, :] * cprod(a_eff)                     # [G, Q]
    last = p_incl.shape[0] - 1  # static index (negative indexing does not
    # lower on Pallas TPU)
    t_excl = jnp.concatenate(
        [prod_in[None, :],
         jax.lax.slice_in_dim(p_incl, 0, last, axis=0)], axis=0
    )
    contrib = v & (p_incl >= cfg.t_terminate)
    w = jnp.where(contrib, alpha * t_excl, 0.0)                   # [G, Q]
    cross = contrib & (t_excl > 0.5) & (p_incl < 0.5)
    return alpha, v, p_incl, t_excl, contrib, w, cross


def blend_chunk_fwd(
    carry: BlendCarry,
    xy, conic, opacity, color, depth, depth_med, valid,
    px, py, gt,
    base_index: jnp.ndarray,
    cfg: RasterConfig,
    depth_var=None,
    global_base=None,
    packed_rows=None,
    want_instance_stats: bool = True,
    basis=None,
    origin=None,
    precomputed=None,
):
    """Blend one front-to-back chunk of instances into the carry.

    Args:
      xy [G,2], conic [G,3], opacity [G], color [G,C], depth [G],
      depth_med [G] (same values as depth, possibly different gradient
      routing), valid [G] or [G,Q] bool (a [G,Q] mask expresses per-pixel
      tile membership, used by the oracle to reproduce tile binning).
      px, py, gt: [Q].
      base_index: scalar int32, global index of this chunk's first instance.
      precomputed: optional result of :func:`chunk_weights` (the jvp path
      computes it once and shares it).

    Returns:
      (new_carry, u_inst [G], npix_inst [G]) — per-instance uncertainty and
      related-pixel counts from the median crossing (forward.cu:386-387).
    """
    if precomputed is None:
        precomputed = chunk_weights(carry.prod, xy, conic, opacity, valid,
                                    px, py, cfg, basis, origin)
    alpha, v, p_incl, t_excl, contrib, w, cross = precomputed
    last = p_incl.shape[0] - 1
    crossf = cross.astype(w.dtype)

    g = xy.shape[0]
    c = color.shape[1]
    gi = jax.lax.broadcasted_iota(jnp.int32, (g, 1), 0)
    idx = base_index + 1 + gi
    gidx = (base_index if global_base is None else global_base) + gi

    # The depth-variance (and uncertainty) value path may use a separately
    # gradient-routed copy of the depths: the reference backprops the
    # 2(d-gt) w term into Gaussian means but NOT into the pose
    # (backward.cu:611 feeds dL_ddepths -> preprocess mean path only).
    d_var = depth if depth_var is None else depth_var
    cww = crossf * w

    # All weighted accumulations as ONE MXU contraction; (d-gt)^2 recombines
    # per pixel at output time (finish_var) so raw sums stay chunk-invariant.
    if packed_rows is not None:
        # Pre-assembled feature rows [c.., depth, dmed, d^2, 1] (the Pallas
        # kernels slice these straight out of the DMA'd instance block —
        # Mosaic cannot concatenate freshly computed vectors).  The packed
        # path shares depth's row for the d_var sum (values are identical;
        # gradient routing is the analytic backward's job, not the primal's).
        sums = _dot(packed_rows, w)                               # [C+4, Q]
        depth_sum = sums[c]
        var_d_sum = sums[c]
        var_dd_sum = sums[c + 2]
        w_sum = sums[c + 3]
        med_inc = _dot(
            jax.lax.slice_in_dim(packed_rows, c + 1, c + 2, axis=0),
            crossf)[0]
        ucc = _dot(jax.lax.slice_in_dim(packed_rows, c, c + 4, axis=0), cww)
        ucc_d, ucc_dd, ucc_w = ucc[0], ucc[2], ucc[3]
    else:
        ones_g = jnp.ones((g,), w.dtype)
        feats = jnp.concatenate(
            [color.T, depth[None, :], d_var[None, :],
             (d_var * d_var)[None, :], ones_g[None, :]], axis=0)  # [C+4, G]
        sums = _dot(feats, w)                                     # [C+4, Q]
        depth_sum = sums[c]
        var_d_sum = sums[c + 1]
        var_dd_sum = sums[c + 2]
        w_sum = sums[c + 3]
        med_inc = _dot(depth_med[None, :], crossf)[0]
        ufeat = jnp.concatenate(
            [(d_var * d_var)[None, :], d_var[None, :], ones_g[None, :]],
            axis=0)
        ucc = _dot(ufeat, cww)                                    # [3, Q]
        ucc_dd, ucc_d, ucc_w = ucc[0], ucc[1], ucc[2]

    if want_instance_stats:
        # Per-instance crossing stats: moments of cww against [1, gt, gt^2].
        ub = jnp.stack([jnp.ones_like(gt), gt, gt * gt], axis=1)  # [Q, 3]
        bu = _dot(cww, ub)                                        # [G, 3]
        u_inst = d_var * d_var * bu[:, 0] - 2.0 * d_var * bu[:, 1] + bu[:, 2]
        npix_inst = jnp.sum(cross, axis=1).astype(jnp.int32)
    else:
        u_inst = npix_inst = None

    new_carry = BlendCarry(
        prod=p_incl[last],
        t_final=jnp.minimum(
            carry.t_final, jnp.min(jnp.where(contrib, p_incl, 1.0), axis=0)
        ),
        color=carry.color + sums[:c],
        depth=carry.depth + depth_sum,
        weight=carry.weight + w_sum,
        median=carry.median + med_inc,
        var_dd=carry.var_dd + var_dd_sum,
        var_d=carry.var_d + var_d_sum,
        n_contrib=jnp.maximum(
            carry.n_contrib,
            jnp.max(jnp.where(contrib, idx, 0), axis=0).astype(jnp.int32),
        ),
        n_valid=carry.n_valid + jnp.sum(contrib, axis=0).astype(jnp.int32),
        midx=jnp.maximum(
            carry.midx,
            jnp.max(jnp.where(cross, gidx, -1), axis=0).astype(jnp.int32),
        ),
        ucross_dd=carry.ucross_dd + ucc_dd,
        ucross_d=carry.ucross_d + ucc_d,
        ucross_w=carry.ucross_w + ucc_w,
    )
    return new_carry, u_inst, npix_inst


class JvpCarry(NamedTuple):
    """Running state for the dual (forward + K pose tangents) pass.

    The tangent streams are length-K tuples of [Q] / [C, Q] arrays — tuples
    rather than stacked [K, Q] tensors because Mosaic cannot concatenate
    freshly computed vectors along a major axis, and K is small and static.

    Math (selection masks frozen, as everywhere in this backward design):
    with ``s_i = dalpha_i / (1 - alpha_i)`` summed over contributors,
    ``dT_i = -T_i * S_i``, so ``dw_i = w_i * (dpower_i - S^excl_i)`` and
    every accumulated output tangent is one extra contraction against dw.
    """

    primal: BlendCarry
    s: tuple       # K x [Q]: running sum of s over contributors
    color: tuple   # K x [C, Q]
    depth: tuple   # K x [Q]
    weight: tuple  # K x [Q]
    median: tuple  # K x [Q]


def init_jvp_carry(q: int, k: int, channels: int = 3,
                   dtype=jnp.float32) -> JvpCarry:
    z = lambda: jnp.zeros((q,), dtype)
    return JvpCarry(
        primal=init_carry(q, channels, dtype),
        s=tuple(z() for _ in range(k)),
        color=tuple(jnp.zeros((channels, q), dtype) for _ in range(k)),
        depth=tuple(z() for _ in range(k)),
        weight=tuple(z() for _ in range(k)),
        median=tuple(z() for _ in range(k)),
    )


def blend_chunk_fwd_jvp(
    carry: JvpCarry,
    xy, conic, opacity, color, depth, depth_med,
    tan_xy, tan_depth,
    valid, px, py, gt,
    base_index: jnp.ndarray,
    cfg: RasterConfig,
    global_base=None,
    packed_rows=None,
    want_instance_stats: bool = False,
    tan_depth_med=None,
    tan_conic=(),
):
    """Forward chunk plus exact pose-tangent propagation (K tangents).

    Tangents enter through the splat centers and depths
    (``tan_xy`` K x [G, 2], ``tan_depth`` K x [G]) — the light variant's own
    pose-Jacobian design: the Sigma2D (conic) branch is dropped
    (README.md:53-58) and SH color pose terms don't exist at sh_degree 0.
    Passing ``tan_conic`` (K x [G, 3]: dA, dB, dC) additionally propagates
    the Sigma2D/EWA branch — the full variant's pose Jacobian
    (full backward.cu:243-302 in reverse mode) — via
    ``dpower += -0.5 dx^2 dA - dx dy dB - 0.5 dy^2 dC``.
    Derivation: ``alpha = min(cap, op * exp(power))`` gives
    ``dalpha = alpha * dpower`` on uncapped lanes (0 on capped);
    ``dpower = -(A dxp + B dyp) dx - (C dyp + B dxp) dy``;
    ``dT/T = -sum dalpha/(1-alpha)`` over preceding contributors.  The
    median tangent freezes the crossing selection (mid_once,
    backward.cu:654-664): ``dmedian = sum over crossing of
    d(depth_med)``, supplied via ``tan_depth_med`` — None means the
    median-value stream carries no tangent (the production routing: the
    median reads ``depth_sgview``, whose pose derivative is stopped).

    Requires the direct (non-basis) splat path: ``cfg.splat_basis_power``
    must be off.

    Returns (new_carry, u_inst, npix_inst).
    """
    assert not cfg.splat_basis_power, (
        "pose-jvp requires the direct splat path")
    k_t = len(tan_xy)
    pc = carry.primal
    pre = chunk_weights(pc.prod, xy, conic, opacity, valid, px, py, cfg)
    alpha, v, p_incl, t_excl, contrib, w, cross = pre

    new_pc, u_inst, npix_inst = blend_chunk_fwd(
        pc, xy, conic, opacity, color, depth, depth_med, valid, px, py, gt,
        base_index, cfg, global_base=global_base, packed_rows=packed_rows,
        want_instance_stats=want_instance_stats, precomputed=pre,
    )

    g = xy.shape[0]
    c = color.shape[1]
    # shared across tangents: quadratic-form partials and the s-rate
    dxp = xy[:, 0:1] - px[None, :]
    dyp = xy[:, 1:2] - py[None, :]
    a_, b_, c_ = conic[:, 0:1], conic[:, 1:2], conic[:, 2:3]
    gx = a_ * dxp + b_ * dyp        # -d(power)/d(x_i)
    gy = c_ * dyp + b_ * dxp        # -d(power)/d(y_i)
    capped = alpha >= cfg.alpha_cap
    live = contrib & ~capped
    rate = jnp.where(live, alpha / (1.0 - alpha), 0.0)
    crossf = cross.astype(w.dtype)
    if packed_rows is None:
        ones_g = jnp.ones((g,), w.dtype)
        packed_rows = jnp.concatenate(
            [color.T, depth[None, :], depth_med[None, :],
             (depth * depth)[None, :], ones_g[None, :]], axis=0)
    csum = cumsum_incl_mm if cfg.scan_sum_mm else cumsum_incl

    new_s, new_col, new_dep, new_wgt, new_med = [], [], [], [], []
    for k in range(k_t):
        dpow = -(gx * tan_xy[k][:, 0:1] + gy * tan_xy[k][:, 1:2])  # [G, Q]
        if len(tan_conic):
            ta, tb2, tc2 = (tan_conic[k][:, 0:1], tan_conic[k][:, 1:2],
                            tan_conic[k][:, 2:3])
            dpow = dpow - (0.5 * ta * dxp + tb2 * dyp) * dxp \
                - 0.5 * tc2 * dyp * dyp
        s = rate * dpow
        s_tot = carry.s[k][None, :] + csum(s)       # inclusive global S
        s_excl = s_tot - s
        dw = w * (jnp.where(capped, 0.0, dpow) - s_excl)
        dsum = _dot(packed_rows, dw)                # [C+4, Q]
        dd_row = tan_depth[k][None, :]
        dd_w = _dot(dd_row, w)                      # [1, Q]
        last = g - 1
        new_s.append(s_tot[last])
        new_col.append(carry.color[k] + dsum[:c])
        new_dep.append(carry.depth[k] + dsum[c] + dd_w[0])
        new_wgt.append(carry.weight[k] + dsum[c + 3])
        if tan_depth_med is None:
            new_med.append(carry.median[k])
        else:
            dd_med = _dot(tan_depth_med[k][None, :], crossf)
            new_med.append(carry.median[k] + dd_med[0])

    new_carry = JvpCarry(
        primal=new_pc, s=tuple(new_s), color=tuple(new_col),
        depth=tuple(new_dep), weight=tuple(new_wgt), median=tuple(new_med),
    )
    return new_carry, u_inst, npix_inst


def finish_t_final_tangent(carry: JvpCarry):
    """K x [Q] tangents of t_final: ``dT_final = -T_final * S_final``
    (s is zero past termination, so the running S ends at the last
    contributor — exactly where t_final froze)."""
    return tuple(-carry.primal.t_final * s for s in carry.s)


class BlendBwdCarry(NamedTuple):
    """Running per-pixel state for the backward pass (all [Q]).

    ``pre_all`` is the inclusive prefix sum of ``w_i * s_i`` where
    ``s_i = <features_i, pixel cotangents>`` — the single fused stream that
    replaces the per-channel/depth/weight/variance prefixes.
    """

    prod: jnp.ndarray     # same running product as forward
    pre_all: jnp.ndarray  # prefix of w * s


def init_bwd_carry(q: int, channels: int = 3, dtype=jnp.float32) -> BlendBwdCarry:
    del channels
    return BlendBwdCarry(
        prod=jnp.ones((q,), dtype),
        pre_all=jnp.zeros((q,), dtype),
    )


def bwd_pixel_inputs(gt, tot_c, tot_d, tot_w, tot_v, t_final,
                     dL_dc, dL_dd, dL_dw, dL_dvar, dL_dtf, *, with_med_row):
    """Per-pixel constants of the backward, precomputable once per tile.

    Returns (pixcot [C+3(+1), Q], pixmat [C+3, Q], tot_all [Q]) — tot_all
    folds the t_final cotangent term (t_final * dL_dtf) so the instance loop
    needs one constant row, not two.  ``with_med_row`` inserts a zero row
    after the depth row so pixcot lines up with the kernels' packed feature
    rows [c.., depth, dmed, d^2, 1].
    """
    rows = [dL_dc, (dL_dd - 2.0 * gt * dL_dvar)[None, :]]
    if with_med_row:
        rows.append(jnp.zeros_like(dL_dvar)[None, :])
    rows += [dL_dvar[None, :], (dL_dw + gt * gt * dL_dvar)[None, :]]
    pixcot = jnp.concatenate(rows, axis=0)
    pixmat = jnp.concatenate(
        [dL_dc, dL_dd[None, :], dL_dvar[None, :],
         (gt * dL_dvar)[None, :]], axis=0)
    tot_all = (jnp.sum(dL_dc * tot_c, axis=0) + dL_dd * tot_d
               + dL_dvar * tot_v + dL_dw * tot_w + t_final * dL_dtf)
    return pixcot, pixmat, tot_all


def moment_basis(px, py, origin=None):
    """[6, Q] pixel basis [1, x, y, x^2, y^2, xy] in origin-centered coords
    (centering bounds f32 cancellation in the moment reconstruction)."""
    ox = px[0] if origin is None else origin[0]
    oy = py[0] if origin is None else origin[1]
    pxl = px - ox
    pyl = py - oy
    return jnp.stack(
        [jnp.ones_like(pxl), pxl, pyl, pxl * pxl, pyl * pyl, pxl * pyl],
        axis=0)


def blend_chunk_bwd(
    carry: BlendBwdCarry,
    xy, conic, opacity, color, depth, valid,
    px, py, gt,
    # forward totals / residuals (per pixel)
    tot_c, tot_d, tot_w, tot_v, t_final,
    # incoming cotangents (per pixel)
    dL_dc, dL_dd, dL_dw, dL_dvar, dL_dmed, dL_dtf,
    cfg: RasterConfig,
    packed_rows=None,
    pix=None,          # precomputed bwd_pixel_inputs tuple
    basis=None,        # precomputed moment_basis [6, Q]
    origin=None,       # moment-centering origin (must match basis)
    want_med: bool = True,   # False when dL_dmed is structurally zero
    want_var: bool = True,   # False when dL_dvar is structurally zero
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
    G = xy.shape[0]
    # The power form must match the forward's threshold decisions exactly,
    # so the basis/MXU expansion is used in both passes or neither
    # (cfg.splat_basis_power).
    if cfg.splat_basis_power and basis is not None:
        power = splat_power(xy, conic, px, py, basis, origin)
    else:
        power = splat_power(xy, conic, px, py)
    if basis is None:
        basis = moment_basis(px, py, origin)                      # [6, Q]
    g = jnp.exp(power)
    alpha = jnp.minimum(cfg.alpha_cap, opacity[:, None] * g)
    v = (valid if valid.ndim == 2 else valid[:, None]) \
        & (power <= 0.0) & (alpha >= cfg.alpha_min)

    oma = 1.0 - alpha
    a_eff = jnp.where(v, oma, 1.0)
    cprod = cumprod_incl_mm if cfg.scan_prod_mm else cumprod_incl
    p_incl = carry.prod[None, :] * cprod(a_eff)
    last = p_incl.shape[0] - 1
    t_excl = jnp.concatenate(
        [carry.prod[None, :],
         jax.lax.slice_in_dim(p_incl, 0, last, axis=0)], axis=0
    )
    contrib = v & (p_incl >= cfg.t_terminate)
    contribf = contrib.astype(g.dtype)
    w = contribf * alpha * t_excl

    # --- fused cotangent stream: s_i = <[color, d, d^2, 1]_i, pixcot> -----
    # (d-gt)^2 expands into the per-pixel cotangent features since gt is a
    # pixel constant; all four reference prefix streams collapse into one.
    if pix is None:
        pix = bwd_pixel_inputs(
            gt, tot_c, tot_d, tot_w, tot_v, t_final,
            dL_dc, dL_dd, dL_dw, dL_dvar, dL_dtf,
            with_med_row=packed_rows is not None)
    pixcot, pixmat, tot_all = pix
    if packed_rows is not None:
        # rows [c.., depth, dmed, d^2, 1] straight from the DMA'd block;
        # pixcot carries a zero row for dmed
        s = jax.lax.dot_general(
            packed_rows, pixcot, (((0,), (0,)), ((), ())),
            preferred_element_type=g.dtype)                       # [G, Q]
    else:
        feats = jnp.concatenate(
            [color, depth[:, None], (depth * depth)[:, None],
             jnp.ones((G, 1), g.dtype)], axis=1)                  # [G, C+3]
        s = _dot(feats, pixcot)                                   # [G, Q]

    csum = cumsum_incl_mm if cfg.scan_sum_mm else cumsum_incl
    pre_all = carry.pre_all[None, :] + csum(w * s)
    # alpha <= alpha_cap = 0.99 everywhere (including masked lanes), so
    # 1 - alpha >= 0.01 and the reciprocal needs no guard; contribf zeroes
    # masked lanes afterwards.
    inv_oma = 1.0 / oma

    # dL/dalpha_i (x T_i), with strict-suffix sums S = tot - prefix, plus the
    # t_final cotangent: d t_final / d alpha_i = -t_final/(1-alpha_i) for
    # contributing i.  With dL_dtf = bg . dL_dcolor this is exactly the
    # reference's background term (backward.cu:620-623); tot_all carries it
    # (bwd_pixel_inputs) so per-pixel constants fold outside the loop.
    d_alpha = contribf * (
        t_excl * s - (tot_all[None, :] - pre_all) * inv_oma
    )

    # --- per-instance reductions as moment matmuls ------------------------
    # e = d_alpha * G(x); moments against the tile-centered pixel basis
    # [1, x, y, x^2, y^2, xy] reconstruct all dx/dy-weighted sums.
    # alpha = min(cap, op*G): like the reference, the cap is ignored in the
    # backward (backward.cu:627,678).
    cx = px[0] if origin is None else origin[0]
    cy = py[0] if origin is None else origin[1]
    if basis is None:
        basis = moment_basis(px, py, origin)                      # [6, Q]
    xgl = xy[:, 0] - cx
    ygl = xy[:, 1] - cy
    e = d_alpha * g
    m = jax.lax.dot_general(
        e, basis, (((1,), (1,)), ((), ())),
        preferred_element_type=g.dtype)                           # [G, 6]
    m0, m1, m2, m3, m4, m5 = (m[:, 0], m[:, 1], m[:, 2], m[:, 3], m[:, 4],
                              m[:, 5])
    s_dx = xgl * m0 - m1
    s_dy = ygl * m0 - m2
    s_dxx = xgl * xgl * m0 - 2.0 * xgl * m1 + m3
    s_dyy = ygl * ygl * m0 - 2.0 * ygl * m2 + m4
    s_dxy = xgl * ygl * m0 - xgl * m2 - ygl * m1 + m5

    op = opacity
    Af, Bf, Cf = conic[:, 0], conic[:, 1], conic[:, 2]
    d_xy = jnp.stack(
        [-op * (Af * s_dx + Bf * s_dy), -op * (Cf * s_dy + Bf * s_dx)], -1)
    # True gradient w.r.t. the packed conic (A, B, C); the off-diagonal entry
    # appears once in power with coefficient -dx dy.
    d_conic = jnp.stack(
        [-0.5 * op * s_dxx, -op * s_dxy, -0.5 * op * s_dyy], -1)
    d_opac = m0

    # --- gradient rows: one matmul against the pixel cotangents -----------
    r = jax.lax.dot_general(
        w, pixmat, (((1,), (1,)), ((), ())),
        preferred_element_type=g.dtype)                           # [G, C+3]
    c = color.shape[1]
    d_color = r[:, :c]
    d_depth = r[:, c]
    if want_var:
        d_depth_var = 2.0 * (depth * r[:, c + 1] - r[:, c + 2])
    else:
        d_depth_var = jnp.zeros_like(d_depth)

    if want_med:
        cross = contribf * (t_excl > 0.5) * (p_incl < 0.5)
        d_depth_med = jax.lax.dot_general(
            cross, dL_dmed, (((1,), (0,)), ((), ())),
            preferred_element_type=g.dtype)                       # [G]
    else:
        d_depth_med = jnp.zeros_like(d_depth)

    new_carry = BlendBwdCarry(
        prod=p_incl[last],
        pre_all=pre_all[last],
    )
    return new_carry, (d_xy, d_conic, d_opac, d_color, d_depth,
                       d_depth_var, d_depth_med)
