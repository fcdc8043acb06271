"""Torch autograd bridge for the compatibility API.

The reference's public surface is a ``torch.autograd.Function``
(light ``diff_gaussian_rasterization/__init__.py:48-178``): CG-SLAM calls
``loss.backward()`` and reads gradients off torch tensors.  This module
provides the same contract on top of the JAX engine: the forward converts
torch inputs to JAX, renders, and returns torch tensors; the backward feeds
the incoming torch cotangents through the JAX VJP (jitted, cached per
static configuration) and returns torch gradients — including
``grad_viewmatrix`` (the pose gradient, already pixel-reduced like the
reference's Python-side sum at light ``__init__.py:160-162``) and the
screen-space ``means2D`` gradient 3DGS-style densification reads.

Debug contract (light ``__init__.py:87-97, 146-158``): with
``raster_settings.debug=True`` the op host-copies its inputs before the
call and writes ``snapshot_fw.dump`` / ``snapshot_bw.dump`` on failure.
The backward additionally treats non-finite gradients as a failure — the
functional-runtime equivalent of the CUDA backward crash this dump exists
to debug.  The ``prefiltered`` contract (``auxiliary.h:156-160`` traps when
a prefiltered Gaussian fails the frustum test) is enforced as an eager
debug-mode check.
"""

import functools
import pickle

import numpy as np

import jax
import jax.numpy as jnp

from .camera import Camera
from .config import RasterConfig
from .ops.projection import mark_visible
from .ops.rasterize import rasterize

_OPTIONAL = ("means2D", "shs", "colors_precomp", "scales", "rotations",
             "cov3D_precomp")
# forward output order, light __init__.py:105
_OUTPUTS = ("color", "radii", "depth", "depth_median", "depth_var",
            "opacity_map", "gau_uncertainty", "gau_related_pixels")


def _torch():
    import torch

    return torch


def to_jax(x, keep_empty: bool = False):
    """torch / numpy / jax → jax array (the package's single conversion
    policy; ``__init__``'s compat helpers delegate here).  Empty tensors —
    the reference's ``torch.Tensor([])`` placeholders — and None map to
    None unless ``keep_empty``."""
    if x is None:
        return None
    if hasattr(x, "detach") and hasattr(x, "cpu"):  # torch.Tensor
        x = x.detach().cpu().numpy()
    x = np.asarray(x)
    if x.size == 0 and not keep_empty:
        return None
    return jnp.asarray(x)


def _to_torch(x, int_ok=False):
    t = _torch()
    a = np.asarray(x)
    if not int_ok and a.dtype not in (np.float32, np.float64):
        a = a.astype(np.float32)
    # copy: np.asarray of a jax array is a read-only view, which torch
    # cannot wrap without undefined-behavior warnings
    return t.from_numpy(np.array(a, copy=True))


@functools.lru_cache(maxsize=64)
def _make_fns(h, w, tanfovx, tanfovy, scale_modifier, sh_degree,
              track_off, map_off, cfg: RasterConfig, max_instances):
    """Jitted forward and cotangent→gradient functions, cached on every
    static argument (shapes specialize inside jit's own cache)."""

    def render(diff, bg, gt_depth):
        cam = Camera(viewmatrix=diff["viewmatrix"], tanfovx=tanfovx,
                     tanfovy=tanfovy, height=h, width=w)
        out = rasterize(
            diff["means3D"], cam, cfg,
            opacities=diff["opacities"],
            scales=diff.get("scales"), rotations=diff.get("rotations"),
            cov3D_precomp=diff.get("cov3D_precomp"),
            shs=diff.get("shs"), sh_degree=sh_degree,
            colors_precomp=diff.get("colors_precomp"),
            scale_modifier=scale_modifier, bg=bg, gt_depth=gt_depth,
            means2D=diff.get("means2D"),
            track_off=track_off, map_off=map_off,
            max_instances=max_instances)
        floats = {"color": out.color, "depth": out.depth,
                  "depth_median": out.depth_median,
                  "depth_var": out.depth_var,
                  "opacity_map": out.opacity_map}
        aux = (out.radii, out.gau_uncertainty, out.gau_related_pixels)
        return floats, aux

    fwd = jax.jit(render)

    def grads(diff, bg, gt_depth, cots):
        f = lambda d: render(d, bg, gt_depth)[0]
        _, vjp = jax.vjp(f, diff)
        return vjp(cots)[0]

    bwd = jax.jit(grads)
    return fwd, bwd


def _snapshot(path, **arrays):
    host = {}
    for k, v in arrays.items():
        if v is None or isinstance(v, (int, float, bool, str)):
            host[k] = v
        elif isinstance(v, dict):
            host[k] = {kk: np.asarray(vv) for kk, vv in v.items()
                       if vv is not None}
        elif hasattr(v, "_asdict"):
            host[k] = {kk: (np.asarray(vv) if hasattr(vv, "shape") else vv)
                       for kk, vv in v._asdict().items()}
        else:
            host[k] = np.asarray(v)
    with open(path, "wb") as f:
        pickle.dump(host, f)


def _check_prefiltered(diff, cfg):
    """auxiliary.h:156-160: a Gaussian entering preprocess with
    ``prefiltered=True`` must pass the frustum test (the reference calls
    ``__trap()`` unconditionally; we raise eagerly on every
    ``prefiltered=True`` call)."""
    vis = mark_visible(diff["means3D"], diff["viewmatrix"], near=cfg.near)
    n_bad = int(jnp.sum(~vis))
    if n_bad:
        raise RuntimeError(
            f"prefiltered=True but {n_bad} Gaussians fail the frustum "
            "test (reference traps here: auxiliary.h:156-160)")


class _RasterizeGaussiansTorch:
    """torch.autograd.Function bridging torch autograd to the JAX VJP.

    Built lazily (class body needs torch imported); see
    ``rasterize_gaussians_torch``.
    """

    _cls = None

    @classmethod
    def get(cls):
        if cls._cls is not None:
            return cls._cls
        torch = _torch()

        class F(torch.autograd.Function):
            @staticmethod
            def forward(ctx, means3D, means2D, sh, colors_precomp,
                        opacities, scales, rotations, cov3Ds_precomp,
                        viewmatrix, gt_depth, raster_settings, config,
                        max_instances, alpha_grad):
                s = raster_settings
                cfg = config
                diff = {
                    "means3D": to_jax(means3D),
                    "opacities": to_jax(opacities),
                    "viewmatrix": to_jax(viewmatrix),
                }
                m2d_shape = None
                for name, v in (("means2D", means2D), ("shs", sh),
                                ("colors_precomp", colors_precomp),
                                ("scales", scales), ("rotations", rotations),
                                ("cov3D_precomp", cov3Ds_precomp)):
                    vj = to_jax(v)
                    if vj is not None:
                        if name == "means2D":
                            # reference means2D is a {P,3} screen-space
                            # dummy whose .grad densification reads; our
                            # native op takes the first two (NDC) columns
                            m2d_shape = vj.shape
                            vj = vj[:, :2]
                        diff[name] = vj
                bg = to_jax(s.bg)
                gt = to_jax(gt_depth)

                key = (int(s.image_height), int(s.image_width),
                       float(s.tanfovx), float(s.tanfovy),
                       float(s.scale_modifier), int(s.sh_degree),
                       bool(s.track_off), bool(s.map_off), cfg,
                       max_instances)
                fwd, _ = _make_fns(*key)

                if s.prefiltered:
                    # auxiliary.h:156-160 traps unconditionally, not only
                    # under debug — enforce on every prefiltered call
                    _check_prefiltered(diff, cfg)
                if s.debug:
                    try:
                        floats, aux = fwd(diff, bg, gt)
                        jax.block_until_ready(floats)
                        bad = [n for n, v in floats.items()
                               if not bool(jnp.all(jnp.isfinite(v)))]
                        if bad:
                            raise FloatingPointError(
                                f"non-finite forward outputs: {bad}")
                    except Exception:
                        _snapshot("snapshot_fw.dump", settings=s._asdict()
                                  if hasattr(s, "_asdict") else str(s),
                                  gt_depth=gt, bg=bg, **diff)
                        print("\nAn error occurred in the rasterizer "
                              "forward. Inputs written to snapshot_fw.dump "
                              "for debugging.")
                        raise
                else:
                    floats, aux = fwd(diff, bg, gt)

                ctx.dgr = (diff, bg, gt, key, m2d_shape, s)
                ctx.alpha_grad = alpha_grad
                radii, gau_u, gau_np = aux
                outs = (
                    _to_torch(floats["color"]),
                    _to_torch(radii, int_ok=True),
                    _to_torch(floats["depth"]),
                    _to_torch(floats["depth_median"]),
                    _to_torch(floats["depth_var"]),
                    _to_torch(floats["opacity_map"]),
                    _to_torch(gau_u),
                    _to_torch(gau_np, int_ok=True),
                )
                ctx.mark_non_differentiable(outs[1], outs[7])
                return outs

            @staticmethod
            def backward(ctx, grad_color, grad_radii, grad_depth,
                         grad_depth_median, grad_depth_var, grad_alpha,
                         grad_gau_uncertainty, grad_gau_related_pixels):
                del grad_radii, grad_gau_uncertainty
                del grad_gau_related_pixels  # non-differentiable outputs
                diff, bg, gt, key, m2d_shape, s = ctx.dgr
                h, w = key[0], key[1]

                def cot(g, shape):
                    if g is None:
                        return jnp.zeros(shape, jnp.float32)
                    return jnp.asarray(np.asarray(g.detach().cpu()),
                                       jnp.float32).reshape(shape)

                cots = {
                    "color": cot(grad_color, (3, h, w)),
                    "depth": cot(grad_depth, (1, h, w)),
                    "depth_median": cot(grad_depth_median, (1, h, w)),
                    "depth_var": cot(grad_depth_var, (1, h, w)),
                    # The reference's autograd.Function never feeds the
                    # opacity_map (out_alpha) cotangent to its backward
                    # (light __init__.py:107-152 passes only color/depth/
                    # median/var grads to _C.rasterize_gaussians_backward),
                    # so drop-in callers whose loss touches alpha get zero
                    # gradient from it.  Default mirrors that; alpha_grad=
                    # True opts into the full (correct) VJP.  See PARITY.md.
                    "opacity_map": (cot(grad_alpha, (1, h, w))
                                    if ctx.alpha_grad
                                    else jnp.zeros((1, h, w), jnp.float32)),
                }
                _, bwd = _make_fns(*key)

                if s.debug:
                    try:
                        g = bwd(diff, bg, gt, cots)
                        jax.block_until_ready(g)
                        bad = [n for n, v in g.items()
                               if not bool(jnp.all(jnp.isfinite(v)))]
                        if bad:
                            raise FloatingPointError(
                                f"non-finite gradients: {bad}")
                    except Exception:
                        # light __init__.py:149-158: host-copied backward
                        # inputs to snapshot_bw.dump on a backward failure
                        _snapshot("snapshot_bw.dump",
                                  settings=s._asdict()
                                  if hasattr(s, "_asdict") else str(s),
                                  gt_depth=gt, bg=bg, cotangents=cots,
                                  **diff)
                        print("\nAn error occurred in the rasterizer "
                              "backward. Inputs written to "
                              "snapshot_bw.dump for debugging.")
                        raise
                else:
                    g = bwd(diff, bg, gt, cots)

                def tg(name):
                    if name not in g or g[name] is None:
                        return None
                    return _to_torch(g[name])

                grad_means2D = None
                if "means2D" in g and g["means2D"] is not None:
                    gm = np.zeros(m2d_shape, np.float32)
                    gm[:, :2] = np.asarray(g["means2D"])
                    grad_means2D = _to_torch(gm)

                return (tg("means3D"), grad_means2D, tg("shs"),
                        tg("colors_precomp"), tg("opacities"),
                        tg("scales"), tg("rotations"),
                        tg("cov3D_precomp"), tg("viewmatrix"),
                        None, None, None, None, None)

        cls._cls = F
        return F


def rasterize_gaussians_torch(
    means3D, means2D, sh, colors_precomp, opacities, scales, rotations,
    cov3Ds_precomp, viewmatrix, gt_depth, raster_settings,
    config: RasterConfig = RasterConfig(), max_instances=None,
    alpha_grad: bool = False,
):
    """Torch-gradient analogue of the reference ``rasterize_gaussians``
    (light ``__init__.py:21-46``): returns the 8-tuple of torch tensors
    and supports ``loss.backward()`` with gradients for every
    differentiable input, including ``viewmatrix``.

    ``alpha_grad=False`` (default) reproduces the reference's gradient
    surface exactly: the opacity_map output's cotangent is dropped, as the
    reference's autograd.Function never passes it to the CUDA backward.
    ``alpha_grad=True`` propagates it through the full VJP instead."""
    return _RasterizeGaussiansTorch.get().apply(
        means3D, means2D, sh, colors_precomp, opacities, scales, rotations,
        cov3Ds_precomp, viewmatrix, gt_depth, raster_settings, config,
        max_instances, alpha_grad)
