"""diff_gaussian_rasterization_tpu: TPU-native differentiable Gaussian splatting.

A from-scratch JAX/XLA/Pallas re-architecture of the capabilities of
hjr37/diff-gaussian-rasterization (the CG-SLAM CUDA rasterizer): tile-based
differentiable rasterization of 3D Gaussians with color / depth /
median-depth / silhouette / depth-variance outputs, per-Gaussian uncertainty
statistics, and analytic gradients w.r.t. both the Gaussian parameters and
the 4x4 world-to-camera view matrix ("pose gradients"), with
``track_off`` / ``map_off`` gating for SLAM tracking and mapping loops.

Two API levels:

- **Native** (recommended): ``rasterize``, ``Camera``, ``RasterConfig``,
  ``GaussianModel`` — functional, jit/vmap/shard_map-friendly.
- **Compatibility**: ``GaussianRasterizationSettings`` /
  ``GaussianRasterizer`` mirroring the reference's torch surface
  (light ``diff_gaussian_rasterization/__init__.py:180-248``) so CG-SLAM-style
  callers can port with minimal edits.
"""

from typing import NamedTuple, Optional, Any

import jax
import jax.numpy as jnp

from .camera import Camera, look_at, perspective_matrix
from .config import DEFAULT_CONFIG, RasterConfig
from .ops.oracle import RenderOutputs, render_oracle
from .ops.projection import mark_visible
from .ops.rasterize import rasterize

__version__ = "0.1.0"


def _asarray(x):
    """Accept numpy / jax / torch inputs in the compatibility API
    (delegates to the package's single conversion policy,
    ``torch_compat.to_jax``).

    Torch tensors that carry ``requires_grad=True`` never reach this
    detach: ``rasterize_gaussians`` routes them through the torch autograd
    bridge (``torch_compat``) so gradients flow back into torch exactly as
    with the reference extension.
    """
    from .torch_compat import to_jax

    return to_jax(x, keep_empty=True)


def _wants_torch_grad(*xs):
    """True if any input is a torch tensor with requires_grad inside an
    enabled-grad context — the case where the reference's autograd.Function
    would record a backward edge."""
    live = [x for x in xs
            if hasattr(x, "requires_grad") and hasattr(x, "cpu")]
    if not live or not live[0].__class__.__module__.startswith("torch"):
        return False
    import torch

    return torch.is_grad_enabled() and any(x.requires_grad for x in live)

__all__ = [
    "Camera",
    "GaussianRasterizationSettings",
    "GaussianRasterizer",
    "RasterConfig",
    "RenderOutputs",
    "look_at",
    "mark_visible",
    "perspective_matrix",
    "rasterize",
    "rasterize_gaussians",
    "render_oracle",
]


class GaussianRasterizationSettings(NamedTuple):
    """Drop-in analogue of the reference settings NamedTuple
    (light __init__.py:180-195).

    ``projmatrix``/``perspec_matrix`` are accepted for source compatibility
    but are *derived here from the live view matrix* (so pose gradients are
    exact); they may be ``None``.
    """

    image_height: int
    image_width: int
    tanfovx: float
    tanfovy: float
    bg: Any
    scale_modifier: float
    viewmatrix: Any
    projmatrix: Any = None
    sh_degree: int = 0
    campos: Any = None
    prefiltered: bool = False
    debug: bool = False
    perspec_matrix: Any = None
    track_off: bool = False
    map_off: bool = False


class GaussianRasterizer:
    """Object-style wrapper mirroring the reference ``GaussianRasterizer``
    (light __init__.py:197-248; full __init__.py:167-218 via
    ``variant="full"``).  Stateless; prefer ``rasterize`` directly in jitted
    code.

    ``variant="light"`` (default) returns the light package's 8-tuple;
    ``variant="full"`` returns the full package's 4-tuple ``(color, radii,
    depth, uncertainty)`` — the "uncertainty" image being the silhouette
    map, per the reference quirk (full forward.cu:367,394) — and enables
    the full pose-Jacobian branches (SH/campos and Sigma2D)."""

    def __init__(self, raster_settings: GaussianRasterizationSettings,
                 config: RasterConfig = DEFAULT_CONFIG,
                 variant: str = "light", alpha_grad: bool = False):
        if variant == "full":
            config = config.full_variant()
        self.variant = variant
        self.raster_settings = raster_settings
        self.config = config
        # torch-bridge gradient surface: False mirrors the reference's
        # autograd.Function, which never backpropagates the opacity_map
        # output (see torch_compat.rasterize_gaussians_torch)
        self.alpha_grad = alpha_grad

    def markVisible(self, positions):
        # reference: near-plane-only frustum test against the *settings*
        # view matrix (light __init__.py:202-211)
        return mark_visible(_asarray(positions),
                            _asarray(self.raster_settings.viewmatrix),
                            near=self.config.near)

    def __call__(self, *a, **k):
        return self.forward(*a, **k)

    def forward(self, means3D, means2D=None, opacities=None, shs=None,
                colors_precomp=None, scales=None, rotations=None,
                cov3D_precomp=None, viewmatrix=None, gt_depth=None):
        s = self.raster_settings
        if (shs is None) == (colors_precomp is None):
            raise ValueError(
                "Please provide exactly one of either SHs or precomputed "
                "colors!")
        if ((scales is None or rotations is None)
                and cov3D_precomp is None) or (
                (scales is not None or rotations is not None)
                and cov3D_precomp is not None):
            raise ValueError(
                "Please provide exactly one of either scale/rotation pair "
                "or precomputed 3D covariance!")
        out = rasterize_gaussians(
            means3D=means3D, means2D=means2D, shs=shs,
            colors_precomp=colors_precomp,
            opacities=opacities, scales=scales, rotations=rotations,
            cov3Ds_precomp=cov3D_precomp,
            viewmatrix=(viewmatrix if viewmatrix is not None
                        else s.viewmatrix),
            gt_depth=gt_depth, raster_settings=s, config=self.config,
            alpha_grad=self.alpha_grad,
        )
        if self.variant == "full":
            # full ext returns (color, radii, depth, uncertainty) where
            # "uncertainty" is the silhouette (full rasterize_points.cu:119,
            # forward.cu:367,394); opacity_map is index 5 of the light tuple
            return out[0], out[1], out[2], out[5]
        return out


def rasterize_gaussians(
    means3D,
    shs=None,
    colors_precomp=None,
    opacities=None,
    scales=None,
    rotations=None,
    cov3Ds_precomp=None,
    viewmatrix=None,
    gt_depth=None,
    raster_settings: GaussianRasterizationSettings = None,
    config: RasterConfig = DEFAULT_CONFIG,
    means2D=None,
    alpha_grad: bool = False,
):
    """Functional analogue of the reference ``rasterize_gaussians``
    (light __init__.py:21-46).

    Returns the light variant's 8-tuple (light __init__.py:105):
    ``(color, radii, depth, depth_median, depth_var, opacity_map,
    gau_uncertainty, gau_related_pixels)``.

    Torch callers: if any differentiable input is a torch tensor with
    ``requires_grad=True`` (inside an enabled-grad context), the call is
    routed through the torch autograd bridge (``torch_compat``) and returns
    torch tensors whose ``loss.backward()`` delivers gradients — including
    ``viewmatrix.grad`` and the ``means2D.grad`` densification statistic —
    matching the reference's autograd.Function contract
    (light __init__.py:48-178).
    """
    s = raster_settings
    if _wants_torch_grad(means3D, means2D, shs, colors_precomp, opacities,
                         scales, rotations, cov3Ds_precomp, viewmatrix):
        from .torch_compat import rasterize_gaussians_torch

        return rasterize_gaussians_torch(
            means3D, means2D, shs, colors_precomp, opacities, scales,
            rotations, cov3Ds_precomp,
            viewmatrix if viewmatrix is not None else s.viewmatrix,
            gt_depth, s, config, alpha_grad=alpha_grad)
    cam = Camera(
        viewmatrix=_asarray(viewmatrix),
        tanfovx=float(s.tanfovx), tanfovy=float(s.tanfovy),
        height=int(s.image_height), width=int(s.image_width),
    )

    def none_if_empty(x):
        from .torch_compat import to_jax

        return to_jax(x)

    kwargs = dict(
        opacities=_asarray(opacities),
        scales=none_if_empty(scales),
        rotations=none_if_empty(rotations),
        cov3D_precomp=none_if_empty(cov3Ds_precomp),
        shs=none_if_empty(shs),
        sh_degree=int(s.sh_degree),
        colors_precomp=none_if_empty(colors_precomp),
        scale_modifier=float(s.scale_modifier),
        bg=_asarray(s.bg),
        gt_depth=_asarray(gt_depth),
        track_off=bool(s.track_off),
        map_off=bool(s.map_off),
    )
    try:
        if s.prefiltered:
            # auxiliary.h:156-160: the reference __trap()s when a
            # prefiltered Gaussian fails the frustum test — the trap is
            # unconditional (not gated on debug), so enforce it eagerly
            # on every prefiltered call
            from .torch_compat import _check_prefiltered

            _check_prefiltered(
                {"means3D": _asarray(means3D),
                 "viewmatrix": cam.viewmatrix}, config)
        out = rasterize(_asarray(means3D), cam, config, **kwargs)
        if s.debug:
            # eager finiteness check — the functional analogue of the
            # reference's CHECK_CUDA-after-every-stage debug mode
            # (light auxiliary.h:166-173, rasterizer_impl.cu:254-347)
            bad = [n for n in ("color", "depth", "opacity_map")
                   if not bool(jnp.all(jnp.isfinite(getattr(out, n))))]
            if bad:
                raise FloatingPointError(
                    f"non-finite render outputs: {bad}")
    except Exception:
        if s.debug:
            # crash forensics: dump the inputs for offline reproduction
            # (light __init__.py:90-97 dumps snapshot_fw.dump)
            _dump_snapshot("snapshot_fw.dump", means3D=means3D,
                           viewmatrix=viewmatrix, settings=s, **kwargs)
            print("\nAn error occurred in the rasterizer forward. "
                  "Inputs written to snapshot_fw.dump for debugging.")
        raise
    return (out.color, out.radii, out.depth, out.depth_median,
            out.depth_var, out.opacity_map, out.gau_uncertainty,
            out.gau_related_pixels)


def _dump_snapshot(path, **arrays):
    """Pickle host copies of the op inputs (light __init__.py:17-19
    ``cpu_deep_copy_tuple`` + torch.save)."""
    import pickle

    import numpy as np

    host = {}
    for k, v in arrays.items():
        if v is None or isinstance(v, (int, float, bool, str)):
            host[k] = v
        elif hasattr(v, "_asdict"):
            host[k] = {kk: (np.asarray(vv) if hasattr(vv, "shape") else vv)
                       for kk, vv in v._asdict().items()}
        else:
            host[k] = np.asarray(v)
    with open(path, "wb") as f:
        pickle.dump(host, f)
