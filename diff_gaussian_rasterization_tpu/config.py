"""Rasterizer configuration.

The reference (hjr37/diff-gaussian-rasterization) splits configuration across a
compile-time header (``cuda_rasterizer/config.h:15-17``: NUM_CHANNELS=3,
BLOCK_X=BLOCK_Y=16) and a runtime NamedTuple
(``diff_gaussian_rasterization/__init__.py:180-195`` in the light variant).
Here everything static lives in one frozen dataclass that is hashable, so it can
be a ``jax.jit`` static argument.  The full-vs-light variant split of the
reference becomes the four ``pose_*_branch`` flags (README.md:53-58 of the
reference: the light variant drops the SH color branch and the 2D-covariance
branch of the pose Jacobian).
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    """Static configuration of the TPU rasterizer.

    Numerical constants mirror the reference kernels exactly (citations are to
    the light variant unless noted):

    - ``alpha_cap`` / ``alpha_min`` / ``t_terminate``: forward.cu:364-373
    - ``lowpass``: forward.cu:110-111 (0.3 added to the 2D covariance diagonal)
    - ``radius_sigma`` / ``eig_clamp``: forward.cu:229-232 (3-sigma radius,
      eigenvalue discriminant clamped to >= 0.1)
    - ``near``: auxiliary.h:154 (near-plane cull at z <= 0.2; NDC-bounds
      culling is disabled in the reference and here)
    - ``fov_clamp``: forward.cu:82-87 (view-space point clamped to 1.3*tanfov
      before the EWA Jacobian)
    - ``w_eps``: forward.cu:199 (epsilon added to the homogeneous w)
    """

    # --- tiling: any shape with tile_h*tile_w % 128 == 0 runs on Pallas.
    # 32x32 measured fastest on v5e (fewest instance duplicates at a full
    # 1024-pixel vreg set); 8x128 and 16x32 are close; tiny tiles pay
    # per-tile fixed costs ---
    tile_h: int = 32
    tile_w: int = 32

    # --- blend thresholds (exact reference semantics) ---
    alpha_cap: float = 0.99
    alpha_min: float = 15.0 / 255.0
    t_terminate: float = 1e-4

    # --- projection / footprint ---
    lowpass: float = 0.3
    radius_sigma: float = 3.0
    eig_clamp: float = 0.1
    near: float = 0.2
    fov_clamp: float = 1.3
    w_eps: float = 1e-7

    # Bin each splat with its exact alpha_min footprint radius
    # sigma*sqrt(2 ln(opac/alpha_min)) instead of the reference's fixed
    # 3-sigma rect (forward.cu:229-232): identical rendered output (culled
    # pixels could never pass alpha >= alpha_min), ~30-40% fewer instances.
    opacity_cull: bool = True
    # Extra pixels of binning footprint around every splat (rect AND exact
    # ellipse cull are both dilated).  Zero-cost to rendered output at the
    # binning pose (the blend's alpha >= alpha_min mask zeroes the padded
    # instances), but keeps the instance->tile assignment VALID for nearby
    # poses — GN tracking bins once per frame with a margin covering the
    # expected inter-frame motion and reuses the binning across all
    # iterations (the reference re-sorts every render; see
    # rasterize(binn=...)).
    bin_margin_px: float = 0.0
    # Binning expansion: False = 12-column delta-scatter + prefix scan;
    # True = 1-column marks scan + per-instance row gather of the packed
    # per-Gaussian table (chip A/B knob; see binning.bin_gaussians).
    bin_row_gather: bool = False

    # --- parity quirks (see reference SURVEY appendix A) ---
    # The reference uses quaternions unnormalized (forward.cu:127, the
    # normalization is commented out).  Set True for well-behaved optimization.
    normalize_quaternions: bool = False
    # The reference's depth-variance image is identically zero in the forward
    # (forward.cu:317,410) while its backward still consumes dL/d(depth_var)
    # (backward.cu:608-611).  True reproduces that; False renders the real
    # per-pixel variance  sum_i (d_i - gt)^2 * alpha_i * T_i  and
    # differentiates it consistently.
    ref_depth_var: bool = True

    # --- pose-gradient branches (full vs light variant) ---
    # light variant: ndc + depth branches only (backward.cu:633-651,701-751).
    # full variant additionally: SH/campos branch (full backward.cu:159-166)
    # and the Sigma2D/EWA branch (full backward.cu:243-302).
    pose_ndc_branch: bool = True
    pose_depth_branch: bool = True
    pose_cov2d_branch: bool = False
    pose_sh_branch: bool = False

    # --- capacity (static shapes: XLA cannot resize like the reference's
    # allocator closures, rasterize_points.cu:27-33) ---
    # Maximum (gaussian, tile) instance pairs.  None -> choose at call time
    # from a multiple of P.  Overflow is reported, never silent.
    max_instances: Optional[int] = None
    instance_multiplier: int = 8  # used when max_instances is None

    # Evaluate the per-(instance, pixel) Gaussian exponent as an MXU
    # contraction of per-instance quadratic coefficients against the shared
    # tile-pixel moment basis instead of ~10 VPU ops (blend.splat_power).
    # Changes output by ~1e-4 relative in alpha (f32 cancellation of the
    # expansion), so it is off by default for exact reference parity.
    splat_basis_power: bool = False

    # Run the blend's inclusive scans on the MXU instead of log-doubling on
    # the VPU: the prefix sum becomes a lower-triangular-ones matmul, the
    # prefix product exp(tri @ log(a)).  Changes only summation order /
    # transcendental rounding (~1e-5 relative); all backends and the oracle
    # share the same formulation so threshold decisions stay consistent.
    scan_sum_mm: bool = False
    scan_prod_mm: bool = False
    # Per-pass overrides for the Pallas BACKWARD kernel only (None =
    # inherit the flags above).  Rationale: the MXU-scan win was measured
    # on the combined frame, but the bwd kernel keeps the MXU busier (the
    # fused cotangent matmul + moment reductions + gradient rows), so the
    # optimal scan backend may differ per pass — these are chip A/B knobs.
    # CAVEAT (bwd_scan_prod_mm only): a bwd prod-scan formulation that
    # differs from the forward's reconstructs p_incl/t_excl with ~1e-5
    # relative drift, so contrib/median masks can flip for instances
    # sitting exactly on the t_terminate / 0.5 thresholds — measurement
    # knob, not a default.  bwd_scan_sum_mm is consistency-free (the
    # cumsum only shapes gradient values); bwd_chunk regroups both scans'
    # rounding (~1e-4 relative drift in p_incl), so it carries the same
    # measure-zero mask-flip caveat in miniature.
    bwd_scan_sum_mm: Optional[bool] = None
    bwd_scan_prod_mm: Optional[bool] = None
    # compute sub-chunk width for the Pallas backward only (None = chunk)
    bwd_chunk: Optional[int] = None

    # --- backend selection ---
    backend: str = "auto"  # "pallas" | "xla" | "auto"
    # gaussians processed per compute sub-chunk inside the tile kernels;
    # 128 = one whole DMA block per sub-chunk measured fastest on v5e
    chunk: int = 128
    # tiles per Pallas grid step (statically unrolled).  Measured neutral on
    # v5e at 836 tiles (grid-step overhead is already small); kept as a knob
    # for architectures/shapes where step fixed costs matter
    kernel_tile_batch: int = 1

    def __post_init__(self):
        # the backward divides by (1 - alpha); alpha <= alpha_cap < 1 is the
        # invariant that keeps it finite (reference caps at 0.99,
        # forward.cu:364)
        if not (0.0 < self.alpha_cap < 1.0):
            raise ValueError(
                f"alpha_cap must be in (0, 1), got {self.alpha_cap}")
        if not (0.0 < self.alpha_min < 1.0):
            raise ValueError(
                f"alpha_min must be in (0, 1), got {self.alpha_min}")

    def replace(self, **kw) -> "RasterConfig":
        return dataclasses.replace(self, **kw)

    def bwd_view(self) -> "RasterConfig":
        """The config as seen by the Pallas backward kernel: per-pass
        scan/chunk overrides folded into the shared fields."""
        kw = {}
        if self.bwd_scan_sum_mm is not None:
            kw["scan_sum_mm"] = self.bwd_scan_sum_mm
        if self.bwd_scan_prod_mm is not None:
            kw["scan_prod_mm"] = self.bwd_scan_prod_mm
        if self.bwd_chunk is not None:
            kw["chunk"] = self.bwd_chunk
        return self.replace(**kw) if kw else self

    @property
    def tile_px(self) -> int:
        return self.tile_h * self.tile_w

    def full_variant(self) -> "RasterConfig":
        """Pose Jacobian with all branches (the reference 'full' package)."""
        return self.replace(pose_cov2d_branch=True, pose_sh_branch=True)


DEFAULT_CONFIG = RasterConfig()
