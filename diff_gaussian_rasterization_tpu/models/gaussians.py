"""Gaussian map model: parameters, activations, densify/prune.

The reference library is stateless (an op library); the model/optimizer layer
lives in CG-SLAM above it (reference README.md:60-83 documents the expected
``render`` wrapper).  This module provides that layer TPU-natively:

- a registered-dataclass pytree with 3DGS-standard activations
  (exp for scales, sigmoid for opacity — auxiliary.h:134 ships the sigmoid
  the CUDA side never uses because activations live in Python there too);
- **static-capacity** lifecycle: the model owns ``capacity`` slots and an
  ``active`` mask, so densify/clone/split/prune are pure functions with
  fixed shapes — no reallocation, no host syncs, jit-stable;
- the densification signal is the screen-space position gradient, read from
  the ``means2D`` zero-input exactly like 3DGS reads the reference's
  ``grad_means2D`` output (backward.cu:668-670).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..ops.sh import num_sh_coeffs, rgb_to_sh0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianModel:
    """Static-capacity Gaussian set.  All arrays have leading dim = capacity."""

    means3D: Any          # (N, 3)
    scales_log: Any       # (N, 3)  exp-activated
    rotations: Any        # (N, 4)  raw quaternions
    opacities_logit: Any  # (N, 1)  sigmoid-activated
    sh: Any               # (N, M, 3)
    active: Any           # (N,) bool

    @property
    def capacity(self) -> int:
        return self.means3D.shape[0]

    @property
    def num_active(self):
        return jnp.sum(self.active)

    # --- activations ---
    @property
    def scales(self):
        return jnp.exp(self.scales_log)

    @property
    def opacities(self):
        # inactive slots render with zero opacity: masked out of every tile
        op = jax.nn.sigmoid(self.opacities_logit)
        return jnp.where(self.active[:, None], op, 0.0)

    def raster_kwargs(self, sh_degree: int = None):
        """Keyword arguments for ops.rasterize."""
        m = self.sh.shape[1]
        deg = int(round(m ** 0.5)) - 1 if sh_degree is None else sh_degree
        return dict(
            opacities=self.opacities,
            scales=self.scales,
            rotations=self.rotations,
            shs=self.sh,
            sh_degree=deg,
        )

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def init_model(capacity: int, sh_degree: int = 0, dtype=jnp.float32,
               means=None, colors=None, scales=None, opacity: float = 0.1,
               active=None) -> GaussianModel:
    """Create a model, optionally seeding the first slots from a point cloud."""
    m = num_sh_coeffs(sh_degree)
    model = GaussianModel(
        means3D=jnp.zeros((capacity, 3), dtype),
        scales_log=jnp.full((capacity, 3), -5.0, dtype),
        rotations=jnp.tile(jnp.asarray([1.0, 0, 0, 0], dtype), (capacity, 1)),
        opacities_logit=jnp.full(
            (capacity, 1), _logit(opacity), dtype),
        sh=jnp.zeros((capacity, m, 3), dtype),
        active=jnp.zeros((capacity,), bool),
    )
    if means is not None:
        n = means.shape[0]
        model = model.replace(
            means3D=model.means3D.at[:n].set(means),
            active=model.active.at[:n].set(
                True if active is None else active),
        )
        if colors is not None:
            model = model.replace(
                sh=model.sh.at[:n, 0].set(rgb_to_sh0(colors)))
        if scales is not None:
            model = model.replace(
                scales_log=model.scales_log.at[:n].set(jnp.log(scales)))
    return model


def _logit(p: float) -> float:
    import math
    return math.log(p / (1.0 - p))


# --------------------------------------------------------------------------
# densification / pruning (3DGS-style policies, static shapes)
# --------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DensifyState:
    """Accumulated screen-gradient statistics between densify steps."""

    grad_accum: Any  # (N,) sum of ||dL/d(ndc xy)||
    denom: Any       # (N,) number of frames the Gaussian was visible

    @classmethod
    def zero(cls, capacity: int, dtype=jnp.float32):
        return cls(grad_accum=jnp.zeros((capacity,), dtype),
                   denom=jnp.zeros((capacity,), dtype))

    def update(self, means2D_grad, visible):
        g = jnp.linalg.norm(means2D_grad, axis=-1)
        vis = visible.astype(g.dtype)
        return DensifyState(
            grad_accum=self.grad_accum + g * vis,
            denom=self.denom + vis,
        )


def densify_and_prune(
    model: GaussianModel,
    state: DensifyState,
    *,
    grad_threshold: float = 2e-4,
    percent_dense: float = 0.01,
    scene_extent: float = 1.0,
    opacity_cull: float = 0.005,
    max_new: int = 0,
    split_scale_down: float = 1.6,
    rng: Optional[jax.Array] = None,
):
    """3DGS clone/split/prune with static shapes.

    Candidates with mean screen-gradient above ``grad_threshold`` are cloned
    (small Gaussians) or split (large ones).  Up to ``max_new`` (default:
    capacity budget) new Gaussians are written into inactive slots, chosen by
    descending gradient score.  Gaussians below ``opacity_cull`` are pruned.
    Returns (model, fresh DensifyState).
    """
    cap = model.capacity
    if max_new <= 0:
        max_new = cap // 8
    if rng is None:
        rng = jax.random.PRNGKey(0)

    avg_grad = state.grad_accum / jnp.maximum(state.denom, 1.0)
    max_scale = jnp.max(model.scales, axis=-1)
    is_large = max_scale > percent_dense * scene_extent
    candidate = model.active & (avg_grad > grad_threshold)

    # rank candidates by gradient score; take top max_new
    score = jnp.where(candidate, avg_grad, -jnp.inf)
    src = jnp.argsort(-score)[:max_new]                      # source slots
    src_ok = candidate[src]

    # destination: first max_new inactive slots
    free_order = jnp.argsort(model.active)                   # False first
    dst = free_order[:max_new]
    dst_ok = ~model.active[dst] & src_ok
    n_spawned = jnp.sum(dst_ok)

    split_src = is_large[src]
    # split sample: draw from the source Gaussian
    noise = jax.random.normal(rng, (max_new, 3), model.means3D.dtype)
    src_scales = model.scales[src]
    sampled = model.means3D[src] + noise * src_scales
    new_means = jnp.where(split_src[:, None], sampled, model.means3D[src])
    new_scales_log = jnp.where(
        split_src[:, None],
        model.scales_log[src] - jnp.log(split_scale_down),
        model.scales_log[src],
    )

    def put(arr, rows):
        rows = jnp.where(dst_ok.reshape((-1,) + (1,) * (rows.ndim - 1)),
                         rows, arr[dst])
        return arr.at[dst].set(rows)

    model = model.replace(
        means3D=put(model.means3D, new_means),
        scales_log=put(model.scales_log, new_scales_log),
        rotations=put(model.rotations, model.rotations[src]),
        opacities_logit=put(model.opacities_logit,
                            model.opacities_logit[src]),
        sh=put(model.sh, model.sh[src]),
        active=model.active.at[dst].set(
            model.active[dst] | dst_ok),
    )
    # the split source also shrinks in place
    shrink = jnp.where(
        (dst_ok & split_src)[:, None],
        model.scales_log[src] - jnp.log(split_scale_down),
        model.scales_log[src],
    )
    model = model.replace(scales_log=model.scales_log.at[src].set(shrink))

    # prune: transparent Gaussians die
    op = jax.nn.sigmoid(model.opacities_logit[:, 0])
    keep = model.active & (op > opacity_cull)
    model = model.replace(active=keep)
    return model, DensifyState.zero(cap, model.means3D.dtype), n_spawned


def prune_by_uncertainty(model: GaussianModel, gau_uncertainty,
                         gau_related_pixels, threshold: float):
    """CG-SLAM-style uncertainty-aware pruning: drop Gaussians whose mean
    depth-uncertainty per related pixel exceeds ``threshold`` (the reference
    exposes these statistics for exactly this purpose,
    rasterize_points.cu:75-76, forward.cu:386-387)."""
    u = gau_uncertainty[:, 0] / jnp.maximum(
        gau_related_pixels[:, 0].astype(gau_uncertainty.dtype), 1.0)
    keep = model.active & ~((gau_related_pixels[:, 0] > 0) & (u > threshold))
    return model.replace(active=keep)
