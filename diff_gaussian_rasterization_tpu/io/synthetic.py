"""Synthetic RGB-D sequences for tests and benchmarks.

The reference has no datasets or loaders; CG-SLAM evaluates on Replica / TUM
RGB-D.  This module generates self-consistent sequences by rendering a
ground-truth Gaussian scene along a smooth camera trajectory — giving exact
ground-truth poses and depths for tracking/mapping tests without any data on
disk (BASELINE configs 3-4 are exercised this way; the Replica/TUM readers
in io/replica.py and io/tum.py handle the real datasets).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..camera import Camera
from ..config import RasterConfig
from ..models.gaussians import GaussianModel, init_model
from ..models.slam import Frame, render_model


def random_room_model(capacity=4096, n=2048, seed=0, extent=2.0,
                      dtype=jnp.float32) -> GaussianModel:
    """A box 'room' of Gaussians around the origin."""
    rng = np.random.RandomState(seed)
    # points on the walls of a box plus interior clutter
    walls = rng.uniform(-extent, extent, (n, 3))
    face = rng.randint(0, 6, n)
    axis = face // 2
    sign = (face % 2) * 2 - 1
    walls[np.arange(n), axis] = sign * extent
    clutter = rng.uniform(-extent * 0.7, extent * 0.7, (n // 4, 3))
    pts = np.concatenate([walls[: n - n // 4], clutter])
    colors = rng.uniform(0.1, 0.9, (n, 3))
    scales = np.exp(rng.uniform(np.log(0.05), np.log(0.18), (n, 3)))
    model = init_model(capacity, sh_degree=0, dtype=dtype,
                       means=jnp.asarray(pts, dtype),
                       colors=jnp.asarray(colors, dtype),
                       scales=jnp.asarray(scales, dtype),
                       opacity=0.8)
    rot = rng.normal(size=(n, 4))
    rot /= np.linalg.norm(rot, axis=1, keepdims=True)
    model = model.replace(
        rotations=model.rotations.at[:n].set(jnp.asarray(rot, dtype)))
    return model


def orbit_trajectory(n_frames: int, radius=0.8, height=0.1,
                     dtype=jnp.float32):
    """Smooth orbit inside the room, looking at the +z wall region."""
    from ..camera import look_at
    views = []
    for i in range(n_frames):
        a = 0.35 * np.sin(2 * np.pi * i / max(n_frames, 1) * 0.5)
        eye = (radius * np.sin(a), height * np.cos(a * 2.0), -0.5 + 0.2 * a)
        target = (0.3 * np.sin(a * 0.7), 0.0, 2.0)
        views.append(look_at(eye, target, dtype=dtype))
    return jnp.stack(views)


def render_sequence(model: GaussianModel, views, cam_template: Camera,
                    cfg: RasterConfig):
    """Render ground-truth RGB-D frames for every pose."""
    frames = []
    for i in range(views.shape[0]):
        cam = Camera(viewmatrix=views[i], tanfovx=cam_template.tanfovx,
                     tanfovy=cam_template.tanfovy,
                     height=cam_template.height, width=cam_template.width)
        out = render_model(model, cam, cfg)
        # geometric depth: alpha-weighted mean depth / silhouette
        depth = out.depth[0] / jnp.maximum(out.opacity_map[0], 1e-6)
        depth = jnp.where(out.opacity_map[0] > 0.5, depth, 0.0)
        frames.append(Frame(rgb=out.color, depth=depth))
    return frames
