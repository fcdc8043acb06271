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


def replica_like_model(capacity=None, seed=0, extent=(2.0, 1.5, 2.5),
                       wall_res=56, n_boxes=6, dtype=jnp.float32
                       ) -> GaussianModel:
    """A Replica-class procedural room: textured walls/floor/ceiling plus
    furniture boxes for occlusion.

    Real Replica/TUM sequences cannot be downloaded here (zero egress);
    this is the closest buildable proxy (VERDICT r2 item 4): structured
    surfaces (regular grids with jitter, splat size ~ grid spacing so
    surfaces are watertight), smooth multi-frequency color textures (rich
    photometric gradients for direct tracking), and interior boxes that
    occlude the walls from most viewpoints.
    """
    rng = np.random.RandomState(seed)
    ex, ey, ez = extent
    pts, cols, scls = [], [], []

    def textured_plane(origin, u_vec, v_vec, nu, nv, base_color, fr):
        """Grid of splats spanning origin + [0,1]^2 * (u_vec, v_vec)."""
        uu, vv = np.meshgrid(np.linspace(0, 1, nu), np.linspace(0, 1, nv))
        uu, vv = uu.ravel(), vv.ravel()
        ju = (rng.uniform(-0.3, 0.3, uu.shape)) / nu
        jv = (rng.uniform(-0.3, 0.3, vv.shape)) / nv
        p = (np.asarray(origin)[None]
             + (uu + ju)[:, None] * np.asarray(u_vec)[None]
             + (vv + jv)[:, None] * np.asarray(v_vec)[None])
        # multi-frequency texture: enough structure at every scale that
        # the photometric Jacobian never goes flat
        t = (0.30 * np.sin(2 * np.pi * fr[0] * uu + fr[2])
             * np.cos(2 * np.pi * fr[1] * vv + fr[3])
             + 0.18 * np.sin(2 * np.pi * 3.7 * fr[0] * uu + 1.3)
             + 0.12 * np.cos(2 * np.pi * 4.3 * fr[1] * vv + 0.7))
        c = np.clip(np.asarray(base_color)[None]
                    * (0.65 + 0.35 * t[:, None])
                    + rng.normal(scale=0.02, size=(len(uu), 3)), 0.02, 0.98)
        spacing = max(np.linalg.norm(u_vec) / nu,
                      np.linalg.norm(v_vec) / nv)
        s = np.full((len(uu), 3), spacing * 0.62)
        pts.append(p); cols.append(c); scls.append(s)

    wr = wall_res
    hr = max(8, int(wr * ey / max(ex, ez)) * 2)
    # floor (y = +ey; y grows downward in view space conventions here) and
    # ceiling (y = -ey)
    textured_plane([-ex, ey, -ez], [2 * ex, 0, 0], [0, 0, 2 * ez],
                   wr, wr, [0.55, 0.45, 0.35], rng.uniform(1, 4, 4))
    textured_plane([-ex, -ey, -ez], [2 * ex, 0, 0], [0, 0, 2 * ez],
                   wr, wr, [0.75, 0.75, 0.72], rng.uniform(1, 3, 4))
    # four walls
    textured_plane([-ex, -ey, ez], [2 * ex, 0, 0], [0, 2 * ey, 0],
                   wr, hr, [0.70, 0.62, 0.50], rng.uniform(2, 5, 4))
    textured_plane([-ex, -ey, -ez], [2 * ex, 0, 0], [0, 2 * ey, 0],
                   wr, hr, [0.52, 0.60, 0.68], rng.uniform(2, 5, 4))
    textured_plane([-ex, -ey, -ez], [0, 0, 2 * ez], [0, 2 * ey, 0],
                   wr, hr, [0.62, 0.55, 0.60], rng.uniform(2, 5, 4))
    textured_plane([ex, -ey, -ez], [0, 0, 2 * ez], [0, 2 * ey, 0],
                   wr, hr, [0.58, 0.66, 0.55], rng.uniform(2, 5, 4))

    # furniture: axis-aligned boxes on the floor (occluders)
    br = max(10, wr // 4)
    for b in range(n_boxes):
        cx = rng.uniform(-ex * 0.6, ex * 0.6)
        cz = rng.uniform(-ez * 0.6, ez * 0.6)
        w2 = rng.uniform(0.15, 0.45)
        d2 = rng.uniform(0.15, 0.45)
        h = rng.uniform(0.4, 1.4)
        base = rng.uniform(0.15, 0.85, 3)
        fr = rng.uniform(2, 8, 4)
        y0, y1 = ey, ey - h  # sits on the floor
        # top + 4 sides
        textured_plane([cx - w2, y1, cz - d2], [2 * w2, 0, 0],
                       [0, 0, 2 * d2], br, br, base, fr)
        textured_plane([cx - w2, y1, cz - d2], [2 * w2, 0, 0],
                       [0, y0 - y1, 0], br, br, base * 0.9, fr)
        textured_plane([cx - w2, y1, cz + d2], [2 * w2, 0, 0],
                       [0, y0 - y1, 0], br, br, base * 0.8, fr)
        textured_plane([cx - w2, y1, cz - d2], [0, 0, 2 * d2],
                       [0, y0 - y1, 0], br, br, base * 0.85, fr)
        textured_plane([cx + w2, y1, cz - d2], [0, 0, 2 * d2],
                       [0, y0 - y1, 0], br, br, base * 0.75, fr)

    p = np.concatenate(pts)
    c = np.concatenate(cols)
    s = np.concatenate(scls)
    n = p.shape[0]
    if capacity is None:
        capacity = int(-(-n // 1024) * 1024)
    assert capacity >= n, (capacity, n)
    model = init_model(capacity, sh_degree=0, dtype=dtype,
                       means=jnp.asarray(p, dtype),
                       colors=jnp.asarray(c, dtype),
                       scales=jnp.asarray(s, dtype),
                       opacity=0.92)
    return model


def walkthrough_trajectory(n_frames: int, seed=0, extent=(2.0, 1.5, 2.5),
                           rot_heavy=True, close_loop=False,
                           dtype=jnp.float32):
    """A SLAM-style walkthrough inside the room: smooth translation arcs
    interleaved with rotation-dominant pan segments (the hard case for
    direct tracking — large image motion with near-zero parallax).

    ``close_loop=True`` scales the orbit speed so the eye completes one
    full circuit within ``n_frames`` and returns to its start — a true
    loop closure that re-observes the earliest map (exercises pose-graph
    refinement + re-anchoring at trajectory scale)."""
    from ..camera import look_at

    rng = np.random.RandomState(seed)
    ex, ey, ez = extent
    # constant-angular-speed arc on an interior loop (~0.02 m/frame — the
    # Replica/TUM hand-held regime; a full loop takes ~250 frames), with
    # pan segments that hold the eye still.  Eye motion is frozen during
    # pans by advancing the orbit angle only on non-pan frames.
    orbit_rate = 2 * np.pi / 250.0
    pan = np.zeros(n_frames, bool)
    gaze_rate = np.zeros(n_frames)
    i = 0
    while i < n_frames:
        seg = rng.randint(12, 28)
        if rot_heavy and rng.uniform() < 0.4:
            pan[i:i + seg] = True
            gaze_rate[i:i + seg] = (rng.uniform(0.02, 0.04)
                                    * rng.choice([-1, 1]))
        else:
            gaze_rate[i:i + seg] = (rng.uniform(0.004, 0.012)
                                    * rng.choice([-1, 1]))
        i += seg
    if close_loop:
        n_move = max(int((~pan).sum()), 1)
        orbit_rate = 2 * np.pi / n_move
    theta = np.cumsum(np.where(pan, 0.0, orbit_rate))
    eyes = np.stack([0.45 * ex * np.cos(theta),
                     0.1 * ey * np.sin(2 * theta),
                     0.45 * ez * np.sin(theta)], -1)
    gaze_a = rng.uniform(0, 2 * np.pi) + np.cumsum(gaze_rate)
    views = []
    for k in range(n_frames):
        eye = eyes[k]
        target = eye + np.asarray([np.sin(gaze_a[k]),
                                   0.15 * np.sin(gaze_a[k] * 0.7),
                                   np.cos(gaze_a[k])])
        views.append(look_at(tuple(eye), tuple(target), dtype=dtype))
    return jnp.stack(views)


def render_sequence(model: GaussianModel, views, cam_template: Camera,
                    cfg: RasterConfig, rgb_noise: float = 0.0,
                    depth_noise: float = 0.0, seed: int = 0):
    """Render ground-truth RGB-D frames for every pose.

    ``rgb_noise``/``depth_noise`` add per-pixel sensor noise (std, in
    color units / meters) so benchmarks don't track a noise-free oracle.
    """
    rng = np.random.RandomState(seed)
    frames = []
    for i in range(views.shape[0]):
        cam = Camera(viewmatrix=views[i], tanfovx=cam_template.tanfovx,
                     tanfovy=cam_template.tanfovy,
                     height=cam_template.height, width=cam_template.width)
        out = render_model(model, cam, cfg)
        # geometric depth: alpha-weighted mean depth / silhouette
        depth = out.depth[0] / jnp.maximum(out.opacity_map[0], 1e-6)
        depth = jnp.where(out.opacity_map[0] > 0.5, depth, 0.0)
        rgb = out.color
        if rgb_noise:
            rgb = jnp.clip(rgb + jnp.asarray(
                rng.normal(scale=rgb_noise, size=rgb.shape), rgb.dtype),
                0.0, 1.0)
        if depth_noise:
            depth = jnp.where(
                depth > 0,
                depth + jnp.asarray(
                    rng.normal(scale=depth_noise, size=depth.shape),
                    depth.dtype) * depth,
                0.0)
        frames.append(Frame(rgb=rgb, depth=depth))
    return frames
