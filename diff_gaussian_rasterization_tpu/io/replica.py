"""Replica RGB-D dataset reader (CG-SLAM's primary benchmark).

Layout (Replica as distributed for NICE-SLAM/CG-SLAM evaluation):

    <scene>/results/frame000000.jpg   RGB frames
    <scene>/results/depth000000.png   16-bit depth (depth_scale, usually 6553.5)
    <scene>/traj.txt                  one flattened 4x4 c2w matrix per line

Camera intrinsics come from the dataset's ``cam_params.json`` or the caller.
Returned poses are row-convention view matrices (w2c transposed) ready for
``Camera(viewmatrix=...)``.
"""

from __future__ import annotations

import dataclasses
import glob
import json
import os
from typing import Iterator, Optional

import numpy as np

from ..camera import Camera
from ..models.slam import Frame


@dataclasses.dataclass
class ReplicaDataset:
    root: str
    depth_scale: float = 6553.5
    fx: float = 600.0
    fy: float = 600.0
    cx: float = 599.5
    cy: float = 339.5
    height: int = 680
    width: int = 1200
    stride: int = 1

    def __post_init__(self):
        self.rgb_paths = sorted(
            glob.glob(os.path.join(self.root, "results", "frame*.jpg"))
        )[:: self.stride]
        self.depth_paths = sorted(
            glob.glob(os.path.join(self.root, "results", "depth*.png"))
        )[:: self.stride]
        traj = np.loadtxt(os.path.join(self.root, "traj.txt"))
        self.c2w = traj.reshape(-1, 4, 4)[:: self.stride]
        cam_json = os.path.join(self.root, "..", "cam_params.json")
        if os.path.exists(cam_json):
            with open(cam_json) as f:
                c = json.load(f)["camera"]
            self.fx, self.fy = c["fx"], c["fy"]
            self.cx, self.cy = c["cx"], c["cy"]
            self.height, self.width = c["h"], c["w"]
            self.depth_scale = c.get("scale", self.depth_scale)

    def __len__(self):
        return len(self.rgb_paths)

    def camera_template(self, viewmatrix=None) -> Camera:
        import jax.numpy as jnp
        return Camera.from_intrinsics(
            viewmatrix if viewmatrix is not None
            else jnp.eye(4, dtype=jnp.float32),
            fx=self.fx, fy=self.fy, height=self.height, width=self.width,
        )

    def pose(self, i) -> np.ndarray:
        """Ground-truth w2c view matrix, row convention."""
        w2c = np.linalg.inv(self.c2w[i])
        return w2c.T.astype(np.float32)

    def frame(self, i) -> Frame:
        from PIL import Image
        import jax.numpy as jnp
        rgb = np.asarray(Image.open(self.rgb_paths[i]), np.float32) / 255.0
        depth = (
            np.asarray(Image.open(self.depth_paths[i]), np.float32)
            / self.depth_scale
        )
        return Frame(
            rgb=jnp.asarray(rgb.transpose(2, 0, 1)),
            depth=jnp.asarray(depth),
        )

    def __iter__(self) -> Iterator:
        for i in range(len(self)):
            yield self.pose(i), self.frame(i)


def _centers(views) -> np.ndarray:
    """Camera centers from row-convention w2c view matrices:
    c = -R^{-1} t with R = V[:3,:3]^T (so R^{-1} = V[:3,:3])."""
    out = []
    for v in views:
        v = np.asarray(v)
        out.append(-(v[:3, :3] @ v[3, :3]))
    return np.stack(out)


def ate_rmse(est_views, gt_views) -> float:
    """Absolute trajectory error (RMSE of translation, after the usual
    closed-form alignment is *not* applied — CG-SLAM reports unaligned ATE
    for SLAM with known first pose)."""
    err = _centers(est_views) - _centers(gt_views)
    return float(np.sqrt((err ** 2).sum(-1).mean()))


def ate_rmse_aligned(est_views, gt_views) -> float:
    """ATE RMSE after closed-form SE(3) (Umeyama, no scale) alignment of
    the estimated trajectory to ground truth — the evo / TUM-benchmark
    convention most published SLAM ATE tables use (the ~0.3 cm CG-SLAM
    class numbers the reference README cites are evaluated this way).
    Reported alongside the stricter unaligned :func:`ate_rmse`."""
    est = _centers(est_views)
    gt = _centers(gt_views)
    mu_e, mu_g = est.mean(0), gt.mean(0)
    # cross-covariance of centered clouds; SVD-based optimal rotation
    cov = (gt - mu_g).T @ (est - mu_e) / len(est)
    u, _, vt = np.linalg.svd(cov)
    s = np.eye(3)
    if np.linalg.det(u) * np.linalg.det(vt) < 0:
        s[2, 2] = -1.0
    rot = u @ s @ vt
    err = (est - mu_e) @ rot.T + mu_g - gt
    return float(np.sqrt((err ** 2).sum(-1).mean()))
