"""TUM RGB-D dataset reader with timestamp association.

Layout:
    <scene>/rgb.txt, depth.txt, groundtruth.txt   (timestamp file-or-pose)
Depth is 16-bit PNG scaled by 5000.  Ground-truth poses are tx ty tz qx qy
qz qw (c2w).  Association follows the standard nearest-timestamp rule with a
max difference of 0.02 s (the TUM tools' default).
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Tuple

import numpy as np

from ..camera import Camera
from ..models.slam import Frame

# freiburg1 / freiburg2 / freiburg3 default pinhole intrinsics
TUM_INTRINSICS = {
    1: dict(fx=517.3, fy=516.5, cx=318.6, cy=255.3),
    2: dict(fx=520.9, fy=521.0, cx=325.1, cy=249.7),
    3: dict(fx=535.4, fy=539.2, cx=320.1, cy=247.6),
}


def _read_list(path):
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            out.append((float(parts[0]), parts[1:]))
    return out


def _associate(a, b, max_dt=0.02):
    """Nearest-timestamp association (TUM associate.py semantics)."""
    bi = 0
    pairs = []
    bts = [t for t, _ in b]
    for i, (ta, _) in enumerate(a):
        while bi + 1 < len(bts) and abs(bts[bi + 1] - ta) <= abs(bts[bi] - ta):
            bi += 1
        if abs(bts[bi] - ta) <= max_dt:
            pairs.append((i, bi))
    return pairs


def quat_to_mat(qx, qy, qz, qw):
    r, x, y, z = qw, qx, qy, qz
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)],
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)],
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)],
    ])


@dataclasses.dataclass
class TUMDataset:
    root: str
    freiburg: int = 1
    depth_scale: float = 5000.0
    height: int = 480
    width: int = 640
    stride: int = 1
    max_dt: float = 0.02
    fx: float = None  # override the freiburg defaults (e.g. test fixtures)
    fy: float = None
    # cx/cy are stored for completeness but do NOT affect rendering: the
    # projection model is principal-point-centered, exactly like the
    # reference's ndc2Pix (auxiliary.h:41-44) — it has no principal-point
    # input either.  Off-center TUM sequences carry a ~16 px modeling
    # error in y in BOTH engines.
    cx: float = None
    cy: float = None

    def __post_init__(self):
        rgb = _read_list(os.path.join(self.root, "rgb.txt"))
        depth = _read_list(os.path.join(self.root, "depth.txt"))
        gt = _read_list(os.path.join(self.root, "groundtruth.txt"))
        rd = _associate(rgb, depth, self.max_dt)
        rg = dict(_associate(rgb, gt, self.max_dt))
        self.items: List[Tuple[str, str, np.ndarray]] = []
        for ri, di in rd:
            if ri not in rg:
                continue
            tx, ty, tz, qx, qy, qz, qw = map(float, gt[rg[ri]][1][:7])
            c2w = np.eye(4)
            c2w[:3, :3] = quat_to_mat(qx, qy, qz, qw)
            c2w[:3, 3] = (tx, ty, tz)
            self.items.append((
                os.path.join(self.root, rgb[ri][1][0]),
                os.path.join(self.root, depth[di][1][0]),
                c2w,
            ))
        self.items = self.items[:: self.stride]
        intr = TUM_INTRINSICS[self.freiburg]
        self.fx = self.fx if self.fx is not None else intr["fx"]
        self.fy = self.fy if self.fy is not None else intr["fy"]
        self.cx = self.cx if self.cx is not None else intr["cx"]
        self.cy = self.cy if self.cy is not None else intr["cy"]

    def __len__(self):
        return len(self.items)

    def camera_template(self, viewmatrix=None) -> Camera:
        import jax.numpy as jnp
        return Camera.from_intrinsics(
            viewmatrix if viewmatrix is not None
            else jnp.eye(4, dtype=jnp.float32),
            fx=self.fx, fy=self.fy, height=self.height, width=self.width,
        )

    def pose(self, i) -> np.ndarray:
        _, _, c2w = self.items[i]
        return np.linalg.inv(c2w).T.astype(np.float32)

    def frame(self, i) -> Frame:
        from PIL import Image
        import jax.numpy as jnp
        rgb_p, depth_p, _ = self.items[i]
        rgb = np.asarray(Image.open(rgb_p), np.float32) / 255.0
        depth = np.asarray(Image.open(depth_p), np.float32) / self.depth_scale
        return Frame(rgb=jnp.asarray(rgb.transpose(2, 0, 1)),
                     depth=jnp.asarray(depth))

    def __iter__(self):
        for i in range(len(self)):
            yield self.pose(i), self.frame(i)
