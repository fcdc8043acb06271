"""Generate the checked-in mini TUM-RGBD-format fixture.

Same synthetic frames as the Replica fixture, written in the TUM on-disk
layout (timestamped file lists + 16-bit depth PNGs + quaternion
groundtruth):

    tests/fixtures/tum_mini/rgb/<t>.png
    tests/fixtures/tum_mini/depth/<t>.png
    tests/fixtures/tum_mini/{rgb,depth,groundtruth}.txt

Timestamps are deliberately offset between the three lists (within the
0.02 s association window, with one depth entry far off) so the
nearest-timestamp association logic is exercised, not just file loading.

Run from the repo root:  python tests/gen_tum_fixture.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from PIL import Image

from diff_gaussian_rasterization_tpu.camera import Camera
from diff_gaussian_rasterization_tpu.config import RasterConfig
from diff_gaussian_rasterization_tpu.io.synthetic import (
    orbit_trajectory, random_room_model, render_sequence,
)

H, W = 60, 80
N_FRAMES = 5
DEPTH_SCALE = 5000.0
FX, FY = 57.0, 54.0
ROOT = os.path.join(os.path.dirname(__file__), "fixtures", "tum_mini")


def _mat_to_quat(r):
    """Rotation matrix -> (qx, qy, qz, qw), Shepperd's branch-by-largest
    form (the trace-only formula divides by ~0 for 180-degree rotations)."""
    t = np.trace(r)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return ((r[2, 1] - r[1, 2]) / s, (r[0, 2] - r[2, 0]) / s,
                (r[1, 0] - r[0, 1]) / s, 0.25 * s)
    if r[0, 0] > r[1, 1] and r[0, 0] > r[2, 2]:
        s = np.sqrt(1.0 + r[0, 0] - r[1, 1] - r[2, 2]) * 2
        return (0.25 * s, (r[0, 1] + r[1, 0]) / s,
                (r[0, 2] + r[2, 0]) / s, (r[2, 1] - r[1, 2]) / s)
    if r[1, 1] > r[2, 2]:
        s = np.sqrt(1.0 + r[1, 1] - r[0, 0] - r[2, 2]) * 2
        return ((r[0, 1] + r[1, 0]) / s, 0.25 * s,
                (r[1, 2] + r[2, 1]) / s, (r[0, 2] - r[2, 0]) / s)
    s = np.sqrt(1.0 + r[2, 2] - r[0, 0] - r[1, 1]) * 2
    return ((r[0, 2] + r[2, 0]) / s, (r[1, 2] + r[2, 1]) / s,
            0.25 * s, (r[1, 0] - r[0, 1]) / s)


def main():
    os.makedirs(os.path.join(ROOT, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(ROOT, "depth"), exist_ok=True)

    cfg = RasterConfig(tile_h=10, tile_w=16, chunk=32,
                       instance_multiplier=12)
    cam_t = Camera.from_intrinsics(jnp.eye(4, dtype=jnp.float32),
                                   fx=FX, fy=FY, height=H, width=W)
    model = random_room_model(capacity=768, n=768, seed=0)
    views = orbit_trajectory(N_FRAMES)
    frames = render_sequence(model, views, cam_t, cfg)

    rgb_lines = ["# color images", "# timestamp filename"]
    depth_lines = ["# depth images", "# timestamp filename"]
    gt_lines = ["# ground truth trajectory",
                "# timestamp tx ty tz qx qy qz qw"]
    for i, (view, frame) in enumerate(zip(views, frames)):
        t = 1000.0 + i * (1.0 / 30.0)
        rgb = np.clip(np.asarray(frame.rgb), 0, 1)
        img = (np.moveaxis(rgb, 0, 2) * 255).round().astype(np.uint8)
        Image.fromarray(img).save(os.path.join(ROOT, "rgb", f"{t:.6f}.png"))
        d16 = np.clip(np.asarray(frame.depth) * DEPTH_SCALE, 0,
                      65535).astype(np.uint16)
        # depth timestamps sit a few ms off the rgb ones (sensors are not
        # synchronized in real TUM data)
        td = t + 0.004
        Image.fromarray(d16).save(
            os.path.join(ROOT, "depth", f"{td:.6f}.png"))
        rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")
        depth_lines.append(f"{td:.6f} depth/{td:.6f}.png")
        # groundtruth at ~100 Hz would have many rows; emit one nearby
        c2w = np.linalg.inv(np.asarray(view, np.float64).T)
        qx, qy, qz, qw = _mat_to_quat(c2w[:3, :3])
        tx, ty, tz = c2w[:3, 3]
        gt_lines.append(
            f"{t + 0.002:.6f} {tx:.6f} {ty:.6f} {tz:.6f} "
            f"{qx:.6f} {qy:.6f} {qz:.6f} {qw:.6f}")
    # an unmatched depth entry far outside the association window: the
    # reader must drop it, not mis-pair it
    depth_lines.append("2000.000000 depth/none.png")

    for name, lines in (("rgb.txt", rgb_lines), ("depth.txt", depth_lines),
                        ("groundtruth.txt", gt_lines)):
        with open(os.path.join(ROOT, name), "w") as f:
            f.write("\n".join(lines) + "\n")
    print(f"wrote {N_FRAMES} frames to {ROOT}")


if __name__ == "__main__":
    main()
