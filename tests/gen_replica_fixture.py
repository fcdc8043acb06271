"""Generate the checked-in mini Replica-format fixture.

Renders a few tiny frames of the synthetic room scene and writes them in
the exact on-disk layout the Replica distribution (as packaged for
NICE-SLAM/CG-SLAM evaluation) uses:

    tests/fixtures/replica_mini/cam_params.json
    tests/fixtures/replica_mini/office0/results/frame%06d.jpg
    tests/fixtures/replica_mini/office0/results/depth%06d.png  (16-bit)
    tests/fixtures/replica_mini/office0/traj.txt               (c2w rows)

Run from the repo root:  python tests/gen_replica_fixture.py
The fixture is committed; this script only needs re-running if the
format or the synthetic scene changes.
"""

import json
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
DEPTH_SCALE = 6553.5
FX, FY = 57.0, 54.0
ROOT = os.path.join(os.path.dirname(__file__), "fixtures", "replica_mini")


def main():
    scene_dir = os.path.join(ROOT, "office0")
    results = os.path.join(scene_dir, "results")
    os.makedirs(results, exist_ok=True)

    cfg = RasterConfig(tile_h=10, tile_w=16, chunk=32,
                       instance_multiplier=12)
    cam_t = Camera.from_intrinsics(jnp.eye(4, dtype=jnp.float32),
                                   fx=FX, fy=FY, height=H, width=W)
    model = random_room_model(capacity=768, n=768, seed=0)
    views = orbit_trajectory(N_FRAMES)
    frames = render_sequence(model, views, cam_t, cfg)

    c2w_rows = []
    for i, (view, frame) in enumerate(zip(views, frames)):
        rgb = np.clip(np.asarray(frame.rgb), 0, 1)
        img = (np.moveaxis(rgb, 0, 2) * 255).round().astype(np.uint8)
        Image.fromarray(img).save(
            os.path.join(results, f"frame{i:06d}.jpg"), quality=95)
        d16 = np.clip(np.asarray(frame.depth) * DEPTH_SCALE, 0,
                      65535).astype(np.uint16)
        Image.fromarray(d16).save(
            os.path.join(results, f"depth{i:06d}.png"))
        # traj.txt holds c2w; the row-convention w2c view V satisfies
        # c2w = inv(V^T)
        c2w = np.linalg.inv(np.asarray(view, np.float64).T)
        c2w_rows.append(c2w.reshape(-1))
    np.savetxt(os.path.join(scene_dir, "traj.txt"),
               np.stack(c2w_rows), fmt="%.9f")

    with open(os.path.join(ROOT, "cam_params.json"), "w") as f:
        json.dump({"camera": {"fx": FX, "fy": FY,
                              "cx": (W - 1) / 2.0, "cy": (H - 1) / 2.0,
                              "h": H, "w": W, "scale": DEPTH_SCALE}}, f,
                  indent=2)
    print(f"wrote {N_FRAMES} frames to {scene_dir}")


if __name__ == "__main__":
    main()
