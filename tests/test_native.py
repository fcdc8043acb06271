"""Native (C++) runtime components: pose-graph solver + RGB-D decoder."""

import os

import numpy as np
import pytest

from diff_gaussian_rasterization_tpu import native
from diff_gaussian_rasterization_tpu.models import lie

import jax.numpy as jnp


def _have(libname):
    return os.path.exists(os.path.join(
        os.path.dirname(native.__file__), "_native", libname))


@pytest.mark.skipif(not _have("libposegraph.so"), reason="native lib missing")
def test_pose_graph_recovers_noisy_chain():
    rng = np.random.RandomState(0)
    k = 8
    # ground-truth trajectory: random small twists chained
    gt = [jnp.eye(4)]
    for i in range(1, k):
        xi = jnp.asarray(rng.normal(scale=0.2, size=6))
        gt.append(lie.apply_twist(gt[-1], xi))
    gt = np.stack([np.asarray(v, np.float64) for v in gt])

    def w2c(v):  # column-convention actual transform
        return v.T

    # exact relative measurements X_i^{-1} X_j (column convention -> we pass
    # row convention relatives, i.e. (Xi^-1 Xj)^T = Vj @ inv(Vi)
    edges, zs = [], []
    for i in range(k - 1):
        edges.append((i, i + 1))
        zs.append(gt[i + 1] @ np.linalg.inv(gt[i]))
    # a loop closure
    edges.append((0, k - 1))
    zs.append(gt[k - 1] @ np.linalg.inv(gt[0]))

    # corrupt the initial poses (except pose 0)
    noisy = gt.copy()
    for i in range(1, k):
        xi = jnp.asarray(rng.normal(scale=0.05, size=6))
        noisy[i] = np.asarray(lie.apply_twist(jnp.asarray(gt[i]), xi))

    refined, err = native.pose_graph_optimize(
        noisy, np.asarray(edges), np.stack(zs), iters=15)

    def max_err(views):
        return max(
            np.abs(w2c(views[i]) - w2c(gt[i])).max() for i in range(k))

    assert max_err(refined) < max_err(noisy) * 0.05, (
        max_err(noisy), max_err(refined))
    assert err < 1e-8


@pytest.mark.skipif(not _have("librgbdio.so"), reason="native lib missing")
def test_rgbd_decoder_roundtrip(tmp_path):
    from PIL import Image
    rng = np.random.RandomState(0)
    h, w, n = 32, 48, 3
    rgb_paths, depth_paths, rgbs, depths = [], [], [], []
    for i in range(n):
        rgb = rng.randint(0, 255, (h, w, 3), np.uint8)
        depth = rng.randint(0, 60000, (h, w)).astype(np.uint16)
        rp = str(tmp_path / f"frame{i}.jpg")
        dp = str(tmp_path / f"depth{i}.png")
        Image.fromarray(rgb).save(rp, quality=95)
        Image.fromarray(depth, mode="I;16").save(dp)
        rgb_paths.append(rp)
        depth_paths.append(dp)
        rgbs.append(rgb)
        depths.append(depth)

    out_rgb, out_depth, ok = native.decode_rgbd_batch(
        rgb_paths, depth_paths, h, w, depth_scale=5000.0, n_threads=2)
    assert ok == n
    for i in range(n):
        # compare against PIL's decode of the same JPEG (decoder parity;
        # JPEG itself is lossy so the raw array is not the reference)
        ref = np.asarray(Image.open(rgb_paths[i]), np.float32)
        ref = ref.transpose(2, 0, 1) / 255.0
        assert np.abs(out_rgb[i] - ref).mean() < 0.02
        np.testing.assert_allclose(
            out_depth[i], depths[i].astype(np.float32) / 5000.0, atol=1e-4)
