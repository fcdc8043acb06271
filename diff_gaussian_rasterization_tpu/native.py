"""ctypes bindings for the native (C++) runtime components in csrc/.

- ``pose_graph_optimize``: SE(3) keyframe pose-graph Gauss-Newton
  (csrc/pose_graph.cpp).
- ``decode_rgbd_batch``: threaded JPEG/PNG16 RGB-D frame decoding
  (csrc/rgbd_io.cpp).

Libraries are built by ``make -C csrc`` into ``_native/``; loading is lazy
and failures degrade gracefully (callers fall back to pure-Python paths).
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "_native")


def _load(name: str):
    path = os.path.join(_NATIVE_DIR, name)
    if not os.path.exists(path):
        # try to build once
        csrc = os.path.join(os.path.dirname(__file__), "..", "csrc")
        if os.path.exists(os.path.join(csrc, "Makefile")):
            subprocess.run(["make", "-C", csrc], check=False,
                           capture_output=True)
    return ctypes.CDLL(path)


@functools.lru_cache()
def _posegraph_lib():
    lib = _load("libposegraph.so")
    fn = lib.pose_graph_optimize
    fn.restype = ctypes.c_double
    fn.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.c_int, ctypes.c_double,
    ]
    return fn


def pose_graph_optimize(views, edges, z_rel, weights=None, iters: int = 10,
                        damping: float = 1e-6):
    """Refine keyframe poses with relative-pose constraints.

    Args:
      views: (K, 4, 4) row-convention view matrices (as used everywhere in
        this package; converted to/from column convention internally).
      edges: (E, 2) int array of keyframe index pairs (i, j).
      z_rel: (E, 4, 4) measured relative transforms
        ``X_i^{-1} X_j`` (column convention w2c... see below) — pass
        row-convention relatives ``view_j_rel`` and they are transposed too.
      weights: (E,) edge weights (default 1).
      iters / damping: Gauss-Newton iterations and LM damping.

    Returns:
      (refined views (K, 4, 4) row convention, final squared error).
      Pose 0 is the gauge (held fixed).
    """
    views = np.asarray(views, np.float64)
    k = views.shape[0]
    poses = np.ascontiguousarray(np.transpose(views, (0, 2, 1)))  # column conv
    edges = np.ascontiguousarray(np.asarray(edges, np.int32))
    zs = np.ascontiguousarray(
        np.transpose(np.asarray(z_rel, np.float64), (0, 2, 1)))
    e = edges.shape[0]
    if weights is None:
        weights = np.ones((e,), np.float64)
    weights = np.ascontiguousarray(np.asarray(weights, np.float64))

    fn = _posegraph_lib()
    err = fn(
        poses.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), k,
        edges.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        zs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        weights.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), e,
        int(iters), float(damping),
    )
    if err < 0:
        raise RuntimeError("pose_graph_optimize failed (singular system?)")
    return np.transpose(poses, (0, 2, 1)).astype(np.float32), float(err)


@functools.lru_cache()
def _rgbdio_lib():
    lib = _load("librgbdio.so")
    fn = lib.decode_rgbd_batch
    fn.restype = ctypes.c_int
    fn.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    return fn


def decode_rgbd_batch(rgb_paths, depth_paths, height: int, width: int,
                      depth_scale: float, n_threads: int = 8):
    """Decode a batch of (JPEG rgb, 16-bit PNG depth) frames in parallel.

    Returns (rgb [N,3,H,W] float32, depth [N,H,W] float32, n_ok).
    """
    n = len(rgb_paths)
    rgb = np.zeros((n, 3, height, width), np.float32)
    depth = np.zeros((n, height, width), np.float32)
    c_rgb = (ctypes.c_char_p * n)(*[p.encode() for p in rgb_paths])
    c_dep = (ctypes.c_char_p * n)(*[p.encode() for p in depth_paths])
    fn = _rgbdio_lib()
    ok = fn(
        c_rgb, c_dep, n, height, width, ctypes.c_float(depth_scale),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads,
    )
    return rgb, depth, ok
