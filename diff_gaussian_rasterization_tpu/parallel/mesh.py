"""Device-mesh helpers.

The reference is strictly single-GPU (SURVEY.md §2.3: no NCCL/MPI, no
multi-device anything).  All distribution here is new TPU-native design:
``jax.sharding.Mesh`` + ``shard_map``, with XLA collectives riding ICI.

Two scaling axes for Gaussian-splatting SLAM:

- ``tile``: shard the tile grid of one frame across devices (throughput for
  a single big render; per-Gaussian gradient rows psum over ICI).
- ``kf``: shard keyframes across devices during mapping (data parallel;
  Gaussian gradients psum).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(shape=None, axis_names=("kf", "tile"), devices=None) -> Mesh:
    """Build a mesh over the available devices.

    ``shape=None`` puts all devices on the last axis (pure tile-parallel
    with a singleton keyframe axis).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (1,) * (len(axis_names) - 1) + (n,)
    assert int(np.prod(shape)) == n, (shape, n)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def shard_map_fn(fn, mesh, in_specs, out_specs, check_rep=True):
    """Version-portable shard_map."""
    kw = {} if check_rep else {"check_vma": False}
    if hasattr(jax, "shard_map"):
        return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, **kw)
    from jax.experimental.shard_map import shard_map
    if not check_rep:
        kw = {"check_rep": False}
    return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                     **kw)
