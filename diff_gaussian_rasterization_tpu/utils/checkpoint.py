"""Checkpoint/resume for the Gaussian map + trajectory (orbax).

The reference is a stateless op library with no persistence (SURVEY.md §5);
in a SLAM system the map pytree and keyframe poses are the state worth
saving.  Orbax handles sharded arrays transparently, so the same API works
for multi-host maps.
"""

from __future__ import annotations

import jax


def _ckpt():
    import orbax.checkpoint as ocp
    return ocp


def save(path: str, model, est_views=None, kf_views=None, step: int = 0):
    ocp = _ckpt()
    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
        payload = {"model": model, "step": step}
        if est_views is not None:
            payload["est_views"] = list(est_views)
        if kf_views is not None:
            payload["kf_views"] = list(kf_views)
        ckptr.save(path, payload, force=True)


def restore(path: str, model_like):
    """Restore; `model_like` provides the pytree structure/dtypes."""
    import dataclasses

    ocp = _ckpt()
    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
        restored = ckptr.restore(path)
    m = restored["model"]
    if dataclasses.is_dataclass(model_like) and isinstance(m, dict):
        # orbax round-trips dataclasses as name-keyed dicts whose
        # (alphabetical) leaf order differs from the field order — match by
        # name, never by position
        model = dataclasses.replace(model_like, **m)
    else:
        model = jax.tree.unflatten(
            jax.tree.structure(model_like), jax.tree.leaves(m)
        )
    return model, restored
