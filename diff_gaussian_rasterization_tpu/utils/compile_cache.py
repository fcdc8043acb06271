"""Persistent XLA compilation cache setup.

Large render graphs (the Pallas fwd+bwd core under a scanned optimizer
step) take minutes to compile on a TPU backend; the persistent cache
brings warm-process startup down to seconds.  The reference has no
analogue — its CUDA kernels are AOT-compiled by nvcc at install time
(setup.py:17-35); the JAX equivalent of "install-time compilation" is
exactly this cache, warmed by running the benchmark once.

Call :func:`enable_compile_cache` before the first ``jit`` compilation
(config flags are read at first-compile time).
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compile_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``path`` and return it.

    Resolution order: explicit argument, ``DGR_TPU_CACHE_DIR`` env var,
    ``<repo>/.jax_cache`` next to the package.  Caching every executable
    (min compile time 0) is right for this workload: even the small
    helper graphs re-appear across bench/profiling/SLAM processes.
    """
    import jax

    path = path or os.environ.get("DGR_TPU_CACHE_DIR") or _DEFAULT
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return path
