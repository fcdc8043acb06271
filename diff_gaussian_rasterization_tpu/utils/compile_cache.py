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

import hashlib
import os

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def _host_fingerprint() -> str:
    """Short fingerprint of the host CPU's ISA features.

    XLA:CPU persists AOT-compiled machine code keyed only by the HLO; a
    cache directory reused on a host with DIFFERENT vector features loads
    code compiled for the other machine ("Machine type used for XLA:CPU
    compilation doesn't match ... could lead to execution errors such as
    SIGILL" — observed as a non-reproducible rc=139 in a long test run
    when the workspace moved containers between rounds).  Partitioning
    the cache per CPU-feature set makes a moved workspace start cold
    instead of crashy.
    """
    try:
        with open("/proc/cpuinfo") as f:
            parts = {}
            for line in f:
                key = line.split(":", 1)[0].strip()
                # flags alone are NOT enough: XLA's machine-type detection
                # (e.g. +prefer-no-gather for gather-mitigated Intel parts)
                # keys off cpuid model/microcode, which can differ between
                # two hosts with identical flag sets — observed as the
                # AOT-loader mismatch warning on entries from a same-flags
                # foreign container.  Fold the identity fields in too.
                if key in ("flags", "vendor_id", "cpu family", "model",
                           "stepping", "microcode", "model name"):
                    val = line.split(":", 1)[1].strip()
                    if key == "flags":
                        val = " ".join(sorted(val.split()))
                    parts.setdefault(key, val)
            if parts:
                blob = "|".join(f"{k}={v}" for k, v in sorted(parts.items()))
                return hashlib.sha1(blob.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform
    return hashlib.sha1(platform.processor().encode()).hexdigest()[:10]


def enable_compile_cache(path: str | None = None,
                         partition_by_host: bool = False) -> str:
    """Point JAX's persistent compilation cache at ``path`` and return it.

    Resolution order: explicit argument, ``DGR_TPU_CACHE_DIR`` env var,
    ``<repo>/.jax_cache`` next to the package.  Caching every executable
    (min compile time 0) is right for this workload: even the small
    helper graphs re-appear across bench/profiling/SLAM processes.

    ``partition_by_host=True`` suffixes the directory with the host's
    CPU-feature fingerprint — REQUIRED for XLA:CPU caches (the CPU test
    mesh), whose entries are AOT machine code for the compiling host; TPU
    caches store device executables and stay shared across hosts.
    """
    import jax

    path = path or os.environ.get("DGR_TPU_CACHE_DIR") or _DEFAULT
    if partition_by_host:
        path = os.path.join(path, _host_fingerprint())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return path
