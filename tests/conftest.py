import os

# Tests run on a virtual 8-device CPU mesh; the real TPU is reserved for
# bench.py.  XLA_FLAGS must be set before the CPU backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU backend and sets
# jax_platforms="axon,cpu"; pin tests to CPU regardless.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache for the CPU test mesh: the heavy equivalence
# tests are compile-dominated (sharded SLAM graphs, Pallas-interpret
# kernels), so warm re-runs of the suite drop from ~15 min to a few
# minutes.  Separate directory from the TPU bench cache to keep the two
# backends' artifacts distinguishable on disk.
from diff_gaussian_rasterization_tpu.utils.compile_cache import (  # noqa: E402
    enable_compile_cache,
)

# partition_by_host: XLA:CPU cache entries are AOT machine code compiled
# for a SPECIFIC host CPU; this workspace moves between containers across
# rounds, and loading another host's entries warns "could lead to
# execution errors such as SIGILL" (the likely cause of the one
# non-reproducible rc=139 in a round-4 test run)
enable_compile_cache(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache_cpu"), partition_by_host=True)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound in-process executable accumulation across the long suite.

    Full-suite runs (~45 min, 100+ tests, one process) have segfaulted
    twice inside the persistent-cache READ path
    (jax compilation_cache.get_executable_and_time deserializing an
    entry that loads FINE in isolation) — a process-state-dependent
    crash in jaxlib, not a bad cache entry and not memory pressure
    (125 GB free at crash time).  Dropping the in-memory executable
    caches between modules keeps the live-executable population small;
    re-compiles stay cheap because the persistent cache serves them.
    """
    yield
    jax.clear_caches()
