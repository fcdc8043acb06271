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
