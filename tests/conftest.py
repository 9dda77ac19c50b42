"""Test configuration: run everything on a virtual 8-device CPU mesh.

Tests are hermetic on CPU (the driver benches on the real TPU chip
separately).  float64 is enabled so the golden-fixture comparisons against the
reference's Float64 dumps hold to tight tolerances.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container's sitecustomize may have already imported jax and pinned the
# platform to the TPU tunnel; force the config back to hermetic CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
