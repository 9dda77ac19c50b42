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

import gc  # noqa: E402

import jax  # noqa: E402
import pytest  # noqa: E402

# The container's sitecustomize may have already imported jax and pinned the
# platform to the TPU tunnel; force the config back to hermetic CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(autouse=True, scope="module")
def _release_jit_mappings():
    """Unmap XLA:CPU JIT code between test modules.

    Every compiled executable holds several memory mappings; a full-suite
    run accumulates enough distinct programs (~2k maps/min measured) to
    cross ``vm.max_map_count`` (65530), at which point mmap fails inside
    the compiler and the process segfaults -- deterministically, ~20 min
    in.  ``jax.clear_caches()`` releases the mappings (measured: 1367 ->
    479 after clearing 300 compiles); jitted functions recompile on next
    use, so per-module clearing trades a little recompilation for a
    bounded map count.
    """
    yield
    jax.clear_caches()
    gc.collect()
