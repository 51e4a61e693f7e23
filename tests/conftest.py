"""Test harness config: force CPU with 8 virtual devices so sharding tests
run without TPU hardware (the multi-node-without-a-cluster analog of the
reference's localhost SDRdaemon loopback, SURVEY.md §4).

The container's sitecustomize imports jax and registers the TPU backend
before pytest starts, so plain env vars are too late — switch the platform
through jax.config instead (works because backends initialize lazily).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if not os.environ.get("SDRANGEL_TPU_TEST_ON_TPU"):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    # persistent jit cache: most suite wall clock is XLA compiles of shapes
    # that never change between runs (VERDICT r1 "what's weak" #3)
    cache_dir = os.environ.get(
        "SDRANGEL_TPU_JIT_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.25)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
