"""Test configuration: force CPU with 8 virtual devices.

Multi-host / multi-chip logic is exercised on a virtual 8-device CPU mesh
(the TPU substitute for "multi-node without a real cluster"); unit tests also
run on CPU to keep the suite fast and hermetic.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"   # override a preset accelerator platform
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon TPU plugin force-registers itself via sitecustomize and overrides
# JAX_PLATFORMS; the config knob below wins after registration.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/sassd_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
