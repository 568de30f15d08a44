"""Test configuration: force CPU with 8 virtual devices.

Multi-host / multi-chip logic is exercised on a virtual 8-device CPU mesh
(the TPU substitute for "multi-node without a real cluster"); unit tests also
run on CPU to keep the suite fast and hermetic.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
