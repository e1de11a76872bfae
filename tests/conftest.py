"""Test configuration: force the CPU backend with 8 virtual devices so
single-chip numerics and multi-chip sharding are both testable without TPU
hardware (the driver separately dry-runs the multi-chip path)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
