"""Test config: force CPU backend with a virtual 8-device mesh and x64.

Multi-chip sharding is validated on a virtual CPU mesh (the standard way to
test pod-slice code without a pod); parity math runs in x64 so int truncation
points match the reference's Python arithmetic exactly.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
