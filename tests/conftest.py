"""Test config: force CPU backend with a virtual 8-device mesh and x64.

Multi-chip sharding is validated on a virtual CPU mesh (the standard way to
test pod-slice code without a pod); parity math runs in x64 so int truncation
points match the reference's Python arithmetic exactly.

NOTE: this environment pre-imports jax from a site hook, so XLA_FLAGS /
JAX_PLATFORMS env vars set here are too late — the jax.config API still works
because no backend has been initialized yet.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
