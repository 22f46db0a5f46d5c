"""Test configuration: force JAX onto CPU with 8 virtual devices.

Multi-chip sharding logic (mesh / shard_map / psum) is exercised without real
hardware via 8 virtual CPU devices (SURVEY.md §4).

Note: this environment's ``sitecustomize`` imports jax at interpreter startup
with ``JAX_PLATFORMS=axon`` (remote TPU tunnel), so env vars set here are too
late — every jit would become a remote compile.  ``jax.config.update`` still
works because backends initialize lazily at first use.
"""

import os

# XLA_FLAGS is read at CPU-client init (lazy), so this still takes effect.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
