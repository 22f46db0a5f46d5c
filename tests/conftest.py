"""Test configuration: force JAX onto CPU with 8 virtual devices.

Multi-chip sharding logic (mesh / shard_map / psum) is exercised without real
hardware via ``--xla_force_host_platform_device_count=8`` (SURVEY.md §4).  Must
run before jax is imported anywhere in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
