"""Multi-host bring-up: ``jax.distributed`` initialization + global mesh.

SURVEY.md §2.3 (communication backend row): the reference is one JVM; the
TPU-native equivalent of "bring up the cluster" is ``jax.distributed
.initialize()`` on every host, after which ``jax.devices()`` spans the slice
and the existing ``shard_map`` runtimes (``adlda``/``grid``/``tokenshard``)
work unchanged — their collectives ride ICI within a slice and DCN across
slices, compiled by XLA from the same programs exercised in CI on the
virtual CPU mesh.

This box has one chip, so multi-host paths here are bring-up + topology
helpers with logic-only tests; the runtime classes they feed are the ones
already validated on the 8-device mesh.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence

import numpy as np


@dataclasses.dataclass(frozen=True)
class HostTopology:
    """This process's place in the cluster after bring-up."""

    process_index: int
    process_count: int
    local_device_count: int
    global_device_count: int


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> HostTopology:
    """Bring up JAX's multi-host runtime (idempotent, single-host no-op).

    On TPU pods the three arguments are auto-detected from the environment;
    pass them explicitly for CPU/GPU clusters.  Safe to call when already
    initialized or when running single-process (returns the local topology).
    """
    import jax

    multi = (
        (num_processes or 1) > 1
        or os.environ.get("JAX_NUM_PROCESSES", "")
        or coordinator_address
    )
    if multi:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        except RuntimeError as e:  # already initialized
            if "already" not in str(e).lower():
                raise
    return HostTopology(
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        local_device_count=jax.local_device_count(),
        global_device_count=jax.device_count(),
    )


def make_mesh(
    axis_sizes: dict[str, int],
    devices: Optional[Sequence] = None,
):
    """Build a named mesh over the (global) device list.

    ``axis_sizes`` maps axis name → size in declaration order, e.g.
    ``{"data": 4, "vocab": 2}``.  A size of ``-1`` on exactly one axis means
    "whatever is left" (like a reshape wildcard).  Axis order follows dict
    order; the product must equal the device count used.
    """
    import jax
    from jax.sharding import Mesh

    devs = list(devices if devices is not None else jax.devices())
    names = list(axis_sizes)
    sizes = [axis_sizes[n] for n in names]
    wild = [i for i, s in enumerate(sizes) if s == -1]
    if len(wild) > 1:
        raise ValueError("at most one axis may be -1")
    if wild:
        known = int(np.prod([s for s in sizes if s != -1])) or 1
        if len(devs) % known:
            raise ValueError(
                f"device count {len(devs)} not divisible by {known}"
            )
        sizes[wild[0]] = len(devs) // known
    total = int(np.prod(sizes)) if sizes else 1
    if total != len(devs):
        raise ValueError(
            f"mesh {dict(zip(names, sizes))} needs {total} devices, have {len(devs)}"
        )
    return Mesh(np.array(devs[:total]).reshape(sizes), tuple(names))


def mesh_from_config(config, devices: Optional[Sequence] = None):
    """Build the mesh described by ``LdaConfig.mesh`` (empty → 1D data mesh)."""
    import jax

    axes = dict(config.mesh) if config.mesh else {}
    if not axes:
        axes = {"data": len(devices) if devices is not None else jax.device_count()}
    return make_mesh(axes, devices)
