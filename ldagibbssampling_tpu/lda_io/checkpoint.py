"""Checkpoint / resume of the full sampler state via orbax.

The reference has NO resume path — ``saveIteratedModel`` dumps text artifacts
(``z`` lands in ``.tassign``) that are never re-read (SURVEY.md §5).  This is
the new-framework obligation: the complete ``SamplerState`` pytree
``(z, ndk, nwk, nk, key, sweep)`` round-trips losslessly, so a killed run
resumes the *identical* chain (kill-and-resume reproduces the uninterrupted
trajectory — tested in tests/test_checkpoint.py).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import numpy as np

from ldagibbssampling_tpu.models.state import SamplerState


def _manager(directory: str | Path, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        Path(directory).absolute(),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(directory: str | Path, state: SamplerState, *, max_to_keep: int = 3) -> int:
    """Save ``state`` at step ``state.sweep``; returns the step saved."""
    import orbax.checkpoint as ocp

    step = int(state.sweep)
    with _manager(directory, max_to_keep) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()
    return step


def latest_step(directory: str | Path) -> Optional[int]:
    import orbax.checkpoint as ocp

    d = Path(directory)
    if not d.exists():
        return None
    with _manager(d) as mgr:
        return mgr.latest_step()


def restore_checkpoint(
    directory: str | Path,
    like: SamplerState,
    step: Optional[int] = None,
) -> SamplerState:
    """Restore a state with the same structure/shapes as ``like``."""
    import orbax.checkpoint as ocp

    with _manager(directory) as mgr:
        if step is None:
            step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint found under {directory}")
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), like
        )
        return mgr.restore(step, args=ocp.args.StandardRestore(abstract))


# ---------------------------------------------------------------------------
# Full-run checkpoints: sampler state + live hyperparameters.
# SURVEY.md §5 names the checkpoint unit "(z, nwk, ndk, nk, rng_key,
# sweep_idx, α, β)" — α/β became live values once Minka optimization landed.


def save_run(
    directory: str | Path,
    state: SamplerState,
    alpha: float,
    beta: float,
    *,
    max_to_keep: int = 3,
) -> int:
    """Save the sampler state plus live (α, β); returns the step saved."""
    import orbax.checkpoint as ocp

    step = int(state.sweep)
    with _manager(directory, max_to_keep) as mgr:
        mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                hyper=ocp.args.JsonSave({"alpha": float(alpha), "beta": float(beta)}),
            ),
        )
        mgr.wait_until_finished()
    return step


def restore_run(
    directory: str | Path,
    like: SamplerState,
    step: Optional[int] = None,
) -> tuple[SamplerState, float, float]:
    """Restore ``(state, alpha, beta)`` saved by :func:`save_run`."""
    import orbax.checkpoint as ocp

    with _manager(directory) as mgr:
        if step is None:
            step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint found under {directory}")
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), like
        )
        out = mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract),
                hyper=ocp.args.JsonRestore(),
            ),
        )
    return out["state"], float(out["hyper"]["alpha"]), float(out["hyper"]["beta"])


# ---------------------------------------------------------------------------
# Mesh-runtime checkpoints: the sharded runtimes (parallel/adlda.py, grid.py,
# tokenshard.py) hold their state as a dict of (possibly sharded) arrays
# rather than a SamplerState.  Orbax handles sharded jax.Arrays natively; the
# restore rebuilds each array with ITS CURRENT sharding (resume on the same
# topology — elastic resharding is a documented non-goal, docs/PARALLELISM.md).


def save_mesh_run(
    directory: str | Path,
    arrays: dict,
    alpha: float,
    beta: float,
    step: int,
    *,
    max_to_keep: int = 3,
) -> int:
    """Save a dict of (sharded) arrays plus live (α, β) at ``step``."""
    import orbax.checkpoint as ocp

    with _manager(directory, max_to_keep) as mgr:
        mgr.save(
            int(step),
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(arrays),
                hyper=ocp.args.JsonSave({"alpha": float(alpha), "beta": float(beta)}),
            ),
        )
        mgr.wait_until_finished()
    return int(step)


def restore_mesh_run(
    directory: str | Path,
    like: dict,
    step: Optional[int] = None,
) -> tuple[dict, float, float]:
    """Restore ``(arrays, alpha, beta)`` saved by :func:`save_mesh_run`.

    ``like`` supplies shapes, dtypes AND shardings — each restored array lands
    directly with the runtime's current ``NamedSharding``.
    """
    import orbax.checkpoint as ocp

    with _manager(directory) as mgr:
        if step is None:
            step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint found under {directory}")

        def _abstract(x):
            sharding = getattr(x, "sharding", None)
            return jax.ShapeDtypeStruct(np.shape(x), x.dtype, sharding=sharding)

        out = mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(jax.tree.map(_abstract, like)),
                hyper=ocp.args.JsonRestore(),
            ),
        )
    return out["state"], float(out["hyper"]["alpha"]), float(out["hyper"]["beta"])


# ---------------------------------------------------------------------------
# Generic backend checkpoints: the variational backends (backends/cvb0.py,
# backends/svi.py) carry state that is neither a SamplerState nor sharded —
# a dict of dense arrays plus backend-specific scalars (step counters, host
# RNG state).  Arrays go through orbax StandardSave; scalars ride in a JSON
# blob.  Round-4 verdict item 8: config-5-scale SVI runs are exactly the runs
# long enough to need resume.


def save_backend_run(
    directory: str | Path,
    arrays: dict,
    meta: dict,
    step: int,
    *,
    max_to_keep: int = 3,
) -> int:
    """Save a dict of arrays plus a JSON-serializable ``meta`` at ``step``."""
    import orbax.checkpoint as ocp

    with _manager(directory, max_to_keep) as mgr:
        mgr.save(
            int(step),
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(arrays),
                meta=ocp.args.JsonSave(meta),
            ),
        )
        mgr.wait_until_finished()
    return int(step)


def restore_backend_run(
    directory: str | Path,
    like: dict,
    step: Optional[int] = None,
) -> tuple[dict, dict]:
    """Restore ``(arrays, meta)`` saved by :func:`save_backend_run`.

    ``like`` supplies shapes/dtypes (device or numpy arrays both work).
    """
    import orbax.checkpoint as ocp

    with _manager(directory) as mgr:
        if step is None:
            step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint found under {directory}")
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), like
        )
        out = mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract),
                meta=ocp.args.JsonRestore(),
            ),
        )
    return out["state"], dict(out["meta"])
