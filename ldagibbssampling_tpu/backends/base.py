"""Backend protocol + factory.

Every backend exposes the same surface as the Gibbs ``LdaModel`` (sweep /
phi / theta / sweeps_done), so the driver, artifact writers, and evaluation
stack are backend-agnostic.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Protocol, runtime_checkable

import numpy as np

if TYPE_CHECKING:  # pragma: no cover
    from ldagibbssampling_tpu.config import LdaConfig
    from ldagibbssampling_tpu.corpus.flat import FlatCorpus


@runtime_checkable
class InferenceBackend(Protocol):
    def sweep(self, n: int = 1) -> None: ...
    def phi(self) -> np.ndarray: ...
    def theta(self) -> np.ndarray: ...

    @property
    def sweeps_done(self) -> int: ...


def _mesh_backend(config: "LdaConfig", corpus: "FlatCorpus") -> InferenceBackend:
    """Map ``config.mesh`` (axis -> size; -1 = all devices) onto a runtime.

    ``{"data": n}`` -> AD-LDA doc sharding; ``{"data": p, "vocab": q}`` ->
    the 2D grid; ``{"token": n}`` -> token sharding (giant-doc mode).
    """
    import jax
    import numpy as np

    spec = dict(config.mesh)
    n_dev = len(jax.devices())
    for k, v in spec.items():
        if v in (-1, 0):
            others = int(np.prod([x for kk, x in spec.items()
                                  if kk != k and x > 0]) or 1)
            spec[k] = max(1, n_dev // others)
    axes = frozenset(spec)
    if axes == {"data"}:
        from ldagibbssampling_tpu.parallel.adlda import ShardedLda

        return ShardedLda(config, corpus, num_shards=spec["data"])
    if axes == {"data", "vocab"}:
        from jax.sharding import Mesh

        from ldagibbssampling_tpu.parallel.grid import GridLda

        pd, pv = spec["data"], spec["vocab"]
        mesh = Mesh(np.array(jax.devices()[: pd * pv]).reshape(pd, pv),
                    ("data", "vocab"))
        return GridLda(config, corpus, mesh=mesh)
    if axes == {"token"}:
        from ldagibbssampling_tpu.parallel.tokenshard import TokenShardedLda

        return TokenShardedLda(config, corpus, num_shards=spec["token"])
    if axes == {"chain", "data"}:
        from ldagibbssampling_tpu.parallel.chaingrid import ShardedChainModel

        c = spec["chain"]
        if config.chains > 1 and config.chains != c:
            raise ValueError(
                f"--chains {config.chains} conflicts with mesh chain={c}")
        return ShardedChainModel(
            config, corpus, num_chains=c, num_shards=spec["data"])
    raise ValueError(
        f"unsupported mesh axes {sorted(spec)}; expected {{data}}, "
        "{data, vocab}, {token}, or {chain, data}"
    )


def make_backend(config: "LdaConfig", corpus: "FlatCorpus") -> InferenceBackend:
    """Construct the backend selected by ``config.backend`` (and, for the
    blocked Gibbs sampler, the parallel runtime selected by ``config.mesh``)."""
    if config.backend == "gibbs":
        if config.mesh and config.sampler == "blocked" and (
            config.chains == 1 or "chain" in config.mesh
        ):
            return _mesh_backend(config, corpus)
        if config.chains > 1 and config.sampler == "blocked":
            from ldagibbssampling_tpu.models.chains import MultiChainModel

            return MultiChainModel(config, corpus)
        from ldagibbssampling_tpu.models.lda import LdaModel

        return LdaModel(config, corpus)
    if config.backend == "cvb0":
        from ldagibbssampling_tpu.backends.cvb0 import Cvb0Model

        return Cvb0Model(config, corpus)
    if config.backend == "svi":
        from ldagibbssampling_tpu.backends.svi import SviModel

        return SviModel(config, corpus)
    if config.backend == "smc":
        from ldagibbssampling_tpu.backends.smc import SmcModel

        return SmcModel(config, corpus)
    if config.backend == "warp":
        from ldagibbssampling_tpu.backends.warp import WarpModel

        return WarpModel(config, corpus)
    raise ValueError(f"unknown backend {config.backend!r}")
