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


def make_backend(config: "LdaConfig", corpus: "FlatCorpus") -> InferenceBackend:
    """Construct the backend selected by ``config.backend``."""
    if config.backend == "gibbs":
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
