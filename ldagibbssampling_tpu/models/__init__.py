"""Model layer: sampler state, the serial Java-fidelity oracle, and the
TPU LDA model (reference: ``main/LdaModel.java``)."""

from ldagibbssampling_tpu.models.oracle import OracleSampler
from ldagibbssampling_tpu.models.state import SamplerState, init_state

__all__ = ["OracleSampler", "SamplerState", "init_state"]


def __getattr__(name):  # lazy: LdaModel pulls in jax sweep machinery
    if name == "LdaModel":
        from ldagibbssampling_tpu.models.lda import LdaModel

        return LdaModel
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
