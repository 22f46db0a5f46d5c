"""TPU-native topic-model inference engine.

A brand-new framework with the capabilities of ``qianjinding/LDAGibbsSampling``
(a pure-Java, single-threaded collapsed-Gibbs LDA sampler; see SURVEY.md for the
structural analysis of the reference), re-designed TPU-first:

- the serial per-token resampling loop (``LdaModel.sampleTopicZ`` in
  ``src/liuyang/nlp/lda/main/LdaModel.java``) becomes a vectorized blocked-Gibbs
  sweep (``ops/``) with a fused Pallas kernel on TPU;
- documents shard across chips AD-LDA style with the global word-topic count
  matrix reconciled by ``psum`` over the mesh (``parallel/``);
- additional CVB0 / SVI / SMC / WarpLDA-MH backends (``backends/``), held-out
  perplexity and R-hat diagnostics (``evaluation/``), orbax checkpointing and
  reference-format artifact export (``lda_io/``);
- a native C++ corpus-ingest tier (``native/ldacorpus.cc`` via
  ``corpus/native.py``; 15x the Python pipeline, automatic fallback).

Public symbols are re-exported lazily so subpackages remain importable while the
framework grows (and so importing the root does not pull in jax for pure-corpus
use).
"""

from __future__ import annotations

import importlib
from typing import Any

__version__ = "0.2.0"

# symbol -> submodule that defines it (resolved lazily via PEP 562 __getattr__)
_EXPORTS = {
    "LdaConfig": "ldagibbssampling_tpu.config",
    "Documents": "ldagibbssampling_tpu.corpus.documents",
    "Document": "ldagibbssampling_tpu.corpus.documents",
    "FlatCorpus": "ldagibbssampling_tpu.corpus.flat",
    "SamplerState": "ldagibbssampling_tpu.models.state",
    "LdaModel": "ldagibbssampling_tpu.models.lda",
    "OracleSampler": "ldagibbssampling_tpu.models.oracle",
    "JavaRandom": "ldagibbssampling_tpu.utils.javarandom",
    "ChainSet": "ldagibbssampling_tpu.models.chains",
    "MultiChainModel": "ldagibbssampling_tpu.models.chains",
    "ShardedLda": "ldagibbssampling_tpu.parallel.adlda",
    "GridLda": "ldagibbssampling_tpu.parallel.grid",
    "TokenShardedLda": "ldagibbssampling_tpu.parallel.tokenshard",
    "make_backend": "ldagibbssampling_tpu.backends.base",
    "InferenceBackend": "ldagibbssampling_tpu.backends.base",
    "run_inference": "ldagibbssampling_tpu.runner",
    "WarpModel": "ldagibbssampling_tpu.backends.warp",
    "read_docs_flat": "ldagibbssampling_tpu.corpus.native",
    "write_minicorpus": "ldagibbssampling_tpu.data",
}

__all__ = sorted(_EXPORTS) + ["__version__"]


def __getattr__(name: str) -> Any:
    mod = _EXPORTS.get(name)
    if mod is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    return getattr(importlib.import_module(mod), name)


def __dir__() -> list[str]:
    return __all__
