"""TPU-native topic-model inference engine.

A brand-new framework with the capabilities of ``qianjinding/LDAGibbsSampling``
(a pure-Java, single-threaded collapsed-Gibbs LDA sampler; see SURVEY.md for the
structural analysis of the reference), re-designed TPU-first:

- the serial per-token resampling loop (``LdaModel.sampleTopicZ`` in
  ``src/liuyang/nlp/lda/main/LdaModel.java``) becomes a vectorized blocked-Gibbs
  sweep (``ops/``) with an optional fused Pallas kernel;
- documents shard across chips AD-LDA style with the global word-topic count
  matrix reconciled by ``psum`` over the mesh (``parallel/``);
- additional CVB0 / SVI / SMC backends (``backends/``), held-out perplexity and
  R-hat diagnostics (``evaluation/``), orbax checkpointing and reference-format
  artifact export (``io/``).
"""

from ldagibbssampling_tpu.config import LdaConfig
from ldagibbssampling_tpu.corpus import Documents, FlatCorpus
from ldagibbssampling_tpu.models import LdaModel, SamplerState

__version__ = "0.1.0"

__all__ = [
    "LdaConfig",
    "Documents",
    "FlatCorpus",
    "LdaModel",
    "SamplerState",
    "__version__",
]
