"""Backend-agnostic inference driver.

The reference's ``inferenceModel`` loop (save schedule + guard, SURVEY.md
§3.3) generalized over any :class:`InferenceBackend`.  Backends without
per-token assignments (SVI) get MAP assignments derived from (φ, θ) for
``.tassign`` export.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Optional

import numpy as np

from ldagibbssampling_tpu.backends.base import InferenceBackend
from ldagibbssampling_tpu.config import LdaConfig
from ldagibbssampling_tpu.corpus.flat import FlatCorpus
from ldagibbssampling_tpu.lda_io.artifacts import save_iterated_model


def map_assignments(phi: np.ndarray, theta: np.ndarray, corpus: FlatCorpus) -> np.ndarray:
    """MAP topic per token: argmax_k φ[k, w_t]·θ[d_t, k]."""
    scores = theta[corpus.token_doc] * phi[:, corpus.token_word].T  # [T, K]
    return scores.argmax(axis=1).astype(np.int32)


def _assignments(backend: InferenceBackend, corpus: FlatCorpus) -> np.ndarray:
    z_fn = getattr(backend, "z", None)
    if callable(z_fn):
        return np.asarray(z_fn())
    return map_assignments(backend.phi(), backend.theta(), corpus)


def save_backend_model(
    backend: InferenceBackend,
    iteration: int,
    result_dir: str | Path,
    corpus: FlatCorpus,
    config: LdaConfig,
):
    return save_iterated_model(
        result_dir, iteration, backend.phi(), backend.theta(),
        _assignments(backend, corpus), corpus, config,
    )


def run_inference(
    backend: InferenceBackend,
    config: LdaConfig,
    corpus: FlatCorpus,
    result_dir: Optional[str | Path] = None,
    progress: Optional[Callable[[int], None]] = None,
) -> None:
    """The reference inference loop: sweep with the periodic save schedule."""
    if result_dir is not None:
        config.validate_reference_guard()
    for i in range(config.iteration):
        if (
            result_dir is not None
            and i >= config.begin_save_iters
            and (i - config.begin_save_iters) % config.save_step == 0
        ):
            save_backend_model(backend, i, result_dir, corpus, config)
        backend.sweep(1)
        if progress is not None:
            progress(i)
