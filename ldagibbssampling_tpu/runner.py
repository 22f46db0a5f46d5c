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
from ldagibbssampling_tpu.evaluation.tracing import (
    MetricsLog, SweepTimer, block_on_backend)
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
    metrics: Optional["MetricsLog"] = None,
    metrics_every: int = 1,
    ll_every: int = 0,
    optimize_hyper_every: int = 0,
    checkpoint_dir: Optional[str | Path] = None,
    checkpoint_every: int = 0,
) -> None:
    """The reference inference loop: sweep with the periodic save schedule.

    Extensions over the reference (all opt-in, SURVEY.md §5):

    - ``metrics`` + ``ll_every``: throughput rows and (every ``ll_every``
      sweeps) training log-likelihood/perplexity into a JSONL sink.
      ``metrics_every`` sets the row cadence: 1 (default) logs every sweep but
      forces one device dispatch per sweep (~300 ms each on remote TPU
      platforms — can dominate a 20 ms sweep); N>1 lets the loop batch N
      sweeps per dispatch and logs chunk-averaged throughput; 0 never forces a
      boundary (rows only at save/checkpoint/hyper boundaries).
    - ``optimize_hyper_every``: Minka fixed-point (α, β) updates every N
      sweeps, for backends exposing ``optimize_hyperparameters``.
    - ``checkpoint_dir`` + ``checkpoint_every``: orbax checkpoints every N
      sweeps (backends exposing ``save_checkpoint``); the loop starts at the
      backend's ``sweeps_done``, so a restored backend resumes mid-schedule.
    """
    if result_dir is not None:
        config.validate_reference_guard()
    timer = SweepTimer(corpus.num_tokens)
    start = int(getattr(backend, "sweeps_done", 0))
    if metrics is not None:
        # one header row: the EFFECTIVE kernel tier (may be a logged
        # downgrade from config.use_pallas — SURVEY.md §5 config row)
        metrics.log(
            start, kernel_tier=getattr(backend, "kernel_tier", "n/a"),
            requested_tier=str(config.use_pallas), backend=config.backend,
        )

    def _boundary(i: int) -> bool:
        """Does anything on the schedule need to run right after sweep i?"""
        n = i + 1
        if result_dir is not None and n >= config.begin_save_iters and (
            (n - config.begin_save_iters) % config.save_step == 0
        ):
            return True
        if optimize_hyper_every > 0 and n % optimize_hyper_every == 0:
            return True
        if checkpoint_dir is not None and checkpoint_every > 0 and (
            n % checkpoint_every == 0
        ):
            return True
        if metrics is not None and metrics_every > 0 and n % metrics_every == 0:
            return True  # a metrics row is due after sweep i
        if metrics is not None and ll_every > 0 and n % ll_every == 0:
            return True  # LL / R̂(φ) row due (its own cadence)
        return False

    i = start
    while i < config.iteration:
        if (
            result_dir is not None
            and i >= config.begin_save_iters
            and (i - config.begin_save_iters) % config.save_step == 0
        ):
            save_backend_model(backend, i, result_dir, corpus, config)
        # batch sweeps up to the next schedule boundary: ONE device dispatch
        # (a shard_map executable launch costs ~300 ms on remote platforms;
        # see parallel/adlda.py) — stdout iteration lines are preserved
        chunk = 1
        while i + chunk < config.iteration and not _boundary(i + chunk - 1):
            nxt = i + chunk
            if result_dir is not None and nxt >= config.begin_save_iters and (
                (nxt - config.begin_save_iters) % config.save_step == 0
            ):
                break
            chunk += 1
        with timer:
            backend.sweep(chunk)
            if metrics is not None:
                # timed throughput must cover the COMPUTE, not the async
                # enqueue; without metrics, chunks stay fully pipelined
                block_on_backend(backend)
        i_last = i + chunk - 1  # schedule checks fire for the chunk's last sweep
        if (
            optimize_hyper_every > 0
            and (i_last + 1) % optimize_hyper_every == 0
            and hasattr(backend, "optimize_hyperparameters")
        ):
            backend.optimize_hyperparameters()
        if (
            checkpoint_dir is not None
            and checkpoint_every > 0
            and (i_last + 1) % checkpoint_every == 0
            and hasattr(backend, "save_checkpoint")
        ):
            backend.save_checkpoint(checkpoint_dir)
        if metrics is not None:
            # chunk-averaged throughput: `chunk` sweeps ran in one dispatch
            scalars = {
                "tokens_per_s": chunk * corpus.num_tokens
                / max(timer.times[-1], 1e-12),
            }
            if chunk > 1:
                scalars["sweeps_in_chunk"] = chunk
            if ll_every > 0 and (i_last + 1) % ll_every == 0:
                dev_ll = getattr(backend, "device_log_likelihood", None)
                if callable(dev_ll):
                    # chunked on-device path: constant host memory
                    ll = dev_ll()
                else:
                    from ldagibbssampling_tpu.evaluation.metrics import (
                        log_likelihood)

                    ll = log_likelihood(backend.phi(), backend.theta(), corpus)
                scalars["log_likelihood"] = ll
                if corpus.num_tokens:
                    scalars["perplexity"] = float(
                        np.exp(-ll / corpus.num_tokens)
                    )
            alpha = getattr(backend, "alpha", None)
            beta = getattr(backend, "beta", None)
            if alpha is not None:
                scalars["alpha"] = alpha
            if beta is not None:
                scalars["beta"] = beta
            r_hat_fn = getattr(backend, "r_hat", None)
            if callable(r_hat_fn):
                rh = r_hat_fn()
                if rh == rh:  # skip NaN (needs >= 4 recorded sweeps)
                    scalars["r_hat"] = rh
            if ll_every > 0 and (i_last + 1) % ll_every == 0:
                # topic-aligned R-hat(phi) p99 (BASELINE config 4) on the
                # LL cadence — the O(C*K*V) summary is not per-sweep cheap
                rhp_fn = getattr(backend, "r_hat_phi", None)
                if callable(rhp_fn):
                    p99 = rhp_fn().get("p99", float("nan"))
                    if p99 == p99:
                        scalars["r_hat_phi_p99"] = p99
            metrics.log(i_last, **scalars)
        if progress is not None:
            for j in range(i, i_last + 1):  # keep per-iteration stdout parity
                progress(j)
        i = i_last + 1
