"""High-level LDA model: the reference's driver flow on the TPU engine.

Reference: ``LdaModel`` + ``LdaGibbsSampling.main`` (``src/liuyang/nlp/lda/
main/``, SURVEY.md §3.1–§3.4).  ``LdaModel`` here owns corpus + config + device
state and reproduces the reference control flow:

    initialize (random topics, count tables)            initializeModel :~55
    sweep loop with periodic artifact saves             inferenceModel  :~100
    final artifact dump                                 saveIteratedModel :~190

The hot loop runs as the blocked-Gibbs device sweep (``ops/gibbs.py``), jitted
once and reused; the serial ``sampler="serial"`` mode runs the Java-fidelity
host oracle instead (bit-stable chain for parity work).
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from ldagibbssampling_tpu.config import LdaConfig
from ldagibbssampling_tpu.corpus.flat import FlatCorpus
from ldagibbssampling_tpu.lda_io.artifacts import save_iterated_model
from ldagibbssampling_tpu.models import state as state_lib
from ldagibbssampling_tpu.models.oracle import OracleSampler


class LdaModel:
    """Collapsed-Gibbs LDA over a flat corpus (single chain, single device)."""

    def __init__(self, config: LdaConfig, corpus: FlatCorpus) -> None:
        self.config = config
        self.corpus = corpus
        self.doc_lengths = corpus.doc_lengths()
        self._oracle: Optional[OracleSampler] = None
        # live hyperparameters (start at config; Minka optimization moves them)
        self.alpha = float(config.alpha)
        self.beta = float(config.beta)

        if config.sampler == "serial":
            self._oracle = OracleSampler(
                corpus, config.topic_num, config.alpha, config.beta, seed=config.seed
            )
            self.state = None
            self._run_sweeps = None
            self.kernel_tier = "serial-oracle"
        else:
            block = max(1, min(config.block_size, max(1, corpus.num_tokens)))
            self.block_size = block
            use_pallas = config.use_pallas
            if config.draw_method != "gumbel" and use_pallas in ("fused", "deferred"):
                use_pallas = False  # fidelity draws use the XLA inverse-CDF path
            self._perm = None
            self._plan = None
            if use_pallas == "deferred" and block >= 128:
                # v3 layout: stripe-aligned blocks + per-sweep MXU rebuild
                # (ops/count_kernel.plan_deferred); slot i holds real token
                # plan.perm[i] (-1 = padding)
                from ldagibbssampling_tpu.ops.count_kernel import plan_deferred
                from ldagibbssampling_tpu.ops.gibbs import warn_tier_downgrade

                try:
                    self._plan = plan_deferred(
                        corpus.token_word, corpus.token_doc,
                        corpus.vocab_size, block,
                    )
                except ValueError as e:  # e.g. no multiple-of-8 tile
                    warn_tier_downgrade("deferred", "fused", str(e))
                    use_pallas = "fused"
            if self._plan is not None:
                from ldagibbssampling_tpu.corpus.flat import PaddedCorpus

                pc = PaddedCorpus(
                    token_word=self._plan.token_word,
                    token_doc=self._plan.token_doc,
                    token_mask=self._plan.token_mask,
                    num_real_tokens=corpus.num_tokens,
                    vocab_size=corpus.vocab_size,
                    num_docs=corpus.num_docs,
                )
            else:
                pc = corpus.pad_to(block)
                if config.sort_blocks and block > 1:
                    # statistically-free reorder: within-block word sort enables
                    # the sorted-scatter fast path (PaddedCorpus.sort_within_blocks)
                    pc, self._perm = pc.sort_within_blocks(block)
            self._padded = pc
            self.state = state_lib.init_state(
                pc.token_word, pc.token_doc, pc.token_mask,
                num_docs=pc.num_docs, vocab_size=pc.vocab_size,
                num_topics=config.topic_num, seed=config.seed,
            )
            from ldagibbssampling_tpu.ops.gibbs import make_sweep_fn

            self._run_sweeps = make_sweep_fn(
                pc.token_word, pc.token_doc, pc.token_mask, self.doc_lengths,
                alpha=config.alpha, beta=config.beta, block_size=block,
                draw_method=config.draw_method, num_sweeps=1,
                use_pallas=use_pallas,
                pallas_interpret=bool(getattr(config, "pallas_interpret",
                                              False)),
                sorted_words=self._perm is not None,
                num_topics=config.topic_num,
                deferred_plan=self._plan,
                kernel_compute_dtype=getattr(
                    config, "kernel_compute_dtype", "float32"),
                mirror_dtype=getattr(config, "mirror_dtype", "bfloat16"),
            )
            self.kernel_tier = getattr(self._run_sweeps, "kernel_tier", "xla")

    # ------------------------------------------------------------------
    def sweep(self, n: int = 1) -> None:
        if self._oracle is not None:
            self._oracle.sweep(n)
            return
        with_mirror = getattr(self._run_sweeps, "with_mirror", None)
        if with_mirror is not None:
            # deferred tier: the whole batch is ONE in-compilation dispatch
            # (traced trip count), with the rebuild kernel's ride-along bf16
            # gather snapshot carried ACROSS sweep() calls — only the very
            # first sweep (or the first after a checkpoint restore) pays the
            # [V, K] pad+cast as its own dispatch
            mirror = getattr(self, "_mirror", None)
            self.state, self._mirror = with_mirror(
                self.state, self.alpha, self.beta, mirror, n_sweeps=n)
            return
        # XLA/fused tiers: the whole batch as one dispatch (traced bound)
        self.state = self._run_sweeps(
            self.state, self.alpha, self.beta, n_sweeps=jnp.int32(n))

    def optimize_hyperparameters(self, iters: int = 5) -> tuple[float, float]:
        """Minka fixed-point update of (α, β) from the current count tables
        (``models/hyper.py``; no reference analog — SURVEY.md §8.4).  The
        updated values flow into subsequent sweeps as traced scalars, so this
        never recompiles the sweep.  Not supported in serial-oracle mode
        (the oracle is the Java-fidelity chain; the reference never adapts)."""
        if self._oracle is not None:
            raise NotImplementedError(
                "hyperparameter optimization requires the device sampler"
            )
        from ldagibbssampling_tpu.models.hyper import optimize_alpha, optimize_beta

        self.alpha = float(
            optimize_alpha(self.state.ndk, jnp.asarray(self.doc_lengths),
                           self.alpha, iters=iters)
        )
        self.beta = float(
            optimize_beta(self.state.nwk, self.state.nk, self.beta, iters=iters)
        )
        return self.alpha, self.beta

    @property
    def sweeps_done(self) -> int:
        if self._oracle is not None:
            return self._oracle.sweep_idx
        return int(self.state.sweep)

    # ------------------------------------------------------------------
    def phi(self) -> np.ndarray:
        if self._oracle is not None:
            return self._oracle.phi()
        phi, _ = state_lib.phi_theta(
            self.state, self.doc_lengths, self.alpha, self.beta
        )
        return np.asarray(phi)

    def theta(self) -> np.ndarray:
        if self._oracle is not None:
            return self._oracle.theta()
        _, theta = state_lib.phi_theta(
            self.state, self.doc_lengths, self.alpha, self.beta
        )
        return np.asarray(theta)

    def z(self) -> np.ndarray:
        """Topic assignments of the real (unpadded) tokens, corpus order."""
        if self._oracle is not None:
            return self._oracle.z.copy()
        z = np.asarray(self.state.z)
        if self._plan is not None:
            # deferred layout: slot i holds real token plan.perm[i] (-1 = pad)
            valid = self._plan.perm >= 0
            z_orig = np.empty(self.corpus.num_tokens, dtype=z.dtype)
            z_orig[self._plan.perm[valid]] = z[valid]
            return z_orig
        if self._perm is not None:
            # device z lives in block-sorted space; map back to corpus order
            z_orig = np.empty_like(z)
            z_orig[self._perm] = z
            z = z_orig
        return z[: self.corpus.num_tokens]

    def check_counts_consistent(self) -> None:
        """Recompute all count tables serially from ``z`` and assert bitwise
        equality with the device tables (SURVEY.md §5 race-detection analog;
        same contract as the mesh runtimes')."""
        if self.state is None:
            return  # the serial oracle maintains its own invariant checks
        pc = self._padded
        mask = pc.token_mask.astype(bool)
        z = np.asarray(self.state.z)
        k = self.config.topic_num
        ndk_ref = np.zeros((pc.num_docs, k), np.int64)
        nwk_ref = np.zeros((pc.vocab_size, k), np.int64)
        np.add.at(ndk_ref, (pc.token_doc[mask], z[mask]), 1)
        np.add.at(nwk_ref, (pc.token_word[mask], z[mask]), 1)
        np.testing.assert_array_equal(np.asarray(self.state.ndk), ndk_ref)
        np.testing.assert_array_equal(np.asarray(self.state.nwk), nwk_ref)
        np.testing.assert_array_equal(np.asarray(self.state.nk),
                                      nwk_ref.sum(axis=0))

    def device_log_likelihood(self) -> float:
        """Training LL computed on device in token chunks (constant host
        memory; ``evaluation/device_metrics.py``) — the ``--ll-every`` fast
        path at corpus sizes where host ``theta[td]`` would not fit."""
        if self.state is None:
            raise NotImplementedError("serial-oracle mode has no device state")
        from ldagibbssampling_tpu.evaluation.device_metrics import (
            device_log_likelihood)

        pc = self._padded
        return device_log_likelihood(
            self.state.ndk, self.state.nwk, self.state.nk,
            pc.token_word, pc.token_doc, pc.token_mask, self.doc_lengths,
            self.alpha, self.beta,
        )

    # ------------------------------------------------------------------
    def save_checkpoint(self, directory: str | Path) -> int:
        """Orbax checkpoint of the full run (state + live α/β)."""
        if self.state is None:
            raise NotImplementedError("serial-oracle mode has no device state")
        from ldagibbssampling_tpu.lda_io.checkpoint import save_run

        return save_run(directory, self.state, self.alpha, self.beta)

    def restore_checkpoint(self, directory: str | Path) -> int:
        """Resume from the latest checkpoint; returns the restored sweep index."""
        if self.state is None:
            raise NotImplementedError("serial-oracle mode has no device state")
        from ldagibbssampling_tpu.lda_io.checkpoint import restore_run

        self.state, self.alpha, self.beta = restore_run(directory, self.state)
        self._mirror = None  # bf16 gather snapshot is stale after a restore
        return int(self.state.sweep)

    # ------------------------------------------------------------------
    def save_iterated_model(self, iteration: int, result_dir: str | Path):
        """Dump the five reference artifacts (``saveIteratedModel``)."""
        return save_iterated_model(
            result_dir, iteration, self.phi(), self.theta(), self.z(),
            self.corpus, self.config,
        )

    def inference(
        self,
        result_dir: Optional[str | Path] = None,
        progress: Optional[Callable[[int], None]] = None,
    ) -> None:
        """The reference's ``inferenceModel`` loop, including the save schedule.

        Saves happen when ``i >= beginSaveIters`` and ``(i - beginSaveIters) %
        saveStep == 0`` (only when ``result_dir`` is given); the reference's
        ``iterations < saveStep + beginSaveIters`` hard-exit guard is enforced
        as a ValueError in that case.
        """
        cfg = self.config
        if result_dir is not None:
            cfg.validate_reference_guard()
        for i in range(cfg.iteration):
            if (
                result_dir is not None
                and i >= cfg.begin_save_iters
                and (i - cfg.begin_save_iters) % cfg.save_step == 0
            ):
                self.save_iterated_model(i, result_dir)
            self.sweep(1)
            if progress is not None:
                progress(i)
