"""Multi-chain runner: independent Gibbs chains with R̂ convergence tracking.

The reference runs exactly one chain (SURVEY.md §2.3); BASELINE.json config 4
requires "4 parallel chains, R-hat on φ".  Chains are embarrassingly parallel:
the chain axis is a leading ``vmap`` dimension over ``SamplerState`` (token
arrays shared), so on a mesh the same program shards the chain axis with a
``NamedSharding(('chain',))`` — XLA partitions the vmapped program with zero
collectives between chains.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ldagibbssampling_tpu.config import LdaConfig
from ldagibbssampling_tpu.corpus.flat import FlatCorpus
from ldagibbssampling_tpu.evaluation.diagnostics import r_hat
from ldagibbssampling_tpu.models import state as state_lib
from ldagibbssampling_tpu.models.state import SamplerState
from ldagibbssampling_tpu.ops.gibbs import gibbs_sweep


class ChainSet:
    """N independent chains advanced in lockstep via vmap."""

    def __init__(
        self,
        config: LdaConfig,
        corpus: FlatCorpus,
        num_chains: Optional[int] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
    ) -> None:
        self.config = config
        self.corpus = corpus
        self.num_chains = num_chains or max(1, config.chains)
        block = max(1, min(config.block_size, max(1, corpus.num_tokens)))
        self.block_size = block
        pc = corpus.pad_to(block)
        self._padded = pc
        self.doc_lengths = corpus.doc_lengths()

        states = [
            state_lib.init_state(
                pc.token_word, pc.token_doc, pc.token_mask,
                num_docs=pc.num_docs, vocab_size=pc.vocab_size,
                num_topics=config.topic_num, seed=config.seed + c,
            )
            for c in range(self.num_chains)
        ]
        self.states: SamplerState = jax.tree.map(
            lambda *xs: jnp.stack(xs), *states
        )
        if mesh is not None:
            sharding = jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec("chain")
            )
            self.states = jax.tree.map(
                lambda x: jax.device_put(x, sharding), self.states
            )

        tw = jnp.asarray(pc.token_word)
        td = jnp.asarray(pc.token_doc)
        tm = jnp.asarray(pc.token_mask)
        dl = jnp.asarray(self.doc_lengths)
        cfg = config

        @jax.jit
        def run(states: SamplerState, n_sweeps: jax.Array) -> SamplerState:
            def one(s):
                return gibbs_sweep(
                    s, tw, td, tm, dl,
                    alpha=cfg.alpha, beta=cfg.beta, block_size=block,
                    draw_method=cfg.draw_method,
                )

            def one_sweep(_, sts):
                return jax.vmap(one)(sts)

            # traced bound: a batch of sweeps is ONE dispatch (per-call
            # dispatch on the remote-TPU platform costs ~0.3 s; unbatched
            # burn-in dominated rung-4 wall-clock)
            return jax.lax.fori_loop(0, n_sweeps, one_sweep, states)

        self._run = run
        self.ll_trace: list[np.ndarray] = []   # per sweep: [num_chains]
        self.phi_trace: list[np.ndarray] = []  # per recorded draw: [num_chains, K, V]
        self.phi_accum = None  # O(C·K·V) alternative to phi_trace (see record_phi)
        self.phi_window = None  # pair-safe doubling-window variant (record_phi_auto)

    # ------------------------------------------------------------------
    def sweep(
        self, n: int = 1, record_ll: bool = False, record_phi: bool = False
    ) -> None:
        from ldagibbssampling_tpu.evaluation.metrics import log_likelihood

        if not (record_ll or record_phi):
            self.states = self._run(self.states, jnp.int32(n))
            return
        for _ in range(n):
            self.states = self._run(self.states, jnp.int32(1))
            if record_ll:
                lls = []
                for c in range(self.num_chains):
                    phi, theta = self.chain_phi_theta(c)
                    lls.append(
                        log_likelihood(phi, theta, self.corpus)
                        / max(self.corpus.num_tokens, 1)
                    )
                self.ll_trace.append(np.asarray(lls))
            if record_phi:
                self.phi_trace.append(np.stack(
                    [self.chain_phi_theta(c)[0] for c in range(self.num_chains)]
                ))

    def record_phi(self, half: int) -> None:
        """Fold the CURRENT φ of every chain into the running split-R̂
        accumulator (``evaluation/diagnostics.PhiRhatAccumulator``) — the
        scalable replacement for ``sweep(record_phi=True)``'s stored
        ``[C, K, V]`` snapshots (~1.6 GB/draw at Wikipedia-rung shape).
        ``half`` routes the draw to split-half 0 or 1; the caller owns the
        recording schedule (first half of the window → 0)."""
        from ldagibbssampling_tpu.evaluation.diagnostics import (
            PhiRhatAccumulator)

        if self.phi_accum is None:
            k = self.config.topic_num
            v = self.corpus.vocab_size
            self.phi_accum = PhiRhatAccumulator(self.num_chains, k, v)
        phis = np.stack(
            [self.chain_phi_theta(c)[0] for c in range(self.num_chains)])
        self.phi_accum.add(phis, half)

    def record_phi_auto(self) -> None:
        """Fold the current φ of every chain into the pair-safe doubling-window
        accumulator (``diagnostics.PhiRhatWindowedAccumulator``): safe to call
        once per sweep with no known horizon — routing, balance, and burn-in
        re-windowing are handled internally, so ``r_hat_phi()`` never raises
        and never reports init-transient draws (round-4 verdict weak #1/#3).
        The product-path adapters (:class:`MultiChainModel`,
        ``parallel.chaingrid.ShardedChainModel``) record through this; the
        benchmark ladder keeps its own explicit windows via ``record_phi``."""
        from ldagibbssampling_tpu.evaluation.diagnostics import (
            PhiRhatWindowedAccumulator)

        if self.phi_window is None:
            self.phi_window = PhiRhatWindowedAccumulator(
                self.num_chains, self.config.topic_num, self.corpus.vocab_size)
        phis = np.stack(
            [self.chain_phi_theta(c)[0] for c in range(self.num_chains)])
        self.phi_window.add(phis)

    def reset_phi_accumulator(self) -> None:
        """Drop accumulated φ moments (e.g. to re-window after more burn-in)."""
        self.phi_accum = None

    def chain_state(self, c: int) -> SamplerState:
        return jax.tree.map(lambda x: x[c], self.states)

    def chain_phi_theta(self, c: int):
        s = self.chain_state(c)
        phi, theta = state_lib.phi_theta(
            s, self.doc_lengths, self.config.alpha, self.config.beta
        )
        return np.asarray(phi), np.asarray(theta)

    # ------------------------------------------------------------------
    def r_hat_ll(self) -> float:
        """Split-R̂ on the per-chain log-likelihood traces (needs ≥4 draws)."""
        if len(self.ll_trace) < 4:
            return float("nan")
        return r_hat(np.stack(self.ll_trace, axis=1))

    def r_hat_phi(self) -> dict:
        """Topic-aligned split-R̂ on φ (BASELINE config 4: "R-hat on φ").

        Uses stored draws (``sweep(record_phi=True)``) when present, else the
        running accumulator (``record_phi(half)``); chains are aligned to
        chain 0 before comparison (label switching) — see
        ``evaluation.diagnostics``.
        """
        from ldagibbssampling_tpu.evaluation.diagnostics import r_hat_phi

        if len(self.phi_trace) >= 4:
            return r_hat_phi(np.stack(self.phi_trace, axis=1))
        if self.phi_window is not None:
            return self.phi_window.result()
        if self.phi_accum is not None:
            return self.phi_accum.result()
        return {"max": float("nan"), "p99": float("nan"),
                "frac_gt_1_1": float("nan"), "n_cells": 0, "perms": []}

    def mean_phi(self) -> np.ndarray:
        """Posterior-averaged φ across chains (label switching caveat: chains
        are averaged in the permutation-invariant predictive sense only)."""
        phis = [self.chain_phi_theta(c)[0] for c in range(self.num_chains)]
        return np.mean(phis, axis=0)


class MultiChainModel:
    """InferenceBackend adapter over :class:`ChainSet` (``config.chains > 1``).

    Artifacts (φ, θ, z) come from chain 0 — the reference is single-chain, so
    its output contract is one chain's state — while all chains advance for
    the R̂ convergence diagnostic (exposed as ``r_hat()``, logged by the
    runner's metrics when present).
    """

    def __init__(self, config: LdaConfig, corpus: FlatCorpus) -> None:
        self.config = config
        self.corpus = corpus
        self.chains = ChainSet(config, corpus, num_chains=max(2, config.chains))
        self.kernel_tier = "xla"  # ChainSet runs the vmapped XLA sweep
        self._sweeps = 0

    def sweep(self, n: int = 1) -> None:
        self.chains.sweep(n, record_ll=True)
        self._sweeps += n
        # one φ draw per sweep call into the pair-safe doubling-window
        # accumulator: valid at every horizon (odd counts included) and the
        # reported window never includes the init transient
        self.chains.record_phi_auto()

    @property
    def sweeps_done(self) -> int:
        return self._sweeps

    def phi(self) -> np.ndarray:
        return self.chains.chain_phi_theta(0)[0]

    def theta(self) -> np.ndarray:
        return self.chains.chain_phi_theta(0)[1]

    def z(self) -> np.ndarray:
        s = self.chains.chain_state(0)
        return np.asarray(s.z)[: self.corpus.num_tokens]

    def r_hat(self) -> float:
        return self.chains.r_hat_ll()

    def r_hat_phi(self) -> dict:
        return self.chains.r_hat_phi()

    def mean_phi(self) -> np.ndarray:
        return self.chains.mean_phi()
