"""Statistical parity harness: blocked/parallel chains vs the serial oracle.

SURVEY.md §7 hard-part 1: blocked Gibbs and AD-LDA run a *different Markov
chain* than the reference's serial scan; equality is distributional, not
bitwise.  This harness runs matched-budget chain families (same corpus, same
sweep count, independent seeds) and compares permutation-invariant posterior
functionals with a two-sample z-score on the across-seed Monte-Carlo spread:

- per-token train log-likelihood (label-free);
- mean topic entropy (sorted — invariant to topic relabeling);
- held-out doc-completion perplexity (optional, costlier).

A |z| ≲ 3-4 on each functional means the blocked chain's stationary bias is
within MC error of the serial chain — the parity criterion BASELINE.json sets.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import numpy as np

from ldagibbssampling_tpu.config import LdaConfig
from ldagibbssampling_tpu.corpus.flat import FlatCorpus
from ldagibbssampling_tpu.evaluation.metrics import log_likelihood


@dataclasses.dataclass
class FamilyStats:
    name: str
    ll_per_token: np.ndarray       # [n_seeds]
    topic_entropy: np.ndarray      # [n_seeds]

    def summary(self) -> dict:
        return {
            "name": self.name,
            "ll_per_token_mean": float(self.ll_per_token.mean()),
            "ll_per_token_std": float(self.ll_per_token.std(ddof=1)),
            "topic_entropy_mean": float(self.topic_entropy.mean()),
            "topic_entropy_std": float(self.topic_entropy.std(ddof=1)),
        }


def _functionals(phi: np.ndarray, theta: np.ndarray, corpus: FlatCorpus):
    ll = log_likelihood(phi, theta, corpus) / max(corpus.num_tokens, 1)
    ent = -np.sum(phi * np.log(np.maximum(phi, 1e-300)), axis=1)
    return ll, float(np.sort(ent).mean())


def run_family(
    name: str,
    corpus: FlatCorpus,
    make_and_run: Callable[[int], tuple[np.ndarray, np.ndarray]],
    seeds: Sequence[int],
) -> FamilyStats:
    """``make_and_run(seed) -> (phi, theta)`` after the matched sweep budget."""
    lls, ents = [], []
    for s in seeds:
        phi, theta = make_and_run(s)
        ll, ent = _functionals(phi, theta, corpus)
        lls.append(ll)
        ents.append(ent)
    return FamilyStats(name, np.asarray(lls), np.asarray(ents))


def z_score(a: np.ndarray, b: np.ndarray) -> float:
    """Two-sample z on across-seed means; guards the zero-variance corner."""
    na, nb = len(a), len(b)
    se = np.sqrt(a.var(ddof=1) / na + b.var(ddof=1) / nb)
    if se == 0:
        return 0.0 if a.mean() == b.mean() else float("inf")
    return float((a.mean() - b.mean()) / se)


def oracle_vs_blocked(
    corpus: FlatCorpus,
    k: int,
    *,
    alpha: float = 0.5,
    beta: float = 0.1,
    sweeps: int = 40,
    seeds: Sequence[int] = (0, 1, 2, 3),
    block_size: int = 256,
    draw_method: str = "gumbel",
) -> dict:
    """The standard parity report: serial oracle family vs blocked-device family."""
    from ldagibbssampling_tpu.models.lda import LdaModel
    from ldagibbssampling_tpu.models.oracle import OracleSampler

    def run_oracle(seed: int):
        o = OracleSampler(corpus, k, alpha, beta, seed=seed)
        o.sweep(sweeps)
        return o.phi(), o.theta()

    def run_blocked(seed: int):
        cfg = LdaConfig(
            topic_num=k, alpha=alpha, beta=beta, seed=seed,
            block_size=block_size, draw_method=draw_method,
        )
        m = LdaModel(cfg, corpus)
        m.sweep(sweeps)
        return m.phi(), m.theta()

    fa = run_family("oracle", corpus, run_oracle, seeds)
    fb = run_family("blocked", corpus, run_blocked, seeds)
    return {
        "oracle": fa.summary(),
        "blocked": fb.summary(),
        "z_ll": z_score(fa.ll_per_token, fb.ll_per_token),
        "z_entropy": z_score(fa.topic_entropy, fb.topic_entropy),
    }


def serial_vs_parallel(
    corpus: FlatCorpus,
    k: int,
    runtime: str,
    *,
    alpha: float = 0.5,
    beta: float = 0.1,
    sweeps: int = 40,
    seeds: Sequence[int] = (0, 1, 2, 3),
    block_size: int = 64,
    num_shards: int = 4,
) -> dict:
    """Parity report: single-device blocked family vs a multi-device runtime.

    ``runtime`` ∈ {"adlda", "grid", "tokenshard"}.  This is the chain-
    correctness gate for the parallel update schemes (SURVEY.md §7 hard-part
    1): the AD-LDA/grid staleness must not bias the posterior functionals
    beyond MC error of the single-device blocked chain.

    Measured behavior (tests/test_parallel_parity.py): stale parallel updates
    MIX SLOWER — at short budgets (≈30 sweeps) the parallel families sit
    measurably closer to the high-entropy init (z up to ~20 on topic
    entropy), but this is a transient, not a stationary bias: by ~150 sweeps
    on a planted-topic corpus the same functionals agree to <1% with
    |z| ≲ 1.  Parity must therefore be asserted POST burn-in; matched
    SHORT budgets compare transients and will flag mixing-speed differences
    as false biases.
    """
    import jax

    from ldagibbssampling_tpu.models.lda import LdaModel

    def run_single(seed: int):
        cfg = LdaConfig(topic_num=k, alpha=alpha, beta=beta, seed=seed,
                        block_size=block_size)
        m = LdaModel(cfg, corpus)
        m.sweep(sweeps)
        return m.phi(), m.theta()

    def run_parallel(seed: int):
        cfg = LdaConfig(topic_num=k, alpha=alpha, beta=beta, seed=seed,
                        block_size=block_size)
        if runtime == "adlda":
            from ldagibbssampling_tpu.parallel.adlda import ShardedLda

            m = ShardedLda(cfg, corpus, num_shards=num_shards)
        elif runtime == "tokenshard":
            from ldagibbssampling_tpu.parallel.tokenshard import TokenShardedLda

            m = TokenShardedLda(cfg, corpus, num_shards=num_shards)
        elif runtime == "grid":
            import numpy as _np

            from ldagibbssampling_tpu.parallel.grid import GridLda

            devs = jax.devices()
            pd = max(1, num_shards // 2)
            mesh = jax.sharding.Mesh(
                _np.array(devs[: pd * 2]).reshape(pd, 2), ("data", "vocab")
            )
            m = GridLda(cfg, corpus, mesh=mesh)
        else:
            raise ValueError(f"unknown runtime {runtime!r}")
        m.sweep(sweeps)
        return m.phi(), m.theta()

    fa = run_family("single", corpus, run_single, seeds)
    fb = run_family(runtime, corpus, run_parallel, seeds)
    return {
        "single": fa.summary(),
        runtime: fb.summary(),
        "z_ll": z_score(fa.ll_per_token, fb.ll_per_token),
        "z_entropy": z_score(fa.topic_entropy, fb.topic_entropy),
    }
