"""SMC: sequential Monte Carlo (particle-filter) LDA.

No reference analog; the fourth BASELINE.json backend.  Implements the
single-pass particle filter of Canini et al. (2009): P particles each carry
their own count tables; tokens are absorbed sequentially — each particle
samples ``z_t`` from its own collapsed conditional, its weight is multiplied
by the predictive probability of the token, and particles are resampled
(multinomial) whenever the effective sample size drops below ``ess_threshold·P``.

TPU mapping: particles are a ``vmap`` axis (all particles advance in lockstep,
one token per step under ``lax.scan``), so the per-token work is a [P, K]
vectorized block.  ``sweep()`` = one full absorb pass over the corpus
(re-absorbing tokens acts as a rejuvenation pass).

**Measured scale ceiling (TPU v5e, scripts/backend_verdicts.py):** 23.4 s
per pass at T=173k, P=16, K=20 — ~7.4k tokens/s, four orders of magnitude
below the deferred Gibbs tier, because the particle filter's per-token
sequential absorption IS the algorithm (each token's conditional depends on
every previous token's assignment), so the ``lax.scan`` cannot be blocked
without changing the sampler.  The memory wall compounds it: per-particle
count tables are ``[P, M, K] + [P, V, K]`` f32 —

- rung 3 shape (M=300k, V=100k, K=100, P=16):  ~3 GB
- rung 4 shape (M=1M,  V=100k, K=500, P=16):  ~35 GB  (exceeds one v5e)
- rung 5 shape (M=8.2M, V=140k, K=1000, P=16): ~534 GB

Honest role: small corpora where a single-pass posterior (no burn-in) or
online document arrival matters, and as the algorithmic reference for the
particle-filter family.  For batch training at any BASELINE rung, run the
Gibbs tiers.

Checkpoint/resume is a **documented non-goal** for this backend: runs at its
measured scale ceiling finish in minutes, and a faithful resume would have
to snapshot every particle's count tables plus the importance weights
mid-absorption — the cost/benefit is upside-down (the Gibbs runtimes and the
CVB0/SVI backends all checkpoint).  The CLI refuses ``--checkpoint-every``/
``--resume`` for this backend with a clean error.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ldagibbssampling_tpu.config import LdaConfig
from ldagibbssampling_tpu.corpus.flat import FlatCorpus


@functools.partial(
    jax.jit, static_argnames=("alpha", "beta", "ess_threshold", "num_steps")
)
def smc_absorb(
    ndk: jax.Array,       # [P, M, K] per-particle doc-topic counts
    nwk: jax.Array,       # [P, V, K]
    nk: jax.Array,        # [P, K]
    z: jax.Array,         # [P, T] assignments
    logw: jax.Array,      # [P] log-weights
    key: jax.Array,
    token_word: jax.Array,   # [T]
    token_doc: jax.Array,    # [T]
    first_pass: jax.Array,   # bool scalar: if False, decrement old z first
    t_offset: jax.Array,     # [] int32 — absolute index of this chunk's first token
    *,
    alpha: float,
    beta: float,
    ess_threshold: float,
    num_steps: int,
):
    p, _, k = ndk.shape
    v = nwk.shape[1]
    t_total = token_word.shape[0]
    vbeta = v * beta
    kalpha = k * alpha

    def step(carry, i):
        ndk, nwk, nk, z, logw, key = carry
        t = t_offset + i
        w = token_word[t]
        d = token_doc[t]

        old = z[:, t]                                   # [P]
        dec = jnp.where(first_pass, 0, 1).astype(ndk.dtype)
        pid = jnp.arange(p)
        ndk = ndk.at[pid, d, old].add(-dec)
        nwk = nwk.at[pid, w, old].add(-dec)
        nk = nk.at[pid, old].add(-dec)

        ndk_d = ndk[:, d, :]                            # [P, K]
        nwk_w = nwk[:, w, :]                            # [P, K]
        cond = (nwk_w + beta) / (nk + vbeta) * (ndk_d + alpha)  # [P, K]
        total = cond.sum(axis=1)                        # predictive (unnorm by N_d+Kα)
        key, sub = jax.random.split(key)
        g = jax.random.gumbel(sub, (p, k))
        znew = jnp.argmax(jnp.log(jnp.maximum(cond, 1e-30)) + g, axis=1)

        ndk = ndk.at[pid, d, znew].add(1)
        nwk = nwk.at[pid, w, znew].add(1)
        nk = nk.at[pid, znew].add(1)
        z = z.at[:, t].set(znew.astype(z.dtype))

        nd_tot = ndk_d.sum(axis=1)                      # post-decrement doc total
        logw = logw + jnp.log(jnp.maximum(total / (nd_tot + kalpha), 1e-300))

        # resample on ESS collapse
        wnorm = jax.nn.softmax(logw)
        ess = 1.0 / jnp.maximum(jnp.sum(wnorm**2), 1e-30)

        def resample(args):
            ndk, nwk, nk, z, logw, key = args
            key, sub = jax.random.split(key)
            idx = jax.random.categorical(sub, logw, shape=(p,))
            return (ndk[idx], nwk[idx], nk[idx], z[idx],
                    jnp.zeros_like(logw), key)

        ndk, nwk, nk, z, logw, key = lax.cond(
            ess < ess_threshold * p, resample, lambda a: a,
            (ndk, nwk, nk, z, logw, key),
        )
        return (ndk, nwk, nk, z, logw, key), None

    # chunked dispatch: the caller bounds num_steps so one executable never
    # runs an unbounded sequential scan on the device (a 420k-step single
    # dispatch reproducibly faulted the remote TPU — UNAVAILABLE device
    # error; ~32k-step chunks are well inside the envelope and the carry
    # crosses dispatches exactly)
    (ndk, nwk, nk, z, logw, key), _ = lax.scan(
        step, (ndk, nwk, nk, z, logw, key), jnp.arange(num_steps)
    )
    return ndk, nwk, nk, z, logw, key


class SmcModel:
    """Particle-filter backend (small-corpus scale; particles via vmap axis)."""

    def __init__(self, config: LdaConfig, corpus: FlatCorpus,
                 num_particles: int = 16, ess_threshold: float = 0.5,
                 chunk_size: int = 32_768) -> None:
        self.config = config
        self.corpus = corpus
        self.num_particles = num_particles
        self.ess_threshold = ess_threshold
        self.chunk_size = max(1, chunk_size)
        self.doc_lengths = corpus.doc_lengths()

        p, m, v, k = num_particles, corpus.num_docs, corpus.vocab_size, config.topic_num
        t = corpus.num_tokens
        self.ndk = jnp.zeros((p, m, k), jnp.int32)
        self.nwk = jnp.zeros((p, v, k), jnp.int32)
        self.nk = jnp.zeros((p, k), jnp.int32)
        self.z = jnp.zeros((p, t), jnp.int32)
        self.logw = jnp.zeros(p, jnp.float32)
        self.key = jax.random.PRNGKey(config.seed)
        self._tw = jnp.asarray(corpus.token_word)
        self._td = jnp.asarray(corpus.token_doc)
        self._sweeps = 0

    def sweep(self, n: int = 1) -> None:
        """Absorb (first call) / re-absorb (rejuvenate) the full token stream.

        The stream is absorbed in ``chunk_size``-token dispatches (the carry
        crosses chunk boundaries bitwise, so the chain is identical to one
        big scan — asserted in tests/test_backends.py); unbounded
        single-dispatch scans fault the remote TPU at a few hundred
        thousand steps.
        """
        t_total = int(self._tw.shape[0])
        for _ in range(n):
            first = jnp.asarray(self._sweeps == 0)
            pos = 0
            while pos < t_total:
                c = min(self.chunk_size, t_total - pos)
                (self.ndk, self.nwk, self.nk, self.z, self.logw,
                 self.key) = smc_absorb(
                    self.ndk, self.nwk, self.nk, self.z, self.logw, self.key,
                    self._tw, self._td, first, jnp.int32(pos),
                    alpha=self.config.alpha, beta=self.config.beta,
                    ess_threshold=self.ess_threshold, num_steps=c,
                )
                pos += c
            self._sweeps += 1

    @property
    def sweeps_done(self) -> int:
        return self._sweeps

    # ------------------------------------------------------------------
    def _weights(self) -> np.ndarray:
        return np.asarray(jax.nn.softmax(self.logw), np.float64)

    def phi(self) -> np.ndarray:
        wts = self._weights()[:, None, None]
        nwk = np.asarray(self.nwk, np.float64)
        nk = np.asarray(self.nk, np.float64)[:, None, :]
        v = nwk.shape[1]
        per_particle = (nwk + self.config.beta) / (nk + v * self.config.beta)
        return np.swapaxes((wts * per_particle).sum(axis=0), 0, 1)

    def theta(self) -> np.ndarray:
        wts = self._weights()[:, None, None]
        ndk = np.asarray(self.ndk, np.float64)
        k = ndk.shape[2]
        per_particle = (ndk + self.config.alpha) / (
            self.doc_lengths[None, :, None] + k * self.config.alpha
        )
        return (wts * per_particle).sum(axis=0)
