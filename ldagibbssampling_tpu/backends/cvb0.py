"""CVB0: collapsed variational Bayes (0th-order) LDA.

No reference analog (the Java code is Gibbs-only); this is the deterministic
backend of the BASELINE.json north star.  Instead of hard assignments ``z``,
every token carries a dense responsibility vector γ_t ∈ Δ^K (Asuncion et al.
2009), and the count tables hold *expected* counts (float).  The update is the
same conditional as Gibbs with the token's own γ excluded:

    γ_t ∝ (E[nwk[w_t]] − γ_t + β) · (E[ndk[d_t]] − γ_t + α) / (E[nk] − γ_t + V·β)

which is pure gather → elementwise → normalize → scatter — no RNG, no argmax —
and converges in far fewer sweeps than Gibbs.  Structure mirrors
``ops/gibbs.py``: token blocks under ``lax.fori_loop``, deltas via scatter-add;
reference anchor for the conditional: ``LdaModel.sampleTopicZ`` (SURVEY.md §8.1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ldagibbssampling_tpu.config import LdaConfig
from ldagibbssampling_tpu.corpus.flat import FlatCorpus


@functools.partial(jax.jit, static_argnames=("alpha", "beta", "block_size", "sorted_words"))
def cvb0_sweep(
    gamma: jax.Array,       # [T_pad, K] responsibilities (padding rows all-zero)
    ndk: jax.Array,         # [M, K] expected counts (float32)
    nwk: jax.Array,         # [V, K]
    nk: jax.Array,          # [K]
    token_word: jax.Array,
    token_doc: jax.Array,
    token_mask: jax.Array,
    *,
    alpha: float,
    beta: float,
    block_size: int,
    sorted_words: bool = False,
):
    t_pad, k = gamma.shape
    v = nwk.shape[0]
    num_blocks = t_pad // block_size
    vbeta = v * beta

    def body(i, carry):
        gamma, ndk, nwk, nk = carry
        start = i * block_size
        w = lax.dynamic_slice(token_word, (start,), (block_size,))
        d = lax.dynamic_slice(token_doc, (start,), (block_size,))
        msk = lax.dynamic_slice(token_mask, (start,), (block_size,)).astype(gamma.dtype)
        g_old = lax.dynamic_slice(gamma, (start, 0), (block_size, k))

        nwk_ex = nwk[w] - g_old
        ndk_ex = ndk[d] - g_old
        nk_ex = nk[None, :] - g_old
        unnorm = (nwk_ex + beta) * (ndk_ex + alpha) / (nk_ex + vbeta)
        g_new = unnorm / jnp.maximum(unnorm.sum(axis=1, keepdims=True), 1e-30)
        g_new = g_new * msk[:, None]  # padding rows stay zero

        delta = g_new - g_old
        # exactly one axis is sorted within a block: word ids when the caller
        # pre-sorted blocks (sorted-scatter fast path, as ops/gibbs), doc ids
        # otherwise (doc-major stream)
        ndk = ndk.at[d].add(delta, indices_are_sorted=not sorted_words)
        nwk = nwk.at[w].add(delta, indices_are_sorted=sorted_words)
        nk = nk + delta.sum(axis=0)
        gamma = lax.dynamic_update_slice(gamma, g_new, (start, 0))
        return gamma, ndk, nwk, nk

    return lax.fori_loop(0, num_blocks, body, (gamma, ndk, nwk, nk))


@functools.partial(jax.jit, static_argnames=("alpha", "beta", "block_size",
                                             "sorted_words"))
def cvb0_sweeps(
    gamma, ndk, nwk, nk, token_word, token_doc, token_mask, n_sweeps,
    *, alpha, beta, block_size, sorted_words=False,
):
    """``n_sweeps`` (traced) full CVB0 sweeps as ONE dispatch — per-dispatch
    latency on remote platforms is 1-3 ms, a measurable tax on a ~15 ms
    sweep when issued one at a time."""
    def one(_, carry):
        g, a, b, c = carry
        return cvb0_sweep(g, a, b, c, token_word, token_doc, token_mask,
                          alpha=alpha, beta=beta, block_size=block_size,
                          sorted_words=sorted_words)
    return lax.fori_loop(0, n_sweeps, one, (gamma, ndk, nwk, nk))


class Cvb0Model:
    """Deterministic CVB0 backend with the common InferenceBackend surface."""

    def __init__(self, config: LdaConfig, corpus: FlatCorpus) -> None:
        self.config = config
        self.corpus = corpus
        k = config.topic_num
        block = max(1, min(config.block_size, max(1, corpus.num_tokens)))
        self.block_size = block
        pc = corpus.pad_to(block)
        self._sorted = bool(getattr(config, "sort_blocks", False)) and block > 1
        if self._sorted:
            pc, self._perm = pc.sort_within_blocks(block)
        else:
            self._perm = None
        self._padded = pc
        self.doc_lengths = corpus.doc_lengths()

        # random simplex init (small jitter around uniform, like CVB0 practice)
        key = jax.random.PRNGKey(config.seed)
        noise = jax.random.uniform(key, (pc.num_tokens, k), minval=0.5, maxval=1.5)
        g = noise / noise.sum(axis=1, keepdims=True)
        g = g * jnp.asarray(pc.token_mask, g.dtype)[:, None]
        self.gamma = g.astype(jnp.float32)

        td = np.asarray(pc.token_doc)
        twd = np.asarray(pc.token_word)
        g_np = np.asarray(self.gamma)
        ndk = np.zeros((pc.num_docs, k), np.float32)
        nwk = np.zeros((pc.vocab_size, k), np.float32)
        np.add.at(ndk, td, g_np)
        np.add.at(nwk, twd, g_np)
        self.ndk = jnp.asarray(ndk)
        self.nwk = jnp.asarray(nwk)
        self.nk = jnp.asarray(nwk.sum(axis=0))
        self._tw = jnp.asarray(pc.token_word)
        self._td = jnp.asarray(pc.token_doc)
        self._tm = jnp.asarray(pc.token_mask)
        self._sweeps = 0

    # ------------------------------------------------------------------
    def sweep(self, n: int = 1) -> None:
        # one batched dispatch (traced trip count — chunk sizes never
        # recompile), matching the Gibbs tiers
        self.gamma, self.ndk, self.nwk, self.nk = cvb0_sweeps(
            self.gamma, self.ndk, self.nwk, self.nk,
            self._tw, self._td, self._tm, jnp.int32(n),
            alpha=self.config.alpha, beta=self.config.beta,
            sorted_words=self._sorted,
            block_size=self.block_size,
        )
        self._sweeps += n

    @property
    def sweeps_done(self) -> int:
        return self._sweeps

    # ------------------------------------------------------------------
    def phi(self) -> np.ndarray:
        nwk = np.asarray(self.nwk, dtype=np.float64)
        nk = np.asarray(self.nk, dtype=np.float64)
        v = nwk.shape[0]
        return ((nwk + self.config.beta) / (nk + v * self.config.beta)).T

    def theta(self) -> np.ndarray:
        ndk = np.asarray(self.ndk, dtype=np.float64)
        k = ndk.shape[1]
        return (ndk + self.config.alpha) / (
            self.doc_lengths[:, None] + k * self.config.alpha
        )

    def z(self) -> np.ndarray:
        """Hard assignments (argmax responsibilities) for artifact export,
        in original corpus token order."""
        g = np.asarray(self.gamma)
        zs = g.argmax(axis=1).astype(np.int32)
        if self._perm is not None:
            z_orig = np.empty_like(zs)
            z_orig[self._perm] = zs
            zs = z_orig
        return zs[: self.corpus.num_tokens]

    # ------------------------------------------------------------------
    def save_checkpoint(self, directory) -> int:
        """Orbax checkpoint of the full CVB0 state (γ + expected counts).

        α/β are config constants here (no Minka path on this backend), so the
        arrays plus the sweep counter are the complete state — a restored run
        continues the identical deterministic trajectory."""
        from ldagibbssampling_tpu.lda_io.checkpoint import save_backend_run

        arrays = {"gamma": self.gamma, "ndk": self.ndk, "nwk": self.nwk,
                  "nk": self.nk}
        return save_backend_run(directory, arrays, {"sweeps": self._sweeps},
                                self._sweeps)

    def restore_checkpoint(self, directory) -> int:
        from ldagibbssampling_tpu.lda_io.checkpoint import restore_backend_run

        like = {"gamma": self.gamma, "ndk": self.ndk, "nwk": self.nwk,
                "nk": self.nk}
        arrays, meta = restore_backend_run(directory, like)
        self.gamma = arrays["gamma"]
        self.ndk = arrays["ndk"]
        self.nwk = arrays["nwk"]
        self.nk = arrays["nk"]
        self._sweeps = int(meta["sweeps"])
        return self._sweeps

    def check_invariants(self) -> None:
        ndk = np.asarray(self.ndk, np.float64)
        nwk = np.asarray(self.nwk, np.float64)
        nk = np.asarray(self.nk, np.float64)
        np.testing.assert_allclose(ndk.sum(axis=1), self.doc_lengths, rtol=1e-3)
        np.testing.assert_allclose(nwk.sum(axis=0), nk, rtol=1e-3)
        np.testing.assert_allclose(nk.sum(), self.corpus.num_tokens, rtol=1e-3)
