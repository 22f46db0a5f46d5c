"""Sampler state: the sufficient statistics of collapsed-Gibbs LDA as a pytree.

Reference fields (``LdaModel`` in ``src/liuyang/nlp/lda/main/LdaModel.java``,
SURVEY.md §3.2): ``z[M][N_m]`` topic assignments, ``nmk[M][K]`` doc-topic
counts, ``nkt[K][V]`` topic-word counts, ``nktSum[K]`` topic totals,
``nmkSum[M]`` doc lengths.  TPU-native layout differences:

- ``z`` is flat ``[T_pad]`` over the padded token stream (CSR corpus), not ragged;
- the word-topic table is ``nwk[V, K]`` (word-major) so the per-token gather
  ``nwk[w]`` reads contiguous K-vectors — the hot access pattern;
- ``nmkSum`` is not stored: it is the (static) per-doc length, derivable from
  ``doc_ptr``; the engine passes doc lengths separately where needed;
- a ``jax.random`` key and the sweep index ride along for checkpoint/resume.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SamplerState:
    """Pytree of collapsed-Gibbs sufficient statistics (one chain)."""

    z: jax.Array        # int32 [T_pad] — topic of each token (padding: topic 0, masked)
    ndk: jax.Array      # int32 [M, K]  — doc-topic counts   (reference nmk)
    nwk: jax.Array      # int32 [V, K]  — word-topic counts  (reference nkt, transposed)
    nk: jax.Array       # int32 [K]     — topic totals       (reference nktSum)
    key: jax.Array      # jax PRNG key
    sweep: jax.Array    # int32 scalar — completed sweeps (for resume)


def host_randint(key, shape, maxval: int) -> np.ndarray:
    """``jax.random.randint`` evaluated on the CPU backend, returned as numpy.

    threefry is bit-identical across backends, so this produces the SAME
    init as drawing on the accelerator — without paying a remote compile +
    device→host fetch at model-construction time (measured: a single 4 MB
    ``np.asarray(device_randint)`` cost ~27 s over the remote-TPU tunnel;
    the CPU draw is milliseconds).
    """
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        return np.asarray(
            jax.random.randint(key, shape, 0, maxval, dtype=jnp.int32))


def init_state(
    token_word: Any,
    token_doc: Any,
    token_mask: Any,
    *,
    num_docs: int,
    vocab_size: int,
    num_topics: int,
    seed: int = 0,
) -> SamplerState:
    """Random topic init + count-table construction.

    Mirrors ``LdaModel.initializeModel`` (SURVEY.md §3.2): each token gets a
    uniform random topic, then counts are accumulated.  Built host-side with
    numpy (cheap, one-off) so the function is usable before any device code.
    Padding tokens (mask 0) are excluded from every count table.
    """
    token_word = np.asarray(token_word, dtype=np.int32)
    token_doc = np.asarray(token_doc, dtype=np.int32)
    token_mask = np.asarray(token_mask, dtype=np.int32)
    k = num_topics

    root = jax.random.PRNGKey(seed)
    init_key, chain_key = jax.random.split(root)
    z = host_randint(init_key, token_word.shape, k)
    real = token_mask.astype(bool)
    ndk = np.zeros((num_docs, k), dtype=np.int32)
    nwk = np.zeros((vocab_size, k), dtype=np.int32)
    np.add.at(ndk, (token_doc[real], z[real]), 1)
    np.add.at(nwk, (token_word[real], z[real]), 1)
    nk = nwk.sum(axis=0, dtype=np.int32)

    return SamplerState(
        z=jnp.asarray(z),
        ndk=jnp.asarray(ndk),
        nwk=jnp.asarray(nwk),
        nk=jnp.asarray(nk),
        key=chain_key,
        sweep=jnp.int32(0),
    )


def phi_theta(
    state: SamplerState,
    doc_lengths: Any,
    alpha: float,
    beta: float,
) -> tuple[jax.Array, jax.Array]:
    """Point estimates from current counts (``LdaModel.updateEstimatedParameters``).

    phi[k, t] = (nwk[t, k] + β) / (nk[k] + V·β)
    theta[m, k] = (ndk[m, k] + α) / (N_m + K·α)

    Returned in the reference's orientation: phi ``[K, V]``, theta ``[M, K]``.
    """
    v = state.nwk.shape[0]
    k = state.nwk.shape[1]
    lengths = jnp.asarray(doc_lengths, dtype=jnp.float32)[:, None]
    phi = (state.nwk.T + beta) / (state.nk[:, None] + v * beta)
    theta = (state.ndk + alpha) / (lengths + k * alpha)
    return phi.astype(jnp.float32), theta.astype(jnp.float32)


def check_invariants(
    state: SamplerState,
    token_mask: Any,
    doc_lengths: Any,
) -> None:
    """Assert the count-table invariants (SURVEY.md §4): raises on violation.

    Σ_k ndk[m, k] == N_m;  Σ_t nwk[t, k] == nk[k];  Σ_k nk[k] == total tokens;
    all counts non-negative.  Host-side debug helper — not for use inside jit.
    """
    ndk = np.asarray(state.ndk)
    nwk = np.asarray(state.nwk)
    nk = np.asarray(state.nk)
    lengths = np.asarray(doc_lengths)
    total = int(np.asarray(token_mask).sum())
    if (ndk < 0).any() or (nwk < 0).any() or (nk < 0).any():
        raise AssertionError("negative counts")
    if not (ndk.sum(axis=1) == lengths).all():
        raise AssertionError("ndk row sums != doc lengths")
    if not (nwk.sum(axis=0) == nk).all():
        raise AssertionError("nwk column sums != nk")
    if int(nk.sum()) != total:
        raise AssertionError(f"nk total {int(nk.sum())} != token count {total}")
