"""Device-side metrics: chunked log-likelihood and batched fold-in.

Round 2's host metrics (``evaluation/metrics.py``) materialize ``theta[td]``
— a ``[T, K]`` float64 host array (~400 GB at rung-3 scale) — and fold new
documents in one at a time with a per-token Python Gibbs loop.  These versions
keep everything on device with O(chunk·K) memory:

- :func:`device_log_likelihood` walks the token stream in fixed chunks inside
  one jitted ``fori_loop``, gathering count rows and reducing each chunk to a
  single partial sum; the host sees only a ``[num_chunks]`` vector (summed in
  float64 — per-chunk f32 partials keep the relative error ~1e-7).
- :func:`fold_in_theta_batch` folds in MANY documents at once as blocked Gibbs
  with φ frozen — the same snapshot approximation the main sweep uses
  (SURVEY.md §7 hard-part 3), vectorized over a padded ``[D, L]`` token grid.

No reference analog (the Java code computes no metrics — SURVEY.md §8.4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ldagibbssampling_tpu.corpus.flat import FlatCorpus


@functools.partial(jax.jit, static_argnames=("chunk_size", "vocab_size"))
def _ll_chunks(
    ndk, nwk, nk, tw, td, tm, dl, alpha, beta, *, chunk_size: int,
    vocab_size=None,
) -> jax.Array:
    t = tw.shape[0]
    k = ndk.shape[1]
    # vocab_size overrides V for the V·β smoothing mass when ``nwk`` is a
    # vocab-sharded slab whose height is not the global vocabulary size
    v = nwk.shape[0] if vocab_size is None else vocab_size
    alpha = jnp.float32(alpha)
    beta = jnp.float32(beta)
    vbeta = v * beta
    kalpha = k * alpha
    nkf = nk.astype(jnp.float32) + vbeta          # [K]
    dlf = dl.astype(jnp.float32)

    def body(i, acc):
        s = i * chunk_size
        w = lax.dynamic_slice(tw, (s,), (chunk_size,))
        d = lax.dynamic_slice(td, (s,), (chunk_size,))
        m = lax.dynamic_slice(tm, (s,), (chunk_size,))
        phi_rows = (nwk[w].astype(jnp.float32) + beta) / nkf          # [C, K]
        theta_rows = (ndk[d].astype(jnp.float32) + alpha) / (
            dlf[d] + kalpha
        )[:, None]                                                     # [C, K]
        p = jnp.sum(phi_rows * theta_rows, axis=-1)
        ll = jnp.sum(jnp.where(m > 0, jnp.log(jnp.maximum(p, 1e-30)), 0.0))
        return acc.at[i].set(ll)

    n_chunks = t // chunk_size
    return lax.fori_loop(0, n_chunks, body, jnp.zeros((n_chunks,), jnp.float32))


def device_log_likelihood(
    ndk, nwk, nk,
    token_word, token_doc, token_mask, doc_lengths,
    alpha: float, beta: float,
    chunk_size: int = 1 << 19,
) -> float:
    """Token log-likelihood from the count tables, chunked on device.

    Same quantity as ``metrics.log_likelihood`` of the point estimates
    φ=(nwk+β)/(nk+Vβ), θ=(ndk+α)/(N+Kα), but with O(chunk·K) device memory
    and O(T/chunk) host memory — usable at rung-3+ token counts.
    """
    tw = jnp.asarray(token_word, jnp.int32)
    td = jnp.asarray(token_doc, jnp.int32)
    tm = jnp.asarray(token_mask, jnp.int32)
    t = tw.shape[0]
    chunk_size = min(chunk_size, max(t, 1))
    pad = (-t) % chunk_size
    if pad:
        tw = jnp.pad(tw, (0, pad))
        td = jnp.pad(td, (0, pad))
        tm = jnp.pad(tm, (0, pad))
    chunks = _ll_chunks(
        jnp.asarray(ndk), jnp.asarray(nwk), jnp.asarray(nk),
        tw, td, tm, jnp.asarray(doc_lengths),
        alpha, beta, chunk_size=int(chunk_size),
    )
    return float(np.asarray(chunks, np.float64).sum())


def shard_ll_chunks(
    ndk, nwk, nk, tw, td, tm, dl, alpha, beta,
    chunk_size: int = 1 << 19, vocab_size=None,
) -> jax.Array:
    """Shard-local chunked LL partials — the ``_ll_chunks`` body with static
    padding, usable inside a ``shard_map`` (mesh runtimes' ``--ll-every``
    fast path).  Returns the ``[n_chunks]`` f32 partial sums; callers stack
    the per-shard vectors on the host and reduce in float64 (more accurate
    than a device psum of f32 partials, and just as cheap — the vector is
    O(T/chunk) scalars)."""
    t = tw.shape[0]
    chunk = int(min(chunk_size, max(t, 1)))
    pad = (-t) % chunk
    if pad:
        tw = jnp.pad(tw, (0, pad))
        td = jnp.pad(td, (0, pad))
        tm = jnp.pad(tm, (0, pad))
    return _ll_chunks(
        ndk, nwk, nk, tw, td, tm, dl, alpha, beta,
        chunk_size=chunk, vocab_size=vocab_size,
    )


@functools.partial(jax.jit, static_argnames=("n_sweeps",))
def _fold_in_batch(phi, tokens, mask, alpha, key, *, n_sweeps: int):
    d, l = tokens.shape
    k = phi.shape[0]
    alpha = jnp.float32(alpha)
    # one gather of the docs' φ columns: [D, L, K]
    phw = phi.T[tokens.reshape(-1)].reshape(d, l, k)
    phw = jnp.where(mask.reshape(d, l, 1) > 0, phw, 1.0)
    logphw = jnp.log(jnp.maximum(phw, 1e-30))
    maskf = mask.astype(jnp.float32)[:, :, None]

    z0 = jax.random.randint(key, (d, l), 0, k, dtype=jnp.int32)

    def counts(z):
        oh = jax.nn.one_hot(z, k, dtype=jnp.float32) * maskf
        return oh.sum(axis=1)  # [D, K]

    def sweep(i, carry):
        z, ndk = carry
        oh = jax.nn.one_hot(z, k, dtype=jnp.float32) * maskf
        logp = logphw + jnp.log(
            jnp.maximum(ndk[:, None, :] - oh + alpha, 1e-30)
        )
        g = jax.random.gumbel(
            jax.random.fold_in(key, i + 1), (d, l, k), dtype=jnp.float32
        )
        z_new = jnp.argmax(logp + g, axis=-1).astype(jnp.int32)
        z_new = jnp.where(mask > 0, z_new, z)
        return z_new, counts(z_new)

    z, ndk = lax.fori_loop(0, n_sweeps, sweep, (z0, counts(z0)))
    n = maskf.sum(axis=(1, 2))
    return (ndk + alpha) / (n[:, None] + k * alpha)


def fold_in_theta_batch(
    phi: np.ndarray,
    docs: list,
    alpha: float,
    n_sweeps: int = 20,
    seed: int = 0,
    doc_batch: int = 256,
) -> np.ndarray:
    """θ for MANY new documents at once: blocked Gibbs with φ frozen.

    Replaces the per-document per-token host loop (``metrics.fold_in_theta``)
    with batched device sweeps over a padded ``[D, L]`` grid; documents are
    processed in groups of ``doc_batch`` so memory stays O(doc_batch·L·K).
    """
    phi = jnp.asarray(phi, jnp.float32)
    k = phi.shape[0]
    out = np.empty((len(docs), k), np.float64)
    for lo in range(0, len(docs), doc_batch):
        group = docs[lo : lo + doc_batch]
        l = max(1, max((len(t) for t in group), default=1))
        toks = np.zeros((len(group), l), np.int32)
        mask = np.zeros((len(group), l), np.int32)
        for i, t in enumerate(group):
            toks[i, : len(t)] = t
            mask[i, : len(t)] = 1
        theta = _fold_in_batch(
            phi, jnp.asarray(toks), jnp.asarray(mask), alpha,
            jax.random.PRNGKey(seed + lo), n_sweeps=n_sweeps,
        )
        out[lo : lo + len(group)] = np.asarray(theta, np.float64)
    return out


def heldout_perplexity_device(
    phi: np.ndarray,
    heldout: FlatCorpus,
    alpha: float,
    n_sweeps: int = 20,
    seed: int = 0,
) -> float:
    """Doc-completion perplexity with batched device fold-in.

    Same estimator as ``metrics.heldout_perplexity`` (even positions observe,
    odd evaluate), but all documents fold in together.
    """
    obs = [heldout.doc_tokens(m)[0::2] for m in range(heldout.num_docs)]
    evs = [heldout.doc_tokens(m)[1::2] for m in range(heldout.num_docs)]
    theta = fold_in_theta_batch(phi, obs, alpha, n_sweeps, seed=seed)
    phi64 = np.asarray(phi, np.float64)
    total_ll, total_tokens = 0.0, 0
    for m, ev in enumerate(evs):
        if len(ev) == 0:
            continue
        p = theta[m] @ phi64[:, ev]
        total_ll += float(np.log(np.maximum(p, 1e-300)).sum())
        total_tokens += len(ev)
    if total_tokens == 0:
        return float("nan")
    return float(np.exp(-total_ll / total_tokens))
