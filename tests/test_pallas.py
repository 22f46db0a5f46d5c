"""Pallas fused sampling kernel tests (interpret mode on CPU; SURVEY.md §4).

Deterministic parts are checked for exact equality vs the jnp reference path;
the sampled draw is checked distributionally (chi-square vs the analytic
collapsed-Gibbs conditional).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ldagibbssampling_tpu.corpus.flat import FlatCorpus
from ldagibbssampling_tpu.models.state import check_invariants, init_state
from ldagibbssampling_tpu.ops.gibbs import gibbs_sweep
from ldagibbssampling_tpu.ops.pallas_gibbs import pallas_sample_block

ALPHA, BETA = 0.5, 0.1


def _random_rows(b=64, k=7, v=30, seed=0):
    rng = np.random.default_rng(seed)
    nwk = rng.integers(0, 20, size=(b, k)).astype(np.float32)
    ndk = rng.integers(0, 12, size=(b, k)).astype(np.float32)
    nk = rng.integers(50, 200, size=k).astype(np.float32)
    zold = rng.integers(0, k, size=b).astype(np.int32)
    # self-exclusion must never go negative: ensure counts at zold >= 1
    rows = np.arange(b)
    nwk[rows, zold] += 1
    ndk[rows, zold] += 1
    return jnp.asarray(nwk), jnp.asarray(ndk), jnp.asarray(nk), jnp.asarray(zold)


def _jnp_reference_argmax(nwk, ndk, nk, zold, k):
    onehot = jax.nn.one_hot(zold, k, dtype=jnp.float32)
    v = 30
    logp = (
        jnp.log(nwk - onehot + BETA)
        + jnp.log(ndk - onehot + ALPHA)
        - jnp.log(nk[None, :] - onehot + v * BETA)
    )
    return jnp.argmax(logp, axis=-1).astype(jnp.int32)


def test_deterministic_kernel_matches_jnp_exactly():
    nwk, ndk, nk, zold = _random_rows()
    k = nwk.shape[1]
    got = pallas_sample_block(
        nwk, ndk, nk, zold, jnp.int32(7),
        alpha=ALPHA, beta=BETA, vbeta=30 * BETA, k_real=k,
        noise_mode="deterministic", interpret=True,
    )
    want = _jnp_reference_argmax(nwk, ndk, nk, zold, k)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_deterministic_kernel_k_and_b_padding():
    # K=7 pads to 128 lanes, B=50 pads to the row tile — padding must not leak
    nwk, ndk, nk, zold = _random_rows(b=50, k=7)
    got = pallas_sample_block(
        nwk, ndk, nk, zold, jnp.int32(0),
        alpha=ALPHA, beta=BETA, vbeta=30 * BETA, k_real=7,
        noise_mode="deterministic", interpret=True, row_tile=32,
    )
    assert got.shape == (50,)
    assert int(np.asarray(got).max()) < 7  # never picks a padded topic


def test_sampled_kernel_matches_analytic_conditional():
    """Chi-square: replicate one token's counts B times, sample once each."""
    k, v = 5, 30
    nwk_row = np.array([4.0, 1.0, 9.0, 2.0, 6.0], np.float32)
    ndk_row = np.array([2.0, 5.0, 1.0, 3.0, 1.0], np.float32)
    nk = np.array([80.0, 60.0, 120.0, 40.0, 90.0], np.float32)
    b = 8192
    zold = np.full(b, 2, np.int32)  # exclusion hits topic 2 everywhere
    nwk = jnp.asarray(np.tile(nwk_row, (b, 1)))
    ndk = jnp.asarray(np.tile(ndk_row, (b, 1)))
    noise = jax.random.uniform(
        jax.random.PRNGKey(123), (b, k),
        minval=1e-7, maxval=1.0 - 1e-7, dtype=jnp.float32,
    )
    got = np.asarray(
        pallas_sample_block(
            nwk, ndk, jnp.asarray(nk), jnp.asarray(zold), jnp.int32(123), noise,
            alpha=ALPHA, beta=BETA, vbeta=v * BETA, k_real=k,
            noise_mode="external", interpret=True,
        )
    )
    excl = np.eye(k)[2]
    p = (
        (nwk_row - excl + BETA)
        * (ndk_row - excl + ALPHA)
        / (nk - excl + v * BETA)
    )
    p /= p.sum()
    observed = np.bincount(got, minlength=k)
    expected = p * b
    chi2 = float(((observed - expected) ** 2 / expected).sum())
    # df=4; P(chi2 > 23.5) ~ 1e-4 — fails only on a real distribution bug
    assert chi2 < 23.5, (chi2, observed.tolist(), expected.tolist())


def test_sweep_with_pallas_kernel_preserves_invariants():
    fc = FlatCorpus.from_ragged(
        [[0, 1, 2, 1], [2, 3, 3, 0, 1], [4, 4, 0], [1, 2, 4, 3, 3, 0]],
        vocab_size=5,
    )
    pc = fc.pad_to(8)
    state = init_state(
        pc.token_word, pc.token_doc, pc.token_mask,
        num_docs=pc.num_docs, vocab_size=pc.vocab_size, num_topics=3, seed=0,
    )
    dl = jnp.asarray(fc.doc_lengths())
    for _ in range(3):
        state = gibbs_sweep(
            state,
            jnp.asarray(pc.token_word), jnp.asarray(pc.token_doc),
            jnp.asarray(pc.token_mask), dl,
            alpha=ALPHA, beta=BETA, block_size=8, draw_method="gumbel",
            use_pallas=True, pallas_interpret=True,
        )
    check_invariants(state, pc.token_mask, fc.doc_lengths())
    assert int(state.sweep) == 3
