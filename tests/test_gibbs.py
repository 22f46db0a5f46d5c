"""Blocked-Gibbs sweep tests: invariants, determinism, oracle fidelity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldagibbssampling_tpu.corpus.flat import FlatCorpus
from ldagibbssampling_tpu.models.oracle import OracleSampler
from ldagibbssampling_tpu.models.state import SamplerState, check_invariants, init_state, phi_theta
from ldagibbssampling_tpu.ops.gibbs import gibbs_sweep, make_sweep_fn

_RAGGED = [[0, 1, 2, 1], [2, 3, 3, 0, 1], [4, 4, 0], [1, 2, 4, 3, 3, 0]]


def _setup(block_size=4, k=3, seed=0):
    fc = FlatCorpus.from_ragged(_RAGGED, vocab_size=5)
    pc = fc.pad_to(block_size)
    state = init_state(
        pc.token_word, pc.token_doc, pc.token_mask,
        num_docs=pc.num_docs, vocab_size=pc.vocab_size, num_topics=k, seed=seed,
    )
    return fc, pc, state


@pytest.mark.parametrize("block_size", [1, 4, 8])
@pytest.mark.parametrize("draw", ["gumbel", "inverse_cdf"])
def test_sweep_preserves_invariants(block_size, draw):
    fc, pc, state = _setup(block_size)
    dl = fc.doc_lengths()
    for _ in range(3):
        state = gibbs_sweep(
            state,
            jnp.asarray(pc.token_word), jnp.asarray(pc.token_doc),
            jnp.asarray(pc.token_mask), jnp.asarray(dl),
            alpha=0.5, beta=0.1, block_size=block_size, draw_method=draw,
        )
    check_invariants(state, pc.token_mask, dl)
    assert int(state.sweep) == 3


def test_make_sweep_fn_jits_and_is_deterministic():
    fc, pc, state = _setup(block_size=4)
    run = make_sweep_fn(
        pc.token_word, pc.token_doc, pc.token_mask, fc.doc_lengths(),
        alpha=0.5, beta=0.1, block_size=4, num_sweeps=5,
    )
    s1 = run(state)
    s2 = run(state)
    np.testing.assert_array_equal(np.asarray(s1.z), np.asarray(s2.z))
    check_invariants(s1, pc.token_mask, fc.doc_lengths())
    assert int(s1.sweep) == 5


def test_padding_never_touches_counts():
    fc, pc, state = _setup(block_size=8)  # 18 real tokens -> 24 padded
    assert pc.num_tokens > pc.num_real_tokens
    run = make_sweep_fn(
        pc.token_word, pc.token_doc, pc.token_mask, fc.doc_lengths(),
        alpha=0.5, beta=0.1, block_size=8, num_sweeps=4,
    )
    s = run(state)
    # total counts still equal the REAL token count
    assert int(np.asarray(s.nk).sum()) == pc.num_real_tokens
    check_invariants(s, pc.token_mask, fc.doc_lengths())


def test_phi_theta_normalized_after_sweeps():
    fc, pc, state = _setup()
    run = make_sweep_fn(
        pc.token_word, pc.token_doc, pc.token_mask, fc.doc_lengths(),
        alpha=0.5, beta=0.1, block_size=4, num_sweeps=3,
    )
    s = run(state)
    phi, theta = phi_theta(s, fc.doc_lengths(), alpha=0.5, beta=0.1)
    np.testing.assert_allclose(np.asarray(phi).sum(axis=1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(theta).sum(axis=1), 1.0, rtol=1e-5)


def test_block1_inverse_cdf_bit_matches_oracle():
    """Fidelity harness (SURVEY.md §4): block_size=1 + inverse-CDF + the
    oracle's own uniforms reproduces the serial Java-semantics chain."""
    fc = FlatCorpus.from_ragged(_RAGGED, vocab_size=5)
    k = 3
    jax.config.update("jax_enable_x64", True)
    try:
        oracle = OracleSampler(fc, num_topics=k, seed=42)
        # device state seeded with the oracle's exact initial assignment
        state = SamplerState(
            z=jnp.asarray(oracle.z, jnp.int32),
            ndk=jnp.asarray(oracle.ndk, jnp.int32),
            nwk=jnp.asarray(oracle.nwk, jnp.int32),
            nk=jnp.asarray(oracle.nk, jnp.int32),
            key=jax.random.PRNGKey(0),
            sweep=jnp.int32(0),
        )
        dl = jnp.asarray(fc.doc_lengths(), jnp.int32)
        tw = jnp.asarray(fc.token_word)
        td = jnp.asarray(fc.token_doc)
        tm = jnp.ones_like(tw)
        for sweep in range(3):
            # continue the oracle's JavaRandom stream for this sweep's draws,
            # then rewind so oracle.sweep consumes the SAME draws internally
            saved = oracle.rng._seed
            uniforms = np.array(
                [oracle.rng.next_double() for _ in range(fc.num_tokens)]
            )
            state = gibbs_sweep(
                state, tw, td, tm, dl,
                alpha=0.5, beta=0.1, block_size=1, draw_method="inverse_cdf",
                uniforms=jnp.asarray(uniforms, jnp.float64),
                prob_dtype=jnp.float64,
            )
            oracle.rng._seed = saved
            oracle.sweep(1)
            np.testing.assert_array_equal(
                np.asarray(state.z), oracle.z,
                err_msg=f"trajectory diverged at sweep {sweep}",
            )
        np.testing.assert_array_equal(np.asarray(state.nwk), oracle.nwk)
    finally:
        jax.config.update("jax_enable_x64", False)
