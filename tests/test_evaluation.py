"""Evaluation metric tests: likelihood, perplexity, fold-in, R-hat."""

import numpy as np

from ldagibbssampling_tpu.corpus.flat import FlatCorpus
from ldagibbssampling_tpu.evaluation import (
    heldout_perplexity,
    log_likelihood,
    perplexity,
    r_hat,
)


def _uniform_model(k=4, v=5):
    phi = np.full((k, v), 1.0 / v)
    return phi


def test_perplexity_uniform_model_equals_vocab_size():
    # Under a uniform phi, every token has probability 1/V -> PPL == V exactly
    fc = FlatCorpus.from_ragged([[0, 1, 2], [3, 4, 0]], vocab_size=5)
    phi = _uniform_model()
    theta = np.full((2, 4), 0.25)
    assert np.isclose(perplexity(phi, theta, fc), 5.0)


def test_log_likelihood_monotone_in_fit():
    fc = FlatCorpus.from_ragged([[0, 0, 0]], vocab_size=2)
    theta = np.array([[1.0]])
    good = np.array([[0.9, 0.1]])
    bad = np.array([[0.5, 0.5]])
    assert log_likelihood(good, theta, fc) > log_likelihood(bad, theta, fc)


def test_heldout_perplexity_prefers_true_model():
    # corpus drawn from topic 0 = words {0,1}; topic 1 = words {2,3}
    rng = np.random.default_rng(0)
    docs = []
    for _ in range(8):
        topic_words = (0, 1) if rng.random() < 0.5 else (2, 3)
        docs.append([int(rng.choice(topic_words)) for _ in range(30)])
    held = FlatCorpus.from_ragged(docs, vocab_size=4)
    true_phi = np.array([[0.5, 0.5, 0.0, 0.0], [0.0, 0.0, 0.5, 0.5]]) + 1e-6
    true_phi /= true_phi.sum(1, keepdims=True)
    flat_phi = np.full((2, 4), 0.25)
    p_true = heldout_perplexity(true_phi, held, alpha=0.5, n_sweeps=10)
    p_flat = heldout_perplexity(flat_phi, held, alpha=0.5, n_sweeps=10)
    assert p_true < p_flat
    assert p_true < 3.0  # true model: ~2 effective words per doc


def test_r_hat_converged_vs_disjoint():
    rng = np.random.default_rng(1)
    same = rng.normal(0, 1, size=(4, 200))
    assert abs(r_hat(same) - 1.0) < 0.1
    apart = np.stack([rng.normal(10 * c, 1, size=200) for c in range(4)])
    assert r_hat(apart) > 3.0


def test_r_hat_degenerate():
    assert np.isnan(r_hat(np.zeros((2, 2))))
    assert r_hat(np.ones((3, 100))) == 1.0
