"""CVB0 / SVI / SMC backend tests: protocol, invariants, and learning signal."""

import numpy as np
import pytest

from ldagibbssampling_tpu.backends import (
    Cvb0Model,
    InferenceBackend,
    SmcModel,
    SviModel,
    make_backend,
)
from ldagibbssampling_tpu.config import LdaConfig
from ldagibbssampling_tpu.corpus.flat import FlatCorpus
from ldagibbssampling_tpu.evaluation.metrics import log_likelihood


def _topic_corpus(num_docs=24, seed=0):
    """Docs drawn from two disjoint word pools — trivially separable topics."""
    rng = np.random.default_rng(seed)
    ragged = []
    for _ in range(num_docs):
        pool = (0, 1, 2, 3) if rng.random() < 0.5 else (4, 5, 6, 7)
        ragged.append([int(rng.choice(pool)) for _ in range(30)])
    return FlatCorpus.from_ragged(ragged, vocab_size=8)


@pytest.mark.parametrize("backend", ["gibbs", "cvb0", "svi", "smc"])
def test_factory_and_protocol(backend):
    fc = _topic_corpus()
    cfg = LdaConfig(topic_num=2, backend=backend, block_size=64, seed=0)
    m = make_backend(cfg, fc)
    assert isinstance(m, InferenceBackend)
    m.sweep(2)
    assert m.sweeps_done == 2
    phi, theta = m.phi(), m.theta()
    assert phi.shape == (2, 8)
    assert theta.shape == (fc.num_docs, 2)
    np.testing.assert_allclose(phi.sum(axis=1), 1.0, rtol=1e-4)
    np.testing.assert_allclose(theta.sum(axis=1), 1.0, rtol=1e-4)


def test_cvb0_invariants_and_learning():
    fc = _topic_corpus()
    m = Cvb0Model(LdaConfig(topic_num=2, backend="cvb0", block_size=64, seed=1), fc)
    ll0 = log_likelihood(m.phi(), m.theta(), fc)
    m.sweep(15)
    m.check_invariants()
    ll1 = log_likelihood(m.phi(), m.theta(), fc)
    assert ll1 > ll0  # deterministic ascent on this easy corpus
    # separable corpus -> each topic concentrates on one pool
    phi = m.phi()
    top = phi.argmax(axis=1)
    pools = {tuple(sorted(np.argsort(-phi[t])[:4])) for t in range(2)}
    assert pools == {(0, 1, 2, 3), (4, 5, 6, 7)}, phi.round(2)
    assert m.z().shape == (fc.num_tokens,)


def test_svi_learns_separable_topics():
    fc = _topic_corpus(num_docs=40, seed=3)
    m = SviModel(LdaConfig(topic_num=2, backend="svi", seed=0), fc, batch_size=8)
    m.sweep(8)
    phi = m.phi()
    pools = {tuple(sorted(np.argsort(-phi[t])[:4])) for t in range(2)}
    assert pools == {(0, 1, 2, 3), (4, 5, 6, 7)}, phi.round(2)


def test_svi_beats_uniform_likelihood():
    fc = _topic_corpus(num_docs=40, seed=4)
    m = SviModel(LdaConfig(topic_num=2, backend="svi", seed=0), fc, batch_size=8)
    m.sweep(6)
    ll = log_likelihood(m.phi(), m.theta(), fc) / fc.num_tokens
    assert ll > -np.log(fc.vocab_size)


def test_smc_absorbs_and_weights_valid():
    fc = _topic_corpus(num_docs=10, seed=5)
    m = SmcModel(LdaConfig(topic_num=2, backend="smc", seed=0), fc, num_particles=8)
    m.sweep(1)
    w = m._weights()
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-6)
    # every particle's counts are a valid partition of the corpus
    nk = np.asarray(m.nk)
    assert (nk.sum(axis=1) == fc.num_tokens).all()
    ll = log_likelihood(m.phi(), m.theta(), fc) / fc.num_tokens
    assert ll > -np.log(fc.vocab_size)


def test_smc_rejuvenation_improves():
    fc = _topic_corpus(num_docs=10, seed=6)
    m = SmcModel(LdaConfig(topic_num=2, backend="smc", seed=0), fc, num_particles=8)
    m.sweep(1)
    ll1 = log_likelihood(m.phi(), m.theta(), fc)
    m.sweep(3)  # re-absorb passes
    ll2 = log_likelihood(m.phi(), m.theta(), fc)
    assert ll2 >= ll1 - 1.0  # rejuvenation must not collapse the posterior


def test_cvb0_sorted_blocks_z_in_corpus_order():
    """With sort_blocks on (default), z() must come back in corpus order.

    Planted corpus: each doc uses one exclusive word; after convergence a
    doc's tokens share a topic, so z() must be piecewise-constant on doc
    boundaries — broken permutation unmapping would interleave topics."""
    import numpy as np

    from ldagibbssampling_tpu.backends.cvb0 import Cvb0Model
    from ldagibbssampling_tpu.config import LdaConfig
    from ldagibbssampling_tpu.corpus.flat import FlatCorpus

    ragged = [[w] * 24 for w in range(6)]
    fc = FlatCorpus.from_ragged(ragged, vocab_size=6)
    m = Cvb0Model(LdaConfig(backend="cvb0", topic_num=6, block_size=32,
                            seed=1, sort_blocks=True), fc)
    assert m._perm is not None  # the sorted path is actually exercised
    m.sweep(60)
    z = m.z()
    assert z.shape == (fc.num_tokens,)
    for d in range(6):
        seg = z[d * 24:(d + 1) * 24]
        assert (seg == seg[0]).all(), f"doc {d} tokens not coherent: {seg}"


def test_smc_chunked_absorb_matches_single_scan():
    # the chunked dispatch must continue the chain bitwise across chunk
    # boundaries: same corpus, chunk_size >= T vs a tiny chunk_size
    from ldagibbssampling_tpu.backends.smc import SmcModel

    corpus = _topic_corpus(seed=23)
    cfg = LdaConfig(topic_num=4, seed=9)
    a = SmcModel(cfg, corpus, num_particles=4, chunk_size=10**9)
    b = SmcModel(cfg, corpus, num_particles=4, chunk_size=37)
    a.sweep(2)
    b.sweep(2)
    np.testing.assert_array_equal(np.asarray(a.z), np.asarray(b.z))
    np.testing.assert_array_equal(np.asarray(a.nwk), np.asarray(b.nwk))
    np.testing.assert_allclose(np.asarray(a.logw), np.asarray(b.logw),
                               rtol=1e-5)
