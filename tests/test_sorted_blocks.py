"""Within-block word sorting: correctness of the sorted-scatter fast path."""

import numpy as np

from ldagibbssampling_tpu.config import LdaConfig
from ldagibbssampling_tpu.corpus.flat import FlatCorpus
from ldagibbssampling_tpu.models.lda import LdaModel


def _corpus(seed=0, docs=15, vocab=40):
    rng = np.random.default_rng(seed)
    ragged = [[int(x) for x in rng.integers(0, vocab, size=25)] for _ in range(docs)]
    return FlatCorpus.from_ragged(ragged, vocab_size=vocab)


def test_sort_within_blocks_permutation():
    corpus = _corpus()
    pc = corpus.pad_to(64)
    sp, perm = pc.sort_within_blocks(64)
    # sorted within each block
    for s in range(0, sp.num_tokens, 64):
        assert (np.diff(sp.token_word[s : s + 64]) >= 0).all()
    # a true permutation preserving (word, doc, mask) triples
    np.testing.assert_array_equal(sp.token_word, pc.token_word[perm])
    np.testing.assert_array_equal(sp.token_doc, pc.token_doc[perm])
    np.testing.assert_array_equal(sp.token_mask, pc.token_mask[perm])
    assert sorted(perm.tolist()) == list(range(pc.num_tokens))


def test_sorted_model_invariants_and_z_order():
    corpus = _corpus()
    cfg = LdaConfig(topic_num=5, seed=2, block_size=64, sort_blocks=True)
    model = LdaModel(cfg, corpus)
    assert model._perm is not None
    model.sweep(5)
    # de-permuted z reproduces the device count tables exactly
    z = model.z()
    assert z.shape == (corpus.num_tokens,)
    ndk = np.zeros((corpus.num_docs, 5), np.int64)
    nwk = np.zeros((corpus.vocab_size, 5), np.int64)
    np.add.at(ndk, (corpus.token_doc, z), 1)
    np.add.at(nwk, (corpus.token_word, z), 1)
    np.testing.assert_array_equal(np.asarray(model.state.ndk), ndk)
    np.testing.assert_array_equal(np.asarray(model.state.nwk), nwk)


def test_sorted_and_unsorted_statistically_agree():
    """Same corpus, same seed family: both layouts land in the same regime."""
    from ldagibbssampling_tpu.evaluation.metrics import perplexity

    corpus = _corpus(seed=3, docs=30)
    ps = []
    for sort in (True, False):
        cfg = LdaConfig(topic_num=5, seed=11, block_size=64, sort_blocks=sort)
        m = LdaModel(cfg, corpus)
        m.sweep(30)
        ps.append(perplexity(m.phi(), m.theta(), corpus))
    assert abs(ps[0] - ps[1]) / ps[1] < 0.15


def test_sort_disabled_for_serial_fidelity():
    corpus = _corpus()
    cfg = LdaConfig(topic_num=4, seed=0, block_size=1, sort_blocks=True)
    model = LdaModel(cfg, corpus)
    assert model._perm is None  # block=1: exact serial chain, order preserved
