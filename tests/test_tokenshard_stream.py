"""Token-sharded runtime (SP analog) + streaming prefetch pipeline tests."""

import jax
import numpy as np
import pytest

from ldagibbssampling_tpu.config import LdaConfig
from ldagibbssampling_tpu.corpus.flat import FlatCorpus
from ldagibbssampling_tpu.data.stream import (
    minibatch_indices,
    prefetch_to_device,
)
from ldagibbssampling_tpu.parallel.tokenshard import TokenShardedLda, split_tokens


def _corpus_with_giant_doc(seed=0, vocab=40):
    """One 600-token document plus a handful of small ones."""
    rng = np.random.default_rng(seed)
    ragged = [[int(x) for x in rng.integers(0, vocab, size=600)]]
    for _ in range(6):
        ragged.append([int(x) for x in rng.integers(0, vocab, size=10)])
    return FlatCorpus.from_ragged(ragged, vocab_size=vocab)


def test_split_tokens_even_and_conserving():
    corpus = _corpus_with_giant_doc()
    tw, td, tm = split_tokens(corpus, 8, block_size=16)
    assert int(tm.sum()) == corpus.num_tokens
    assert tw.shape[1] % 16 == 0
    # giant doc straddles shards: doc 0 appears on more than one shard
    shards_with_doc0 = {
        p for p in range(8) if (td[p][tm[p].astype(bool)] == 0).any()
    }
    assert len(shards_with_doc0) > 1
    # reconstruction
    got = sorted(zip(tw[tm.astype(bool)].tolist(), td[tm.astype(bool)].tolist()))
    want = sorted(zip(corpus.token_word.tolist(), corpus.token_doc.tolist()))
    assert got == want


def test_tokensharded_lda_counts_consistent():
    if len(jax.devices()) < 8:
        pytest.skip("need 8 devices")
    corpus = _corpus_with_giant_doc()
    cfg = LdaConfig(topic_num=6, block_size=16, seed=1)
    model = TokenShardedLda(cfg, corpus, num_shards=8)
    model.sweep(3)
    model.check_counts_consistent()
    # invariants on the reconciled global tables
    ndk = np.asarray(model.ndk)
    np.testing.assert_array_equal(ndk.sum(axis=1), corpus.doc_lengths())
    assert int(np.asarray(model.nk).sum()) == corpus.num_tokens
    phi, theta = model.phi(), model.theta()
    np.testing.assert_allclose(phi.sum(axis=1), 1.0, rtol=1e-6)
    np.testing.assert_allclose(theta.sum(axis=1), 1.0, rtol=1e-6)


# ---------------------------------------------------------------- stream


def test_minibatch_indices_padding_and_coverage():
    rng = np.random.default_rng(0)
    seen = []
    for idx, real in minibatch_indices(10, 4, rng):
        assert len(idx) == 4
        seen.extend(idx[:real].tolist())
    assert sorted(seen) == list(range(10))


def test_minibatch_indices_drop_remainder():
    rng = np.random.default_rng(0)
    batches = list(minibatch_indices(10, 4, rng, drop_remainder=True))
    assert len(batches) == 2
    assert all(real == 4 for _, real in batches)


def test_prefetch_preserves_order_and_values():
    data = [np.full((3,), i, dtype=np.float32) for i in range(7)]
    out = list(prefetch_to_device(iter(data), depth=3))
    assert len(out) == 7
    for i, x in enumerate(out):
        assert isinstance(x, jax.Array)
        np.testing.assert_array_equal(np.asarray(x), data[i])


def test_prefetch_handles_pytrees_and_short_streams():
    data = [{"a": np.ones(2) * i, "b": np.zeros(1)} for i in range(2)]
    out = list(prefetch_to_device(iter(data), depth=4))
    assert len(out) == 2
    np.testing.assert_array_equal(np.asarray(out[1]["a"]), [1.0, 1.0])


def test_svi_partial_batch_no_duplicate_weighting():
    """Padded final batch must not double-count repeated documents."""
    from ldagibbssampling_tpu.backends.svi import SviModel

    rng = np.random.default_rng(0)
    ragged = [[int(x) for x in rng.integers(0, 30, size=12)] for _ in range(10)]
    corpus = FlatCorpus.from_ragged(ragged, vocab_size=30)
    cfg = LdaConfig(topic_num=4, seed=0)
    model = SviModel(cfg, corpus, batch_size=4)  # 10 docs -> 2 full + 1 partial
    model.sweep(2)
    phi, theta = model.phi(), model.theta()
    np.testing.assert_allclose(phi.sum(axis=1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(theta.sum(axis=1), 1.0, rtol=1e-5)
    assert model.sweeps_done == 2
