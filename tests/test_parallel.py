"""AD-LDA parallel runtime tests on the 8-virtual-device CPU mesh."""

import jax
import numpy as np
import pytest

from ldagibbssampling_tpu.config import LdaConfig
from ldagibbssampling_tpu.corpus.flat import FlatCorpus
from ldagibbssampling_tpu.parallel.adlda import ShardedLda
from ldagibbssampling_tpu.parallel.sharding import shard_corpus


def _corpus(num_docs=24, vocab=40, seed=0):
    rng = np.random.default_rng(seed)
    ragged = [
        [int(x) for x in rng.integers(0, vocab, size=int(rng.integers(5, 30)))]
        for _ in range(num_docs)
    ]
    return FlatCorpus.from_ragged(ragged, vocab_size=vocab)


def test_eight_devices_available():
    assert len(jax.devices()) >= 8


def test_shard_corpus_partition_is_exact():
    fc = _corpus()
    shards = shard_corpus(fc, 4, block_size=8)
    # every real token appears exactly once across shards
    assert shards.token_mask.sum() == fc.num_tokens
    assert shards.tokens_per_shard % 8 == 0
    # doc_map covers all docs exactly once
    real = shards.doc_map[shards.doc_map >= 0]
    assert sorted(real.tolist()) == list(range(fc.num_docs))
    # per-shard doc lengths match the global corpus
    lengths = fc.doc_lengths()
    for p in range(4):
        for local, g in enumerate(shards.doc_map[p]):
            if g >= 0:
                assert shards.doc_lengths[p, local] == lengths[g]
    # token-balance: max/min spread is bounded by the longest doc
    loads = shards.token_mask.sum(axis=1)
    assert loads.max() - loads.min() <= lengths.max()


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_sweep_counts_consistent(n_dev):
    fc = _corpus()
    cfg = LdaConfig(topic_num=5, block_size=16, seed=3)
    model = ShardedLda(cfg, fc, num_shards=n_dev)
    model.sweep(3)
    # psum-reconciled device tables == serially recomputed tables from z
    model.check_counts_consistent()
    assert int(np.asarray(model.nk).sum()) == fc.num_tokens


def test_sharded_phi_theta_normalized():
    fc = _corpus()
    cfg = LdaConfig(topic_num=4, block_size=16, seed=1)
    model = ShardedLda(cfg, fc, num_shards=4)
    model.sweep(2)
    np.testing.assert_allclose(model.phi().sum(axis=1), 1.0, rtol=1e-6)
    np.testing.assert_allclose(model.theta().sum(axis=1), 1.0, rtol=1e-6)
    assert model.theta().shape == (fc.num_docs, 4)


def test_sharded_matches_single_device_statistics():
    """AD-LDA must land in the same posterior mass region as single-chip."""
    from ldagibbssampling_tpu.evaluation import log_likelihood
    from ldagibbssampling_tpu.models.lda import LdaModel

    fc = _corpus(num_docs=30, vocab=20, seed=7)
    k = 4
    lls_single, lls_shard = [], []
    for seed in range(2):
        cfg = LdaConfig(topic_num=k, block_size=32, seed=seed)
        m1 = LdaModel(cfg, fc)
        m1.sweep(30)
        lls_single.append(log_likelihood(m1.phi(), m1.theta(), fc))
        m8 = ShardedLda(cfg, fc, num_shards=8)
        m8.sweep(30)
        lls_shard.append(log_likelihood(m8.phi(), m8.theta(), fc))
    # same ballpark: within 5% of each other's magnitude
    a, b = np.mean(lls_single), np.mean(lls_shard)
    assert abs(a - b) / abs(a) < 0.05, (a, b)


def test_graft_entry_hooks():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert int(out.sweep) == 1
    g.dryrun_multichip(8)


def test_fused_sharded_sweep_counts_consistent():
    """AD-LDA with the fused Pallas kernel per shard (interpret mode on CPU):
    sharded counts must equal a serial recount, and the nwk replica must stay
    consistent after psum reconciliation."""
    from ldagibbssampling_tpu.parallel.adlda import make_sharded_sweep_fn
    from jax.sharding import Mesh

    fc = _corpus(num_docs=48, vocab=64, seed=4)
    n_dev = 4
    block = 128
    shards = shard_corpus(fc, n_dev, block_size=block)
    from ldagibbssampling_tpu.parallel.sharding import sort_blocks_inplace
    sort_blocks_inplace(shards.token_word, shards.token_doc,
                        shards.token_mask, block_size=block)
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("data",))

    import jax.numpy as jnp
    k = 5
    rng = np.random.default_rng(0)
    z = rng.integers(0, k, shards.token_word.shape).astype(np.int32)
    mask = shards.token_mask.astype(bool)
    ndk = np.zeros((n_dev, shards.docs_per_shard, k), np.int32)
    nwk = np.zeros((fc.vocab_size, k), np.int32)
    for s in range(n_dev):
        np.add.at(ndk[s], (shards.token_doc[s][mask[s]], z[s][mask[s]]), 1)
        np.add.at(nwk, (shards.token_word[s][mask[s]], z[s][mask[s]]), 1)
    nk = nwk.sum(0).astype(np.int32)

    run = make_sharded_sweep_fn(
        shards, mesh, alpha=0.5, beta=0.1, block_size=block,
        num_sweeps=2, sorted_words=True,
        use_pallas="fused", pallas_interpret=True,
    )
    zj, ndkj, nwkj, nkj, sweep = run(
        jnp.asarray(z), jnp.asarray(ndk), jnp.asarray(nwk), jnp.asarray(nk),
        jax.random.PRNGKey(7), jnp.int32(0),
    )
    z2 = np.asarray(zj)
    ndk2 = np.zeros_like(ndk)
    nwk2 = np.zeros_like(nwk)
    for s in range(n_dev):
        np.add.at(ndk2[s], (shards.token_doc[s][mask[s]], z2[s][mask[s]]), 1)
        np.add.at(nwk2, (shards.token_word[s][mask[s]], z2[s][mask[s]]), 1)
    np.testing.assert_array_equal(np.asarray(ndkj), ndk2)
    np.testing.assert_array_equal(np.asarray(nwkj), nwk2)
    np.testing.assert_array_equal(np.asarray(nkj), nwk2.sum(0))
    assert int(sweep) == 2
    assert (z2[mask] != z[mask]).any()
