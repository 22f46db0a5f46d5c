"""Deferred-nwk kernel tier on the mesh runtimes (interpret mode, CPU mesh).

Round-3 verdict item 1: the deferred fast path must be reachable from the
parallel runtimes — per-shard ``deferred_local_counts`` with the global table
reconciled as ``psum(local_counts, 'data')`` (``ops/gibbs.deferred_local_counts``
contract).  These tests run the Mosaic kernels under the CPU interpreter on
the 8-virtual-device mesh and verify BITWISE count consistency against a
serial recount from ``z`` — the race-detection analog of SURVEY.md §5.
"""

import logging

import numpy as np

from ldagibbssampling_tpu.config import LdaConfig
from ldagibbssampling_tpu.corpus.flat import FlatCorpus
from ldagibbssampling_tpu.ops import gibbs as gibbs_mod
from ldagibbssampling_tpu.parallel.adlda import ShardedLda
from ldagibbssampling_tpu.parallel.grid import GridLda

K = 8


def _corpus(num_docs=32, vocab=48, seed=0, max_len=40):
    rng = np.random.default_rng(seed)
    ragged = [
        [int(x) for x in rng.integers(0, vocab, size=int(rng.integers(8, max_len)))]
        for _ in range(num_docs)
    ]
    return FlatCorpus.from_ragged(ragged, vocab_size=vocab)


def _cfg(**kw):
    base = dict(topic_num=K, block_size=128, seed=3,
                use_pallas="deferred", pallas_interpret=True)
    base.update(kw)
    return LdaConfig(**base)


def test_sharded_deferred_counts_bitwise():
    fc = _corpus()
    model = ShardedLda(_cfg(), fc, num_shards=4)
    assert model.kernel_tier == "deferred"
    z0 = np.asarray(model.z).copy()
    model.sweep(2)
    assert model.sweeps_done == 2
    assert not np.array_equal(np.asarray(model.z), z0)
    # bitwise: psum-of-local-rebuilds == serial recount from z
    model.check_counts_consistent()
    phi = model.phi()
    theta = model.theta()
    np.testing.assert_allclose(phi.sum(axis=1), 1.0, rtol=1e-6)
    np.testing.assert_allclose(theta.sum(axis=1), 1.0, rtol=1e-6)


def test_sharded_deferred_total_tokens_preserved():
    fc = _corpus(seed=5)
    model = ShardedLda(_cfg(seed=11), fc, num_shards=4)
    model.sweep(3)
    assert int(np.asarray(model.nk).sum()) == fc.num_tokens
    assert int(np.asarray(model.nwk).sum()) == fc.num_tokens


def test_grid_deferred_counts_bitwise():
    fc = _corpus(num_docs=24, vocab=40, seed=7)
    from jax.sharding import Mesh
    import jax

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("data", "vocab"))
    model = GridLda(_cfg(seed=2), fc, mesh=mesh)
    assert model.kernel_tier == "deferred"
    model.sweep(2)
    model.check_counts_consistent()
    np.testing.assert_allclose(model.phi().sum(axis=1), 1.0, rtol=1e-6)
    assert int(np.asarray(model.nk).sum()) == fc.num_tokens


def test_grid_deferred_minka_and_resume(tmp_path):
    # the deferred tier composes with the mesh Minka + checkpoint hooks
    fc = _corpus(num_docs=24, vocab=40, seed=9)
    from jax.sharding import Mesh
    import jax

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("data", "vocab"))
    model = GridLda(_cfg(seed=4), fc, mesh=mesh)
    model.sweep(2)
    a, b = model.optimize_hyperparameters()
    assert 0 < a < 10 and 0 < b < 10
    model.save_checkpoint(tmp_path)
    model.sweep(1)
    z_after = np.asarray(model.z).copy()

    model2 = GridLda(_cfg(seed=4), fc, mesh=mesh)
    step = model2.restore_checkpoint(tmp_path)
    assert step == 2
    model2.alpha, model2.beta = a, b
    model2.sweep(1)
    np.testing.assert_array_equal(np.asarray(model2.z), z_after)


def test_deferred_downgrade_small_block_warns(caplog):
    fc = _corpus(seed=13)
    gibbs_mod._warned_downgrades.clear()
    with caplog.at_level(logging.WARNING, logger="ldagibbssampling_tpu"):
        model = ShardedLda(_cfg(block_size=32), fc, num_shards=4)
    assert model.kernel_tier == "xla"
    assert any("downgrade" in r.message for r in caplog.records)
    model.sweep(1)
    model.check_counts_consistent()


def test_deferred_downgrade_fidelity_draw(caplog):
    fc = _corpus(seed=17)
    gibbs_mod._warned_downgrades.clear()
    with caplog.at_level(logging.WARNING, logger="ldagibbssampling_tpu"):
        model = ShardedLda(
            _cfg(draw_method="inverse_cdf"), fc, num_shards=2)
    assert model.kernel_tier == "xla"
    assert any("downgrade" in r.message for r in caplog.records)


def test_sharded_deferred_matches_xla_statistics():
    # same corpus, deferred vs XLA tier: after a burn-in both tiers must land
    # in the same posterior mass region (loose perplexity agreement — the
    # chains differ by design, the stationary target must not)
    from ldagibbssampling_tpu.evaluation.metrics import perplexity

    fc = _corpus(num_docs=48, vocab=64, seed=21)
    m_def = ShardedLda(_cfg(seed=5), fc, num_shards=4)
    m_xla = ShardedLda(_cfg(seed=5, use_pallas=False), fc, num_shards=4)
    m_def.sweep(30)
    m_xla.sweep(30)
    p_def = perplexity(m_def.phi(), m_def.theta(), fc)
    p_xla = perplexity(m_xla.phi(), m_xla.theta(), fc)
    assert abs(p_def - p_xla) / p_xla < 0.06


def test_tokenshard_deferred_counts_bitwise():
    from ldagibbssampling_tpu.parallel.tokenshard import TokenShardedLda

    # include one giant document so the straddling-doc psum path is real
    rng = np.random.default_rng(31)
    ragged = [[int(x) for x in rng.integers(0, 48, size=600)]]
    ragged += [
        [int(x) for x in rng.integers(0, 48, size=int(rng.integers(8, 40)))]
        for _ in range(20)
    ]
    fc = FlatCorpus.from_ragged(ragged, vocab_size=48)
    model = TokenShardedLda(_cfg(seed=9), fc, num_shards=4)
    assert model.kernel_tier == "deferred"
    model.sweep(2)
    model.check_counts_consistent()
    assert int(np.asarray(model.nk).sum()) == fc.num_tokens
    np.testing.assert_allclose(model.phi().sum(axis=1), 1.0, rtol=1e-6)
    assert np.isfinite(model.device_log_likelihood())


def test_chaingrid_deferred_counts_bitwise():
    # round-4 verdict item 6: the deferred tier composed with the
    # ('chain','data') mesh — per-(chain,shard) MXU rebuilds, psum over
    # 'data' only, per-chain bitwise count consistency
    from ldagibbssampling_tpu.parallel.chaingrid import ShardedChainModel

    fc = _corpus(seed=11)
    model = ShardedChainModel(_cfg(seed=5, chains=2), fc, num_chains=2,
                              num_shards=2)
    assert model.kernel_tier == "deferred"
    model.sweep(2)
    model.check_counts_consistent()
    # z export must undo the stripe permutation (original corpus order)
    z = model.z()
    assert z.shape == (fc.num_tokens,)
    assert z.min() >= 0 and z.max() < K
    # and z must be consistent with chain 0's count tables
    nwk0 = np.asarray(model.chains.nwk)[0]
    nwk_ref = np.zeros_like(nwk0)
    np.add.at(nwk_ref, (fc.token_word, z), 1)
    np.testing.assert_array_equal(nwk0, nwk_ref)


def test_chaingrid_deferred_matches_xla_statistics():
    # deferred vs XLA tier on the chain mesh: same posterior region after
    # burn-in (they are different chains — compare count-table moments)
    from ldagibbssampling_tpu.parallel.chaingrid import ShardedChainModel

    fc = _corpus(num_docs=48, seed=12)
    m_def = ShardedChainModel(_cfg(seed=7), fc, num_chains=2, num_shards=2)
    m_xla = ShardedChainModel(
        _cfg(seed=7, use_pallas=False), fc, num_chains=2, num_shards=2)
    assert m_def.kernel_tier == "deferred"
    assert m_xla.kernel_tier == "xla"
    m_def.sweep(30)
    m_xla.sweep(30)
    # compare training LL of chain 0 (both tiers should fit comparably)
    from ldagibbssampling_tpu.evaluation.metrics import log_likelihood

    ld = log_likelihood(m_def.phi(), m_def.theta(), fc) / fc.num_tokens
    lx = log_likelihood(m_xla.phi(), m_xla.theta(), fc) / fc.num_tokens
    assert abs(ld - lx) < 0.15, (ld, lx)


def test_grid_deferred_rung5_stripe_shape():
    # BASELINE config 5's defining stripe shape: K=1000 (k_pad=1024) with
    # vocab-sharded nwk — the one configuration that REQUIRES GridLda
    # (round-4 verdict item 5).  V is scaled down (the stripe layout and
    # kernel tile shapes are what's under test; v_loc=128 stripes are
    # identical at any V), counts checked bitwise after sweeps.
    import jax
    from jax.sharding import Mesh

    from ldagibbssampling_tpu.parallel.grid import GridLda

    rng = np.random.default_rng(5)
    ragged = [[int(x) for x in rng.integers(0, 512, size=40)]
              for _ in range(24)]
    fc = FlatCorpus.from_ragged(ragged, vocab_size=512)
    cfg = LdaConfig(topic_num=1000, block_size=128, seed=3,
                    use_pallas="deferred", pallas_interpret=True)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("data", "vocab"))
    model = GridLda(cfg, fc, mesh=mesh)
    assert model.kernel_tier == "deferred"
    model.sweep(2)
    model.check_counts_consistent()
