"""Multi-chain runner + Minka hyperparameter optimization tests."""

import jax
import jax.numpy as jnp
import numpy as np

from ldagibbssampling_tpu.config import LdaConfig
from ldagibbssampling_tpu.corpus.flat import FlatCorpus
from ldagibbssampling_tpu.models.chains import ChainSet
from ldagibbssampling_tpu.models.hyper import (
    optimize_alpha,
    optimize_beta,
    sharded_alpha_update,
)

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _corpus(num_docs=16, vocab=25, seed=0):
    rng = np.random.default_rng(seed)
    ragged = [
        [int(x) for x in rng.integers(0, vocab, size=int(rng.integers(8, 25)))]
        for _ in range(num_docs)
    ]
    return FlatCorpus.from_ragged(ragged, vocab_size=vocab)


def test_chains_advance_independently():
    fc = _corpus()
    cs = ChainSet(LdaConfig(topic_num=3, block_size=32, chains=4, seed=0), fc)
    cs.sweep(3)
    z = np.asarray(cs.states.z)
    assert z.shape[0] == 4
    assert int(cs.states.sweep[0]) == 3
    # different seeds -> chains diverge
    assert not np.array_equal(z[0], z[1])
    # per-chain counts remain valid
    for c in range(4):
        s = cs.chain_state(c)
        assert int(np.asarray(s.nk).sum()) == fc.num_tokens


def test_chains_r_hat_trace():
    fc = _corpus()
    cs = ChainSet(LdaConfig(topic_num=3, block_size=32, chains=3, seed=5), fc)
    cs.sweep(8, record_ll=True)
    rh = cs.r_hat_ll()
    assert np.isfinite(rh)
    assert rh < 2.5  # small problem mixes fast
    phi = cs.mean_phi()
    np.testing.assert_allclose(phi.sum(axis=1), 1.0, rtol=1e-5)


def test_chains_shard_over_mesh():
    devs = jax.devices()[:4]
    mesh = jax.sharding.Mesh(np.array(devs), ("chain",))
    fc = _corpus()
    cs = ChainSet(
        LdaConfig(topic_num=3, block_size=32, chains=4, seed=1), fc, mesh=mesh
    )
    cs.sweep(2)
    assert int(cs.states.sweep[0]) == 2
    for c in range(4):
        assert int(np.asarray(cs.chain_state(c).nk).sum()) == fc.num_tokens


def test_minka_alpha_recovers_scale():
    """Counts drawn from a known symmetric Dirichlet(α₀) should pull the
    fixed point toward α₀ from both directions."""
    rng = np.random.default_rng(0)
    a0, k, m, n = 0.4, 8, 600, 120
    theta = rng.dirichlet([a0] * k, size=m)
    ndk = np.stack([rng.multinomial(n, t) for t in theta])
    lengths = np.full(m, n)
    est_lo = float(optimize_alpha(jnp.asarray(ndk), jnp.asarray(lengths), 0.05, iters=50))
    est_hi = float(optimize_alpha(jnp.asarray(ndk), jnp.asarray(lengths), 5.0, iters=50))
    assert 0.25 < est_lo < 0.6, est_lo
    assert abs(est_lo - est_hi) < 0.02  # same fixed point from both sides


def test_minka_beta_runs_and_stays_positive():
    rng = np.random.default_rng(1)
    nwk = rng.integers(0, 30, size=(40, 6))
    nk = nwk.sum(axis=0)
    b = float(optimize_beta(jnp.asarray(nwk), jnp.asarray(nk), 0.1, iters=20))
    assert 1e-8 < b < 1e3


def test_sharded_alpha_matches_global():
    """psum-reconciled Minka update == single-device update on gathered counts."""
    rng = np.random.default_rng(2)
    p, m_s, k = 4, 5, 6
    ndk = rng.integers(0, 15, size=(p, m_s, k)).astype(np.int32)
    lengths = ndk.sum(axis=2).astype(np.int32)
    # mark one doc per shard as padding
    ndk[:, -1, :] = 0
    lengths[:, -1] = 0

    mesh = jax.sharding.Mesh(np.array(jax.devices()[:p]), ("data",))
    fn = shard_map(
        lambda nd, dl: sharded_alpha_update(nd[0], dl[0], 0.5, "data", iters=8),
        mesh=mesh,
        in_specs=(jax.sharding.PartitionSpec("data"),) * 2,
        out_specs=jax.sharding.PartitionSpec(),
        check_vma=False,
    )
    sharded = float(np.asarray(jax.jit(fn)(jnp.asarray(ndk), jnp.asarray(lengths)))[()])

    real = lengths.reshape(-1) > 0
    flat_ndk = ndk.reshape(-1, k)[real]
    flat_len = lengths.reshape(-1)[real]
    global_ = float(optimize_alpha(jnp.asarray(flat_ndk), jnp.asarray(flat_len), 0.5, iters=8))
    np.testing.assert_allclose(sharded, global_, rtol=1e-4)
