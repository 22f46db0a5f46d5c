"""2D grid-parallel (doc × vocab sharded) runtime tests on the CPU mesh."""

import jax
import numpy as np
import pytest

from ldagibbssampling_tpu.config import LdaConfig
from ldagibbssampling_tpu.corpus.flat import FlatCorpus
from ldagibbssampling_tpu.parallel.grid import (
    GridLda,
    partition_vocab,
    shard_corpus_grid,
)


def _toy_corpus(num_docs=24, vocab=50, seed=0, zipf=False):
    rng = np.random.default_rng(seed)
    ragged = []
    for _ in range(num_docs):
        n = int(rng.integers(5, 40))
        if zipf:
            w = ((rng.zipf(1.3, size=n) - 1) % vocab).astype(int)
        else:
            w = rng.integers(0, vocab, size=n)
        ragged.append([int(x) for x in w])
    return FlatCorpus.from_ragged(ragged, vocab_size=vocab)


def _mesh(pd, pv):
    devs = jax.devices()
    if len(devs) < pd * pv:
        pytest.skip(f"need {pd * pv} devices")
    return jax.sharding.Mesh(
        np.array(devs[: pd * pv]).reshape(pd, pv), ("data", "vocab")
    )


# ---------------------------------------------------------------- partition


def test_partition_vocab_covers_and_balances():
    corpus = _toy_corpus(zipf=True)
    bounds = partition_vocab(corpus, 4)
    assert bounds[0] == 0 and bounds[-1] == corpus.vocab_size
    assert (np.diff(bounds) >= 0).all()
    freq = np.bincount(corpus.token_word, minlength=corpus.vocab_size)
    loads = [freq[bounds[j] : bounds[j + 1]].sum() for j in range(4)]
    # frequency-balanced: no slab should hold the entire mass
    assert max(loads) < corpus.num_tokens


def test_grid_shards_conserve_tokens():
    corpus = _toy_corpus()
    shards = shard_corpus_grid(corpus, 4, 2, block_size=8)
    assert int(shards.token_mask.sum()) == corpus.num_tokens
    assert shards.tokens_per_cell % 8 == 0
    # reconstruct the global (word, doc) multiset
    bounds = shards.vocab_bounds
    got = []
    for i in range(4):
        for j in range(2):
            sel = shards.token_mask[i, j].astype(bool)
            w = shards.token_word[i, j][sel] + bounds[j]
            d = shards.doc_map[i][shards.token_doc[i, j][sel]]
            got.extend(zip(w.tolist(), d.tolist()))
    want = list(zip(corpus.token_word.tolist(), corpus.token_doc.tolist()))
    assert sorted(got) == sorted(want)


def test_grid_shard_local_word_ids_in_range():
    corpus = _toy_corpus(zipf=True)
    shards = shard_corpus_grid(corpus, 2, 4, block_size=4)
    widths = np.diff(shards.vocab_bounds)
    for j in range(4):
        sel = shards.token_mask[:, j].astype(bool)
        if sel.any():
            w = shards.token_word[:, j][sel]
            assert w.min() >= 0 and w.max() < widths[j]


# ---------------------------------------------------------------- runtime


@pytest.mark.parametrize("pd,pv", [(4, 2), (2, 4)])
def test_grid_lda_counts_consistent(pd, pv):
    mesh = _mesh(pd, pv)
    corpus = _toy_corpus(num_docs=8 * pd, zipf=True)
    cfg = LdaConfig(topic_num=7, block_size=16, seed=3)
    model = GridLda(cfg, corpus, mesh=mesh)
    model.sweep(3)
    model.check_counts_consistent()

    # reassembled global tables satisfy the reference invariants
    nwk = model.global_nwk()
    nk = np.asarray(model.nk)
    np.testing.assert_array_equal(nwk.sum(axis=0), nk)
    assert int(nk.sum()) == corpus.num_tokens

    phi = model.phi()
    theta = model.theta()
    np.testing.assert_allclose(phi.sum(axis=1), 1.0, rtol=1e-6)
    np.testing.assert_allclose(theta.sum(axis=1), 1.0, rtol=1e-6)


def test_grid_lda_assignments_move():
    mesh = _mesh(4, 2)
    corpus = _toy_corpus(num_docs=32, zipf=True)
    cfg = LdaConfig(topic_num=5, block_size=16, seed=0)
    model = GridLda(cfg, corpus, mesh=mesh)
    z0 = np.asarray(model.z).copy()
    model.sweep(2)
    z1 = np.asarray(model.z)
    mask = model.shards.token_mask.astype(bool)
    assert (z0[mask] != z1[mask]).any()
    assert int(model.sweep_idx) == 2


def test_fused_grid_sweep_counts_consistent():
    """Grid (doc x vocab) sweep through the fused kernel (interpret mode):
    per-axis psum reconciliation must leave exact count tables."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from ldagibbssampling_tpu.parallel.grid import make_grid_sweep_fn

    fc = _toy_corpus(num_docs=32, vocab=64, seed=6)
    block = 128
    shards = shard_corpus_grid(fc, 2, 2, block_size=block)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("data", "vocab"))

    k = 5
    rng = np.random.default_rng(1)
    z = rng.integers(0, k, shards.token_word.shape).astype(np.int32)
    mask = shards.token_mask.astype(bool)
    ndk = np.zeros((2, shards.docs_per_shard, k), np.int32)
    nwk = np.zeros((2, shards.vocab_per_shard, k), np.int32)
    for i in range(2):
        for j in range(2):
            m = mask[i, j]
            np.add.at(ndk[i], (shards.token_doc[i, j][m], z[i, j][m]), 1)
            np.add.at(nwk[j], (shards.token_word[i, j][m], z[i, j][m]), 1)
    nk = nwk.sum((0, 1)).astype(np.int32)

    run = make_grid_sweep_fn(
        shards, mesh, alpha=0.5, beta=0.1, block_size=block, num_sweeps=2,
        use_pallas="fused", pallas_interpret=True,
    )
    zj, ndkj, nwkj, nkj, sweep = run(
        jnp.asarray(z), jnp.asarray(ndk), jnp.asarray(nwk), jnp.asarray(nk),
        jax.random.PRNGKey(3), jnp.int32(0),
    )
    z2 = np.asarray(zj)
    ndk2 = np.zeros_like(ndk)
    nwk2 = np.zeros_like(nwk)
    for i in range(2):
        for j in range(2):
            m = mask[i, j]
            np.add.at(ndk2[i], (shards.token_doc[i, j][m], z2[i, j][m]), 1)
            np.add.at(nwk2[j], (shards.token_word[i, j][m], z2[i, j][m]), 1)
    np.testing.assert_array_equal(np.asarray(ndkj), ndk2)
    np.testing.assert_array_equal(np.asarray(nwkj), nwk2)
    np.testing.assert_array_equal(np.asarray(nkj), nwk2.sum((0, 1)))
    assert int(sweep) == 2
