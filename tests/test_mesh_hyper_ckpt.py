"""Sharded Minka hyperparameter optimization + checkpoint/resume on the mesh
runtimes (VERDICT r2 item 5; BASELINE config 4 "α/β optimization via
collectives"; SURVEY.md §5 checkpoint row).

Runs on the 8-virtual-device CPU mesh (tests/conftest.py).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ldagibbssampling_tpu.config import LdaConfig  # noqa: E402
from ldagibbssampling_tpu.corpus.flat import FlatCorpus  # noqa: E402
from ldagibbssampling_tpu.models.hyper import optimize_alpha, optimize_beta  # noqa: E402
from ldagibbssampling_tpu.parallel.adlda import ShardedLda  # noqa: E402
from ldagibbssampling_tpu.parallel.grid import GridLda  # noqa: E402
from ldagibbssampling_tpu.parallel.tokenshard import TokenShardedLda  # noqa: E402


def _corpus(seed=0, docs=24, vocab=60, length=40):
    rng = np.random.default_rng(seed)
    ragged = [
        [int(x) for x in rng.integers(0, vocab, size=length)] for _ in range(docs)
    ]
    return FlatCorpus.from_ragged(ragged, vocab_size=vocab)


def _gather_ndk(model):
    """Global [M, K] doc-topic table from a doc-sharded runtime."""
    ndk = np.asarray(model.ndk)
    m = model.corpus.num_docs
    out = np.zeros((m, ndk.shape[-1]), np.int32)
    for s in range(model.shards.doc_map.shape[0]):
        for local, g in enumerate(model.shards.doc_map[s]):
            if g >= 0:
                out[g] = ndk[s, local]
    return out


def test_sharded_minka_matches_serial_adlda():
    corpus = _corpus()
    cfg = LdaConfig(topic_num=5, seed=0, block_size=64)
    model = ShardedLda(cfg, corpus, num_shards=4)
    model.sweep(3)
    a, b = model.optimize_hyperparameters(iters=4)
    # serial reference on the gathered global tables
    a_ref = float(optimize_alpha(
        jnp.asarray(_gather_ndk(model)), jnp.asarray(corpus.doc_lengths()),
        cfg.alpha, iters=4))
    b_ref = float(optimize_beta(model.nwk, model.nk, cfg.beta, iters=4))
    assert a == pytest.approx(a_ref, rel=1e-4)
    assert b == pytest.approx(b_ref, rel=1e-4)
    assert a != cfg.alpha and b != cfg.beta
    # updated values flow into further sweeps without error
    model.sweep(2)
    model.check_counts_consistent()


def test_grid_minka_matches_serial():
    corpus = _corpus(seed=1)
    cfg = LdaConfig(topic_num=5, seed=0, block_size=64)
    model = GridLda(cfg, corpus, p_data=2, p_vocab=2)
    model.sweep(3)
    a, b = model.optimize_hyperparameters(iters=4)
    a_ref = float(optimize_alpha(
        jnp.asarray(_gather_ndk(model)), jnp.asarray(corpus.doc_lengths()),
        cfg.alpha, iters=4))
    b_ref = float(optimize_beta(
        jnp.asarray(model.global_nwk()), model.nk, cfg.beta, iters=4))
    assert a == pytest.approx(a_ref, rel=1e-4)
    assert b == pytest.approx(b_ref, rel=1e-4)
    model.sweep(2)
    model.check_counts_consistent()


def test_tokenshard_minka_runs():
    corpus = _corpus(seed=2)
    cfg = LdaConfig(topic_num=5, seed=0, block_size=64)
    model = TokenShardedLda(cfg, corpus, num_shards=4)
    model.sweep(3)
    a, b = model.optimize_hyperparameters(iters=4)
    assert a != cfg.alpha and b != cfg.beta
    model.sweep(2)
    model.check_counts_consistent()


@pytest.mark.parametrize("cls,kw", [
    (ShardedLda, {"num_shards": 4}),
    (GridLda, {"p_data": 2, "p_vocab": 2}),
    (TokenShardedLda, {"num_shards": 4}),
])
def test_mesh_checkpoint_resume_identical_chain(tmp_path, cls, kw):
    corpus = _corpus(seed=3)
    cfg = LdaConfig(topic_num=4, seed=7, block_size=64)

    ref = cls(cfg, corpus, **kw)
    ref.sweep(8)

    a = cls(cfg, corpus, **kw)
    a.sweep(4)
    a.optimize_hyperparameters()  # α/β must survive the round-trip
    assert a.save_checkpoint(tmp_path / "ckpt") == 4

    b = cls(cfg, corpus, **kw)
    assert b.restore_checkpoint(tmp_path / "ckpt") == 4
    assert (b.alpha, b.beta) == (a.alpha, a.beta)
    # the restored chain continues EXACTLY like an uninterrupted one would
    # have with the same live hyperparameters
    ref2 = cls(cfg, corpus, **kw)
    ref2.sweep(4)
    ref2.optimize_hyperparameters()
    ref2.sweep(4)
    b.sweep(4)
    np.testing.assert_array_equal(np.asarray(b.z), np.asarray(ref2.z))
    np.testing.assert_array_equal(np.asarray(b.nwk), np.asarray(ref2.nwk))
    b.check_counts_consistent()


def test_cli_mesh_optimize_checkpoint_resume(tmp_path, monkeypatch, capsys):
    """VERDICT r2 item 5 done-criterion: the full CLI flag combination
    round-trips on the CPU mesh with an identical-chain resume."""
    from ldagibbssampling_tpu.cli import main
    from ldagibbssampling_tpu.data import write_minicorpus

    monkeypatch.chdir(tmp_path)
    write_minicorpus("docs", num_docs=8)
    base = ["--docs", "docs", "--no-save", "-k", "3", "--seed", "1",
            "--mesh", "data=4", "--optimize-hyper-every", "10",
            "--checkpoint-every", "20"]

    rc = main(base + ["--checkpoint-dir", "ckpt", "--iterations", "20"])
    assert rc == 0
    rc = main(base + ["--checkpoint-dir", "ckpt", "--iterations", "40",
                      "--resume"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Resumed from sweep 20" in out
