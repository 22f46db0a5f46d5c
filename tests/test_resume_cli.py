"""Full-run checkpoint (state + live hyperparameters) and CLI resume tests."""

import numpy as np

from ldagibbssampling_tpu.config import LdaConfig
from ldagibbssampling_tpu.corpus.flat import FlatCorpus
from ldagibbssampling_tpu.lda_io.checkpoint import restore_run, save_run
from ldagibbssampling_tpu.models.lda import LdaModel


def _corpus(seed=0):
    rng = np.random.default_rng(seed)
    ragged = [[int(x) for x in rng.integers(0, 30, size=20)] for _ in range(10)]
    return FlatCorpus.from_ragged(ragged, vocab_size=30)


def test_save_restore_run_roundtrips_hyper(tmp_path):
    corpus = _corpus()
    cfg = LdaConfig(topic_num=4, seed=0, block_size=32)
    model = LdaModel(cfg, corpus)
    model.sweep(5)
    model.alpha, model.beta = 0.123, 0.045  # pretend Minka moved them
    step = save_run(tmp_path / "ckpt", model.state, model.alpha, model.beta)
    assert step == 5

    fresh = LdaModel(cfg, corpus)
    state, a, b = restore_run(tmp_path / "ckpt", fresh.state)
    assert (a, b) == (0.123, 0.045)
    assert int(state.sweep) == 5
    np.testing.assert_array_equal(np.asarray(state.z), np.asarray(model.state.z))


def test_model_checkpoint_resume_continues_chain(tmp_path):
    corpus = _corpus()
    cfg = LdaConfig(topic_num=4, seed=7, block_size=32)

    ref = LdaModel(cfg, corpus)
    ref.sweep(10)

    a = LdaModel(cfg, corpus)
    a.sweep(6)
    a.save_checkpoint(tmp_path / "ckpt")

    b = LdaModel(cfg, corpus)
    assert b.restore_checkpoint(tmp_path / "ckpt") == 6
    b.sweep(4)
    np.testing.assert_array_equal(np.asarray(b.state.z), np.asarray(ref.state.z))
    np.testing.assert_array_equal(np.asarray(b.state.nwk), np.asarray(ref.state.nwk))


def test_cli_checkpoint_and_resume(tmp_path, monkeypatch, capsys):
    from ldagibbssampling_tpu.cli import main
    from ldagibbssampling_tpu.data import write_minicorpus

    monkeypatch.chdir(tmp_path)
    write_minicorpus("docs", num_docs=8)
    common = ["--docs", "docs", "--no-save", "-k", "3", "--seed", "1",
              "--checkpoint-dir", "ckpt"]

    # full uninterrupted run -> reference artifacts
    rc = main(common + ["--iterations", "8", "--checkpoint-every", "4"])
    assert rc == 0

    # "killed" run: stops at 4 sweeps (checkpointed), then resumed to 8
    rc = main(["--docs", "docs", "--no-save", "-k", "3", "--seed", "1",
               "--checkpoint-dir", "ckpt2", "--iterations", "4",
               "--checkpoint-every", "4"])
    assert rc == 0
    rc = main(["--docs", "docs", "--no-save", "-k", "3", "--seed", "1",
               "--checkpoint-dir", "ckpt2", "--iterations", "8", "--resume"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Resumed from sweep 4" in out
    # resumed run skips already-done sweeps: iterations 4..7 only
    assert "Iteration 3" not in out.split("Resumed from sweep 4")[1]


def test_cli_resume_requires_dir(tmp_path, monkeypatch):
    from ldagibbssampling_tpu.cli import main
    from ldagibbssampling_tpu.data import write_minicorpus

    monkeypatch.chdir(tmp_path)
    write_minicorpus("docs", num_docs=6)
    rc = main(["--docs", "docs", "--no-save", "--resume"])
    assert rc == 2
