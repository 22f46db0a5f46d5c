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


def test_cvb0_checkpoint_resume_identical_trajectory(tmp_path):
    # round-4 verdict item 8: CVB0 is deterministic, so a kill-and-resume
    # run must reproduce the uninterrupted trajectory bitwise
    from ldagibbssampling_tpu.backends.cvb0 import Cvb0Model

    corpus = _corpus(seed=3)
    cfg = LdaConfig(topic_num=4, seed=1, block_size=32, backend="cvb0")
    ref = Cvb0Model(cfg, corpus)
    ref.sweep(6)

    a = Cvb0Model(cfg, corpus)
    a.sweep(3)
    assert a.save_checkpoint(tmp_path / "ck") == 3
    b = Cvb0Model(cfg, corpus)
    assert b.restore_checkpoint(tmp_path / "ck") == 3
    assert b.sweeps_done == 3
    b.sweep(3)
    np.testing.assert_array_equal(np.asarray(b.gamma), np.asarray(ref.gamma))
    np.testing.assert_allclose(b.phi(), ref.phi(), rtol=1e-6)


def test_svi_checkpoint_resume_identical_trajectory(tmp_path):
    # SVI resume restores lambda, the gamma cache, the step counter AND the
    # host shuffler state, so the remaining minibatch sequence is identical
    from ldagibbssampling_tpu.backends.svi import SviModel

    corpus = _corpus(seed=4)
    cfg = LdaConfig(topic_num=4, seed=2, backend="svi")
    ref = SviModel(cfg, corpus, batch_size=4)
    ref.sweep(4)

    a = SviModel(cfg, corpus, batch_size=4)
    a.sweep(2)
    assert a.save_checkpoint(tmp_path / "ck") == 2
    b = SviModel(cfg, corpus, batch_size=4)
    assert b.restore_checkpoint(tmp_path / "ck") == 2
    b.sweep(2)
    np.testing.assert_allclose(np.asarray(b.lam), np.asarray(ref.lam),
                               rtol=1e-5)
    np.testing.assert_allclose(b.theta(), ref.theta(), rtol=1e-4)


def test_cli_svi_checkpoint_resume(tmp_path, monkeypatch):
    # the CLI surface: --backend svi --checkpoint-every ... --resume
    from ldagibbssampling_tpu.cli import main
    from ldagibbssampling_tpu.data import write_minicorpus

    monkeypatch.chdir(tmp_path)
    write_minicorpus("docs", num_docs=8)
    common = ["--docs", "docs", "--no-save", "--backend", "svi", "-k", "3",
              "--seed", "5", "--checkpoint-dir", "ck"]
    rc = main(common + ["--iterations", "3", "--checkpoint-every", "1"])
    assert rc == 0
    rc = main(common + ["--iterations", "6", "--checkpoint-every", "1",
                        "--resume"])
    assert rc == 0
    from ldagibbssampling_tpu.lda_io.checkpoint import latest_step

    assert latest_step("ck") == 6


def test_cli_smc_checkpoint_refused(tmp_path, monkeypatch, capsys):
    # smc/warp: checkpointing is a documented non-goal -> clean CLI error
    from ldagibbssampling_tpu.cli import main
    from ldagibbssampling_tpu.data import write_minicorpus

    monkeypatch.chdir(tmp_path)
    write_minicorpus("docs", num_docs=6)
    rc = main(["--docs", "docs", "--no-save", "--backend", "smc", "-k", "3",
               "--iterations", "2", "--checkpoint-dir", "ck",
               "--checkpoint-every", "1"])
    assert rc == 2
    assert "does not support checkpointing" in capsys.readouterr().err
