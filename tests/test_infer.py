"""New-document fold-in inference tests."""

import numpy as np

from ldagibbssampling_tpu.lda_io.infer import infer_new_docs, read_docs_frozen_vocab


def _write(p, name, text):
    (p / name).write_text(text)


def test_frozen_vocab_drops_unknown(tmp_path):
    d = tmp_path / "new"
    d.mkdir()
    _write(d, "a.txt", "alpha beta gamma unknownword\n")
    _write(d, "b.txt", "beta beta the of\n")  # "the"/"of" are stopwords
    vocab = {"alpha": 0, "beta": 1, "gamma": 2}
    names, docs, dropped = read_docs_frozen_vocab(d, vocab)
    assert names == ["a.txt", "b.txt"]
    assert docs == [[0, 1, 2], [1, 1]]
    assert dropped == 1  # unknownword only; stopwords filtered before lookup


def test_infer_new_docs_writes_artifacts(tmp_path):
    d = tmp_path / "new"
    d.mkdir()
    _write(d, "doc0.txt", "apple apple banana\n")
    _write(d, "doc1.txt", "cherry cherry cherry\n")
    _write(d, "empty.txt", "the of and\n")  # all stopwords -> 0 tokens
    vocab = {"apple": 0, "banana": 1, "cherry": 2}
    # planted phi: topic 0 emits apple/banana, topic 1 emits cherry
    phi = np.array([[0.45, 0.45, 0.10],
                    [0.05, 0.05, 0.90]])
    out = tmp_path / "res"
    summary = infer_new_docs(phi, d, vocab, alpha=0.1, result_dir=out, seed=0)
    assert summary["num_docs"] == 3
    assert summary["num_tokens"] == 6
    theta = np.loadtxt(out / "inferred.theta")
    assert theta.shape == (3, 2)
    np.testing.assert_allclose(theta.sum(axis=1), 1.0, rtol=1e-6)
    # doc0 leans topic 0; doc1 leans topic 1; empty doc is uniform
    assert theta[0, 0] > 0.6
    assert theta[1, 1] > 0.6
    np.testing.assert_allclose(theta[2], 0.5, atol=1e-9)
    lines = (out / "inferred.tassign").read_text().splitlines()
    assert len(lines) == 3 and lines[2] == ""
    assert all(":" in pair for pair in lines[0].split("\t"))
    assert (out / "inferred.docs").read_text().splitlines() == [
        "doc0.txt", "doc1.txt", "empty.txt"
    ]


def test_cli_infer_docs(tmp_path, monkeypatch, capsys):
    from ldagibbssampling_tpu.cli import main
    from ldagibbssampling_tpu.data import write_minicorpus

    monkeypatch.chdir(tmp_path)
    write_minicorpus("docs", num_docs=8)
    # new docs reuse training vocabulary words
    new = tmp_path / "new"
    new.mkdir()
    first = sorted((tmp_path / "docs").iterdir())[0]
    _write(new, "unseen.txt", first.read_text())
    rc = main(["--docs", "docs", "--results", "out", "-k", "3",
               "--iterations", "60", "--begin-save-iters", "50",
               "--save-step", "10", "--seed", "1", "--infer-docs", str(new)])
    assert rc == 0
    theta = np.loadtxt(tmp_path / "out" / "inferred.theta")
    assert theta.shape == (3,)
    np.testing.assert_allclose(theta.sum(), 1.0, rtol=1e-6)
    assert "Inferred 1 new docs" in capsys.readouterr().out
