"""Benchmark ladder harness + synthetic corpora tests (tiny scales)."""

import json

import numpy as np

from ldagibbssampling_tpu.benchmarks.ladder import main as ladder_main, rung1
from ldagibbssampling_tpu.data.synthetic import planted_topic_corpus, zipf_corpus


def test_zipf_corpus_shapes():
    c = zipf_corpus(50, 300, mean_doc_len=20, seed=0)
    assert c.num_docs == 50
    assert c.num_tokens == int(c.doc_ptr[-1])
    assert c.token_word.max() < 300
    np.testing.assert_array_equal(np.diff(c.doc_ptr) >= 1, True)


def test_planted_corpus_has_true_phi():
    c, phi = planted_topic_corpus(30, 200, 5, mean_doc_len=25, seed=1)
    assert phi.shape == (5, 200)
    np.testing.assert_allclose(phi.sum(axis=1), 1.0, rtol=1e-9)
    assert c.num_tokens > 0


def test_rung1_oracle_vs_blocked_close():
    res = rung1(scale=1.0, sweeps=30)
    assert res["rung"] == 1
    # matched-budget runs land in the same perplexity regime
    assert res["rel_gap"] < 0.2


def test_ladder_main_writes_report(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc = ladder_main(["--rungs", "1", "--scale", "0.002", "--out", "r.json"])
    assert rc == 0
    rep = json.loads((tmp_path / "r.json").read_text())
    assert rep["rungs"][0]["rung"] == 1
    assert "wall_s" in rep["rungs"][0]
