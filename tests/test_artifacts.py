"""Artifact writer tests against the SURVEY.md §8.3 formats."""

import numpy as np

from ldagibbssampling_tpu.config import LdaConfig
from ldagibbssampling_tpu.corpus.flat import FlatCorpus
from ldagibbssampling_tpu.lda_io.artifacts import save_iterated_model

_RAGGED = [[0, 1, 2], [2, 1, 1, 0]]


def _write(tmp_path, top_words=2):
    fc = FlatCorpus.from_ragged(_RAGGED, vocab_size=3, vocab=("apple", "pear", "plum"))
    cfg = LdaConfig(topic_num=2, top_words=top_words)
    phi = np.array([[0.5, 0.3, 0.2], [0.1, 0.1, 0.8]])
    theta = np.array([[0.6, 0.4], [0.25, 0.75]])
    z = np.array([0, 0, 1, 1, 1, 0, 0])
    paths = save_iterated_model(tmp_path, 7, phi, theta, z, fc, cfg)
    return fc, {p.suffix: p for p in paths}


def test_all_five_artifacts_written(tmp_path):
    _, by_suffix = _write(tmp_path)
    assert set(by_suffix) == {".params", ".phi", ".theta", ".tassign", ".twords"}
    assert all(p.name.startswith("lda_7") for p in by_suffix.values())


def test_params_contents(tmp_path):
    _, by_suffix = _write(tmp_path)
    text = by_suffix[".params"].read_text()
    assert "alpha = 0.5" in text
    assert "docNum = 2" in text
    assert "termNum = 3" in text


def test_phi_theta_shapes_roundtrip(tmp_path):
    _, by_suffix = _write(tmp_path)
    phi_lines = by_suffix[".phi"].read_text().splitlines()
    assert len(phi_lines) == 2  # K rows
    assert all(len(l.split("\t")) == 3 for l in phi_lines)  # V columns
    back = np.array([[float(x) for x in l.split("\t")] for l in phi_lines])
    np.testing.assert_allclose(back, [[0.5, 0.3, 0.2], [0.1, 0.1, 0.8]])
    theta_lines = by_suffix[".theta"].read_text().splitlines()
    assert len(theta_lines) == 2  # M rows


def test_tassign_format(tmp_path):
    _, by_suffix = _write(tmp_path)
    lines = by_suffix[".tassign"].read_text().splitlines()
    assert lines[0] == "0:0\t1:0\t2:1"
    assert lines[1] == "2:1\t1:1\t1:0\t0:0"


def test_twords_top_n_and_tie_break(tmp_path):
    _, by_suffix = _write(tmp_path)
    lines = by_suffix[".twords"].read_text().splitlines()
    # topic 0: phi [0.5, 0.3, 0.2] -> apple, pear
    assert lines[0] == "topic 0 :"
    assert lines[1] == "\tapple" and lines[2] == "\tpear"
    # topic 1: phi [0.1, 0.1, 0.8] -> plum first, then the 0.1 tie broken by
    # ascending word index -> apple
    assert lines[3] == "topic 1 :"
    assert lines[4] == "\tplum" and lines[5] == "\tapple"
