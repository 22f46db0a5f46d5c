"""Parity tests: native (C++) corpus ingester vs the Python fidelity pipeline.

Reference semantics anchor: ``Documents.readDocs`` / ``Document`` /
``Document.isNoiseWord`` (``src/liuyang/nlp/lda/main/Documents.java``,
SURVEY.md §3.1) — both tiers must produce identical token ids, vocab order,
and term counts on ASCII corpora.
"""

from __future__ import annotations

import numpy as np
import pytest

from ldagibbssampling_tpu.corpus import native
from ldagibbssampling_tpu.corpus.documents import Documents
from ldagibbssampling_tpu.corpus.flat import FlatCorpus

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="no C++ toolchain / build failed"
)


def _python_flat(path):
    return FlatCorpus.from_documents(Documents().read_docs(path))


def _assert_same(a: FlatCorpus, b: FlatCorpus):
    np.testing.assert_array_equal(a.token_word, b.token_word)
    np.testing.assert_array_equal(a.token_doc, b.token_doc)
    np.testing.assert_array_equal(a.doc_ptr, b.doc_ptr)
    assert a.vocab == b.vocab
    assert a.vocab_size == b.vocab_size


def test_native_matches_python_on_minicorpus(tmp_path):
    from ldagibbssampling_tpu.data import write_minicorpus

    d = write_minicorpus(tmp_path / "docs", num_docs=20)
    _assert_same(native.read_docs_flat(d), _python_flat(d))


def test_native_matches_python_on_adversarial_corpus(tmp_path):
    docs = tmp_path / "docs"
    docs.mkdir()
    (docs / "a.txt").write_text(
        "The QUICK brown\tfox the THE a\fjumps\r\nover www.example.org "
        "foo.com http://x 1234 ... alpha-beta c3po \x01weird\x01 trailing  "
    )
    (docs / "b.txt").write_text("")  # empty file
    (docs / "c.txt").write_text("and or but the of")  # all stopwords
    (docs / "d.txt").write_text("alpha beta gamma alpha beta alpha")
    _assert_same(native.read_docs_flat(docs), _python_flat(docs))


def test_native_term_counts_match_python(tmp_path):
    docs = tmp_path / "docs"
    docs.mkdir()
    (docs / "x.txt").write_text("apple banana apple cherry banana apple")
    tw, ptr, vocab, counts = native.ingest_texts(
        [(docs / "x.txt").read_bytes()]
    )
    py = Documents().read_docs(docs)
    assert vocab == tuple(py.index_to_term)
    assert {v: int(c) for v, c in zip(vocab, counts)} == py.term_count
    assert list(tw) == py.docs[0].doc_words


def test_native_noise_and_stopword_filtering():
    tw, ptr, vocab, counts = native.ingest_texts(
        [b"the apple WWW.foo bar.com http://baz 42 !!! zebra"]
    )
    assert vocab == ("apple", "zebra")
    assert list(tw) == [0, 1]


def test_non_ascii_corpus_falls_back_to_python(tmp_path):
    docs = tmp_path / "docs"
    docs.mkdir()
    (docs / "a.txt").write_text("café résumé apple", encoding="utf-8")
    fc = native.read_docs_flat(docs)
    ref = _python_flat(docs)
    _assert_same(fc, ref)
    # python pipeline lowercases unicode; the word must be present
    assert "café" in fc.vocab


def test_directory_order_flag(tmp_path):
    docs = tmp_path / "docs"
    docs.mkdir()
    (docs / "b.txt").write_text("bravo")
    (docs / "a.txt").write_text("alpha")
    fc = native.read_docs_flat(docs)  # sorted order: a first
    assert fc.vocab == ("alpha", "bravo")


def test_empty_directory(tmp_path):
    docs = tmp_path / "docs"
    docs.mkdir()
    fc = native.read_docs_flat(docs)
    assert fc.num_docs == 0 and fc.num_tokens == 0


def test_force_python_matches_native(tmp_path):
    from ldagibbssampling_tpu.data import write_minicorpus

    d = write_minicorpus(tmp_path / "docs", num_docs=6)
    _assert_same(
        native.read_docs_flat(d, force_python=True),
        native.read_docs_flat(d),
    )
