"""Corpus pipeline tests: stopword/noise filtering, first-seen vocab ids, CSR."""

import numpy as np

from ldagibbssampling_tpu.corpus.documents import Document, Documents, is_noise_word
from ldagibbssampling_tpu.corpus.flat import FlatCorpus
from ldagibbssampling_tpu.corpus.stopwords import STOPWORDS, is_stopword
from ldagibbssampling_tpu.data import generate_minicorpus, write_minicorpus


def test_stopword_list_scale_and_membership():
    assert 400 <= len(STOPWORDS) <= 700  # reference scale is ~400-500 entries
    assert is_stopword("the") and is_stopword("and") and is_stopword("would")
    assert not is_stopword("market") and not is_stopword("protein")


def test_noise_word_filter():
    assert is_noise_word("www.example.org")
    assert is_noise_word("foo.com")
    assert is_noise_word("http://x")
    assert is_noise_word("1234") and is_noise_word("!!") and is_noise_word("")
    assert not is_noise_word("hello") and not is_noise_word("abc123")


def test_document_first_seen_vocab_ids(tmp_path):
    (tmp_path / "a.txt").write_text("Market shares market THE rally\n")
    t2i, i2t, tc = {}, [], {}
    d = Document(tmp_path / "a.txt", t2i, i2t, tc)
    # "the" is a stopword and dropped; ids assigned in first-seen order
    assert i2t == ["market", "shares", "rally"]
    assert d.doc_words == [0, 1, 0, 2]
    assert tc == {"market": 2, "shares": 1, "rally": 1}


def test_documents_read_docs_sorted_order(tmp_path):
    (tmp_path / "b.txt").write_text("banana\n")
    (tmp_path / "a.txt").write_text("apple\n")
    docs = Documents().read_docs(tmp_path)
    # sorted order: a.txt first → "apple" gets id 0
    assert docs.index_to_term == ["apple", "banana"]
    assert docs.num_docs == 2


def test_add_document_tokens_matches_file_path(tmp_path):
    (tmp_path / "x.txt").write_text("Alpha beta-x THE www.spam.org gamma9\n")
    via_file = Documents().read_docs(tmp_path)
    via_mem = Documents()
    via_mem.add_document_tokens(["Alpha", "beta-x", "THE", "www.spam.org", "gamma9"])
    assert via_file.index_to_term == via_mem.index_to_term
    assert via_file.docs[0].doc_words == via_mem.docs[0].doc_words


def test_flat_corpus_csr(tmp_path):
    write_minicorpus(tmp_path, num_docs=5)
    docs = Documents().read_docs(tmp_path)
    fc = FlatCorpus.from_documents(docs)
    assert fc.num_docs == 5
    assert fc.num_tokens == docs.total_tokens
    assert fc.doc_ptr[0] == 0 and fc.doc_ptr[-1] == fc.num_tokens
    # token order is doc-major, preserving within-doc order
    assert fc.to_ragged() == [d.doc_words for d in docs.docs]
    # token_doc is consistent with doc_ptr
    for m in range(fc.num_docs):
        seg = fc.token_doc[fc.doc_ptr[m]:fc.doc_ptr[m + 1]]
        assert (seg == m).all()


def test_pad_to_masks_padding():
    fc = FlatCorpus.from_ragged([[0, 1, 2], [1, 1]], vocab_size=3)
    pc = fc.pad_to(4)
    assert pc.num_tokens == 8
    assert pc.num_real_tokens == 5
    assert pc.token_mask.sum() == 5
    assert (pc.token_mask[:5] == 1).all() and (pc.token_mask[5:] == 0).all()
    np.testing.assert_array_equal(pc.token_word[:5], [0, 1, 2, 1, 1])


def test_minicorpus_deterministic():
    a = generate_minicorpus(num_docs=3, seed=1)
    b = generate_minicorpus(num_docs=3, seed=1)
    c = generate_minicorpus(num_docs=3, seed=2)
    assert a == b
    assert a != c
    assert len(a) == 3


def test_select_docs_roundtrip_and_renumber():
    from ldagibbssampling_tpu.corpus.flat import FlatCorpus

    rng = np.random.default_rng(3)
    ragged = [[int(x) for x in rng.integers(0, 20, size=int(rng.integers(1, 9)))]
              for _ in range(12)]
    fc = FlatCorpus.from_ragged(ragged, vocab_size=20)
    sub = fc.select_docs(np.array([2, 5, 7]))
    assert sub.num_docs == 3
    assert sub.to_ragged() == [ragged[2], ragged[5], ragged[7]]
    # unsorted ids select the same docs (ascending original order)
    sub2 = fc.select_docs(np.array([7, 2, 5]))
    assert sub2.to_ragged() == sub.to_ragged()


def test_split_docs_partitions_corpus():
    from ldagibbssampling_tpu.corpus.flat import FlatCorpus

    rng = np.random.default_rng(4)
    ragged = [[int(x) for x in rng.integers(0, 30, size=10)] for _ in range(40)]
    fc = FlatCorpus.from_ragged(ragged, vocab_size=30)
    train, held = fc.split_docs(0.1, seed=7)
    assert held.num_docs == 4
    assert train.num_docs == 36
    assert train.num_tokens + held.num_tokens == fc.num_tokens
    # same vocab; deterministic per seed
    t2, h2 = fc.split_docs(0.1, seed=7)
    assert h2.to_ragged() == held.to_ragged()
    # every doc appears exactly once across the split
    all_docs = sorted(map(tuple, train.to_ragged() + held.to_ragged()))
    assert all_docs == sorted(map(tuple, ragged))
