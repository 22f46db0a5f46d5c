"""ctypes bindings for the native (C++) corpus-ingest tier.

The reference's ingestion (``Documents.readDocs``, ``src/liuyang/nlp/lda/
main/Documents.java`` — SURVEY.md §3.1) is pure Java; this framework keeps a
pure-Python fidelity pipeline (``corpus/documents.py``) and adds this native
tier for the large benchmark rungs, where host-side preprocessing otherwise
dominates wall-clock (NYTimes 300k / Wikipedia 1M / PubMed 8.2M docs).

Semantics are identical to the Python pipeline for ASCII corpora (verified by
``tests/test_native_corpus.py``); the native lowercaser covers ASCII A–Z only,
so non-ASCII corpora are routed to the Python pipeline automatically.

The shared library is built from ``native/ldacorpus.cc`` by ``make -C native``
or transparently on first use (g++ is part of the supported toolchain); when
neither works, everything falls back to pure Python.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

from ldagibbssampling_tpu.corpus.flat import FlatCorpus

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False

_PKG_DIR = Path(__file__).resolve().parent.parent
_SO_PATH = _PKG_DIR / "_native" / "libldacorpus.so"
_SRC_PATH = _PKG_DIR.parent / "native" / "ldacorpus.cc"


def _build() -> bool:
    """Compile the shared library if a toolchain is available."""
    if not _SRC_PATH.exists():
        return False
    _SO_PATH.parent.mkdir(parents=True, exist_ok=True)
    cmd = [
        os.environ.get("CXX", "g++"), "-O2", "-std=c++17", "-fPIC", "-shared",
        "-o", str(_SO_PATH), str(_SRC_PATH),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None when unavailable."""
    global _LIB, _LIB_TRIED
    with _LOCK:
        if _LIB_TRIED:
            return _LIB
        _LIB_TRIED = True
        if not _SO_PATH.exists() and not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_SO_PATH))
        except OSError:
            return None
        lib.lda_ingest.restype = ctypes.c_void_p
        lib.lda_ingest.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ]
        for name in ("lda_num_tokens", "lda_num_docs", "lda_vocab_size",
                     "lda_vocab_bytes"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int64
            fn.argtypes = [ctypes.c_void_p]
        lib.lda_copy_tokens.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.lda_copy_doc_ptr.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.lda_copy_vocab.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.lda_copy_term_counts.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.lda_destroy.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return load_library() is not None


def _offsets(chunks: Sequence[bytes]) -> np.ndarray:
    off = np.zeros(len(chunks) + 1, dtype=np.int64)
    np.cumsum([len(c) for c in chunks], out=off[1:])
    return off


def ingest_texts(
    texts: Sequence[bytes],
    stopwords: Optional[Sequence[str]] = None,
) -> tuple[np.ndarray, np.ndarray, tuple[str, ...], np.ndarray]:
    """Run the native ingester over in-memory document bytes.

    Returns ``(token_word [T] int32, doc_ptr [M+1] int64, vocab, term_counts)``.
    Raises ``RuntimeError`` when the native library is unavailable — callers
    wanting transparent fallback use :func:`read_docs_flat`.
    """
    lib = load_library()
    if lib is None:
        raise RuntimeError("native corpus library unavailable (no g++ / build failed)")
    if stopwords is None:
        from ldagibbssampling_tpu.corpus.stopwords import STOPWORDS

        stopwords = sorted(STOPWORDS)
    stop_b = [s.encode("utf-8") for s in stopwords]
    text_buf = b"".join(texts)
    doc_off = _offsets(texts)
    stop_buf = b"".join(stop_b)
    stop_off = _offsets(stop_b)

    h = lib.lda_ingest(
        text_buf, doc_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(texts),
        stop_buf, stop_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(stop_b),
    )
    if not h:
        raise RuntimeError("native ingest failed")
    try:
        t = lib.lda_num_tokens(h)
        m = lib.lda_num_docs(h)
        v = lib.lda_vocab_size(h)
        vb = lib.lda_vocab_bytes(h)
        token_word = np.empty(t, dtype=np.int32)
        doc_ptr = np.empty(m + 1, dtype=np.int64)
        vocab_buf = ctypes.create_string_buffer(max(1, vb))
        vocab_off = np.empty(v + 1, dtype=np.int64)
        term_counts = np.empty(v, dtype=np.int64)
        if t:
            lib.lda_copy_tokens(h, token_word.ctypes.data)
        lib.lda_copy_doc_ptr(h, doc_ptr.ctypes.data)
        lib.lda_copy_vocab(h, vocab_buf, vocab_off.ctypes.data)
        if v:
            lib.lda_copy_term_counts(h, term_counts.ctypes.data)
        raw = vocab_buf.raw[:vb]
        vocab = tuple(
            raw[vocab_off[i]:vocab_off[i + 1]].decode("utf-8")
            for i in range(v)
        )
        return token_word, doc_ptr, vocab, term_counts
    finally:
        lib.lda_destroy(h)


def read_docs_flat(
    path: str | Path,
    *,
    directory_order: bool = False,
    force_python: bool = False,
) -> FlatCorpus:
    """Directory ingestion straight to a :class:`FlatCorpus`.

    Uses the native tier when available *and* the corpus is pure ASCII
    (identical output to the Python pipeline — the lowercase step is the only
    byte-dependent operation); otherwise falls back to
    ``Documents.read_docs`` + ``FlatCorpus.from_documents``.
    """
    p = Path(path)
    names = os.listdir(p)
    if not directory_order:
        names = sorted(names)
    files = [p / n for n in names if (p / n).is_file()]

    if not force_python and native_available():
        texts: List[bytes] = [f.read_bytes() for f in files]
        if all(_is_ascii(b) for b in texts):
            token_word, doc_ptr, vocab, _ = ingest_texts(texts)
            token_doc = np.repeat(
                np.arange(len(files), dtype=np.int32), np.diff(doc_ptr)
            )
            return FlatCorpus(
                token_word=token_word,
                token_doc=token_doc,
                doc_ptr=doc_ptr.astype(np.int32),
                vocab_size=len(vocab),
                vocab=vocab,
            )

    from ldagibbssampling_tpu.corpus.documents import Documents

    docs = Documents().read_docs(p, directory_order=directory_order)
    return FlatCorpus.from_documents(docs)


def _is_ascii(b: bytes) -> bool:
    try:
        b.decode("ascii")
        return True
    except UnicodeDecodeError:
        return False
