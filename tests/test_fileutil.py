"""Tokenizer / file IO parity tests (reference ``com/FileUtil.java`` semantics)."""

from pathlib import Path

from ldagibbssampling_tpu.corpus import fileutil


def test_split_java_delimiter_set():
    # StringTokenizer default delims: space, tab, \n, \r, \f
    assert fileutil.tokenize("a b\tc\nd\re\x0cf") == ["a", "b", "c", "d", "e", "f"]


def test_split_java_drops_empty_runs():
    assert fileutil.tokenize("  a   b  ") == ["a", "b"]
    assert fileutil.tokenize("") == []
    assert fileutil.tokenize("   \t\t ") == []


def test_split_java_does_not_split_vertical_tab_or_nbsp():
    # \x0b and U+00A0 are NOT StringTokenizer delimiters (str.split() would split)
    assert fileutil.tokenize("a\x0bb") == ["a\x0bb"]
    assert fileutil.tokenize("a b") == ["a b"]


def test_tokenize_and_lowercase():
    assert fileutil.tokenize_and_lowercase("Hello WORLD") == ["hello", "world"]


def test_java_trim_control_chars():
    # Java trim() strips chars <= U+0020 (e.g. \x01); str.strip() would keep it
    assert fileutil._java_trim("\x01abc\x01") == "abc"
    # Java trim() KEEPS U+00A0; str.strip() would remove it
    assert fileutil._java_trim(" abc") == " abc"
    assert fileutil._java_trim("  ") == ""


def test_read_write_lines_roundtrip(tmp_path: Path):
    p = tmp_path / "f.txt"
    fileutil.write_lines(p, ["one", "two three", ""])
    assert fileutil.read_lines(p) == ["one", "two three", ""]


def test_read_lines_crlf(tmp_path: Path):
    p = tmp_path / "crlf.txt"
    p.write_bytes(b"a\r\nb\nc")
    assert fileutil.read_lines(p) == ["a", "b", "c"]


def test_mkdir(tmp_path: Path):
    d = tmp_path / "x" / "y"
    fileutil.mkdir(d)
    assert d.is_dir()
