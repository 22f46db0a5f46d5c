"""File and tokenization utilities.

Behavioral parity with the reference's ``com/FileUtil.java`` (see SURVEY.md §2.1 #4):
``readLines`` / ``writeLines`` / ``tokenizeAndLowerCase`` / ``mkdir``.  The reference
tokenizes with ``java.util.StringTokenizer`` — i.e. a plain whitespace split with
empty tokens dropped — then lowercases and trims.  We reproduce exactly that
semantics (``str.split()`` with no argument has the same drop-empty whitespace-run
behavior as ``StringTokenizer``'s default delimiter set ``" \t\n\r\f"``).
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterable, List

# StringTokenizer's default delimiters: space, tab, newline, carriage return, form feed.
_JAVA_DELIMS = " \t\n\r\x0c"


def read_lines(path: str | Path) -> List[str]:
    """Read a text file into a list of lines (reference ``FileUtil.readLines``).

    Java's BufferedReader.readLine strips the terminator; so do we.  Decoding is
    UTF-8 with replacement so a stray byte never crashes ingestion.
    """
    with open(path, "r", encoding="utf-8", errors="replace") as f:
        return [line.rstrip("\n").rstrip("\r") for line in f]


def write_lines(path: str | Path, lines: Iterable[object]) -> None:
    """Write items one per line (reference ``FileUtil.writeLines``)."""
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    with open(p, "w", encoding="utf-8") as f:
        for item in lines:
            f.write(f"{item}\n")


def tokenize(line: str) -> List[str]:
    """Whitespace tokenize, preserving case (reference ``FileUtil.tokenize``)."""
    return _split_java(line)


def tokenize_and_lowercase(line: str) -> List[str]:
    """Whitespace tokenize + lowercase + trim (``FileUtil.tokenizeAndLowerCase``)."""
    return [tok.lower().strip() for tok in _split_java(line)]


def _split_java(line: str) -> List[str]:
    # Split on runs of the StringTokenizer delimiter set, dropping empties.
    out: List[str] = []
    cur: list[str] = []
    for ch in line:
        if ch in _JAVA_DELIMS:
            if cur:
                out.append("".join(cur))
                cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def mkdir(path: str | Path) -> None:
    """Create a directory tree if missing (reference ``FileUtil.mkdir``)."""
    Path(path).mkdir(parents=True, exist_ok=True)
