"""Freeze the trained WordPiece inventory into wordpiece.py.

Reproduces bpe.word_histogram's semantics in pure Python over the
sf0.001 documents parquet (lower, split on single spaces, drop
empties — byte-identical to the Spark pass on ASCII corpora), runs
learn_wordpiece, and REWRITES the FIXED_START/FIXED_CONT literals in
pigpen_spark/functions/wordpiece.py — written to the file from inside
the script (never scraped from stdout: the round-6 progress-bar
lesson).

Usage:  python tools/freeze_wordpiece.py [vocab_size]
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pigpen_spark.functions.wordpiece import learn_wordpiece  # noqa: E402


def main() -> None:
    vocab_size = int(sys.argv[1]) if len(sys.argv) > 1 else 72
    tbl = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                        columns=["text"])
    cnt: Counter[str] = Counter()
    for text in tbl.column("text").to_pylist():
        for w in ("" if text is None else text).lower().split(" "):
            if w:
                cnt[w] += 1
    start, cont = learn_wordpiece(sorted(cnt.items()), vocab_size)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "pigpen_spark", "functions",
        "wordpiece.py")
    src = open(path).read()
    s_lit = "[" + ", ".join(repr(x) for x in start) + "]"
    c_lit = "[" + ", ".join(repr(x) for x in cont) + "]"
    # Anchor on the LINE (re.M), not on a [^\]]* bracket scan — a piece
    # containing ']' or a quote edge case must not truncate the match
    # and corrupt the module.  repr() keeps every literal single-line,
    # so whole-line replacement is exact.  Refuse to write a module the
    # generated source can't re-import.
    src, n_s = re.subn(r"^FIXED_START: list\[str\] = .*$",
                       f"FIXED_START: list[str] = {s_lit}", src,
                       count=1, flags=re.M)
    src, n_c = re.subn(r"^FIXED_CONT: list\[str\] = .*$",
                       f"FIXED_CONT: list[str] = {c_lit}", src,
                       count=1, flags=re.M)
    if n_s != 1 or n_c != 1:
        raise SystemExit(
            f"freeze_wordpiece: expected exactly one FIXED_START and one "
            f"FIXED_CONT line, matched {n_s}/{n_c} — refusing to write")
    compile(src, path, "exec")  # syntax check BEFORE overwriting
    open(path, "w").write(src)
    print(f"froze {len(start)} start + {len(cont)} cont pieces")


if __name__ == "__main__":
    main()
