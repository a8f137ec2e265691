"""WordPiece subword tokenizer (Schuster & Nakajima 2012; the BERT
tokenizer) — greedy longest-match-first segmentation, completing the
tokenizer family next to :mod:`pigpen_spark.functions.bpe` (bottom-up
merging) and :mod:`pigpen_spark.functions.unigram` (global-optimum
Viterbi): WordPiece is the deterministic longest-prefix walker, the
fastest of the three at encode time and the one BERT-family models ship.

Reference parity note: the reference engine has no tokenizer at all —
this module is extension surface for the LLM-pipeline north star.

Semantics contract (what makes the encoder hash-exact across engines):
at each position take the LONGEST vocabulary piece (word-initial pieces
and ``##``-continuation pieces are separate inventories, per BERT); if
no piece matches at any position, or the word exceeds ``max_word``
characters (HuggingFace's ``max_input_chars_per_word`` analog), the
WHOLE word becomes ``[UNK]``.  No scores, no ties — greedy
longest-match is already deterministic, so the DuckDB oracle
(:func:`wordpiece_encode_fixed_sql`) replays it exactly with one
chained CTE per greedy step over the distinct-words table (each step
consumes ≥1 character, so ``max_word`` stages always suffice — the
unigram/pagerank fixed-iteration-unrolling doctrine).

TRAINING (:func:`train_wordpiece`) uses the published WordPiece merge
criterion — merge the adjacent symbol pair maximizing
count(ab) / (count(a)·count(b)) — compared in cross-multiplied integer
arithmetic so retraining is bit-reproducible.  Counting is the only
corpus-sized pass (the shared one-groupBy word histogram); the merge
loop runs driver-side over the histogram, like train_bpe.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_PIECE = 4          #: longest piece (marker-stripped) considered anywhere
MAX_WORD = 16          #: longest word; beyond it the word is [UNK] by contract
UNK = "[UNK]"


def greedy_encode_word(word: str, start_vocab: Iterable[str],
                       cont_vocab: Iterable[str],
                       max_piece: int = MAX_PIECE,
                       max_word: int = MAX_WORD) -> tuple[list[str], int]:
    """Segment one word greedily: longest matching piece at each
    position (word-initial pieces from ``start_vocab``, continuations
    from ``cont_vocab``, which holds the pieces WITHOUT the ``##``
    marker; emitted pieces carry it).  Returns (pieces, is_unk) —
    an uncoverable or over-long word is ``([UNK], 1)``, the classic
    WordPiece whole-word failure mode."""
    start, cont = set(start_vocab), set(cont_vocab)
    if not word or len(word) > max_word:
        return [UNK], 1
    pieces: list[str] = []
    p = 0
    while p < len(word):
        k = min(max_piece, len(word) - p)
        voc = start if p == 0 else cont
        while k > 0 and word[p:p + k] not in voc:
            k -= 1
        if k == 0:
            return [UNK], 1
        pieces.append(word[p:p + k] if p == 0 else "##" + word[p:p + k])
        p += k
    return pieces, 0


def wordpiece_encode(df: DataFrame, id_col: str, text_col: str,
                     start_vocab: Iterable[str], cont_vocab: Iterable[str],
                     max_piece: int = MAX_PIECE,
                     max_word: int = MAX_WORD) -> DataFrame:
    """Encode every document against a (trained or fixed) WordPiece
    inventory: Arrow-batched mapInPandas with a per-batch word cache
    (Zipfian text re-encodes the same words constantly — the same cache
    as bpe_encode/unigram_encode).  The vocabulary rides to executors
    as a closure literal (piece inventories are KBs).

    Returns (id, pieces array<string>, n_pieces, n_unk_words)."""
    start, cont = frozenset(start_vocab), frozenset(cont_vocab)

    def work(batches: Iterator) -> Iterator:
        import pandas as pd

        cache: dict[str, tuple[list[str], int]] = {}
        for pdf in batches:
            rows = []
            for rid, text in zip(pdf["id"], pdf["text"]):
                pieces: list[str] = []
                unks = 0
                for w in ("" if text is None else text).lower().split(" "):
                    if not w:
                        continue
                    if w not in cache:
                        cache[w] = greedy_encode_word(
                            w, start, cont, max_piece, max_word)
                    p, u = cache[w]
                    pieces.extend(p)
                    unks += u
                rows.append({"id": rid, "pieces": pieces,
                             "n_pieces": len(pieces), "n_unk_words": unks})
            yield pd.DataFrame(rows)

    src = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    return src.mapInPandas(
        work,
        schema="id long, pieces array<string>, n_pieces long, n_unk_words long")


def _q(s: str) -> str:
    """SQL single-quote a piece literal (ADVICE r6: trained pieces can
    contain apostrophes)."""
    return "'" + s.replace("'", "''") + "'"


def _match_case_sql(pieces: Iterable[str], w: str, p: str,
                    max_piece: int) -> str:
    """CASE yielding the LENGTH of the longest piece of the given
    inventory matching ``w`` at 1-based position ``p`` (0 = no match).
    Longest-first WHEN order IS the greedy policy; a k-char substr near
    the word end comes back shorter and cannot equal any k-char piece,
    so no end guard is needed."""
    by_len: dict[int, list[str]] = {}
    for pc in pieces:
        by_len.setdefault(len(pc), []).append(pc)
    whens = "".join(
        f" WHEN substr({w}, {p}, {k}) IN ({', '.join(_q(x) for x in sorted(by_len[k]))}) THEN {k}"
        for k in sorted(by_len, reverse=True) if k <= max_piece)
    return f"(CASE{whens} ELSE 0 END)"


def wordpiece_encode_fixed_sql(table: str, id_col: str, text_col: str,
                               start_vocab: Iterable[str],
                               cont_vocab: Iterable[str],
                               max_piece: int = MAX_PIECE,
                               max_word: int = MAX_WORD) -> str:
    """DuckDB oracle for :func:`wordpiece_encode` under fixed
    inventories.  The greedy walk unrolls as one chained CTE per step
    over the DISTINCT-WORDS table (state struct {p: next position,
    s: pieces-so-far, u: unk flag}; each step consumes ≥1 char so
    ``max_word`` stages always finish); segmentations join back to the
    exploded token stream and re-aggregate per document in token order.
    Emits (doc_id, pieces, n_pieces, n_unk_words) with the piece stream
    space-joined (catalog rule: bags stringify)."""
    start, cont = sorted(set(start_vocab)), sorted(set(cont_vocab))
    toks = f"list_filter(string_split(lower({text_col}), ' '), t -> t <> '')"

    def stage(i: int) -> str:
        g = f"g{i - 1}"
        p = f"struct_extract({g}, 'p')"
        s = f"struct_extract({g}, 's')"
        k_start = _match_case_sql(start, "w", p, max_piece)
        k_cont = _match_case_sql(cont, "w", p, max_piece)
        k = f"(CASE WHEN {p} = 1 THEN {k_start} ELSE {k_cont} END)"
        piece = (f"(CASE WHEN {p} = 1 THEN substr(w, {p}, kk) "
                 f"ELSE '##' || substr(w, {p}, kk) END)")
        nxt = (f"(CASE WHEN struct_extract({g}, 'u') OR {p} > len(w) THEN {g} "
               f"WHEN kk = 0 THEN {{'p': 0, 's': '', 'u': true}} "
               f"ELSE {{'p': ({p} + kk)::INTEGER, "
               f"'s': (CASE WHEN {s} = '' THEN {piece} "
               f"ELSE {s} || ' ' || {piece} END), 'u': false}} END)")
        # let-bind kk once per row via a single-element comprehension
        return f"[{nxt} for kk in [{k}]][1]"

    stages = ",\n    ".join(
        f"d{i} AS (SELECT w, {stage(i)} AS g{i} FROM d{i - 1})"
        for i in range(1, max_word + 1))
    gN = f"g{max_word}"
    return f"""
    WITH base AS (SELECT {id_col} AS doc_id, {toks} AS toks FROM {table}),
    words AS (SELECT DISTINCT unnest(toks) AS w FROM base),
    d0 AS (SELECT w,
                  (CASE WHEN len(w) > {max_word}
                        THEN {{'p': 0, 's': '', 'u': true}}
                        ELSE {{'p': 1, 's': '', 'u': false}} END) AS g0
           FROM words),
    {stages},
    seg AS (
      SELECT w,
             (CASE WHEN struct_extract({gN}, 'u') THEN '{UNK}'
                   ELSE struct_extract({gN}, 's') END) AS pieces_w,
             (CASE WHEN struct_extract({gN}, 'u') THEN 1
                   ELSE len(string_split(struct_extract({gN}, 's'), ' '))
              END)::BIGINT AS np_w,
             (CASE WHEN struct_extract({gN}, 'u') THEN 1 ELSE 0
              END)::BIGINT AS unk_w
      FROM d{max_word}
    ),
    tok AS (
      SELECT doc_id, unnest(toks) AS w, generate_subscripts(toks, 1) AS i
      FROM base
    ),
    perdoc AS (
      SELECT t.doc_id,
             array_to_string(list(s.pieces_w ORDER BY t.i), ' ') AS pieces,
             sum(s.np_w)::BIGINT AS n_pieces,
             sum(s.unk_w)::BIGINT AS n_unk_words
      FROM tok t JOIN seg s ON t.w = s.w
      GROUP BY t.doc_id
    )
    SELECT b.doc_id,
           coalesce(p.pieces, '') AS pieces,
           coalesce(p.n_pieces, 0)::BIGINT AS n_pieces,
           coalesce(p.n_unk_words, 0)::BIGINT AS n_unk_words
    FROM base b LEFT JOIN perdoc p ON b.doc_id = p.doc_id
    """


def _best_pair(sym_cnt: dict[str, int], pair_cnt: dict[tuple[str, str], int],
               max_piece: int) -> tuple[str, str] | None:
    """The WordPiece merge argmax: the adjacent pair maximizing
    count(ab)/(count(a)·count(b)) — NOT the raw pair count (that is
    BPE's criterion) — compared cross-multiplied in integers, ties to
    the lexicographically smallest pair.  Pairs whose stripped result
    would exceed ``max_piece`` are ineligible (the SQL oracle's match
    width)."""
    def strip(sym: str) -> str:
        return sym[2:] if sym.startswith("##") else sym

    best: tuple[str, str] | None = None
    for (a, b), c in pair_cnt.items():
        if len(strip(a)) + len(strip(b)) > max_piece:
            continue
        if best is None:
            best = (a, b)
            continue
        ba, bb = best
        lhs = c * sym_cnt[ba] * sym_cnt[bb]
        rhs = pair_cnt[best] * sym_cnt[a] * sym_cnt[b]
        if lhs > rhs or (lhs == rhs and (a, b) < best):
            best = (a, b)
    return best


def learn_wordpiece(hist: list[tuple[str, int]], vocab_size: int = 64,
                    max_piece: int = MAX_PIECE,
                    ) -> tuple[list[str], list[str]]:
    """Driver-side WordPiece training over a word histogram: start from
    characters (continuations marked ``##``), repeatedly merge the
    adjacent pair (a, b) maximizing count(ab)/(count(a)·count(b)) — the
    published WordPiece likelihood criterion — until the symbol
    inventory reaches ``vocab_size`` or no productive merge remains.
    The argmax compares cross-multiplied INTEGERS (count(ab)·count(a')·
    count(b') vs count(a'b')·count(a)·count(b)), ties by the
    lexicographically smallest pair, so retraining reproduces the
    inventory bit-for-bit.  Merges whose stripped result would exceed
    ``max_piece`` are skipped (the SQL oracle's match width).

    Returns (start_vocab, cont_vocab) — continuation pieces WITHOUT the
    marker, the shape :func:`wordpiece_encode` takes."""
    segs: dict[str, list[str]] = {
        w: [w[0]] + ["##" + c for c in w[1:]] for w, _ in hist if w}
    freqs = dict(hist)

    def strip(sym: str) -> str:
        return sym[2:] if sym.startswith("##") else sym

    def inventory() -> set[str]:
        return {s for seg in segs.values() for s in seg}

    while len(inventory()) < vocab_size:
        sym_cnt: dict[str, int] = {}
        pair_cnt: dict[tuple[str, str], int] = {}
        for w, seg in segs.items():
            n = freqs[w]
            for s in seg:
                sym_cnt[s] = sym_cnt.get(s, 0) + n
            for a, b in zip(seg, seg[1:]):
                pair_cnt[(a, b)] = pair_cnt.get((a, b), 0) + n
        best = _best_pair(sym_cnt, pair_cnt, max_piece)
        if best is None:
            break
        a, b = best
        merged = a + strip(b)
        for w, seg in segs.items():
            out: list[str] = []
            i = 0
            while i < len(seg):
                if i + 1 < len(seg) and seg[i] == a and seg[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seg[i])
                    i += 1
            segs[w] = out
    inv = inventory()
    # the seed alphabet stays in BOTH inventories unconditionally (the
    # HuggingFace initial_alphabet rule): chars that merged away during
    # training must still match standalone, or any unseen word built
    # from seen characters would UNK
    alphabet = {c for w, _ in hist for c in w}
    start = sorted({s for s in inv if not s.startswith("##")} | alphabet)
    cont = sorted({strip(s) for s in inv if s.startswith("##")} | alphabet)
    return start, cont


def train_wordpiece(df: DataFrame, text_col: str, vocab_size: int = 64,
                    max_piece: int = MAX_PIECE, min_freq: int = 1,
                    max_words: int = 1_000_000,
                    ) -> tuple[list[str], list[str]]:
    """Distributed-count + driver-learn WordPiece training (the
    train_bpe split): one word-histogram groupBy is the only
    corpus-sized pass; ``max_words`` bounds the driver collect
    (highest-frequency words first, ties by word)."""
    from pigpen_spark.functions.bpe import word_histogram

    hist_rows = (
        word_histogram(df, text_col, min_freq=min_freq)
        .orderBy(F.col("freq").desc(), "word")
        .limit(max_words)
        .collect()
    )
    return learn_wordpiece([(r["word"], int(r["freq"])) for r in hist_rows],
                           vocab_size, max_piece)


#: Deterministic inventories for the hash-exact driver check (the
#: FIXED_MERGES doctrine): EXACTLY what :func:`train_wordpiece`
#: produces on the sf0.001 ``documents`` word histogram (vocab_size 72)
#: — frozen verbatim by tools/freeze_wordpiece.py, so the oracle
#: replays the ENCODER bit-for-bit while the inventory remains a
#: genuinely trained artifact.  The trained path stays exercised by
#: ext_wordpiece_encode_trained (rows-only) + the pure-Python
#: differential test.
FIXED_START: list[str] = ['a', 'agg', 'b', 'big', 'c', 'co', 'cust', 'd', 'data', 'dup', 'e', 'f', 'fast', 'filt', 'g', 'h', 'hash', 'i', 'j', 'join', 'k', 'key', 'l', 'line', 'm', 'merg', 'n', 'o', 'ord', 'p', 'part', 'q', 'qu', 'r', 'row', 's', 'scan', 'slow', 'sm', 'sort', 'spa', 'str', 't', 'tabl', 'the', 'u', 'v', 'valu', 've', 'w', 'wind', 'y']
FIXED_CONT: list[str] = ['a', 'all', 'atch', 'b', 'c', 'ctor', 'd', 'e', 'eam', 'er', 'ery', 'f', 'g', 'h', 'i', 'j', 'k', 'l', 'lumn', 'm', 'n', 'o', 'omer', 'ow', 'p', 'q', 'r', 'rk', 'roup', 's', 't', 'u', 'v', 'w', 'y']
