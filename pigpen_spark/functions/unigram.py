"""Unigram-LM subword tokenizer (Kudo 2018, the SentencePiece model):
segment each word into the piece sequence maximizing the sum of piece
log-scores, found by Viterbi DP over word positions — the second
id-mapper next to :mod:`pigpen_spark.functions.bpe` (BPE is greedy
bottom-up merging; unigram is global-optimum segmentation under a piece
LM, and the one that supports sampling/regularization in training
pipelines).

Reference parity note: the reference engine has no tokenizer at all —
this module (like bpe.py) is extension surface for the LLM-pipeline
north star.

Arithmetic contract (what makes the encoder hash-exact across engines):
piece scores are INTEGER log-score units (larger = more probable), the
DP total is an integer sum, and the tie policy is fixed — among
candidate last-pieces achieving the maximal total, the SHORTEST piece
wins.  The DuckDB oracle (:func:`unigram_encode_fixed_sql`) replays the
identical DP unrolled as one chained CTE per word position over the
distinct-words table (the same fixed-iteration-unrolling doctrine as
pagerank_cte_sql), so Spark and the oracle agree piece-for-piece; the
optional character fallback (``unk_score``) is mirrored on both sides.

TRAINING (:func:`train_unigram`) is Viterbi-EM with vocabulary pruning
— iterative, so the trained path is rows-only by design (same split as
train_bpe): counting is the only corpus-sized pass (the word histogram),
EM runs driver-side over the vocab-sized histogram, and the resulting
piece table is data the encoder takes as a parameter.
"""

from __future__ import annotations

import math
from collections.abc import Iterator, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_PIECE = 4          #: longest multi-char piece considered anywhere
MAX_WORD = 16          #: longest word the SQL unroll supports


def viterbi_encode_word(word: str, vocab: Mapping[str, int],
                        max_piece: int = MAX_PIECE,
                        unk_score: int | None = None) -> tuple[list[str], int]:
    """Optimal segmentation of one word under integer piece scores:
    maximizes total score; ties resolve to the SHORTEST last piece at
    every DP position (a fixed, engine-portable policy).

    ``unk_score`` is the character-fallback policy (SentencePiece's
    byte-fallback analog): a single character absent from the vocabulary
    becomes its own piece at that (heavily penalized) score, so corpora
    whose charset drifted past the trained table still encode — set it
    strictly below every trained score so known pieces always win.
    With ``unk_score=None`` (default) an uncoverable word raises —
    the strict mode for corpora whose coverage is a guarantee."""
    n = len(word)
    best: list[int | None] = [None] * (n + 1)
    back: list[list[str] | None] = [None] * (n + 1)
    best[0], back[0] = 0, []
    for j in range(1, n + 1):
        bj: int | None = None
        pj: list[str] | None = None
        for k in range(1, min(max_piece, j) + 1):   # ascending k: ties → shortest
            prev = best[j - k]
            if prev is None:
                continue
            s = vocab.get(word[j - k:j])
            if s is None and k == 1:
                s = unk_score
            if s is None:
                continue
            c = prev + s
            if bj is None or c > bj:
                bj, pj = c, back[j - k] + [word[j - k:j]]
        best[j], back[j] = bj, pj
    if best[n] is None:
        raise ValueError(f"unigram: word {word!r} not coverable by the "
                         "piece vocabulary")
    return back[n], best[n]


def unigram_encode(df: DataFrame, id_col: str, text_col: str,
                   vocab: Mapping[str, int],
                   unk_score: int | None = None) -> DataFrame:
    """Encode every document with a (trained or fixed) unigram piece
    table: Arrow-batched mapInPandas with a per-batch word→segmentation
    cache (Zipfian text re-encodes the same words constantly — the same
    cache as bpe_encode).  The vocab rides to executors as a closure
    literal (piece tables are KBs).

    Returns (id, pieces array<string>, n_pieces, score) — ``score`` is
    the integer Viterbi total summed over the document's words, the
    quantity the oracle pins alongside the pieces.  ``unk_score``
    is the character-fallback policy (see viterbi_encode_word)."""
    voc = dict(vocab)

    def work(batches: Iterator) -> Iterator:
        import pandas as pd

        cache: dict[str, tuple[list[str], int]] = {}
        for pdf in batches:
            rows = []
            for rid, text in zip(pdf["id"], pdf["text"]):
                pieces: list[str] = []
                score = 0
                for w in ("" if text is None else text).lower().split(" "):
                    if not w:
                        continue
                    if w not in cache:
                        cache[w] = viterbi_encode_word(w, voc, unk_score=unk_score)
                    p, s = cache[w]
                    pieces.extend(p)
                    score += s
                rows.append({"id": rid, "pieces": pieces,
                             "n_pieces": len(pieces), "score": score})
            yield pd.DataFrame(rows)

    src = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    return src.mapInPandas(
        work, schema="id long, pieces array<string>, n_pieces long, score long")


def _score_case_sql(w: str, k: int, vocab: Mapping[str, int], j: int,
                    unk_score: int | None = None) -> str:
    """CASE mapping the k-char piece ending at position j to its score;
    single characters fall back to ``unk_score`` when set (mirror of
    viterbi_encode_word's character-fallback policy)."""
    # escape single quotes in piece literals — a trained vocabulary can
    # contain apostrophes (e.g. "n't" from word_histogram over natural
    # text), which would otherwise break the generated SQL
    branches = "".join(
        f" WHEN '{p.replace(chr(39), chr(39) * 2)}' THEN {s}"
        for p, s in sorted(vocab.items()) if len(p) == k)
    els = unk_score if (k == 1 and unk_score is not None) else "NULL"
    return f"(CASE substr({w}, {j - k + 1}, {k}){branches} ELSE {els} END)"


def _stage_sql(j: int, vocab: Mapping[str, int],
               max_piece: int = MAX_PIECE,
               unk_score: int | None = None) -> str:
    """Expression for DP stage ``j`` — a struct {b, p} column computed
    from the previous stages' columns ``s{j-1}..s{j-max_piece}`` of the
    distinct-words table.  Candidates are tested ascending-k first, so
    score ties resolve to the shortest last piece, mirroring
    :func:`viterbi_encode_word`."""
    ks = list(range(1, min(max_piece, j) + 1))
    cands = "[" + ", ".join(
        f"struct_extract(s{j - k}, 'b') + "
        f"{_score_case_sql('w', k, vocab, j, unk_score)}"
        for k in ks) + "]"
    picks = "".join(
        f" WHEN cs[{i + 1}] = bj THEN (CASE WHEN struct_extract(s{j - k}, 'p') = '' "
        f"THEN substr(w, {j - k + 1}, {k}) "
        f"ELSE struct_extract(s{j - k}, 'p') || ' ' || substr(w, {j - k + 1}, {k}) END)"
        for i, k in enumerate(ks))
    return (f"[[{{'b': bj, 'p': (CASE{picks} ELSE NULL END)}}"
            f" for bj in [list_max(cs)]][1]"
            f" for cs in [{cands}]][1]")


def unigram_encode_fixed_sql(table: str, id_col: str, text_col: str,
                             vocab: Mapping[str, int],
                             max_word: int = MAX_WORD,
                             unk_score: int | None = None) -> str:
    """DuckDB oracle for :func:`unigram_encode` under a FIXED piece
    table.  The Viterbi DP unrolls as one chained CTE per word position
    over the DISTINCT-WORDS table (each stage a plain projection adding
    the struct column s{j} — flat, because nesting the stages as
    lambda let-bindings makes DuckDB's binder exponential in depth);
    segmentations then join back to the exploded token stream and
    re-aggregate per document in token order.  Emits (doc_id, pieces,
    n_pieces, score) with the piece stream space-joined (catalog rule:
    bags stringify)."""
    toks = f"list_filter(string_split(lower({text_col}), ' '), t -> t <> '')"
    stages = ",\n    ".join(
        f"d{j} AS (SELECT *, {_stage_sql(j, vocab, unk_score=unk_score)} AS s{j} FROM d{j - 1})"
        for j in range(1, max_word + 1))
    # words longer than max_word must FAIL LOUDLY, not silently drop out
    # of the per-doc aggregates (sum/array_to_string skip NULLs) while
    # Spark encodes them — error() raises at evaluation time
    final = ("(CASE len(w)"
             + "".join(f" WHEN {j} THEN s{j}" for j in range(1, max_word + 1))
             + " ELSE error('unigram oracle: word exceeds MAX_WORD="
             + str(max_word) + "') END)")
    return f"""
    WITH base AS (SELECT {id_col} AS doc_id, {toks} AS toks FROM {table}),
    words AS (SELECT DISTINCT unnest(toks) AS w FROM base),
    d0 AS (SELECT w, {{'b': 0::BIGINT, 'p': ''}} AS s0 FROM words),
    {stages},
    seg AS (SELECT w, {final} AS sg FROM d{max_word}),
    tok AS (
      SELECT doc_id, unnest(toks) AS w, generate_subscripts(toks, 1) AS i
      FROM base
    ),
    perdoc AS (
      SELECT t.doc_id,
             array_to_string(list(struct_extract(sg, 'p') ORDER BY t.i), ' ')
               AS pieces,
             sum(len(string_split(struct_extract(sg, 'p'), ' ')))::BIGINT
               AS n_pieces,
             sum(struct_extract(sg, 'b'))::BIGINT AS score
      FROM tok t JOIN seg ON t.w = seg.w
      GROUP BY t.doc_id
    )
    SELECT b.doc_id,
           coalesce(p.pieces, '') AS pieces,
           coalesce(p.n_pieces, 0)::BIGINT AS n_pieces,
           coalesce(p.score, 0)::BIGINT AS score
    FROM base b LEFT JOIN perdoc p ON b.doc_id = p.doc_id
    """


#: Deterministic piece table for the hash-exact driver check (the
#: FIXED_MERGES doctrine): EXACTLY what :func:`train_unigram` produces
#: on the sf0.001 ``documents`` word histogram (vocab_size 48,
#: em_rounds 3, centi-nat scores; frozen verbatim, then a-z coverage
#: completed with the rare-char score -1112 for the two letters the
#: corpus never uses) — so the oracle replays the ENCODER bit-for-bit
#: while the table remains a genuinely trained artifact.  The trained
#: path stays exercised by ext_unigram_encode_trained (rows-only) + the
#: pure-Python differential test.
FIXED_PIECES: dict[str, int] = {
    "a": -223,
    "b": -321,
    "c": -362,
    "d": -428,
    "e": -290,
    "f": -430,
    "g": -432,
    "h": -361,
    "i": -432,
    "j": -1112,
    "k": -430,
    "l": -321,
    "m": -363,
    "n": -1112,
    "o": -432,
    "p": -358,
    "q": -1112,
    "r": -320,
    "s": -292,
    "t": -252,
    "u": -429,
    "v": -1112,
    "w": -1112,
    "x": -1112,
    "y": -427,
    "z": -1112,
    "am": -429,
    "er": -362,
    "mn": -423,
    "or": -428,
    "ow": -360,
    "agg": -425,
    "key": -426,
    "colu": -423,
    "filt": -429,
    "grou": -427,
    "hash": -429,
    "join": -427,
    "line": -426,
    "merg": -427,
    "orde": -423,
    "part": -424,
    "quer": -427,
    "scan": -422,
    "slow": -429,
    "sort": -423,
    "stre": -429,
    "valu": -426,
    "vect": -428,
    "wind": -423,
}


def train_unigram(df: DataFrame, text_col: str, vocab_size: int = 64,
                  em_rounds: int = 3, max_piece: int = MAX_PIECE,
                  min_freq: int = 2, scale: int = 100) -> dict[str, int]:
    """Viterbi-EM unigram training (the SentencePiece recipe, Viterbi
    E-step variant): seed the vocabulary with every substring of length
    ≤ ``max_piece`` whose corpus frequency ≥ ``min_freq`` plus all
    single characters (required coverage), then alternate (E) Viterbi
    re-segmentation of the word histogram under current scores and (M)
    re-scoring pieces by their weighted usage, pruning the least-used
    multi-char pieces down to ``vocab_size``.

    Counting is the only corpus-sized pass (the same one-groupBy word
    histogram train_bpe uses); EM runs driver-side over the ≤ vocab-
    sized histogram — the split production tokenizer trainers use.
    Scores come back as integers (``scale`` × natural-log likelihood,
    rounded), ready for the hash-exact encoder; ties in pruning break
    lexicographically so retraining reproduces the table."""
    from pigpen_spark.functions.bpe import word_histogram

    hist = [(r["word"], int(r["freq"]))
            for r in word_histogram(df, text_col).collect()]
    if not hist:
        raise ValueError("train_unigram: empty corpus")
    chars = sorted({c for w, _ in hist for c in w})
    counts: dict[str, int] = {}
    for w, n in hist:
        for k in range(2, max_piece + 1):
            for i in range(len(w) - k + 1):
                p = w[i:i + k]
                counts[p] = counts.get(p, 0) + n
    vocab_set = set(chars) | {p for p, c in counts.items() if c >= min_freq}
    # uniform init: every piece equally likely
    scores = {p: -scale * 5 for p in vocab_set}
    for _ in range(em_rounds):
        usage: dict[str, int] = {}
        for w, n in hist:
            pieces, _s = viterbi_encode_word(w, scores, max_piece)
            for p in pieces:
                usage[p] = usage.get(p, 0) + n
        # prune: keep all single chars + the most-used multi-char pieces
        multi = sorted((p for p in usage if len(p) > 1),
                       key=lambda p: (-usage[p], p))[:max(0, vocab_size - len(chars))]
        kept = set(chars) | set(multi)
        total = sum(usage.get(p, 0) for p in kept) or 1
        scores = {
            p: round(scale * math.log((usage.get(p, 0) + 1) / (total + len(kept))))
            for p in kept
        }
    return scores
