"""Byte-pair-encoding tokenizer training + encoding over a corpus.

Extension surface (BASELINE.json north star — last-mile tokenizer prep).
:func:`pigpen_spark.functions.pipeline.build_vocab` induces a WORD
vocabulary; real LLM pipelines train a subword tokenizer.  This module
implements the original BPE algorithm (Sennrich et al. 2016,
arXiv:1508.07909) with the split of labor every production tokenizer
trainer uses at scale (HuggingFace tokenizers, SentencePiece):

- **Counting is distributed** — the corpus-sized pass is ONE groupBy
  producing the distinct-word histogram (word, freq).  At 100 TB this is
  the only stage that touches the data, and it's a plain map-side-
  combining aggregation.
- **Merge learning runs on the driver over the HISTOGRAM** — vocab-sized
  (10^5-10^6 rows after ``min_freq``), not corpus-sized; the classic
  driver-artifact posture of the PQ codebooks / k-means centroids: the
  trained merge list is tiny and re-enters plans as broadcast data.
- **Encoding is distributed** — Arrow-batched ``pandas_udf`` applying the
  merge list per word, with a per-batch word cache (Zipf: most tokens are
  repeats, so amortized cost per token is near zero).

Training is iterative (non-SQL-expressible) ⇒ rows-only oracle; the
algorithm itself is pinned by a differential test against an independent
pure-Python reference implementation (tests/test_round3b_bpe.py).

ENCODING, however, IS SQL-expressible for a fixed merge table whose
pairs all have distinct sides: represent a word's symbol sequence as a
``|``-delimited string (``|t|h|e|</w>|``) and apply each merge as a
string ``replace('|l|r|', '|lr|')``.  For l != r the pair's occurrences
in a symbol sequence are disjoint and merging can never create a new
occurrence (the merged symbol ``lr`` is strictly longer than l), so the
replace fixpoint equals :func:`_merge_word`'s greedy pass; adjacent
occurrences share a boundary pipe that a single scan consumes, and two
passes provably reach the fixpoint (pass 1 takes alternating
occurrences, the survivors are then separated by merged symbols) — we
emit three per merge for margin.  :func:`bpe_encode_fixed_sql` builds
that oracle; equivalence is differential-tested against
:func:`encode_word` (vocabulary + adversarial random words) in pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pigpen_spark.functions.text import tokens

#: End-of-word sentinel appended to each word's symbol sequence (the
#: original BPE formulation — lets merges distinguish suffixes from
#: word-internal sequences).
EOW = "</w>"


def word_histogram(df: DataFrame, text_col: str, min_freq: int = 1) -> DataFrame:
    """(word, freq) over the whitespace-tokenized corpus — the one
    corpus-sized pass of BPE training.  Map-side combine applies; output
    is vocabulary-sized."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= min_freq)
    )


def _merge_word(symbols: tuple, pair: tuple) -> tuple:
    """Replace every non-overlapping left-to-right occurrence of ``pair``
    in a symbol sequence with the concatenated symbol."""
    out, i, n = [], 0, len(symbols)
    while i < n:
        if i < n - 1 and symbols[i] == pair[0] and symbols[i + 1] == pair[1]:
            out.append(symbols[i] + symbols[i + 1])
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def learn_merges(histogram: list[tuple[str, int]],
                 n_merges: int) -> list[tuple[str, str]]:
    """The driver-side merge loop of Sennrich BPE over a (word, freq)
    histogram: repeatedly count adjacent symbol pairs (weighted by word
    frequency) and merge the most frequent one.  Ties break
    deterministically: highest count, then lexicographic pair.  Stops
    early when no pair occurs twice."""
    words: dict[tuple, int] = {}
    for w, f in histogram:
        words[tuple(w) + (EOW,)] = words.get(tuple(w) + (EOW,), 0) + f
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in words.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < 2:
            break
        merges.append(best)
        # rebuild the histogram with the chosen pair merged everywhere
        rebuilt: dict[tuple, int] = {}
        for syms, f in words.items():
            m = _merge_word(syms, best)
            rebuilt[m] = rebuilt.get(m, 0) + f
        words = rebuilt
    return merges


def train_bpe(df: DataFrame, text_col: str, n_merges: int = 100,
              min_freq: int = 1, max_words: int = 1_000_000,
              ) -> list[tuple[str, str]]:
    """Distributed-count + driver-learn BPE training.  ``max_words``
    bounds the driver collect (highest-frequency words first, ties by
    word — a frequency-truncated histogram is the standard trainer
    behavior and changes only tail merges).  Returns the ordered merge
    list — a tiny driver artifact, like a PQ codebook."""
    hist_rows = (
        word_histogram(df, text_col, min_freq=min_freq)
        .orderBy(F.col("freq").desc(), "word")
        .limit(max_words)
        .collect()
    )
    return learn_merges([(r["word"], r["freq"]) for r in hist_rows], n_merges)


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply the trained merges, in training order, to one word."""
    syms: tuple = tuple(word) + (EOW,)
    for pair in merges:
        if len(syms) < 2:
            break
        syms = _merge_word(syms, pair)
    return list(syms)


#: Deterministic merge-table subset for the hash-exact driver check
#: (VERDICT r3 item 8): the first 24 merges :func:`learn_merges` produces
#: on the sf0.001 ``documents`` word histogram (ties broken by the
#: documented count-desc/lex rule, so any re-run reproduces it).  Every
#: pair has distinct sides, which is what makes the SQL replace-chain
#: oracle exact (module docstring).  The TRAINED path stays exercised by
#: ext_bpe_encode_trained (rows-only) + the pure-Python differential test.
FIXED_MERGES: list[tuple[str, str]] = [
    ("e", "r"), ("e", EOW), ("n", EOW), ("o", "r"), ("t", EOW),
    ("er", EOW), ("o", "w"), ("ow", EOW), ("l", "u"), ("i", "n"),
    ("y", EOW), ("a", "r"), ("p", "ar"), ("g", EOW), ("a", "s"),
    ("h", EOW), ("a", EOW), ("s", "t"), ("a", "t"), ("a", "n" + EOW),
    ("c", "an" + EOW), ("s", "can" + EOW), ("c", "o"), ("co", "lu"),
]


def encode_word_sql(word_expr: str, merges: list[tuple[str, str]],
                    passes: int = 3) -> str:
    """DuckDB expression: space-joined BPE pieces of one lowercase word,
    via the delimited-string replace chain (module docstring).  Exact
    for merge tables whose pairs all have distinct sides."""
    for l, r in merges:
        if l == r:
            raise ValueError(
                f"encode_word_sql: equal-sided pair {(l, r)!r} — the "
                "replace chain is only exact for distinct-sided merges"
            )
    e = f"'|' || array_to_string(string_split({word_expr}, ''), '|') || '|{EOW}|'"
    for l, r in merges:
        for _ in range(passes):
            e = f"replace({e}, '|{l}|{r}|', '|{l}{r}|')"
    return f"array_to_string(string_split(trim({e}, '|'), '|'), ' ')"


def bpe_encode_fixed_sql(table: str, id_col: str, text_col: str,
                         merges: list[tuple[str, str]]) -> str:
    """DuckDB oracle for :func:`bpe_encode` under a FIXED merge table:
    per document, encode each whitespace token with the replace chain and
    space-join the piece stream (catalog rule #4: bags stringify)."""
    toks = f"list_filter(string_split(lower({text_col}), ' '), t -> t <> '')"
    return f"""
    WITH enc AS (
      SELECT {id_col} AS doc_id,
             coalesce(array_to_string(
               [{encode_word_sql('w', merges)} for w in {toks}], ' '), '')
               AS pieces
      FROM {table}
    )
    SELECT doc_id, pieces,
           (CASE WHEN pieces = '' THEN 0
                 ELSE len(string_split(pieces, ' ')) END)::BIGINT AS n_pieces
    FROM enc
    """


def bpe_encode(df: DataFrame, id_col: str, text_col: str,
               merges: list[tuple[str, str]]) -> DataFrame:
    """Encode every document with a trained merge list: Arrow-batched
    ``pandas_udf`` (the merge list rides into the workers as a closure
    literal — tiny), with a per-batch word→pieces cache exploiting the
    Zipfian repeat structure of natural text.

    Returns (id, pieces array<string>, n_pieces).  Subword-piece streams
    feed :func:`pigpen_spark.functions.pipeline.tokenize_pack` for
    id-mapping + sequence packing."""
    import pandas as pd

    mlist = list(merges)

    def _enc(texts):
        cache: dict[str, list[str]] = {}
        out = []
        for t in texts:
            if t is None:
                out.append([])
                continue
            pieces: list[str] = []
            for w in t.lower().split(" "):
                if not w:
                    continue
                if w not in cache:
                    cache[w] = encode_word(w, mlist)
                pieces.extend(cache[w])
            out.append(pieces)
        return pd.Series(out)

    _enc.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    udf = F.pandas_udf(_enc, "array<string>")
    return df.select(
        F.col(id_col).alias("id"), udf(F.col(text_col)).alias("pieces")
    ).withColumn("n_pieces", F.size("pieces").cast("long"))
