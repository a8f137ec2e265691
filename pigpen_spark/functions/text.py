"""Text-analysis operators for large-scale training-data pipelines.

Extension surface beyond the reference (which has NO scalar function
library — SURVEY §2.7): language ID, quality scoring, token counting,
document fingerprinting.  Everything is built from JVM-side Catalyst
higher-order functions (split/filter/transform/aggregate) — no Python UDFs
— so the operators whole-stage-codegen and scale linearly with executors.

Hash portability: md5 (identical across engines) is the only hash used, so
every operator here has an exact DuckDB SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language stopword lists for the n-gram/stopword language-ID
#: heuristic.  Deliberately small and fixed — the operator's value is the
#: *shape* (argmax of per-language token-overlap scores at scale).
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "of", "and", "to", "in", "a", "is", "that", "for", "it"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"],
    "es": ["el", "la", "los", "de", "y", "un", "una", "es", "que", "para"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "im"],
}

#: CJK unicode block — presence implies zh for this corpus.
_CJK_PATTERN = "[一-鿿]"

#: BPE-ish pre-tokenizer: letter runs, single digits, punctuation marks.
BPE_PATTERN = "[a-z]+|[0-9]|[^a-z0-9\\s]"


from pigpen_spark.relation import _to_col as _c  # noqa: E402 — shared coercion


def tokens(col) -> Column:
    """Whitespace tokens, lowercased, empties removed."""
    return F.filter(F.split(F.lower(_c(col)), " "), lambda t: t != "")


def token_count(col) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col)).cast("long")


def bpe_token_count(col) -> Column:
    """BPE-ish token count: size of the pre-tokenizer match list (the
    standard cheap proxy for LLM token budgeting at corpus scale)."""
    return F.size(F.regexp_extract_all(F.lower(_c(col)), F.lit(BPE_PATTERN), 0)).cast("long")


def stopword_count(col, lang: str) -> Column:
    """Count (with multiplicity) of tokens in ``lang``'s stopword list."""
    stops = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(stops, t))).cast("long")


def cjk_count(col) -> Column:
    return F.size(F.regexp_extract_all(_c(col), F.lit(_CJK_PATTERN), 0)).cast("long")


def lang_id(col) -> Column:
    """Heuristic language ID: CJK presence → zh, else argmax of stopword
    overlap with a fixed priority order (en > fr > es > de) for ties —
    fully deterministic, expressible in any SQL engine."""
    en, fr, es, de = (stopword_count(col, lg) for lg in ("en", "fr", "es", "de"))
    return (
        F.when(cjk_count(col) > 0, F.lit("zh"))
        .when((en >= fr) & (en >= es) & (en >= de), F.lit("en"))
        .when((fr >= es) & (fr >= de), F.lit("fr"))
        .when(es >= de, F.lit("es"))
        .otherwise(F.lit("de"))
    )


def lang_id_sql(col: str) -> str:
    """The exact DuckDB-SQL equivalent of :func:`lang_id` (oracle)."""
    def sw(lang: str) -> str:
        lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        return (f"len(list_filter(list_filter(string_split(lower({col}), ' '), t -> t <> ''), "
                f"t -> list_contains([{lst}], t)))")
    return f"""
      CASE WHEN len(regexp_extract_all({col}, '{_CJK_PATTERN}')) > 0 THEN 'zh'
           WHEN {sw('en')} >= {sw('fr')} AND {sw('en')} >= {sw('es')} AND {sw('en')} >= {sw('de')} THEN 'en'
           WHEN {sw('fr')} >= {sw('es')} AND {sw('fr')} >= {sw('de')} THEN 'fr'
           WHEN {sw('es')} >= {sw('de')} THEN 'es'
           ELSE 'de' END
    """


def punct_ratio(col) -> Column:
    """Fraction of non-alphanumeric/space characters."""
    n = F.size(F.regexp_extract_all(F.lower(_c(col)), F.lit("[^a-z0-9 ]"), 0))
    # try_divide: Spark 4 is ANSI by default — a plain / THROWS on empty docs
    return F.try_divide(n.cast("double"), F.length(_c(col)).cast("double"))


def digit_ratio(col) -> Column:
    n = F.size(F.regexp_extract_all(_c(col), F.lit("[0-9]"), 0))
    return F.try_divide(n.cast("double"), F.length(_c(col)).cast("double"))


def stopword_ratio(col) -> Column:
    """English stopword density — the classic fast quality signal."""
    return F.try_divide(stopword_count(col, "en").cast("double"), token_count(col).cast("double"))


def mean_token_len(col) -> Column:
    return F.try_divide(
        F.aggregate(tokens(col), F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)).cast("double"),
        token_count(col).cast("double"),
    )


def quality_score(col) -> Column:
    """Composite document-quality score ∈ [0,1]: length band + stopword
    density + low punctuation noise.  Deterministic arithmetic only.

    Zero-token documents score 0: the stopword ratio is 0/0 = NULL there,
    and ``F.least`` SKIPS nulls (would award full credit) — hence the
    coalesce."""
    ntok = token_count(col)
    return (
        F.when((ntok >= 10) & (ntok <= 1000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.least(F.coalesce(stopword_ratio(col), F.lit(0.0)) * 2, F.lit(0.3))
        + F.when(punct_ratio(col) < 0.05, F.lit(0.3)).otherwise(F.lit(0.0))
    )


def fingerprint(col) -> Column:
    """Canonical content fingerprint: md5 of the sorted distinct token set
    (order/duplication-insensitive — catches shuffled near-copies)."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(col))), " "))


def shingles(col, n: int = 3) -> Column:
    """Word n-gram shingles (the dedup primitive).  Docs with fewer than
    ``n`` tokens yield a single shingle of the whole text."""
    toks = tokens(col)
    k = F.size(toks)
    return F.when(
        k >= n,
        F.transform(
            F.sequence(F.lit(1), k - n + 1),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array(F.array_join(toks, " ")))


def shingles_sql(col: str, n: int = 3) -> str:
    """DuckDB equivalent of :func:`shingles`."""
    toks = f"list_filter(string_split(lower({col}), ' '), t -> t <> '')"
    return f"""
      CASE WHEN len({toks}) >= {n}
           THEN [array_to_string(({toks})[i : i + {n - 1}], ' ')
                 for i in range(1, len({toks}) - {n} + 2)]
           ELSE [array_to_string({toks}, ' ')] END
    """


def shingle_fingerprint(col, n: int = 3) -> Column:
    """Min-hash-of-shingles rolling fingerprint (winnowing-lite): the
    lexicographic min of md5(shingle) — robust to local edits."""
    return F.array_min(F.transform(shingles(col, n), F.md5))
