"""Text retrieval / corpus-vocabulary operators: BM25 search, per-group
heavy-hitter terms.

Extension surface (the reference has no text-retrieval story): the ops a
training-data pipeline runs to *query* a corpus it just curated.

100 TB shapes:

- **bm25_search** — tokenize+explode is narrow; candidate terms are
  filtered immediately after the explode (rows drop from Σdl to query
  matches only); the per-term document frequencies and the (N, avgdl)
  corpus scalars are single-row / |query|-row aggregates that join back
  via broadcast; the only real shuffles key on (doc, term) and doc.  No
  driver-side collect anywhere — scalars travel as broadcast crossJoin.
- **top_terms_per_group** — explode → (group, term) count →
  per-group window top-k.  The window partitions on the group key, so
  it parallelizes; skewed vocabularies are pre-aggregated map-side by
  the count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pigpen_spark.cache import persisted as _persisted
from pigpen_spark.functions.text import token_count, tokens


def bm25_search(docs: DataFrame, query_terms: Sequence[str],
                id_col: str = "doc_id", text_col: str = "text",
                k1: float = 1.2, b: float = 0.75,
                topk: int = 20) -> DataFrame:
    """Okapi BM25 scores for ``query_terms``, top-``topk`` docs.

    Returns ``(id_col, score double)`` ordered by (score desc, id) with
    the score rounded to 6 dp (sum-over-terms is order-sensitive float
    addition; rounding makes the result engine-stable).
    idf = ln(1 + (N − df + ½)/(df + ½)) — the standard "plus one"
    Robertson–Spärck Jones form, never negative.
    """
    if not query_terms:
        raise ValueError("bm25_search needs at least one query term")
    toks = docs.select(
        F.col(id_col),
        F.explode(tokens(text_col)).alias("__term"),
        token_count(text_col).alias("__dl"),
    )
    tf = (
        toks.filter(F.col("__term").isin(*query_terms))
        .groupBy(id_col, "__term", "__dl")
        .agg(F.count("*").alias("__tf"))
    )
    dfreq = tf.groupBy("__term").agg(F.count("*").alias("__df"))
    stats = docs.agg(
        F.count("*").cast("double").alias("__n"),
        F.avg(token_count(text_col)).alias("__avgdl"),
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
    )
    tf_part = (
        F.col("__tf") * (k1 + 1)
        / (
            F.col("__tf")
            + k1 * (1 - b + b * F.col("__dl") / F.col("__avgdl"))
        )
    )
    return (
        tf.join(F.broadcast(dfreq), "__term")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(idf * tf_part), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(topk)
    )


def bm25_search_sql(query_terms: Sequence[str], id_col: str = "doc_id",
                    text_col: str = "text", k1: float = 1.2,
                    b: float = 0.75, topk: int = 20,
                    table: str = "documents") -> str:
    """DuckDB oracle for :func:`bm25_search`."""
    toks = (
        f"list_filter(string_split(lower({text_col}), ' '), t -> t <> '')"
    )
    terms = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
    WITH toks AS (
      SELECT {id_col}, unnest({toks}) AS term, len({toks}) AS dl
      FROM {table}
    ),
    tf AS (
      SELECT {id_col}, term, dl, count(*) AS tf
      FROM toks WHERE term IN ({terms}) GROUP BY 1, 2, 3
    ),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    stats AS (
      SELECT count(*)::DOUBLE AS n, avg(len({toks})) AS avgdl
      FROM {table}
    )
    SELECT {id_col},
           round(sum(ln(1.0 + (n - df + 0.5) / (df + 0.5))
                     * tf * ({k1} + 1)
                     / (tf + {k1} * (1 - {b} + {b} * dl / avgdl))), 6)
             AS score
    FROM tf JOIN dfreq USING (term) CROSS JOIN stats
    GROUP BY {id_col}
    ORDER BY score DESC, {id_col}
    LIMIT {topk}
    """


def top_terms_per_group(docs: DataFrame, group_col: str,
                        id_col: str = "doc_id", text_col: str = "text",
                        topk: int = 5) -> DataFrame:
    """Per-group heavy-hitter vocabulary: the ``topk`` most frequent
    tokens per ``group_col`` — ``(group_col, term, n bigint, pos)`` with
    ``pos`` the 1-based rank (count desc, term asc for determinism)."""
    counts = (
        docs.select(F.col(group_col), F.explode(tokens(text_col)).alias("term"))
        .groupBy(group_col, "term")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("n").desc(), F.col("term")
    )
    return (
        counts.withColumn("pos", F.row_number().over(w).cast("bigint"))
        .filter(F.col("pos") <= topk)
    )


def top_terms_per_group_sql(group_col: str, text_col: str = "text",
                            topk: int = 5, table: str = "documents") -> str:
    """DuckDB oracle for :func:`top_terms_per_group`."""
    toks = (
        f"list_filter(string_split(lower({text_col}), ' '), t -> t <> '')"
    )
    return f"""
    WITH counts AS (
      SELECT {group_col}, unnest({toks}) AS term FROM {table}
    ),
    agg AS (
      SELECT {group_col}, term, count(*) AS n
      FROM counts GROUP BY 1, 2
    )
    SELECT {group_col}, term, n,
           row_number() OVER (PARTITION BY {group_col}
                              ORDER BY n DESC, term) AS pos
    FROM agg QUALIFY pos <= {topk}
    """


from pigpen_spark.functions.text import cooccurrence_pairs, cooccurrence_pairs_sql  # noqa: E402


def collocations(docs: DataFrame, text_col: str = "text", window: int = 2,
                 min_count: int = 2) -> DataFrame:
    """Corpus-level collocation mining: unordered token pairs co-occurring
    within ``window`` positions, with an exact integer association score —
    the phrase-detection / word-embedding co-occurrence pre-aggregation.

    Returns ``(pair, pair_count, assoc_ppm)`` where ``assoc_ppm`` is the
    squared Ochiai coefficient in parts-per-million:
    ``10⁶ · c(xy)² div (c(x)·c(y))`` over corpus token counts — a bounded
    [0, 10⁶] collocation-strength measure that, unlike log-PMI, is pure
    integer arithmetic (hash-exact across engines; see ROUND_NOTES lesson:
    exp/log are not bit-portable).  decimal(38,0) intermediates keep the
    numerator exact to c(xy) ≈ 10¹⁶.

    Plan: per-doc pair HOF (no shuffle) → explode → one groupBy for pair
    counts, one for token counts, two equi-joins of the pair table against
    the (much smaller) vocabulary table — AQE broadcasts the vocab side
    when it fits.  ``min_count`` prunes the long tail BEFORE the joins.
    """
    pairs = docs.select(F.explode(cooccurrence_pairs(text_col, window)).alias("pair"))
    pc = (
        pairs.groupBy("pair").agg(F.count("*").alias("pair_count"))
        .filter(F.col("pair_count") >= min_count)
    )
    wc = (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w").agg(F.count("*").alias("wc"))
    )
    split = F.split(F.col("pair"), " ")
    keyed = pc.select(
        "pair", "pair_count",
        split.getItem(0).alias("__w1"), split.getItem(1).alias("__w2"),
    )
    joined = (
        keyed.join(wc.select(F.col("w").alias("__w1"), F.col("wc").alias("__c1")), "__w1")
        .join(wc.select(F.col("w").alias("__w2"), F.col("wc").alias("__c2")), "__w2")
    )
    assoc = F.expr(
        "(cast(1000000 as decimal(38,0)) * pair_count * pair_count)"
        " div (cast(__c1 as decimal(38,0)) * __c2)"
    )
    return joined.select("pair", "pair_count", assoc.cast("bigint").alias("assoc_ppm"))


def collocations_sql(text_col: str = "text", window: int = 2,
                     min_count: int = 2, table: str = "documents") -> str:
    """DuckDB oracle for :func:`collocations`."""
    toks = f"list_filter(string_split(lower({text_col}), ' '), t -> t <> '')"
    return f"""
    WITH pairs AS (
      SELECT unnest({cooccurrence_pairs_sql(text_col, window)}) AS pair FROM {table}
    ),
    pc AS (
      SELECT pair, count(*)::BIGINT AS pair_count FROM pairs
      GROUP BY pair HAVING count(*) >= {min_count}
    ),
    wc AS (
      SELECT w, count(*)::BIGINT AS wc
      FROM (SELECT unnest({toks}) AS w FROM {table}) GROUP BY w
    )
    SELECT pair, pair_count,
           ((1000000::HUGEINT * pair_count * pair_count)
            // (w1.wc::HUGEINT * w2.wc))::BIGINT AS assoc_ppm
    FROM pc
    JOIN wc w1 ON string_split(pair, ' ')[1] = w1.w
    JOIN wc w2 ON string_split(pair, ' ')[2] = w2.w
    """


def rrf_fuse(rankings: Sequence[DataFrame], q_col: str = "q_id",
             n_col: str = "n_id", rank_col: str = "rank",
             k: int = 60, topk: int = 10) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) — the
    standard hybrid-retrieval combiner (lexical BM25 + vector ANN, or
    exact + approximate): per (query, candidate),
    ``score = Σ_r 10⁶ DIV (k + rank_r)`` over every ranking that
    retrieved it, then top-``topk`` per query.  Integer arithmetic →
    hash-exact; candidates absent from a ranking simply contribute
    nothing (no imputation).  The fusion is one union + one groupBy +
    one per-query WindowGroupLimit — cost is the candidate lists, the
    rankers already paid for the corpus.

    Ties break by candidate id, so fused rankings are total."""
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    if k < 1:
        raise ValueError(f"rrf_fuse: k must be >= 1, got {k}")
    parts = [
        r.select(F.col(q_col).alias("q_id"), F.col(n_col).alias("n_id"),
                 F.expr(f"CAST(1000000 DIV ({k} + {rank_col}) AS BIGINT)")
                 .alias("__c"))
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy("q_id", "n_id").agg(F.sum("__c").alias("rrf_score"))
    w = Window.partitionBy("q_id").orderBy(
        F.col("rrf_score").desc(), F.col("n_id"))
    return (fused.withColumn("fused_rank", F.row_number().over(w))
            .filter(F.col("fused_rank") <= topk))


def sparse_cosine_pairs(docs: DataFrame, id_col: str, text_col: str,
                        threshold_num: int = 4, threshold_den: int = 5,
                        max_df: int = 50) -> DataFrame:
    """All-pairs SPARSE cosine similarity over term-frequency vectors —
    the lexical twin of the embedding near-dup family: pairs of
    documents whose whitespace-token tf vectors have cosine ≥
    threshold_num/threshold_den, found via an INVERTED-INDEX equi-join
    (the Bayardo et al. 2007 all-pairs shape), never a cartesian
    product.

    Arithmetic contract (mirrored by :func:`sparse_cosine_sql`): tf,
    dot products, and squared norms are exact BIGINTs; the threshold
    test is the cross-multiplied integer inequality
    ``dot² · den² ≥ num² · norm_a · norm_b`` (dot > 0 always — tf ≥ 0),
    evaluated in WIDE integers — decimal(38,0) on Spark, HUGEINT on
    DuckDB — because max_df bounds document FREQUENCY, not term
    frequency: a doc repeating one rare token ~30k times already pushes
    dot² · den² past BIGINT.  Both sides are exact while every product
    stays under 10³⁸ (i.e. dot < 10¹⁹/den and norm_a·norm_b <
    10³⁸/num² — astronomically past any real document); only the
    boolean crosses back, so no wide type reaches the result and the
    oracle is hash-exact with zero float traffic.  Tokens with
    document frequency > ``max_df`` are dropped from the VOCABULARY
    before anything else — norms and dots are both computed on the
    projected space, so the score is a true cosine there (an explicit,
    engine-identical vocabulary projection, not a per-pair
    approximation; same hub-cut doctrine as ``winnow_overlap_pairs``).

    Scale: posting lists are keyed by token with the worst list bounded
    at ``max_df`` rows, so the self-join's worst key costs max_df²;
    the pair aggregation is the one wide shuffle and partial-aggregates
    map-side.  Returns (id_a, id_b, dot, norm_a, norm_b), id_a < id_b.
    """
    if not (0 < threshold_num <= threshold_den):
        raise ValueError("sparse_cosine_pairs: need 0 < num <= den, got "
                         f"{threshold_num}/{threshold_den}")
    tf = (
        docs.select(F.col(id_col).alias("id"),
                    F.explode(tokens(F.col(text_col))).alias("tok"))
        .groupBy("id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    kept = tf.join(dfreq.filter(F.col("df") <= max_df), on="tok") \
        .select("id", "tok", "tf").transform(_persisted)
    norms = kept.groupBy("id").agg(F.sum(F.col("tf") * F.col("tf")).alias("nrm"))
    a, b = kept.alias("a"), kept.alias("b")
    dots = (
        a.join(b, (F.col("a.tok") == F.col("b.tok"))
               & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.sum(F.col("a.tf") * F.col("b.tf")).alias("dot"))
    )
    na = norms.select(F.col("id").alias("id_a"), F.col("nrm").alias("norm_a"))
    nb = norms.select(F.col("id").alias("id_b"), F.col("nrm").alias("norm_b"))
    n2, d2 = threshold_num * threshold_num, threshold_den * threshold_den
    return (
        dots.join(na, on="id_a").join(nb, on="id_b")
        .filter(F.expr(
            f"cast(dot as decimal(38,0)) * dot * {d2} "
            f">= {n2} * cast(norm_a as decimal(38,0)) * norm_b"))
        .select("id_a", "id_b",
                F.col("dot").cast("long").alias("dot"),
                F.col("norm_a").cast("long").alias("norm_a"),
                F.col("norm_b").cast("long").alias("norm_b"))
    )


def sparse_cosine_sql(table: str, id_col: str, text_col: str,
                      threshold_num: int = 4, threshold_den: int = 5,
                      max_df: int = 50) -> str:
    """DuckDB mirror of :func:`sparse_cosine_pairs`."""
    n2, d2 = threshold_num * threshold_num, threshold_den * threshold_den
    toks = (f"list_filter(string_split(lower({text_col}), ' '), "
            "t -> t <> '')")
    return f"""WITH tf AS (
      SELECT {id_col} AS id, tok, count(*)::BIGINT AS tf
      FROM {table}, unnest({toks}) AS u(tok)
      GROUP BY {id_col}, tok),
    dfreq AS (SELECT tok, count(*)::BIGINT AS df FROM tf GROUP BY tok),
    kept AS (
      SELECT tf.id, tf.tok, tf.tf FROM tf
      JOIN dfreq ON tf.tok = dfreq.tok AND dfreq.df <= {max_df}),
    norms AS (SELECT id, sum(tf * tf)::BIGINT AS nrm FROM kept GROUP BY id),
    dots AS (
      SELECT a.id AS id_a, b.id AS id_b, sum(a.tf * b.tf)::BIGINT AS dot
      FROM kept a JOIN kept b ON a.tok = b.tok AND a.id < b.id
      GROUP BY a.id, b.id)
    SELECT d.id_a, d.id_b, d.dot, na.nrm AS norm_a, nb.nrm AS norm_b
    FROM dots d
    JOIN norms na ON d.id_a = na.id
    JOIN norms nb ON d.id_b = nb.id
    WHERE d.dot::HUGEINT * d.dot * {d2} >= {n2} * na.nrm::HUGEINT * nb.nrm"""
