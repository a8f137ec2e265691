"""Model-based corpus filtering: hashed linear text classifier
(fasttext-style) and an n-gram LM fluency scorer (KenLM-style).

Real training pipelines gate documents on learned models — a fasttext
quality/language classifier and a KenLM perplexity filter are the standard
pair (both public: Joulin et al. 2016 arXiv:1607.01759; CCNet,
arXiv:1911.00359).  The SPARK-SIDE shape of both is identical regardless of
where the weights come from: per-row feature hashing + a broadcast weight
table lookup + a linear fold — pure Catalyst HOFs, whole-stage codegen,
zero shuffles, linear in tokens.

This module implements that shape with DETERMINISTIC md5-derived stand-in
weights so every operator carries an exact DuckDB oracle.  Swapping in
real trained weights is a data change, not a plan change:

- ``hashed_linear_score(col, weights=...)`` accepts any Python list of
  per-bucket weights (e.g. exported from a trained fasttext model); the
  list enters the plan as an array literal — broadcast once, O(1) lookup
  per token.
- For models too big for a literal (millions of buckets), join the
  token-bucket explosion against a weight TABLE instead — same math, one
  extra equi-join; or run the real binary model in an Arrow-batched
  ``mapInPandas`` (the multimodal module shows that plumbing).

All arithmetic is +/*/÷ in float64 with left-fold association — bit-exact
across Spark and DuckDB — so scores are NOT rounded.  The sigmoid is
deliberately omitted: it is monotone, so thresholding the linear margin is
the same decision, and exp() is not guaranteed bit-identical across
engines.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

from pigpen_spark.functions.text import _let, tokens


def _pseudo_weight(tag: str, i: int) -> float:
    """Deterministic stand-in weight in [-0.498, 0.5): derived from md5 so
    Spark literals and generated oracle SQL agree digit-for-digit.  The
    value is (k − 127.5)/256 with k the first md5 byte — a multiple of
    2^-9, exactly representable in float64 AND in its shortest decimal
    repr, so the literal round-trips through SQL text losslessly."""
    k = int(hashlib.md5(f"{tag}-{i}".encode()).hexdigest()[:2], 16)
    return (k - 127.5) / 256


def default_weights(n_buckets: int, tag: str = "qcls") -> list[float]:
    return [_pseudo_weight(tag, b) for b in range(n_buckets)]


def _bucket(tok: Column, n_buckets: int) -> Column:
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("bigint") % n_buckets


def hashed_linear_score(
    col, n_buckets: int = 256, weights: list[float] | None = None,
    bias: float = 0.0, tag: str = "qcls",
) -> Column:
    """Linear margin of a hashed bag-of-words classifier: bias + mean over
    tokens of W[bucket(token)], bucket = md5(token) mod n_buckets.

    This is fasttext's inference shape (unigram features, mean pooling,
    linear head) minus the softmax — threshold the margin directly.
    NULL for token-less documents (no features → no decision)."""
    w = weights if weights is not None else default_weights(n_buckets, tag)
    if len(w) != n_buckets:
        raise ValueError(
            f"hashed_linear_score: {len(w)} weights for {n_buckets} buckets"
        )
    warr = F.array(*[F.lit(float(x)) for x in w])
    return _let(tokens(col), lambda toks: F.lit(float(bias)) + F.try_divide(
        F.aggregate(
            toks, F.lit(0.0),
            lambda acc, t: acc + F.element_at(warr, _bucket(t, n_buckets).cast("int") + 1),
        ),
        F.size(toks).cast("double"),
    ))


def hashed_linear_score_sql(
    col: str, n_buckets: int = 256, weights: list[float] | None = None,
    bias: float = 0.0, tag: str = "qcls",
) -> str:
    """DuckDB equivalent of :func:`hashed_linear_score`."""
    w = weights if weights is not None else default_weights(n_buckets, tag)
    lits = "[" + ", ".join(repr(float(x)) for x in w) + "]"
    toks = f"list_filter(string_split(lower({col}), ' '), t -> t <> '')"
    return f"""
      ({float(bias)!r} + list_sum([
          ({lits})[(('0x' || substring(md5(t), 1, 8))::BIGINT % {n_buckets}) + 1]
          for t in ({toks})]) / len({toks}))
    """


#: Fixed-point scale for table-form weights: stand-in weights are
#: multiples of 2^-9, so ×512 makes them exact integers — the distributed
#: SUM is then order-independent (bigint), unlike a float sum whose
#: association order varies per shuffle.  One final division restores the
#: float margin.
WEIGHT_SCALE = 512


def weight_table(spark, n_buckets: int = 256, tag: str = "qcls"):
    """(bucket, w512) weight TABLE for :func:`hashed_linear_score_join` —
    the stand-in for a trained model's exported weights.  Real weights
    load the same shape from parquet (quantize to the fixed-point scale
    on export)."""
    return spark.createDataFrame(
        [(b, int(_pseudo_weight(tag, b) * WEIGHT_SCALE)) for b in range(n_buckets)],
        "bucket int, w512 long",
    )


def hashed_linear_score_join(
    df, id_col: str, text_col: str, weights_df, n_buckets: int = 256,
):
    """Table-form hashed linear classifier: same margin as
    :func:`hashed_linear_score`, but the weights come from a (bucket,
    w512) DataFrame — the posture for vocabularies too large for an
    array literal (a 10M-bucket fasttext model is an 80 MB parquet, not
    an expression tree).

    Plan shape: explode tokens → bucket key → LEFT-join the weight table
    (Catalyst broadcasts it while it fits, falls back to shuffle join
    beyond that) → per-doc SUM of integer-scaled weights + token count →
    one division.  The join is LEFT with a 0 default because exported
    models are SPARSE — a bucket with no learned feature means weight 0,
    and the mean still divides by ALL tokens (fasttext mean-pool
    semantics); an inner join would silently rescale the margin to the
    matched-token mean.  The integer sum keeps the result EXACT under
    any aggregation order, so the table form and the literal form agree
    to the last bit on dense tables.  Token-less docs come back with
    NULL margin via the outer join, matching the literal form.

    PRECONDITION: ``id_col`` must be unique per row.  The token pool is
    keyed by id, so duplicate ids would silently blend their tokens into
    one margin (the literal form scores each row independently); this
    form FAILS FAST instead — the id-dedup aggregate doubles as a
    duplicate detector (same shuffle a plain distinct would cost) and
    raises mid-job on the first duplicate id."""
    from pyspark.sql import functions as _F

    toks = df.select(
        _F.col(id_col).alias("__id"),
        _F.explode(tokens(_F.col(text_col))).alias("__tok"),
    ).select("__id", _bucket(_F.col("__tok"), n_buckets).cast("int").alias("bucket"))
    sums = (
        toks.join(_F.broadcast(weights_df), "bucket", "left")
        .groupBy("__id")
        .agg(
            _F.sum(_F.coalesce(_F.col("w512"), _F.lit(0))).alias("__s"),
            _F.count(_F.lit(1)).alias("__n"),
        )
    )
    margin = _F.col("__s").cast("double") / (
        _F.lit(float(WEIGHT_SCALE)) * _F.col("__n").cast("double")
    )
    # The guard lives INSIDE the id projection (when→raise_error→otherwise
    # id) so column pruning can't eliminate it the way a dropped side
    # column would be.
    ids = (
        df.select(_F.col(id_col).alias("__id"))
        .groupBy("__id")
        .agg(_F.count(_F.lit(1)).alias("__dup"))
        .select(
            _F.when(
                _F.col("__dup") > 1,
                _F.raise_error(_F.concat(
                    _F.lit(f"hashed_linear_score_join: duplicate {id_col}="),
                    _F.col("__id").cast("string"),
                    _F.lit(" — margins would blend across rows"),
                )),
            ).otherwise(_F.col("__id")).alias("__id"),
        )
    )
    return (
        ids.join(sums, "__id", "left")
        .select(_F.col("__id").alias(id_col), margin.alias("margin"))
    )


def weight_table_sql(n_buckets: int = 256, tag: str = "qcls") -> str:
    """DuckDB CTE body generating the same (bucket, w512) weight table
    from the md5 derivation — no literal list needed."""
    rows = ", ".join(
        f"({b}, {int(_pseudo_weight(tag, b) * WEIGHT_SCALE)})" for b in range(n_buckets)
    )
    return f"(VALUES {rows}) AS w(bucket, w512)"


def bigram_lm_score(col, tag: str = "lm", scale: int = 1 << 24) -> Column:
    """Mean per-bigram pseudo-log-probability in (−1, 0]: bigram (t₁,t₂)
    scores −(md5(t₁‖' '‖t₂) mod scale)/scale.  The md5-derived value
    stands in for a trained bigram LM's log P(t₂|t₁) — the Spark-side
    shape (per-row bigram HOF + table-free lookup + mean fold) is exactly
    a KenLM-lite fluency filter; a REAL LM swaps in as a weight-table
    join or an Arrow-batched ``mapInPandas``, not a plan change.

    Single-token and empty documents have no bigrams → NULL (callers
    decide the gate for degenerate docs).  Division by a power of two and
    a left-fold mean keep the score bit-exact across engines."""
    def body(toks: Column) -> Column:
        n_bi = F.size(toks) - 1
        lp = F.aggregate(
            F.sequence(F.lit(1), n_bi),
            F.lit(0.0),
            lambda acc, i: acc - (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.element_at(toks, i), F.lit(" "),
                                       F.element_at(toks, i + 1), F.lit("#"), F.lit(tag))),
                        1, 8,
                    ), 16, 10,
                ).cast("bigint") % scale
            ).cast("double") / F.lit(float(scale)),
        )
        return F.when(n_bi >= 1, F.try_divide(lp, n_bi.cast("double")))

    return _let(tokens(col), body)


def bigram_lm_score_sql(col: str, tag: str = "lm", scale: int = 1 << 24) -> str:
    """DuckDB equivalent of :func:`bigram_lm_score`.  The token list is
    let-bound via a single-element list comprehension (``[expr for t in
    [toks]][1]``) — DuckDB's analog of text._let, evaluating the
    tokenizer once instead of once per reference."""
    toks = f"list_filter(string_split(lower({col}), ' '), t -> t <> '')"
    h = (f"('0x' || substring(md5(t[i] || ' ' || t[i + 1] || '#' || '{tag}'), 1, 8))"
         f"::BIGINT % {scale}")
    return f"""
      ([CASE WHEN len(t) >= 2
             THEN list_sum([-({h})::DOUBLE / {float(scale)!r}
                            for i in range(1, len(t))]) / (len(t) - 1)
             END
        for t in [({toks})]])[1]
    """


def perplexity_buckets(df, id_col: str, text_col: str, lang_col: str,
                       n_buckets: int = 3, tag: str = "lm",
                       thresholds: dict[str, list[float]] | None = None):
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score every
    document with the bigram-LM fluency score and assign a per-language
    head/middle/tail bucket (0 = most fluent).

    Two forms, one semantics:

    - ``thresholds=None`` (exact form, the oracle-checked catalog query):
      bucket = ``((rank-1)·n) div count`` over a PARTITION BY language
      window ordered by (score DESC, id) — integer math, bit-exact across
      engines.  The per-language window is the honest cost of *exact*
      terciles; languages parallelize across each other.
    - ``thresholds={lang: [cut1, cut2, ...]}`` (the production/scale
      form): bucket = number of descending score cutoffs the document
      falls below — a pure broadcast-literal comparison with NO window
      and no shuffle beyond the scan, exactly how CCNet deploys (cutoffs
      are trained once on a sample, then applied to the full crawl).

    Documents with no bigrams (≤1 token) score NULL and land in a NULL
    bucket — callers gate degenerate docs explicitly.

    Returns (id, lang, lm_score, bucket)."""
    from pyspark.sql import Window

    score = bigram_lm_score(F.col(text_col), tag=tag)
    scored = df.select(F.col(id_col), F.col(lang_col), score.alias("lm_score"))
    if thresholds is not None:
        def _lang_bucket(cuts: list[float]) -> Column:
            b = F.lit(0).cast("bigint")
            for c in cuts:  # descending cutoffs: below a cut ⇒ next bucket
                b = b + F.when(F.col("lm_score") < F.lit(float(c)), 1).otherwise(0)
            return b
        bucket = F.lit(None).cast("bigint")
        for lang, cuts in sorted(thresholds.items(), reverse=True):
            bucket = F.when(F.col(lang_col) == F.lit(lang), _lang_bucket(list(cuts))) \
                      .otherwise(bucket)
        return scored.select(
            F.col(id_col), F.col(lang_col), F.col("lm_score"),
            F.when(F.col("lm_score").isNotNull(), bucket).alias("bucket"),
        )
    w = Window.partitionBy(lang_col).orderBy(F.col("lm_score").desc(), F.col(id_col))
    ranked = scored.where(F.col("lm_score").isNotNull()).select(
        "*",
        F.row_number().over(w).cast("bigint").alias("__rn"),
        F.count(F.lit(1)).over(Window.partitionBy(lang_col)).alias("__cnt"),
    )
    bucketed = ranked.select(
        F.col(id_col), F.col(lang_col), F.col("lm_score"),
        F.floor((F.col("__rn") - 1) * n_buckets / F.col("__cnt")).cast("bigint").alias("bucket"),
    )
    nulls = scored.where(F.col("lm_score").isNull()).select(
        F.col(id_col), F.col(lang_col), F.col("lm_score"),
        F.lit(None).cast("bigint").alias("bucket"),
    )
    return bucketed.unionByName(nulls)


def perplexity_buckets_sql(table: str, id_col: str, text_col: str,
                           lang_col: str, n_buckets: int = 3,
                           tag: str = "lm") -> str:
    """DuckDB oracle for the exact (windowed) form of
    :func:`perplexity_buckets` — same integer bucket math."""
    lm = bigram_lm_score_sql(text_col, tag=tag)
    return f"""
    WITH s AS (
      SELECT {id_col}, {lang_col}, ({lm}) AS lm_score FROM {table}
    ),
    r AS (
      SELECT {id_col}, {lang_col}, lm_score,
             row_number() OVER (PARTITION BY {lang_col}
                                ORDER BY lm_score DESC, {id_col}) AS rn,
             count(*) OVER (PARTITION BY {lang_col}) AS cnt
      FROM s WHERE lm_score IS NOT NULL
    )
    SELECT {id_col}, {lang_col}, lm_score,
           ((rn - 1) * {n_buckets} // cnt)::BIGINT AS bucket
    FROM r
    UNION ALL
    SELECT {id_col}, {lang_col}, lm_score, NULL::BIGINT AS bucket
    FROM s WHERE lm_score IS NULL
    """


def bigram_pairs(col) -> Column:
    """Array of (w1, w2) structs for consecutive whitespace tokens —
    let-bound, tokenizes once per row."""
    def body(toks: Column) -> Column:
        n_bi = F.size(toks) - 1
        return F.when(n_bi >= 1, F.transform(
            F.sequence(F.lit(1), n_bi),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        )).otherwise(F.array())
    return _let(tokens(col), body)


def train_bigram_counts(df, text_col: str):
    """COUNT-based bigram LM training: the real-statistics sibling of the
    md5 stand-in :func:`bigram_lm_score` — one partial-aggregating
    groupBy over the exploded bigram stream (the identical counting split
    KenLM's first pass runs; the corpus-sized work is this one shuffle).
    Returns (w1, w2, c) — store it once, score any corpus against it."""
    return (
        df.select(F.explode(bigram_pairs(F.col(text_col))).alias("b"))
        .groupBy(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def bigram_lm_score_counts(df, id_col: str, text_col: str, counts):
    """Score documents against TRAINED bigram counts with integer-exact
    arithmetic: per bigram, the conditional probability p(w2|w1) =
    c(w1,w2)/c(w1,·) in ppm (integer ``div`` — unseen bigrams/contexts
    score 0); per document, the mean over its bigrams.  Mean conditional
    probability replaces perplexity because ln() is not bit-portable
    across engines (ROUND_NOTES float discipline) — it is monotone with
    the same gating decisions for fixed-length docs and hash-exact in
    the oracle.

    Plan: explode doc bigrams → equi-join the bigram table on (w1,w2) →
    equi-join the context table on w1 (both corpus-vocab-sized relations;
    Catalyst broadcasts them while they fit) → one per-doc groupBy.
    Returns (id, n_bigrams, mean_p_ppm) for EVERY input row (<2-token
    docs: 0 bigrams, NULL score)."""
    ctx = counts.groupBy("w1").agg(F.sum("c").alias("c1"))
    bi = (
        df.select(F.col(id_col).alias("__id"),
                  F.explode(bigram_pairs(F.col(text_col))).alias("b"))
        .select("__id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    scored = (
        bi.join(counts, on=["w1", "w2"], how="left")
        .join(ctx, on="w1", how="left")
        .select(
            "__id",
            F.coalesce(
                F.expr("c * 1000000 DIV c1"), F.lit(0).cast("bigint")
            ).alias("p_ppm"),
        )
    )
    per_doc = scored.groupBy("__id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.expr("sum(p_ppm) DIV count(1)").alias("mean_p_ppm"),
    )
    return (
        df.select(F.col(id_col).alias("__id"))
        .join(per_doc, on="__id", how="left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.col("mean_p_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# DSIR: data selection via importance resampling (Xie et al. 2023,
# arXiv:2302.03169) — hashed n-gram importance weights
# ---------------------------------------------------------------------------
#
# DSIR scores raw documents by how target-like their hashed n-gram
# profile is: fit bucket distributions p (target corpus) and q (raw
# corpus) over md5-hashed unigram+bigram buckets, then weight each doc
# by its features' p/q ratios and keep the highest-weighted docs.  The
# published form uses log-likelihood ratios; ln() is not bit-portable
# across engines (same reason perplexity_buckets uses mean conditional
# probability), so the portable analog here scores a doc by the MEAN of
# its features' add-one-smoothed share ratios in ppm — identical
# two-pass count shape, identical broadcast-join scoring plan, monotone
# in the same per-feature evidence; swap the ratio column for
# log-ratios when serving from a real float pipeline.


def dsir_feature_buckets(col, n_buckets: int = 1024) -> Column:
    """Array of hashed feature buckets for one document: md5 buckets of
    every unigram AND every space-joined bigram (DSIR's feature map).
    Pure HOF expression — tokenizes once, zero UDFs, zero shuffles."""
    def body(toks: Column) -> Column:
        unis = F.transform(toks, lambda t: _bucket(t, n_buckets))
        n_bi = F.size(toks) - 1
        bis = F.when(n_bi >= 1, F.transform(
            F.sequence(F.lit(1), n_bi),
            lambda i: _bucket(F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)),
                n_buckets),
        )).otherwise(F.array().cast("array<bigint>"))
        return F.concat(unis, bis)
    return _let(tokens(col), body)


def dsir_bucket_counts(df, text_col: str, n_buckets: int = 1024):
    """Corpus pass of DSIR: hashed-feature bucket counts — ONE
    partial-aggregating groupBy over the exploded feature stream; the
    result is n_buckets rows (broadcastable however big the corpus)."""
    return (
        df.select(F.explode(dsir_feature_buckets(F.col(text_col), n_buckets))
                  .alias("bucket"))
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))
    )


def dsir_ratio_table(spark, target_counts, raw_counts, n_buckets: int = 1024):
    """Complete (bucket, ratio_ppm) table over the full bucket spine:
    ratio_ppm = ((ct+1)·(Tr+B)·10⁶) DIV ((cr+1)·(Tt+B)) — the add-one-
    smoothed target/raw share ratio, computed in DECIMAL(38,0) so the
    triple product never overflows BIGINT at corpus scale (mirrors
    HUGEINT on the DuckDB side).  n_buckets rows: a broadcast literal of
    a table, exactly like the ANN codebooks."""
    spine = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    tt = target_counts.agg(F.sum("c").alias("tt"))
    tr = raw_counts.agg(F.sum("c").alias("tr"))
    return (
        spine
        .join(target_counts.withColumnRenamed("c", "ct"), on="bucket", how="left")
        .join(raw_counts.withColumnRenamed("c", "cr"), on="bucket", how="left")
        .crossJoin(tt).crossJoin(tr)
        .select(
            "bucket",
            F.expr(f"""CAST(
                (CAST(coalesce(ct, 0) + 1 AS DECIMAL(38,0))
                 * (tr + {n_buckets}) * 1000000)
                DIV (CAST(coalesce(cr, 0) + 1 AS DECIMAL(38,0))
                     * (tt + {n_buckets}))
                AS BIGINT)""").alias("ratio_ppm"),
        )
    )


def dsir_importance(df, id_col: str, text_col: str, ratio_table,
                    n_buckets: int = 1024):
    """Score every document: explode its feature buckets, broadcast-join
    the n_buckets-row ratio table, one per-doc aggregate — mean feature
    ratio in ppm (NULL for token-less docs).  Returns
    (id, n_feats, w_ppm); select with sort/take or take_budget."""
    from pyspark.sql.functions import broadcast

    feats = (
        df.select(F.col(id_col).alias("__id"),
                  F.explode(dsir_feature_buckets(F.col(text_col), n_buckets))
                  .alias("bucket"))
    )
    per_doc = (
        feats.join(broadcast(ratio_table), on="bucket")
        .groupBy("__id")
        .agg(F.count(F.lit(1)).alias("n_feats"),
             F.expr("sum(ratio_ppm) DIV count(1)").alias("w_ppm"))
    )
    return (
        df.select(F.col(id_col).alias("__id"))
        .join(per_doc, on="__id", how="left")
        .select(F.col("__id").alias(id_col),
                F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
                F.col("w_ppm"))
    )


def dsir_score_corpus(df, id_col: str, text_col: str, target_pred,
                      n_buckets: int = 1024):
    """Fused DSIR pass: explode the hashed features ONCE (persisted slim
    (id, is_target, bucket) rows), derive target and raw bucket counts
    and the per-doc scoring from that single explode — one corpus
    tokenization instead of three (2× measured at sf0.1).  ``target_pred``
    is a boolean Column selecting the target slice.  Returns
    (id, n_feats, w_ppm) like :func:`dsir_importance`."""
    from pigpen_spark.cache import persisted as _persisted
    from pyspark.sql.functions import broadcast

    feats = _persisted(
        df.select(
            F.col(id_col).alias("__id"), target_pred.alias("__t"),
            F.explode(dsir_feature_buckets(F.col(text_col), n_buckets))
            .alias("bucket"),
        )
    )
    target_counts = (feats.filter(F.col("__t")).groupBy("bucket")
                     .agg(F.count(F.lit(1)).alias("c")))
    raw_counts = feats.groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))
    ratio = dsir_ratio_table(df.sparkSession, target_counts, raw_counts,
                             n_buckets)
    per_doc = (
        feats.join(broadcast(ratio), on="bucket")
        .groupBy("__id")
        .agg(F.count(F.lit(1)).alias("n_feats"),
             F.expr("sum(ratio_ppm) DIV count(1)").alias("w_ppm"))
    )
    return (
        df.select(F.col(id_col).alias("__id"))
        .join(per_doc, on="__id", how="left")
        .select(F.col("__id").alias(id_col),
                F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
                F.col("w_ppm"))
    )


def target_encode(df, cat_col: str, target_col, m: int = 50):
    """Smoothed TARGET (mean) encoding of a categorical column — the
    standard leakage-safe tabular-ML feature: each category is encoded
    by its empirical positive rate shrunk toward the global prior with
    pseudo-count ``m`` (the "m-estimate" / add-m smoothing used by
    CatBoost-style encoders; rare categories collapse to the prior,
    frequent ones keep their own rate).

    Arithmetic contract (mirrored by :func:`target_encode_sql`):
    ``target_col`` must evaluate to 0/1 BIGINT;
    ``prior_ppm = Σpos · 10⁶ DIV greatest(N, 1)`` and
    ``enc_ppm = (pos · 10⁶ + m · prior_ppm) DIV (cnt + m)`` — all
    operands non-negative BIGINTs, so Spark DIV (truncate) and DuckDB
    // (floor) agree and the oracle is hash-exact.  The ``greatest``
    guard makes the empty-input case an empty RESULT on both engines
    (without it Spark DIV-by-zero yields NULL while DuckDB ``//``
    raises — an engine divergence even though no row would be
    emitted).

    Scale: ONE groupBy on the category plus a single-row global
    aggregate that joins back via broadcast crossJoin — no windows, no
    per-row state; applying the encoding to a fact table is a broadcast
    join of this output (|categories| rows) against the facts.

    Returns (category, cnt, pos, enc_ppm) — one row per category.
    """
    if m < 0:
        raise ValueError(f"target_encode: m must be >= 0, got {m}")
    base = df.select(F.col(cat_col).alias("category"),
                     F.col(target_col).cast("long").alias("t")
                     if isinstance(target_col, str) else
                     target_col.cast("long").alias("t"))
    per = base.groupBy("category").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("t").alias("pos"))
    glob = base.agg(
        F.count(F.lit(1)).alias("n"), F.sum("t").alias("tp")
    ).select(F.expr("tp * 1000000 DIV greatest(n, 1)").alias("prior_ppm"))
    return (
        per.crossJoin(F.broadcast(glob))
        .select("category",
                F.col("cnt").cast("long").alias("cnt"),
                F.col("pos").cast("long").alias("pos"),
                F.expr(f"(pos * 1000000 + {m} * prior_ppm) DIV (cnt + {m})")
                 .cast("long").alias("enc_ppm"))
    )


def target_encode_sql(table: str, cat_col: str, target_expr: str,
                      m: int = 50) -> str:
    """DuckDB mirror of :func:`target_encode`; ``target_expr`` is a SQL
    expression evaluating to 0/1."""
    return f"""WITH base AS (
      SELECT {cat_col} AS category, ({target_expr})::BIGINT AS t
      FROM {table}),
    per AS (
      SELECT category, count(*)::BIGINT AS cnt, sum(t)::BIGINT AS pos
      FROM base GROUP BY category),
    gl AS (
      SELECT (sum(t) * 1000000 // greatest(count(*), 1))::BIGINT AS prior_ppm
      FROM base)
    SELECT category, cnt, pos,
           ((pos * 1000000 + {m} * prior_ppm) // (cnt + {m}))::BIGINT
             AS enc_ppm
    FROM per, gl"""
