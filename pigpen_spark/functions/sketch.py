"""Mergeable frequency sketches: Count-Min heavy hitters.

Extension surface (BASELINE.json north star — corpus-analysis ops a
training-data pipeline needs).  The reference's analytics layer stops at
exact grouped counts (pigpen-core join/fold, e.g. pigpen.core/group-by +
count); at 100 TB an exact term-frequency table is itself a giant
dataset, so the scale tool is a *mergeable sketch*: fixed-size partial
sketches combine associatively across partitions/executors — the same
two-level posture as the HLL queries (``ext_hll_merge``).

Count-Min (Cormode & Muthukrishnan 2005): depth×width integer counters;
``est(x) = min_r counter[r][h_r(x)]`` overestimates by at most
ε·N with probability 1−δ (ε = e/width, δ = e^−depth).  Everything here
is integer arithmetic over md5-derived token hashes — the exact
portable-hash discipline of :mod:`pigpen_spark.functions.dedup` — so the
DuckDB oracle reproduces every counter and estimate hash-exactly.

Plan shape (see ``heavy_hitters``): one token explode → ONE groupBy
(r, bucket) with map-side partial aggregation builds the sketch
(≤ depth·width rows — broadcastable by construction); estimation joins
candidate terms against the BROADCAST sketch and takes a min over depth
rows.  No all-terms exact count table ever materializes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pigpen_spark.cache import persisted as _persisted
from pigpen_spark.functions.dedup import _P, _hconst, token_hashes, token_hashes_sql
from pigpen_spark.functions.text import tokens


def cms_bucket(h: Column, r: int, width: int) -> Column:
    """Row-``r`` counter index for a 32-bit token hash: universal hash
    ``(A_r·h + B_r) mod P mod width`` — pure modular arithmetic, one
    md5 per token TOTAL (in :func:`token_hashes`), not per row."""
    a, b = _hconst("cms-a", r), _hconst("cms-b", r)
    return ((F.lit(a) * h + F.lit(b)) % F.lit(_P)) % F.lit(width)


def cms_bucket_sql(h: str, r: int, width: int) -> str:
    """DuckDB equivalent of :func:`cms_bucket` (same literals)."""
    a, b = _hconst("cms-a", r), _hconst("cms-b", r)
    return f"(({a} * {h} + {b}) % {_P}) % {width}"


def cms_sketch(df: DataFrame, text_col: str, depth: int = 4,
               width: int = 512) -> DataFrame:
    """Build the Count-Min sketch of the corpus token stream as a
    (r, bucket, cnt) DataFrame with ≤ depth·width rows.

    ONE shuffle: explode tokens → per-token 32-bit hash → explode the
    ``depth`` (r, bucket) coordinates → groupBy(r, bucket).count() with
    map-side partial aggregation — each executor's partial IS its local
    sketch and the reduce is the sketch merge, which is what makes this
    the 1000-executor pattern (counters add; no per-term state)."""
    toks = df.select(F.explode(token_hashes(F.col(text_col))).alias("h"))
    coords = toks.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("r"),
                    cms_bucket(F.col("h"), r, width).alias("bucket"),
                )
                for r in range(depth)
            ])
        ).alias("c")
    ).select("c.r", "c.bucket")
    return coords.groupBy("r", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def heavy_hitters(df: DataFrame, text_col: str, depth: int = 4,
                  width: int = 512, min_est: int = 10) -> DataFrame:
    """Heavy hitters by Count-Min estimate: every distinct token whose
    sketch estimate is ≥ ``min_est``, with the estimate.

    Candidate terms are the corpus's distinct tokens (at true scale:
    distinct tokens of a SAMPLE, or a known vocabulary — any candidate
    superset works because the sketch answers point queries); each term
    recomputes its ``depth`` buckets and takes ``min(cnt)`` over a
    BROADCAST join against the ≤ depth·width-row sketch.  The estimate
    can only overestimate, so recall of true heavy hitters is exact.

    Returns (term, est) — integer estimates, hash-exact vs the DuckDB
    oracle (:func:`heavy_hitters_sql`)."""
    sketch = cms_sketch(df, text_col, depth=depth, width=width)
    terms = (
        df.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .distinct()
        .withColumn(
            "h", F.conv(F.substring(F.md5(F.col("term")), 1, 8), 16, 10).cast("bigint")
        )
    )
    probes = terms.select(
        "term",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("r"),
                    cms_bucket(F.col("h"), r, width).alias("bucket"),
                )
                for r in range(depth)
            ])
        ).alias("c"),
    ).select("term", "c.r", "c.bucket")
    est = (
        probes.join(F.broadcast(sketch), ["r", "bucket"])
        .groupBy("term")
        .agg(F.min("cnt").alias("est"))
    )
    return est.filter(F.col("est") >= min_est)


def heavy_hitters_sql(table: str, text_col: str, depth: int = 4,
                      width: int = 512, min_est: int = 10) -> str:
    """DuckDB oracle for :func:`heavy_hitters` — identical md5 token
    hashes, identical universal-hash literals, identical integer
    counters."""
    toks = f"list_filter(string_split(lower({text_col}), ' '), t -> t <> '')"
    coord_rows = " UNION ALL ".join(
        f"SELECT {r} AS r, {cms_bucket_sql('h', r, width)} AS bucket FROM th"
        for r in range(depth)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT term, {r} AS r, {cms_bucket_sql('h', r, width)} AS bucket FROM terms"
        for r in range(depth)
    )
    return f"""
    WITH th AS (
      SELECT unnest({token_hashes_sql(text_col)}) AS h FROM {table}
    ),
    coords AS ({coord_rows}),
    sketch AS (
      SELECT r, bucket, count(*)::BIGINT AS cnt FROM coords GROUP BY r, bucket
    ),
    terms AS (
      SELECT DISTINCT t AS term,
             ('0x' || substring(md5(t), 1, 8))::BIGINT AS h
      FROM (SELECT unnest({toks}) AS t FROM {table})
    ),
    probes AS ({probe_rows})
    SELECT p.term, min(s.cnt) AS est
    FROM probes p JOIN sketch s ON p.r = s.r AND p.bucket = s.bucket
    GROUP BY p.term
    HAVING min(s.cnt) >= {min_est}
    """


def histogram_sketch(df: DataFrame, value: Column, lo: int, hi: int,
                     n_bins: int = 256, shard_col: Column | None = None,
                     group_cols: list[str] | None = None) -> DataFrame:
    """Fixed-bin integer histogram of ``value`` (caller supplies INTEGER
    units — cents, micros — so binning is exact integer math): the
    quantile-sketch sibling of :func:`cms_sketch` / ``ext_hll_merge``.

    ``bin = clamp((x - lo) div w, 0, n_bins-1)`` with ``w = ceil((hi-lo)/
    n_bins)``; out-of-range values clamp into the edge bins.  ONE groupBy
    with map-side partial aggregation — each executor's partial counts ARE
    its local sketch, the reduce is the merge (counters add), and the
    result is ≤ ``n_bins`` rows regardless of input size.  When
    ``shard_col`` is given, per-shard sketches materialize first and merge
    in a second ≤ shards·n_bins-row agg — the explicit two-level rollup a
    1000-executor fleet or a day-partitioned lake would run.

    ``group_cols`` produces one independent histogram per group key
    (≤ groups·n_bins rows) — per-language length stats, per-source score
    distributions — in the SAME single partial-aggregating pass.

    Returns (group_cols..., bin, cnt)."""
    w = max(1, -((lo - hi) // n_bins))  # ceil((hi-lo)/n_bins), integer
    groups = list(group_cols or [])
    x = value.cast("bigint")
    b = F.floor((x - F.lit(lo)) / F.lit(w)).cast("bigint")
    bin_ = F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), b)).alias("bin")
    if shard_col is not None:
        per_shard = (
            df.select(*groups, shard_col.alias("shard"), bin_)
            .groupBy(*groups, "shard", "bin").agg(F.count(F.lit(1)).alias("cnt"))
        )
        return per_shard.groupBy(*groups, "bin").agg(F.sum("cnt").alias("cnt"))
    return df.select(*groups, bin_).groupBy(*groups, "bin").agg(
        F.count(F.lit(1)).alias("cnt"))


def histogram_quantiles(df: DataFrame, value: Column, lo: int, hi: int,
                        n_bins: int = 256,
                        ps_permille: tuple[int, ...] = (500, 900, 990),
                        shard_col: Column | None = None,
                        group_cols: list[str] | None = None) -> DataFrame:
    """Quantile estimates from the mergeable histogram sketch: for each
    requested permille ``p``, the lower bound of the first bin whose
    cumulative count reaches ``p``/1000 of the total.

    Error bound: one bin width ``w`` (≤ (hi-lo)/n_bins) for in-range
    data — the estimate is deterministic, integer-exact, and identical
    under any partitioning (counters are order-independent), unlike
    ``approx_percentile`` whose merge is neither portable nor
    engine-stable.  The cumulative pass runs over the ≤ n_bins-row sketch
    (a bounded single-partition window — n_bins rows, not data rows).

    ``group_cols`` yields independent per-group quantiles (per-language
    length stats etc.); each group's cumulative window spans its own
    ≤ n_bins sketch rows, so groups parallelize and no window ever sees
    more than n_bins rows.

    Returns (group_cols..., p_permille, est, n_total) where ``est`` is in
    the caller's integer units."""
    w = max(1, -((lo - hi) // n_bins))
    groups = list(group_cols or [])
    hist = histogram_sketch(df, value, lo, hi, n_bins, shard_col=shard_col,
                            group_cols=groups)
    cum_w = (Window.partitionBy(*groups) if groups else Window.partitionBy())
    cum = hist.select(
        *groups, "bin", "cnt",
        F.sum("cnt").over(
            cum_w.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
        ).alias("cum"),
        F.sum("cnt").over(cum_w).alias("total"),
    )
    ps = F.explode(F.array(*[F.lit(int(p)) for p in ps_permille])).alias("p_permille")
    return (
        cum.select(*groups, ps, "bin", "cum", "total")
        .where(F.col("cum") * 1000 >= F.col("p_permille") * F.col("total"))
        .groupBy(*groups, "p_permille")
        .agg(
            (F.lit(lo) + F.min("bin") * F.lit(w)).alias("est"),
            F.max("total").alias("n_total"),
        )
    )


def histogram_quantiles_sql(table: str, value_sql: str, lo: int, hi: int,
                            n_bins: int = 256,
                            ps_permille: tuple[int, ...] = (500, 900, 990),
                            ) -> str:
    """DuckDB oracle for :func:`histogram_quantiles` — same integer bin,
    cumulative, and selection math (sharding is merge-invariant, so the
    unsharded oracle checks the sharded query too)."""
    w = max(1, -((lo - hi) // n_bins))
    plist = ", ".join(str(int(p)) for p in ps_permille)
    return f"""
    WITH hist AS (
      SELECT least({n_bins - 1}, greatest(0, ({value_sql} - {lo}) // {w})) AS bin,
             count(*)::BIGINT AS cnt
      FROM {table} GROUP BY 1
    ),
    cum AS (
      SELECT bin, cnt,
             sum(cnt) OVER (ORDER BY bin)::BIGINT AS cum,
             sum(cnt) OVER ()::BIGINT AS total
      FROM hist
    )
    SELECT p.p_permille, ({lo} + min(c.bin) * {w})::BIGINT AS est,
           max(c.total)::BIGINT AS n_total
    FROM (SELECT unnest([{plist}]) AS p_permille) p
    JOIN cum c ON c.cum * 1000 >= p.p_permille * c.total
    GROUP BY p.p_permille
    """


# -- Bloom filter ----------------------------------------------------------

#: Bits per sketch word.  62, not 64: bit 63 is the sign and ``1 << 63``
#: overflows DuckDB's BIGINT shift, so staying ≤ 2^61 keeps every word a
#: positive int64 in BOTH engines (bit_or/& are then portable bit math).
_BLOOM_WORD = 62


def _bloom_pos(h: Column, r: int, m_bits: int) -> Column:
    a, b = _hconst("bloom-a", r), _hconst("bloom-b", r)
    return ((F.lit(a) * h + F.lit(b)) % F.lit(_P)) % F.lit(m_bits)


def _bloom_pos_sql(h: str, r: int, m_bits: int) -> str:
    a, b = _hconst("bloom-a", r), _hconst("bloom-b", r)
    return f"(({a} * {h} + {b}) % {_P}) % {m_bits}"


def bloom_build(items: DataFrame, hash_col: str = "h", m_bits: int = 8192,
                k: int = 3) -> DataFrame:
    """Build a Bloom filter over pre-hashed items as a (word, bits)
    DataFrame with ≤ ceil(m_bits/62) rows — the third mergeable sketch
    next to HLL and Count-Min: per-partition partial ``bit_or`` IS the
    local filter and the reduce is the union (bit-or is associative,
    commutative, idempotent), so 1000 executors build one filter with a
    single tiny shuffle and two filters over different corpora union by
    the same aggregate.

    Deterministic md5-derived double hashing (same ``_hconst`` universal-
    hash discipline as Count-Min) makes the words hash-exact across
    engines — false positives exist (classic Bloom ~(1-e^{-kn/m})^k) but
    are the SAME false positives in Spark and DuckDB, so oracle checks
    are exact, not bound-checked."""
    coords = items.select(
        F.explode(F.array(*[
            _bloom_pos(F.col(hash_col), r, m_bits).alias("p") for r in range(k)
        ])).alias("p")
    )
    return coords.select(
        (F.col("p") / F.lit(_BLOOM_WORD)).cast("bigint").alias("word"),
        F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(p % {_BLOOM_WORD} AS INT))").alias("bit"),
    ).groupBy("word").agg(F.bit_or("bit").alias("bits"))


def bloom_maybe_contains(probes: DataFrame, sketch: DataFrame,
                         hash_col: str = "h", m_bits: int = 8192,
                         k: int = 3, out_col: str = "maybe") -> DataFrame:
    """Membership test against a built filter: ``out_col`` is true iff
    ALL k probe bits are set (no false negatives; bounded deterministic
    false positives).  The sketch is ≤ m_bits/62 rows — ALWAYS broadcast —
    so probing a 100 TB corpus is a map-only stage: explode k coords,
    broadcast-join the words, count matched bits per row.  No shuffle of
    the probed data beyond the per-row groupBy(key) reassembly, and even
    that partial-aggregates map-side."""
    # One broadcast LEFT join per probe index, then AND the k bit tests:
    # the probed data is NEVER shuffled (each join is a map-side
    # BroadcastHashJoin against the <= m/62-row sketch) and never
    # re-keyed — the old explode + probe-key groupBy + join-back form
    # spent three probe-sized exchanges to compute the same column.
    out = probes
    cond = None
    pow2 = F.lit(_POW2)
    for r in range(k):
        p = _bloom_pos(F.col(hash_col), r, m_bits)
        skr = sketch.select(F.col("word").alias(f"__bw{r}"),
                            F.col("bits").alias(f"__bb{r}"))
        out = (
            out.withColumn(f"__bw{r}", (p / F.lit(_BLOOM_WORD)).cast("bigint"))
            .withColumn(f"__bbit{r}",
                        F.element_at(pow2, (p % F.lit(_BLOOM_WORD)).cast("int") + F.lit(1)))
            .join(F.broadcast(skr), on=f"__bw{r}", how="left")
        )
        c = (F.coalesce(F.col(f"__bb{r}"), F.lit(0).cast("bigint"))
             .bitwiseAND(F.col(f"__bbit{r}")) != F.lit(0))
        cond = c if cond is None else cond & c
    return out.select(*probes.columns, cond.alias(out_col))


#: Powers of two 2^0..2^61 as a literal lookup — the column-shift
#: workaround (F.shiftleft takes only a Python-int shift), and legal
#: inside HOF lambdas where F.expr cannot reach the lambda variable.
_POW2 = [1 << i for i in range(_BLOOM_WORD)]


def bloom_words(sketch: DataFrame, m_bits: int) -> list[int]:
    """Materialize a built filter as a dense word list (length
    ceil(m_bits/62)) for :func:`bloom_maybe_col`.  The collect is
    BOUNDED by construction — a Bloom filter never exceeds m_bits/62
    rows regardless of corpus size (8192 bits = 133 rows at 100 TB),
    which is the whole point of probing through a sketch."""
    n_words = -(-m_bits // _BLOOM_WORD)
    words = [0] * n_words
    for row in sketch.collect():
        words[int(row["word"])] = int(row["bits"])
    return words


def bloom_maybe_col(words: list[int], h: Column, m_bits: int,
                    k: int = 3) -> Column:
    """Pure-EXPRESSION membership test: true iff all ``k`` probe bits of
    ``h`` are set in the literal filter ``words`` (from
    :func:`bloom_words`).  Unlike :func:`bloom_maybe_contains` — which
    spends a probe-key groupBy, a join-back, and usually a third join to
    reattach results — this is zero shuffles: the filter rides into the
    expression as a constant array, so probing a 100 TB corpus is pure
    map-side arithmetic inside whole-stage codegen, and it composes into
    HOF lambdas (probe every element of an array column without
    exploding it).  Same ``_bloom_pos`` discipline, so the true/false
    pattern is bit-identical to the join form and to DuckDB."""
    words_lit = F.lit([int(w) for w in words])
    pow2_lit = F.lit(_POW2)
    cond = None
    for r in range(k):
        p = _bloom_pos(h, r, m_bits)
        word = F.element_at(words_lit, (p / F.lit(_BLOOM_WORD)).cast("int") + F.lit(1))
        bit = F.element_at(pow2_lit, (p % F.lit(_BLOOM_WORD)).cast("int") + F.lit(1))
        c = word.bitwiseAND(bit) != F.lit(0)
        cond = c if cond is None else cond & c
    return cond


def bloom_gate(df: DataFrame, id_col: str, text_col: str, words: list[int],
               n: int = 3, m_bits: int = 8192, k: int = 3) -> DataFrame:
    """Decontamination gate against a STORED filter (the serving path):
    per document, count the distinct ``n``-gram hashes whose membership
    test passes in the literal filter ``words`` (from
    :func:`bloom_words`), and flag any document with at least one —
    (id, n_maybe, flagged).  The probe is the pure expression form
    (:func:`bloom_maybe_col`), so gating a corpus of any size is one
    map-side scan + a partial-aggregating per-doc count; no join, no
    gram shuffle.  Shares the gram definition with
    ``ext_bloom_decontaminate`` (shingled token hashes), so a filter
    built by :func:`bloom_build` over a benchmark's grams gates batch
    and stream identically."""
    from pigpen_spark.functions.dedup import shingle_hashes, token_hashes

    sh = F.array_distinct(shingle_hashes(token_hashes(F.col(text_col)), n))
    maybe = F.when(
        bloom_maybe_col(words, F.col("__h"), m_bits=m_bits, k=k),
        F.lit(1).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
    return (
        df.select(F.col(id_col).alias("doc_id"),
                  F.explode_outer(sh).alias("__h"))
        .select("doc_id", maybe.alias("__m"))
        .groupBy("doc_id").agg(F.sum("__m").alias("n_maybe"))
        .select("doc_id", "n_maybe", (F.col("n_maybe") >= 1).alias("flagged"))
    )


def histogram_quantiles_by_sql(table: str, value_sql: str, group_col: str,
                               lo: int, hi: int, n_bins: int = 256,
                               ps_permille: tuple[int, ...] = (500, 900, 990),
                               ) -> str:
    """DuckDB oracle for the grouped form of :func:`histogram_quantiles`."""
    w = max(1, -((lo - hi) // n_bins))
    plist = ", ".join(str(int(p)) for p in ps_permille)
    return f"""
    WITH hist AS (
      SELECT {group_col},
             least({n_bins - 1}, greatest(0, ({value_sql} - {lo}) // {w})) AS bin,
             count(*)::BIGINT AS cnt
      FROM {table} GROUP BY 1, 2
    ),
    cum AS (
      SELECT {group_col}, bin, cnt,
             sum(cnt) OVER (PARTITION BY {group_col} ORDER BY bin)::BIGINT AS cum,
             sum(cnt) OVER (PARTITION BY {group_col})::BIGINT AS total
      FROM hist
    )
    SELECT c.{group_col}, p.p_permille, ({lo} + min(c.bin) * {w})::BIGINT AS est,
           max(c.total)::BIGINT AS n_total
    FROM (SELECT unnest([{plist}]) AS p_permille) p
    JOIN cum c ON c.cum * 1000 >= p.p_permille * c.total
    GROUP BY 1, 2
    """


def exact_kth(df: DataFrame, value: Column, k: int,
              n_bins: int = 4096, max_rounds: int | None = None) -> int:
    """EXACT k-th smallest (1-based) of an integer-valued column by
    iterative histogram narrowing — distributed selection without a
    global sort: each round histograms the surviving range into
    ``n_bins`` and descends into the bin containing rank ``k``, so a
    64-bit domain resolves in ⌈64/log2(n_bins)⌉ ≈ 6 passes over the
    data regardless of row count.  This is the exact-refinement
    companion of :func:`histogram_quantiles` (one pass, ±bin-width):
    same mergeable counters, ~log_bins(domain) passes instead of one.

    Driver state per round is ONE ≤n_bins-row collect + three ints —
    the bounded-collect pattern; the data is never shuffled at all
    (every histogram is a map-side-combining aggregate).

    Returns the value as a Python int (an ACTION, like count())."""
    if k < 1:
        raise ValueError(f"exact_kth: k must be ≥1, got {k}")
    x = value.cast("bigint").alias("__x")
    vals = df.select(x).where(F.col("__x").isNotNull()).transform(_persisted)
    try:
        row = vals.agg(F.min("__x").alias("lo"), F.max("__x").alias("hi"),
                       F.count(F.lit(1)).alias("n")).first()
        if row["n"] == 0 or k > row["n"]:
            raise ValueError(f"exact_kth: k={k} out of range (n={row['n']})")
        lo, hi = int(row["lo"]), int(row["hi"])
        if hi - lo >= (1 << 62):
            # (__x - lo) must stay in int64 under ANSI mode; a span this
            # wide needs a pre-shift/partition of the domain first
            raise ValueError("exact_kth: value span exceeds 2^62")
        base = 0  # values strictly below lo
        if max_rounds is None:
            # ceil(log_bins(span)) + slack: each round divides the span by
            # ≥ n_bins/2 (ceil'd width), so this always suffices
            max_rounds, span = 2, hi - lo + 1
            while span > 1:
                span = (span + n_bins - 1) // n_bins
                max_rounds += 1
        for _ in range(max_rounds):
            if lo == hi:
                return lo
            w = max(1, (hi - lo + n_bins) // n_bins)  # ceil((hi-lo)+1/bins)
            # integer DIV, not float /: double division mis-bins values
            # once the surviving span exceeds 2^53
            hist = dict(
                vals.where((F.col("__x") >= lo) & (F.col("__x") <= hi))
                .groupBy(F.expr(f"(__x - {lo}) DIV {w}").alias("b"))
                .agg(F.count(F.lit(1)).alias("c"))
                .collect()
            )
            cum = base
            for b in sorted(hist):
                if cum + hist[b] >= k:
                    lo, hi = lo + int(b) * w, min(hi, lo + int(b) * w + w - 1)
                    base = cum
                    break
                cum += hist[b]
        raise RuntimeError("exact_kth: did not converge in max_rounds rounds")
    finally:
        vals.unpersist()


def heavy_hitters_exact(df: DataFrame, text_col: str, depth: int = 4,
                        width: int = 512, min_count: int = 10) -> DataFrame:
    """Sketch-then-verify heavy hitters: Count-Min proposes a candidate
    superset (estimates only OVERcount, so no true heavy hitter is
    missed), then ONE aggregation confined to candidate tokens computes
    exact counts.  The full-corpus term table never materializes —
    the exact pass counts only tokens that pass the broadcast candidate
    filter, which at Zipfian 100 TB is a few thousand terms instead of
    a vocabulary-sized shuffle.

    Returns (term, cnt) with EXACT counts ≥ min_count."""
    cands = heavy_hitters(df, text_col, depth=depth, width=width,
                          min_est=min_count).select("term")
    toks = df.select(F.explode(tokens(F.col(text_col))).alias("term"))
    return (
        toks.join(F.broadcast(cands), on="term", how="left_semi")
        .groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= min_count)
    )


def heavy_hitters_exact_sql(table: str, text_col: str,
                            min_count: int = 10) -> str:
    """DuckDB oracle for :func:`heavy_hitters_exact` — the sketch stage
    only ever ADDS candidates, so the exact result equals a plain
    thresholded term count."""
    toks = f"list_filter(string_split(lower({text_col}), ' '), t -> t <> '')"
    return f"""
    SELECT t AS term, count(*)::BIGINT AS cnt
    FROM (SELECT unnest({toks}) AS t FROM {table})
    GROUP BY t HAVING count(*) >= {min_count}
    """


def histogram_drift(old: DataFrame, new: DataFrame, value: Column,
                    lo: int, hi: int, n_bins: int = 256) -> DataFrame:
    """Distribution drift between two slices of the same measure: both
    sides reduce to fixed-bin histograms (mergeable counters — each side
    is ONE partial-aggregating pass), then per-bin shares in ppm are
    compared.  Returns one row: (n_old, n_new, l1_ppm, linf_ppm,
    n_bins_changed) where ``l1_ppm`` is Σ|p_old − p_new| in ppm (0 =
    identical shape, 2 000 000 = disjoint support) — the integer-exact
    stand-in for a KS/χ² drift alarm: thresholding L1 gives the same
    monitoring decision without a single float.

    The per-bin compare is an outer join of two ≤ n_bins-row sketches —
    driver-free, data never co-shuffled.  At 100 TB this is the nightly
    "did yesterday's drop change shape" gate in two scans."""
    ho = histogram_sketch(old, value, lo, hi, n_bins) \
        .select("bin", F.col("cnt").alias("c_old"))
    hn = histogram_sketch(new, value, lo, hi, n_bins) \
        .select("bin", F.col("cnt").alias("c_new"))
    j = ho.join(hn, on="bin", how="full_outer").select(
        F.coalesce(F.col("c_old"), F.lit(0)).alias("c_old"),
        F.coalesce(F.col("c_new"), F.lit(0)).alias("c_new"),
    )
    tot = j.agg(F.sum("c_old").alias("n_old"), F.sum("c_new").alias("n_new"))
    # empty-side guard: a 0-row side has only c=0 bins, so its share is 0
    # (and ANSI DIV would otherwise throw on the zero total)
    share_old = "CASE WHEN n_old = 0 THEN 0 ELSE c_old * 1000000 DIV n_old END"
    share_new = "CASE WHEN n_new = 0 THEN 0 ELSE c_new * 1000000 DIV n_new END"
    diffs = j.crossJoin(F.broadcast(tot)).select(
        "n_old", "n_new",
        F.abs(F.expr(f"{share_old} - {share_new}")).alias("d"),
        (F.col("c_old") != F.col("c_new")).cast("bigint").alias("chg"),
    )
    return diffs.groupBy("n_old", "n_new").agg(
        F.sum("d").alias("l1_ppm"),
        F.max("d").alias("linf_ppm"),
        F.sum("chg").alias("n_bins_changed"),
    )


def histogram_drift_sql(old_pred: str, new_pred: str, table: str,
                        value_sql: str, lo: int, hi: int,
                        n_bins: int = 256) -> str:
    """DuckDB oracle for :func:`histogram_drift`."""
    w = max(1, -((lo - hi) // n_bins))
    b = f"least({n_bins - 1}, greatest(0, ({value_sql} - {lo}) // {w}))"
    return f"""
    WITH ho AS (
      SELECT {b} AS bin, count(*)::BIGINT AS c_old FROM {table}
      WHERE {old_pred} GROUP BY 1
    ),
    hn AS (
      SELECT {b} AS bin, count(*)::BIGINT AS c_new FROM {table}
      WHERE {new_pred} GROUP BY 1
    ),
    j AS (
      SELECT coalesce(c_old, 0) AS c_old, coalesce(c_new, 0) AS c_new
      FROM ho FULL OUTER JOIN hn USING (bin)
    ),
    tot AS (SELECT sum(c_old)::BIGINT AS n_old, sum(c_new)::BIGINT AS n_new FROM j)
    SELECT n_old, n_new,
           sum(abs(CASE WHEN n_old = 0 THEN 0 ELSE c_old * 1000000 // n_old END
                   - CASE WHEN n_new = 0 THEN 0 ELSE c_new * 1000000 // n_new END))::BIGINT AS l1_ppm,
           max(abs(CASE WHEN n_old = 0 THEN 0 ELSE c_old * 1000000 // n_old END
                   - CASE WHEN n_new = 0 THEN 0 ELSE c_new * 1000000 // n_new END))::BIGINT AS linf_ppm,
           sum(CASE WHEN c_old <> c_new THEN 1 ELSE 0 END)::BIGINT AS n_bins_changed
    FROM j, tot
    GROUP BY n_old, n_new
    """


# -- KMV (k-minimum-values / theta) distinct sketch -------------------------
#
# Beyer et al. 2007 ("On synopses for distinct-value estimation under
# multiset operations"): keep the k smallest values of a uniform hash
# over the set; D̂ = (k−1)·SPACE / kth_min (exact count when fewer than
# k distinct hashes exist).  Unlike HLL (ext_hll_merge), KMV supports
# INTERSECTION: the k-min of K_A ∪ K_B is exactly the k-min of A ∪ B
# (the union's k smallest hashes all live in one of the two sketches),
# and the fraction of that union sketch present in BOTH sketches
# estimates Jaccard — so |A∩B| ≈ ρ̂·D̂_union, all from two k-row
# synopses.  Hashes are the first 15 md5 hex digits (60-bit int —
# portable to DuckDB's BIGINT), estimates are integer DECIMAL(38,0)/
# HUGEINT arithmetic: every estimate is hash-exact cross-engine.

KMV_SPACE = 1 << 60


def kmv_hash(item: Column) -> Column:
    """Uniform 60-bit integer hash (md5 first 15 hex digits)."""
    return F.conv(F.substring(F.md5(item), 1, 15), 16, 10).cast("bigint")


def kmv_hash_sql(item: str) -> str:
    return f"('0x' || substring(md5({item}), 1, 15))::BIGINT"


def kmv_sketch(df: DataFrame, item: Column, k: int = 64,
               key: list | None = None) -> DataFrame:
    """KMV synopsis rows: the ``k`` smallest distinct hashes of ``item``
    (per ``key`` group, or one global sketch).  Scale shape: one
    distinct shuffle on (key, h); the k-min is TakeOrdered for the
    global form and a WindowGroupLimit rank filter for the keyed form —
    never a full sort, never unbounded state.  Returns (key…, h)."""
    if k < 2:
        raise ValueError(f"kmv_sketch: k must be >= 2, got {k}")
    keys = list(key or [])
    d = df.select(*[F.col(c) for c in keys], kmv_hash(item).alias("h")).distinct()
    if not keys:
        return d.orderBy("h").limit(k)
    w = Window.partitionBy(*keys).orderBy("h")
    return (d.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k).drop("__rn"))


def _kmv_est_expr(n: str, kth: str, k: int) -> Column:
    return F.when(
        F.col(n) < k, F.col(n)
    ).otherwise(F.expr(
        f"CAST(CAST({k - 1} AS DECIMAL(38,0)) * {KMV_SPACE} DIV {kth} AS BIGINT)"
    )).cast("bigint")


def kmv_est_sql(n: str, kth: str, k: int) -> str:
    return (f"(CASE WHEN {n} < {k} THEN {n} "
            f"ELSE (({k - 1}::HUGEINT * {KMV_SPACE}) // {kth})::BIGINT END)")


def kmv_estimate(sketch: DataFrame, k: int,
                 key: list | None = None) -> DataFrame:
    """Distinct-count estimate from a :func:`kmv_sketch`: exact when the
    sketch is unsaturated (|S| < k), else (k−1)·SPACE DIV kth_min.
    Returns (key…, est_distinct)."""
    keys = list(key or [])
    agg = [F.count(F.lit(1)).alias("__n"), F.max("h").alias("__kth")]
    g = sketch.groupBy(*keys).agg(*agg) if keys else sketch.agg(*agg)
    return g.select(*keys, _kmv_est_expr("__n", "__kth", k).alias("est_distinct"))


def kmv_merge(a: DataFrame, b: DataFrame, k: int) -> DataFrame:
    """Union synopsis: the k smallest of K_A ∪ K_B — exactly the KMV
    sketch of A ∪ B (associative/commutative; merge any number of
    per-shard sketches this way)."""
    return (a.select("h").union(b.select("h")).distinct()
            .orderBy("h").limit(k))


def kmv_overlap(a: DataFrame, b: DataFrame, k: int) -> DataFrame:
    """Full set-algebra readout from two KMV sketches: one row with
    est_a, est_b, est_union, est_intersect, jaccard_ppm.  ρ̂ = |{h in
    the union synopsis present in BOTH sketches}| / |union synopsis|,
    |A∩B| ≈ ρ̂·D̂_union (Beyer et al. §4); every term is integer
    arithmetic over the ≤k-row synopses — the corpus is long gone."""
    a = _persisted(a.select("h"))
    b = _persisted(b.select("h"))
    u = _persisted(kmv_merge(a, b, k))
    both = u.join(a, on="h").join(b, on="h")
    ests = (
        kmv_estimate(a, k).withColumnRenamed("est_distinct", "est_a")
        .crossJoin(kmv_estimate(b, k).withColumnRenamed("est_distinct", "est_b"))
        .crossJoin(kmv_estimate(u, k).withColumnRenamed("est_distinct", "est_union"))
        .crossJoin(u.agg(F.count(F.lit(1)).alias("__ku")))
        .crossJoin(both.agg(F.count(F.lit(1)).alias("__m")))
    )
    return ests.select(
        "est_a", "est_b", "est_union",
        F.expr("CAST(__m * est_union DIV __ku AS BIGINT)").alias("est_intersect"),
        F.expr("CAST(__m * 1000000 DIV __ku AS BIGINT)").alias("jaccard_ppm"),
    )


def mad_outliers(df: DataFrame, group_cols: list, value: Column,
                 threshold_num: int = 3, threshold_den: int = 1) -> DataFrame:
    """Robust per-group outlier flagging via median absolute deviation
    (the data-cleaning staple mean±σ rules get wrong on heavy tails):
    a row is an outlier when ``|x − median| · den > num · mad``, with
    both medians EXACT lower medians from rank windows — all-integer
    when ``value`` is integer, so the flags are hash-exact cross-engine
    (thresholds are a rational num/den instead of a float multiplier).

    Plan: two window passes partitioned by the group (rank for the
    median, rank for the deviation median) — sorts bounded by group
    size, no global funnel.  Groups too large to sort (billions per
    key) should use :func:`histogram_quantiles` medians instead; this
    exact form is for the per-entity audit regime (≤ millions/group).

    Returns the input rows + (grp_median, grp_mad, is_outlier)."""
    if threshold_num < 1 or threshold_den < 1:
        raise ValueError("mad_outliers: threshold must be a positive rational")
    gs = [F.col(g) for g in group_cols]
    d = df.withColumn("__v", value)
    w = Window.partitionBy(*gs)
    rn = F.row_number().over(w.orderBy("__v"))
    n = F.count(F.lit(1)).over(w)
    k = F.floor((n + 1) / 2).cast("long")      # lower-median rank
    d = d.withColumn("__med", F.max(
        F.when(rn == k, F.col("__v")).otherwise(None)).over(w))
    d = d.withColumn("__dev", F.abs(F.col("__v") - F.col("__med")))
    rn2 = F.row_number().over(w.orderBy("__dev"))
    d = d.withColumn("__mad", F.max(
        F.when(rn2 == k, F.col("__dev")).otherwise(None)).over(w))
    return (
        d.withColumn("grp_median", F.col("__med"))
        .withColumn("grp_mad", F.col("__mad"))
        .withColumn(
            "is_outlier",
            F.col("__dev") * threshold_den > F.lit(threshold_num) * F.col("__mad"))
        .drop("__v", "__med", "__dev", "__mad")
    )


def comoments(df: DataFrame, x: Column, y: Column,
              group_cols: list | None = None) -> DataFrame:
    """Mergeable second-order sufficient statistics for a pair of
    integer-valued expressions: (n, Σx, Σy, Σxy, Σx², Σy²) per group —
    everything covariance, correlation, and OLS slope/intercept need,
    in ONE map-side-combining pass, with the same merge-by-addition
    posture as the other sketches (shard rows ADD componentwise; the
    incremental-rollup machinery maintains them live).

    All sums run in DECIMAL(38,0) so squared-cents products never
    overflow BIGINT; downstream floats (corr needs a sqrt) are derived
    AT READOUT from exact integers: n·Σxy − Σx·Σy is the exact
    covariance numerator, n·Σx² − (Σx)² the variance numerators.
    Emitted as decimal-strings (the catalog's no-float discipline).
    """
    gs = [F.col(g) for g in (group_cols or [])]
    xi = x.cast("decimal(38,0)")
    yi = y.cast("decimal(38,0)")
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(xi).cast("decimal(38,0)").cast("string").alias("sum_x"),
        F.sum(yi).cast("decimal(38,0)").cast("string").alias("sum_y"),
        F.sum(xi * yi).cast("decimal(38,0)").cast("string").alias("sum_xy"),
        F.sum(xi * xi).cast("decimal(38,0)").cast("string").alias("sum_x2"),
        F.sum(yi * yi).cast("decimal(38,0)").cast("string").alias("sum_y2"),
    ]
    return df.groupBy(*gs).agg(*aggs) if gs else df.agg(*aggs)


def ols_readout(stats: DataFrame, scale: int = 1_000_000) -> DataFrame:
    """Least-squares readout from :func:`comoments` statistics — the
    regression slope/intercept and correlation sign derived EXACTLY
    from the integer sums (floats never enter):

    - ``slope_ppm``  = scale·(n·Σxy − Σx·Σy) DIV (n·Σx² − (Σx)²)
    - ``intercept_scaled`` = scale·Σy DIV n − slope_ppm·Σx DIV n
      (intercept in y-units × scale)
    - ``cov_num`` / ``var_x_num`` — the exact numerators, for callers
      who want their own precision.

    Degenerate groups (zero x-variance) read NULL slope/intercept.
    Arithmetic stays in DECIMAL(38,0); inputs are the decimal-strings
    comoments emits."""
    d = "decimal(38,0)"
    n = F.col("n").cast(d)
    sx = F.col("sum_x").cast(d)
    sy = F.col("sum_y").cast(d)
    sxy = F.col("sum_xy").cast(d)
    sx2 = F.col("sum_x2").cast(d)
    cov_num = (n * sxy - sx * sy)
    var_num = (n * sx2 - sx * sx)
    slope = F.when(var_num != 0, F.expr(
        f"CAST(CAST({scale} AS {d}) * (CAST(n AS {d}) * CAST(sum_xy AS {d})"
        f" - CAST(sum_x AS {d}) * CAST(sum_y AS {d}))"
        f" DIV (CAST(n AS {d}) * CAST(sum_x2 AS {d})"
        f" - CAST(sum_x AS {d}) * CAST(sum_x AS {d})) AS BIGINT)"))
    out = stats.withColumn("slope_ppm", slope)
    return out.select(
        *[c for c in stats.columns],
        "slope_ppm",
        F.when(F.col("slope_ppm").isNotNull(), F.expr(
            f"CAST(CAST({scale} AS {d}) * CAST(sum_y AS {d}) DIV CAST(n AS {d})"
            f" - CAST(slope_ppm AS {d}) * CAST(sum_x AS {d}) DIV CAST(n AS {d})"
            f" AS BIGINT)")).alias("intercept_scaled"),
        cov_num.cast("string").alias("cov_num"),
        var_num.cast("string").alias("var_x_num"),
    )
