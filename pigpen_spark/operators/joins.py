"""Join extensions beyond the reference: as-of joins and skew salting.

The reference has no theta/range/as-of joins and delegates skew handling to
Pig's ``skewed`` strategy passthrough (SURVEY §2.3 note; script.clj:315-319).
These are first-class here because both are daily needs of large-scale
event/training pipelines.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


from pigpen_spark.relation import _to_col as _c  # noqa: E402 — shared coercion
from pigpen_spark.typeutil import epoch_seconds


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: Sequence[str] = (),
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """As-of (backward) join: for every left row, attach the payload of the
    LATEST right row with ``right_ts <= left_ts`` for the same key (the
    time-series point-in-time lookup; DuckDB/kdb ``ASOF JOIN``).

    Implementation is the union+window formulation — one shuffle on the
    key, no range cross-product, state linear in rows:

    1. union both sides tagged left/right, right payload as a struct;
    2. running ``last(payload, ignorenulls)`` over (key, ts, right-first)
       — each left row sees the most recent right payload at-or-before it;
    3. keep left rows; optionally null the match beyond ``tolerance``.

    Ties (equal ts) match, like ASOF's ``>=``.  For determinism when the
    right side has several rows at the same (key, ts), pre-aggregate it
    (e.g. keep max-id per key+ts) before calling.
    """
    pay_struct = F.struct(
        epoch_seconds(right, right_ts).alias("__rts"),
        *[F.col(p) for p in payload],
    )
    lrow = F.struct(*[F.col(c) for c in left.columns])
    l_tagged = left.select(
        _c(on).alias("__k"),
        epoch_seconds(left, left_ts).alias("__ts"),
        F.lit(0).alias("__r"),
        lrow.alias("__lrow"),
        F.lit(None).cast(
            right.select(pay_struct.alias("p")).schema["p"].dataType.simpleString()
        ).alias("__pay"),
    )
    r_tagged = right.select(
        _c(on).alias("__k"),
        epoch_seconds(right, right_ts).alias("__ts"),
        F.lit(1).alias("__r"),
        F.lit(None).cast(
            left.select(lrow.alias("l")).schema["l"].dataType.simpleString()
        ).alias("__lrow"),
        pay_struct.alias("__pay"),
    )
    u = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__r").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__pay", ignorenulls=True).over(w)).filter(F.col("__r") == 0)
    if tolerance_seconds is not None:
        matched = matched.withColumn(
            "__m",
            F.when(F.col("__ts") - F.col("__m.__rts") <= tolerance_seconds, F.col("__m")),
        )
    out_cols = [F.col(f"__lrow.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"__m.{p}").alias(p) for p in payload]
    return matched.select(*out_cols)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    right_on: str | None = None,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: left rows get a per-row salt bucket, the right
    side is replicated ``salt``× — a hot key's rows spread over ``salt``
    reducers instead of one straggler.

    Use when one side has pathological key skew AND the small side fits
    ``salt``-fold replication (right side should be the smaller one).
    AQE's skew-join split handles moderate skew automatically; salting is
    the explicit big-hammer for extreme single-key skew.  Result is
    row-identical to the unsalted join (oracle-verified: q_salted_join).
    """
    right_on = right_on or on
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join: how={how!r} unsupported — the right side is replicated "
            f"{salt}x, so right/full outer joins would emit {salt} null-padded "
            "copies of unmatched right rows; salt the other side instead"
        )
    lsalt = F.pmod(F.monotonically_increasing_id(), F.lit(salt)).cast("int")
    l = left.withColumn("__lsalt", lsalt)
    r = right.withColumn("__rsalt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    cond = (l["__lsalt"] == r["__rsalt"]) & (l[on] == r[right_on])
    joined = l.join(r, on=cond, how=how).drop("__lsalt", "__rsalt")
    if on == right_on and how in ("inner", "left", "left_outer"):
        # same-named keys: keep only the left copy so downstream by-name
        # references aren't ambiguous (parity with Relation.join)
        joined = joined.drop(r[right_on])
    return joined


def range_join(
    left: DataFrame,
    right: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    on: str | None = None,
    right_on: str | None = None,
    bin_width: float | None = None,
) -> DataFrame:
    """Point-in-interval range join: left rows matched to every right row
    whose ``[lo_col, hi_col]`` interval contains ``value_col`` (inclusive
    both ends), optionally also keyed on an equi-column.

    Spark executes a bare range predicate as a broadcast-nested-loop join —
    O(n·m) compares and a broadcast requirement, both fatal at scale.  This
    operator rewrites it to an EQUI-join on value bins: each right interval
    explodes to the bins it covers, each left value hashes to exactly one
    bin, the shuffle is keyed by (key, bin), and the exact BETWEEN filter
    runs only on bin-colocated pairs.  floor() is monotonic, so
    lo <= v <= hi guarantees bin(lo) <= bin(v) <= bin(hi) — no boundary
    loss from float division.

    ``bin_width``: bins per interval ≈ width/bin_width + 1, so pick about
    the typical interval width (replication factor ~2).  None = one tiny
    aggregate pass computing avg interval width.  Degenerate inputs (all
    zero-width intervals) fall back to width 1.0.

    Rows with a NULL value or NULL interval endpoint never match (inner
    join).  Result is row-identical to the naive theta join
    (oracle-verified: q_range_join).
    """
    if bin_width is None:
        row = right.select(
            F.avg(_c(hi_col).cast("double") - _c(lo_col).cast("double")).alias("w")
        ).first()
        bin_width = float(row["w"] or 0.0) or 1.0
    if bin_width <= 0:
        raise ValueError(f"range_join: bin_width must be positive, got {bin_width}")
    w = F.lit(float(bin_width))
    lbin = F.floor(_c(value_col).cast("double") / w)
    r_bins = F.explode(
        F.sequence(
            F.floor(_c(lo_col).cast("double") / w).cast("long"),
            F.floor(_c(hi_col).cast("double") / w).cast("long"),
        )
    )
    l_tag = left.withColumn("__bin", lbin)
    # inverted intervals can never match, and Spark's sequence(a, b) would
    # happily generate them DESCENDING — drop them before the explode
    r_tag = right.filter(
        _c(lo_col).cast("double") <= _c(hi_col).cast("double")
    ).withColumn("__bin", r_bins)
    cond = (l_tag["__bin"] == r_tag["__bin"]) & (
        l_tag[value_col].cast("double") >= r_tag[lo_col].cast("double")
    ) & (l_tag[value_col].cast("double") <= r_tag[hi_col].cast("double"))
    if on is not None:
        cond = cond & (l_tag[on] == r_tag[right_on or on])
    joined = l_tag.join(r_tag, on=cond, how="inner").drop(l_tag["__bin"]).drop(r_tag["__bin"])
    if on is not None and (right_on or on) == on:
        joined = joined.drop(r_tag[on])
    return joined


def _delete_one(s: Column) -> Column:
    """All strings formed by deleting exactly one character of ``s``
    (empty input → empty list; sequence(1,0) would count DOWN in Spark)."""
    dels = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(
            F.substr(s, F.lit(1), i - F.lit(1)),
            F.substr(s, i + F.lit(1), F.length(s)),
        ),
    )
    return F.when(F.length(s) >= 1, dels).otherwise(F.array().cast("array<string>"))


def deletion_neighborhood(s: Column, max_dist: int) -> Column:
    """SymSpell deletion neighborhood: every string reachable from ``s``
    by deleting up to ``max_dist`` characters (including ``s`` itself),
    distinct.  Key property (Garbe's SymSpell): if lev(a, b) <= d then
    the d-deletion neighborhoods of a and b intersect — so an equi-join
    on neighborhood members is a NO-FALSE-NEGATIVE candidate generator
    for edit-distance-bounded matching."""
    acc = F.array(s)
    for _ in range(max_dist):
        acc = F.array_distinct(
            F.concat(acc, F.flatten(F.transform(acc, _delete_one)))
        )
    return acc


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_col: str,
    right_id: str | None = None,
    right_col: str | None = None,
    max_dist: int = 1,
    dist_col: str = "dist",
) -> DataFrame:
    """Approximate string join: (id_l, id_r, dist) for every cross pair
    with Levenshtein distance <= ``max_dist`` — WITHOUT the cross product.

    Candidate generation is SymSpell deletion-neighborhood blocking: each
    side explodes to its <= ``max_dist``-deletion variants (O(len^d) keys
    per row — this operator is for SHORT keys: names, titles, SKUs, URLs;
    near-dup long text belongs to the minhash family in functions/dedup),
    candidates equi-join on the shared variant, then the exact
    ``levenshtein`` verifies.  The blocking is lossless (see
    :func:`deletion_neighborhood`), so the result is row-identical to the
    naive theta join (oracle-verified: ext_fuzzy_join).

    At scale: the only shuffle is the variant equi-join plus one distinct
    on candidate pairs; hot variants (short strings collapse to few
    variants) are ordinary key skew — AQE skew-split applies.  Self-join:
    pass the same df twice and filter ``id_l < id_r`` downstream.
    """
    right_id = right_id or left_id
    right_col = right_col or left_col
    if max_dist < 0:
        raise ValueError(f"fuzzy_join: max_dist must be >= 0, got {max_dist}")
    lv = left.select(
        _c(left_id).alias("id_l"),
        _c(left_col).alias("__sl"),
        F.explode(deletion_neighborhood(_c(left_col), max_dist)).alias("__v"),
    )
    rv = right.select(
        _c(right_id).alias("id_r"),
        _c(right_col).alias("__sr"),
        F.explode(deletion_neighborhood(_c(right_col), max_dist)).alias("__v"),
    )
    cand = (
        lv.join(rv, on="__v")
        .select("id_l", "id_r", "__sl", "__sr")
        .distinct()  # a pair can share several variants — emit once
    )
    return (
        cand.withColumn(dist_col, F.levenshtein(F.col("__sl"), F.col("__sr")))
        .filter(F.col(dist_col) <= max_dist)
        .drop("__sl", "__sr")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    on: str | None = None,
    right_on: str | None = None,
    bin_width: float | None = None,
) -> DataFrame:
    """Interval-overlap join: pairs whose ``[lo, hi]`` ranges intersect
    (closed ends), optionally also keyed on an equi-column.

    Same binning rewrite as :func:`range_join`, on both sides: each
    interval explodes to its covered bins and candidates equi-join on
    (key, bin).  Overlapping intervals share every bin their INTERSECTION
    covers, so a pair would surface once per shared bin — instead of a
    dropDuplicates shuffle, a pair is emitted only in the FIRST shared bin
    (bin == max(first-bin_a, first-bin_b), the leftmost bin of the
    intersection), which each pair satisfies exactly once.

    ``bin_width`` None = avg of both sides' mean interval widths (two tiny
    aggregate passes).  Rows with NULL endpoints or inverted intervals
    never match."""
    if bin_width is None:
        ws = []
        for df_, lo_, hi_ in ((left, left_lo, left_hi), (right, right_lo, right_hi)):
            row = df_.select(F.avg(_c(hi_).cast("double") - _c(lo_).cast("double")).alias("w")).first()
            # clamp: inverted (lo > hi) rows are filtered out below but would
            # otherwise drag the mean width negative and defeat the 1.0
            # fallback with a ValueError instead
            ws.append(max(float(row["w"] or 0.0), 0.0))
        bin_width = (sum(ws) / 2) or 1.0
    if bin_width <= 0:
        raise ValueError(f"interval_overlap_join: bin_width must be positive, got {bin_width}")
    w = F.lit(float(bin_width))

    def tag(df_, lo_, hi_):
        first = F.floor(_c(lo_).cast("double") / w).cast("long")
        return (
            df_.filter(_c(lo_).cast("double") <= _c(hi_).cast("double"))
            .withColumn("__bin0", first)
            .withColumn(
                "__bin",
                F.explode(F.sequence(first, F.floor(_c(hi_).cast("double") / w).cast("long"))),
            )
        )

    l_tag = tag(left, left_lo, left_hi)
    r_tag = tag(right, right_lo, right_hi)
    overlap = (
        (l_tag[left_lo].cast("double") <= r_tag[right_hi].cast("double"))
        & (r_tag[right_lo].cast("double") <= l_tag[left_hi].cast("double"))
    )
    once = l_tag["__bin"] == F.greatest(l_tag["__bin0"], r_tag["__bin0"])
    cond = (l_tag["__bin"] == r_tag["__bin"]) & overlap & once
    if on is not None:
        cond = cond & (l_tag[on] == r_tag[right_on or on])
    joined = (
        l_tag.join(r_tag, on=cond, how="inner")
        .drop(l_tag["__bin"]).drop(r_tag["__bin"])
        .drop(l_tag["__bin0"]).drop(r_tag["__bin0"])
    )
    if on is not None and (right_on or on) == on:
        joined = joined.drop(r_tag[on])
    return joined


# ---------------------------------------------------------------------------
# Probabilistic record linkage (Fellegi & Sunter 1969)
# ---------------------------------------------------------------------------


def fs_weights(m_ppm: int, u_ppm: int, scale: int = 1000,
               signed: bool = False) -> tuple[int, int]:
    """Fellegi-Sunter field weights as INTEGER literals: agreement adds
    round(scale*log2(m/u)), disagreement round(scale*log2((1-m)/(1-u))),
    with m = P(agree | match) and u = P(agree | non-match) given in ppm.
    The logs run DRIVER-side in Python at plan-construction time, so the
    engine-side score is a sum of integer literals — hash-exact across
    engines by construction (the same trick as the integer-scaled
    classifier weights).  m must exceed u or the field carries no
    linkage signal (raises).

    ``signed=True`` lifts the m > u requirement: log2(m/u) is simply
    NEGATIVE for a field where agreement is evidence AGAINST a match —
    which trained (EM) weights legitimately produce (e.g. a corpus
    whose near-duplicates systematically cross languages makes
    same-language agreement anti-informative).  Hand-set weights keep
    the strict default: specifying m < u by hand is almost always a
    transposed pair, not a real anti-informative field."""
    import math

    if signed:
        if not (0 < u_ppm < 1_000_000 and 0 < m_ppm < 1_000_000) \
                or m_ppm == u_ppm:
            raise ValueError(
                f"fs_weights: need distinct m, u in (0, 1e6) ppm, "
                f"got m={m_ppm} u={u_ppm}")
    elif not (0 < u_ppm < m_ppm < 1_000_000):
        raise ValueError(
            f"fs_weights: need 0 < u < m < 1e6 ppm, got m={m_ppm} u={u_ppm}")
    w_a = round(scale * math.log2(m_ppm / u_ppm))
    w_d = round(scale * math.log2((1_000_000 - m_ppm) / (1_000_000 - u_ppm)))
    return w_a, w_d


def agreement_histogram(pairs: DataFrame,
                        agreements: dict) -> list[tuple[tuple[int, ...], int]]:
    """Collapse blocked candidate pairs to the AGREEMENT-PATTERN
    HISTOGRAM the EM weight estimator consumes: one groupBy over the
    boolean agreement vector (NULL — a missing value on either side —
    counts as disagreement, matching record_linkage's 0-contribution
    treatment closely enough for frequency estimation), yielding at most
    2^k rows for k fields.  This is the ONLY corpus-sized pass of
    training — the same one-aggregation shape as the tokenizer trainers'
    word histogram — so the artifact collected to the driver is a tiny
    integer table no matter how many candidate pairs the blocking
    produced."""
    k = len(agreements)
    if not (1 <= k <= 20):
        raise ValueError(f"agreement_histogram: need 1..20 fields, got {k}")
    cols = [F.coalesce(agree.cast("int"), F.lit(0)).alias(f"__g{i}")
            for i, (name, agree) in enumerate(agreements.items())]
    rows = (pairs.select(*cols)
            .groupBy(*[f"__g{i}" for i in range(k)])
            .agg(F.count(F.lit(1)).alias("__n"))
            .collect())
    return [(tuple(int(r[f"__g{i}"]) for i in range(k)), int(r["__n"]))
            for r in rows]


def fs_em(hist: list[tuple[tuple[int, ...], int]],
          iters: int = 200, tol: float = 1e-10,
          init_p: float = 0.1, init_m: float = 0.9, init_u: float = 0.1,
          ) -> tuple[list[int], list[int], float]:
    """Estimate per-field Fellegi-Sunter m/u probabilities by EM over
    the agreement-pattern histogram (Winkler 1988's unsupervised fit of
    the two-class conditional-independence mixture; Fellegi & Sunter
    1969 §3 is the model).  Pure Python on ≤2^k integer rows — exactly
    the tokenizer-trainer doctrine: the corpus pass is one aggregation,
    the iterative algorithm runs driver-side on a tiny artifact.

    E-step: responsibility of the match class for pattern γ is
    p·Π m_i^γi(1-m_i)^(1-γi) over the two-class mixture; M-step
    re-estimates p, m_i, u_i from responsibility-weighted counts.
    Classes are label-symmetric, so if EM converges onto the majority
    class as "matches" (p > 0.5) the labels are swapped — true links
    are always the minority of blocked pairs.  Returns (m_ppm, u_ppm,
    p) with probabilities clamped to [1, 999_999] ppm so fs_weights'
    domain check is the only remaining gate (a field with m ≤ u after
    training carries no signal and fs_weights raises, loudly)."""
    if not hist:
        raise ValueError("fs_em: empty agreement histogram")
    k = len(hist[0][0])
    n_total = float(sum(n for _, n in hist))
    p, m, u = init_p, [init_m] * k, [init_u] * k
    clamp = lambda x: min(max(x, 1e-6), 1.0 - 1e-6)  # noqa: E731
    for _ in range(iters):
        # E-step
        sum_w = 0.0
        m_num = [0.0] * k
        u_num = [0.0] * k
        sum_wn = 0.0
        for gamma, n in hist:
            pm, pu = p, 1.0 - p
            for i, g in enumerate(gamma):
                pm *= m[i] if g else (1.0 - m[i])
                pu *= u[i] if g else (1.0 - u[i])
            w = pm / (pm + pu) if (pm + pu) > 0 else 0.5
            sum_w += w * n
            sum_wn += (1.0 - w) * n
            for i, g in enumerate(gamma):
                if g:
                    m_num[i] += w * n
                    u_num[i] += (1.0 - w) * n
        # M-step
        new_p = clamp(sum_w / n_total)
        new_m = [clamp(m_num[i] / sum_w) if sum_w > 0 else m[i]
                 for i in range(k)]
        new_u = [clamp(u_num[i] / sum_wn) if sum_wn > 0 else u[i]
                 for i in range(k)]
        delta = max(abs(new_p - p),
                    max(abs(new_m[i] - m[i]) for i in range(k)),
                    max(abs(new_u[i] - u[i]) for i in range(k)))
        p, m, u = new_p, new_m, new_u
        if delta < tol:
            break
    if p > 0.5:  # label swap: matches must be the minority class
        p, m, u = 1.0 - p, u, m
    to_ppm = lambda x: min(max(int(round(x * 1_000_000)), 1), 999_999)  # noqa: E731
    return [to_ppm(x) for x in m], [to_ppm(x) for x in u], p


def fs_weights_em(pairs: DataFrame, agreements: dict, scale: int = 1000,
                  iters: int = 200, signed: bool = True) -> dict:
    """End-to-end TRAINED Fellegi-Sunter weights: distributed
    agreement-pattern histogram → driver-side EM → integer log-odds
    weights via :func:`fs_weights`.  ``agreements`` maps field name →
    boolean agreement Column (the same dict shape record_linkage takes,
    minus the weights it is about to learn).  Trained weights default
    to ``signed`` (an EM fit may legitimately find anti-informative
    fields; see fs_weights); pass signed=False to demand every field be
    positively informative and fail loudly otherwise.  Returns field
    name → (w_agree, w_disagree)."""
    hist = agreement_histogram(pairs, agreements)
    m_ppm, u_ppm, _p = fs_em(hist, iters=iters)
    return {name: fs_weights(m_ppm[i], u_ppm[i], scale, signed=signed)
            for i, name in enumerate(agreements)}


def fs_thresholds(weights: dict, upper_frac: float = 0.5,
                  lower_frac: float = 0.5) -> tuple[int, int]:
    """Deterministic decision thresholds from a weight table: ``upper``
    is ``upper_frac`` of the maximum attainable score (every field at
    its most match-favorable value), ``lower`` is ``lower_frac`` of the
    minimum.  Pure integer arithmetic on the driver, so trained rows
    get reproducible thresholds without hand-placing constants."""
    score_max = sum(max(w_a, w_d, 0) for w_a, w_d in weights.values())
    score_min = sum(min(w_a, w_d, 0) for w_a, w_d in weights.values())
    return int(score_max * upper_frac), int(score_min * lower_frac)


def record_linkage(pairs: DataFrame, fields: dict, upper: int,
                   lower: int) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage over CANDIDATE PAIRS
    (produced by any blocking join — fuzzy_join, minhash_candidates, an
    equi-join on a blocking key; linkage never generates pairs itself,
    so the all-pairs trap stays structurally impossible).

    ``fields`` maps field name → (agreement Column (boolean),
    (w_agree, w_disagree) from :func:`fs_weights`).  Each pair's score
    is the sum of its per-field integer weights (NULL agreement — a
    missing value on either side — contributes 0, the standard
    treatment); the decision thresholds the score: ≥ upper → 'match',
    ≤ lower → 'non_match', else 'review' (the clerical band).  One
    map-side expression over the pair table, no shuffle beyond what the
    blocking join already paid.

    Returns ``pairs`` + (score bigint, decision string)."""
    if upper < lower:
        raise ValueError(f"record_linkage: upper {upper} < lower {lower}")
    taken = {c for c in ("score", "decision") if c in pairs.columns}
    if taken:
        # blocking outputs often carry their own `score`; silently
        # renaming over it would only surface later as an
        # ambiguous-reference error — fail loudly at the boundary
        raise ValueError(
            f"record_linkage: pairs already has column(s) {sorted(taken)}; "
            "rename or drop them before linkage (outputs are 'score' and "
            "'decision')")
    score = F.lit(0).cast("long")
    for name, (agree, (w_a, w_d)) in fields.items():
        score = score + F.when(agree, F.lit(w_a)) \
            .when(~agree, F.lit(w_d)).otherwise(F.lit(0)).cast("long")
    decision = (
        F.when(F.col("__fs_score") >= upper, "match")
        .when(F.col("__fs_score") <= lower, "non_match")
        .otherwise("review"))
    return (pairs.withColumn("__fs_score", score)
            .withColumn("decision", decision)
            .withColumnRenamed("__fs_score", "score"))
