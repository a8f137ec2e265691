"""Declarative data-quality validation: rule checks + referential
integrity as relations.

Extension surface (the deequ/Great-Expectations role, public shape:
Schelter et al. 2018, "Automating Large-Scale Data Quality Verification",
VLDB): a training-data ingest runs completeness/range/set rules and FK
audits over every drop BEFORE it reaches dedup or tokenization, and at
100 TB the only affordable form is the one this module uses —

- :func:`check_rules`: ALL expression rules evaluate in ONE aggregate
  pass over the data (each rule is a ``sum(not coalesce(pred, false))``
  — map-side partial, a single 1-row result; no per-rule scans).
  The unpivot to one row per rule happens on that 1-row aggregate.
- :func:`fk_violations`: referential integrity as a LEFT ANTI join
  against the distinct parent keys (Catalyst broadcasts the key set
  while it fits; SQL-standard semantics — NULL child keys pass).

Rules are plain boolean Columns, so anything Catalyst can evaluate is a
rule; a row VIOLATES when the predicate is not TRUE (NULL counts as a
violation — deequ's completeness convention — so ``isNotNull`` guards
belong inside predicates that should tolerate NULLs).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _violation(pred: Column) -> Column:
    return (~F.coalesce(pred, F.lit(False))).cast("bigint")


def check_rules(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """Evaluate every rule in one aggregate pass.

    Returns (rule, n_rows, n_violations, passed) — one row per rule,
    deterministic order-free integers, exact in any engine."""
    if not rules:
        raise ValueError("check_rules: no rules given")
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(_violation(pred)).alias(f"__v{i}")
        for i, pred in enumerate(rules.values())
    ]
    one = df.agg(*aggs)
    per_rule = F.explode(F.array(*[
        F.struct(
            F.lit(name).alias("rule"),
            F.coalesce(F.col(f"__v{i}"), F.lit(0)).alias("n_violations"),
        )
        for i, name in enumerate(rules.keys())
    ])).alias("r")
    return one.select(per_rule, F.col("__n").alias("n_rows")).select(
        F.col("r.rule").alias("rule"),
        F.col("n_rows"),
        F.col("r.n_violations").alias("n_violations"),
        (F.col("r.n_violations") == 0).alias("passed"),
    )


def violating_rows(df: DataFrame, rules: Mapping[str, Column],
                   keep_cols: list[str] | None = None) -> DataFrame:
    """The row-level complement of :func:`check_rules`: rows failing ≥1
    rule, tagged with the sorted comma-joined names of the failed rules
    (a string, not an array — hash-oracle-friendly).  Same single pass —
    each rule is one expression; no joins, no shuffles."""
    failed = F.array_compact(F.array(*[
        F.when(_violation(pred) == 1, F.lit(name))
        for name, pred in rules.items()
    ]))
    cols = keep_cols if keep_cols is not None else df.columns
    return (
        df.select(*cols, failed.alias("__f"))
        .where(F.size("__f") > 0)
        .withColumn("failed_rules", F.array_join(F.array_sort("__f"), ","))
        .drop("__f")
    )


def fk_violations(child: DataFrame, parent: DataFrame, child_key: str,
                  parent_key: str, rule: str | None = None) -> DataFrame:
    """Referential-integrity audit in :func:`check_rules`'s output shape
    (rule, n_rows, n_violations, passed): child rows whose non-NULL key
    has no parent.  LEFT ANTI against the distinct'd parent keys —
    broadcast while the key set fits, shuffle equi-join beyond; the
    child side is never collected or re-scanned per rule."""
    name = rule or f"fk_{child_key}"
    keys = parent.select(F.col(parent_key).alias(child_key)).distinct()
    orphans = (
        child.where(F.col(child_key).isNotNull())
        .join(keys, on=child_key, how="left_anti")
        .agg(F.count(F.lit(1)).alias("n_violations"))
    )
    total = child.agg(F.count(F.lit(1)).alias("n_rows"))
    return total.crossJoin(orphans).select(
        F.lit(name).alias("rule"),
        "n_rows",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


def check_rules_sql(table: str, rules_sql: Mapping[str, str]) -> str:
    """DuckDB oracle for :func:`check_rules` (predicates as SQL strings)."""
    one = ", ".join(
        f"sum(CASE WHEN NOT coalesce({p}, FALSE) THEN 1 ELSE 0 END)::BIGINT AS v{i}"
        for i, p in enumerate(rules_sql.values())
    )
    rows = " UNION ALL ".join(
        f"SELECT '{name}' AS rule, n_rows, coalesce(v{i}, 0) AS n_violations,"
        f" coalesce(v{i}, 0) = 0 AS passed FROM one"
        for i, name in enumerate(rules_sql.keys())
    )
    return f"WITH one AS (SELECT count(*)::BIGINT AS n_rows, {one} FROM {table}) {rows}"


def fk_violations_sql(child: str, parent: str, child_key: str,
                      parent_key: str, rule: str | None = None) -> str:
    """DuckDB oracle for :func:`fk_violations`."""
    name = rule or f"fk_{child_key}"
    return f"""
    SELECT '{name}' AS rule,
           (SELECT count(*) FROM {child})::BIGINT AS n_rows,
           (SELECT count(*) FROM {child} c
             WHERE c.{child_key} IS NOT NULL
               AND NOT EXISTS (SELECT 1 FROM {parent} p
                               WHERE p.{parent_key} = c.{child_key}))::BIGINT
             AS n_violations,
           (SELECT count(*) FROM {child} c
             WHERE c.{child_key} IS NOT NULL
               AND NOT EXISTS (SELECT 1 FROM {parent} p
                               WHERE p.{parent_key} = c.{child_key})) = 0
             AS passed
    """


def profile(df: DataFrame, columns: list[str] | None = None,
            exact_distinct: bool = True) -> DataFrame:
    """Column profile as a relation: (column, n_rows, n_null, n_distinct)
    per column — the data-profiling half of the deequ role (its metrics
    layer), feeding rule thresholds and drift checks.

    ONE aggregate over one scan.  ``exact_distinct=True`` uses
    ``count_distinct`` — Catalyst plans the multi-distinct via one Expand
    (rows duplicate ×columns before the shuffle): exact and fine for
    profiling runs, but the cost grows with profiled width.  At 100 TB
    width, pass ``exact_distinct=False`` for HLL ``approx_count_distinct``
    — Expand-free, constant-memory, ±2% (and rows-only vs an oracle,
    which is why the catalog query uses the exact form)."""
    cols = columns if columns is not None else df.columns
    if not cols:
        raise ValueError("profile: no columns")
    nd = F.count_distinct if exact_distinct else F.approx_count_distinct
    one = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.count(c).alias(f"__c{i}") for i, c in enumerate(cols)],
        *[nd(F.col(c)).alias(f"__d{i}") for i, c in enumerate(cols)],
    )
    rows = F.explode(F.array(*[
        F.struct(
            F.lit(c).alias("column"),
            (F.col("__n") - F.col(f"__c{i}")).alias("n_null"),
            F.col(f"__d{i}").cast("bigint").alias("n_distinct"),
        )
        for i, c in enumerate(cols)
    ])).alias("r")
    return one.select(rows, F.col("__n").alias("n_rows")).select(
        F.col("r.column").alias("column"), "n_rows", "r.n_null", "r.n_distinct")


def profile_sql(table: str, columns: list[str]) -> str:
    """DuckDB oracle for the exact form of :func:`profile`."""
    rows = " UNION ALL ".join(
        f"SELECT '{c}' AS column, count(*)::BIGINT AS n_rows,"
        f" (count(*) - count({c}))::BIGINT AS n_null,"
        f" count(DISTINCT {c})::BIGINT AS n_distinct FROM {table}"
        for c in columns
    )
    return rows


def k_anonymity_report(df: DataFrame, quasi_cols: list[str], k: int,
                       sensitive: Column | str | None = None,
                       l: int | None = None) -> DataFrame:
    """k-anonymity (+ optional l-diversity) audit (Sweeney 2002;
    Machanavajjhala et al. 2007): a release is k-anonymous over the
    quasi-identifier columns when every equivalence class (group of rows
    identical on ``quasi_cols``) holds ≥ k rows, and l-diverse when each
    class carries ≥ l distinct ``sensitive`` values — the checks a
    training-data pipeline runs before shipping user-derived tables.

    ONE groupBy over the quasi columns (map-side partial) then one 1-row
    aggregate over the class table — the class table is
    O(distinct quasi tuples), never row-scale twice.  Returns a single
    row: n_rows, n_classes, min_class_size, n_small_classes (< k),
    rows_at_risk (rows in violating classes), and when ``sensitive`` is
    given: min_diversity, n_low_diversity_classes (< l, with l
    defaulting to 2).  Remediate with :func:`k_anonymity_violations` →
    suppress or generalize those classes."""
    if k < 2:
        raise ValueError(f"k_anonymity_report: k must be >= 2, got {k}")
    want_l = sensitive is not None
    l = 2 if (want_l and l is None) else l
    aggs = [F.count(F.lit(1)).alias("__c")]
    if want_l:
        s = F.col(sensitive) if isinstance(sensitive, str) else sensitive
        aggs.append(F.count_distinct(s).alias("__l"))
    classes = df.groupBy(*quasi_cols).agg(*aggs)
    out = [
        F.coalesce(F.sum("__c"), F.lit(0)).cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("__c").cast("bigint").alias("min_class_size"),
        F.coalesce(F.sum(F.when(F.col("__c") < k, 1).otherwise(0)), F.lit(0))
         .cast("bigint").alias("n_small_classes"),
        F.coalesce(F.sum(F.when(F.col("__c") < k, F.col("__c")).otherwise(0)),
                   F.lit(0)).cast("bigint").alias("rows_at_risk"),
    ]
    if want_l:
        out += [
            F.min("__l").cast("bigint").alias("min_diversity"),
            F.sum(F.when(F.col("__l") < l, 1).otherwise(0))
             .cast("bigint").alias("n_low_diversity_classes"),
        ]
    return classes.agg(*out)


def k_anonymity_violations(df: DataFrame, quasi_cols: list[str],
                           k: int) -> DataFrame:
    """The violating equivalence classes themselves — (quasi_cols…,
    class_size) for every class under ``k``.  Feed to a suppression
    (anti-join the rows) or generalization (coarsen a quasi column and
    re-audit) step."""
    if k < 2:
        raise ValueError(f"k_anonymity_violations: k must be >= 2, got {k}")
    return (df.groupBy(*quasi_cols)
            .agg(F.count(F.lit(1)).cast("bigint").alias("class_size"))
            .filter(F.col("class_size") < k))


def pii_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Column-level PII exposure audit — the governance pass a pipeline
    runs before sharing a table: for every string column, how many rows
    carry each PII pattern class (email / IPv4 / long digit run, the
    same RE2-portable patterns :func:`pigpen_spark.functions.text.
    redact` scrubs — audit and scrub CANNOT disagree about what counts
    as PII because they share the pattern table).

    ONE aggregate pass over the data (every (column × pattern) counter
    is a ``sum(rlike)`` with map-side partials — no per-column scans),
    and every expensive pattern is GATED behind a short-circuiting
    necessary-condition precheck: an email needs an ``@``, an IPv4
    needs a ``.``, a digit run needs a digit — all O(n) memchr-class
    scans, so a clean column (the common governance case: most columns
    have nothing to find) costs three cheap scans instead of three
    NFA-regex scans.  Prechecks are strictly necessary conditions, so
    counts are byte-identical to ungated matching on any input
    (measured 2.0× on the 10× scale corpus — 4.7 → 2.3 s — even though
    that fixture deliberately plants PII in most rows, keeping many
    gates open; a clean column skips its NFA scans entirely.  SCALE.md
    round 6).

    The unpivot to (column, pattern, n_rows, n_hits, hit_ppm) rows
    happens on the 1-row aggregate.  Flag columns with hit_ppm above a
    policy threshold, then route them through ``redact`` or a column
    drop."""
    from pigpen_spark.functions.text import REDACT_PATTERNS

    if columns is None:
        columns = [f.name for f in df.schema.fields
                   if f.dataType.simpleString() == "string"]
    if not columns:
        raise ValueError("pii_profile: no string columns to audit")
    pat_names = {"<EMAIL>": "email", "<IP>": "ipv4", "<NUM>": "digit_run"}
    # necessary condition per class — a row failing it CANNOT match the
    # class pattern, so the regex never runs on it
    prechecks = {
        "<EMAIL>": lambda col: col.contains("@"),
        "<IP>": lambda col: col.contains(".") & col.rlike("[0-9]"),
        "<NUM>": lambda col: col.rlike("[0-9]"),
    }
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        for pat, repl in REDACT_PATTERNS:
            hit = prechecks[repl](F.col(c)) & F.col(c).rlike(pat)
            aggs.append(
                F.sum(F.when(hit, 1).otherwise(0))
                .alias(f"__{c}__{pat_names[repl]}"))
    one = df.agg(*aggs)
    rows = F.array(*[
        F.struct(
            F.lit(c).alias("column"),
            F.lit(pat_names[repl]).alias("pattern"),
            F.col("__n").cast("bigint").alias("n_rows"),
            F.col(f"__{c}__{pat_names[repl]}").cast("bigint").alias("n_hits"),
            F.expr(f"CAST(__{c}__{pat_names[repl]} * 1000000 DIV __n AS BIGINT)")
             .alias("hit_ppm"),
        )
        for c in columns for pat, repl in REDACT_PATTERNS
    ])
    return one.select(F.inline(rows))


def dataset_checksum(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Order-insensitive, MERGEABLE dataset fingerprint — the
    reproducibility primitive a lineage system stores next to every
    materialized table: each row canonicalizes to
    ``col=value`` pairs over the (sorted) column list with a NULL
    marker, hashes to a 60-bit md5 integer, and the fingerprint is the
    SUM of row hashes in DECIMAL(38,0) — commutative and associative,
    so shard checksums ADD to the corpus checksum, an appended delta's
    checksum adds to the old one, and two tables are row-multiset-equal
    iff sums and counts both match (up to 60-bit collisions — a
    fingerprint, not a proof).  One aggregate pass, map-side partials.

    Returns one row: (n_rows, checksum) with checksum a decimal-string.
    """
    cols = sorted(columns if columns is not None else df.columns)
    if not cols:
        raise ValueError("dataset_checksum: no columns")
    canon = F.concat_ws(
        "\x1f", *[F.concat(F.lit(c + "="),
                           F.coalesce(F.col(c).cast("string"), F.lit("\x00")))
                  for c in cols])
    h = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("decimal(38,0)")
    return df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.coalesce(F.sum(h), F.lit(0).cast("decimal(38,0)"))
         .cast("decimal(38,0)").cast("string").alias("checksum"),
    )


def dataset_checksum_buckets(df: DataFrame, n_buckets: int = 256,
                             columns: list[str] | None = None) -> DataFrame:
    """Drill-down companion to :func:`dataset_checksum`: per-bucket
    (md5-prefix hash buckets) row counts and hash sums.  When two
    tables' total checksums differ, comparing their bucket vectors
    localizes the difference to ~1/n_buckets of the rows per level —
    recurse with a larger n_buckets over one bucket's rows to narrow
    further (binary-search over content, no row-by-row diff shuffle
    until the final bucket).  Same canonicalization as the total
    checksum, so bucket sums ADD up to it."""
    cols = sorted(columns if columns is not None else df.columns)
    if not cols:
        raise ValueError("dataset_checksum_buckets: no columns")
    canon = F.concat_ws(
        "\x1f", *[F.concat(F.lit(c + "="),
                           F.coalesce(F.col(c).cast("string"), F.lit("\x00")))
                  for c in cols])
    h = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("decimal(38,0)")
    return (
        df.withColumn("__h", h)
        .groupBy((F.col("__h") % n_buckets).cast("int").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"),
             F.sum("__h").cast("decimal(38,0)").cast("string")
              .alias("checksum"))
    )


def partition_checksums(df: DataFrame, part_cols: list[str],
                        columns: list[str] | None = None) -> DataFrame:
    """Partition-level MANIFEST: per business partition (date, source,
    lang, …) the row count and the order-insensitive hash sum — the
    same canonicalization as :func:`dataset_checksum`, grouped, so
    partition checksums ADD up to the table checksum.

    This is the cheap pre-filter in front of :func:`snapshot diffing
    <pigpen_spark.functions.analytics.snapshot_diff>` at 100 TB:
    compare two snapshots' manifests (|partitions| rows each), and only
    the partitions whose (n_rows, checksum) moved need the row-level
    diff or a re-validation pass — the incremental-audit contract
    lakehouse table formats get from file-level stats, expressed over
    logical partitions.

    ``columns`` defaults to every NON-partition column (the content
    being fingerprinted); partition columns are identity here, hashing
    them too would be noise.  Returns (part_cols…, n_rows, checksum).
    """
    if not part_cols:
        raise ValueError("partition_checksums: need partition columns")
    cols = sorted(columns if columns is not None
                  else [c for c in df.columns if c not in set(part_cols)])
    if not cols:
        raise ValueError("partition_checksums: no content columns")
    canon = F.concat_ws(
        "\x1f", *[F.concat(F.lit(c + "="),
                           F.coalesce(F.col(c).cast("string"), F.lit("\x00")))
                  for c in cols])
    h = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("decimal(38,0)")
    return (
        df.groupBy(*part_cols)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"),
             F.sum(h).cast("decimal(38,0)").cast("string").alias("checksum"))
    )


def manifest_diff(old: DataFrame, new: DataFrame,
                  part_cols: list[str]) -> DataFrame:
    """Compare two partition manifests (as produced by
    :func:`partition_checksums`): one full-outer join over
    |partitions|-sized frames — never row data — classifying each
    partition as ``added`` / ``removed`` / ``changed`` (count or
    checksum moved); unchanged partitions are dropped (the whole point:
    what's left is the reprocessing worklist).  Returns (part_cols…,
    status, n_rows_old, n_rows_new)."""
    o = old.select(*[F.col(c).alias(f"__o_{c}") for c in part_cols],
                   F.col("n_rows").alias("__no"),
                   F.col("checksum").alias("__co"))
    n = new.select(*[F.col(c).alias(f"__n_{c}") for c in part_cols],
                   F.col("n_rows").alias("__nn"),
                   F.col("checksum").alias("__cn"))
    # null-safe key equality: a NULL partition value is a real partition
    # (a plain join would report it as removed+added every run)
    cond = None
    for c in part_cols:
        eq = F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
        cond = eq if cond is None else cond & eq
    j = o.join(n, on=cond, how="full_outer")
    status = (
        F.when(F.col("__no").isNull(), F.lit("added"))
        .when(F.col("__nn").isNull(), F.lit("removed"))
        .when((F.col("__no") != F.col("__nn"))
              | (F.col("__co") != F.col("__cn")), F.lit("changed"))
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(*[F.coalesce(f"__o_{c}", f"__n_{c}").alias(c)
                  for c in part_cols],
                "status",
                F.coalesce("__no", F.lit(0)).cast("bigint").alias("n_rows_old"),
                F.coalesce("__nn", F.lit(0)).cast("bigint").alias("n_rows_new"))
    )
