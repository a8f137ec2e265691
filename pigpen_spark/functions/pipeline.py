"""Training-corpus pipeline operators: deterministic splits, sequence
packing, reproducible shuffling, stratified sampling.

Extension surface (BASELINE.json north star) — the corpus-management layer
a 100 TB LLM data pipeline needs AROUND dedup/similarity/quality:

- **split_by_hash** — train/val/test assignment by salted content hash.
  Pure per-row expression: no shuffle, no state, stable under reruns and
  corpus growth (a doc's split never changes when other docs arrive) —
  exactly why production pipelines hash-split instead of random-split.
- **stratified_sample_by_hash** — per-stratum rate control with the same
  hash trick; a FILTER, not a sampler: deterministic, exactly
  reproducible, and pushdown-friendly.
- **pack_chunks** — concat-and-chunk sequence packing: cumulative token
  budget over a deterministic order assigns each doc a chunk id.  One
  window per shard; ALWAYS partition at scale (a global window is a
  single-reducer funnel — same caveat as windows.ranked).
- **shuffle_deterministic** — reproducible global "random" order: sort by
  salted hash.  Range-partitioned total sort, so it scales like any
  Spark sort; changing the salt reshuffles, keeping the salt reproduces
  byte-identical epochs.

Every operator is hash-based on md5, so each carries an exact DuckDB
oracle (the ``*_sql`` helpers build the same expressions in SQL).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pigpen_spark.relation import _to_col as _c

_HASH_SPACE = float(1 << 32)


def hash_unit(col, salt: str) -> Column:
    """Deterministic uniform-[0,1) value per row: first 8 hex digits of
    md5(value || '|' || salt) scaled by 2^-32.  Exactly reproducible in
    DuckDB (:func:`hash_unit_sql`)."""
    h = F.md5(F.concat(_c(col).cast("string"), F.lit("|" + salt)))
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") / F.lit(_HASH_SPACE)
    )


def hash_unit_sql(col: str, salt: str) -> str:
    """DuckDB equivalent of :func:`hash_unit`."""
    return (
        f"(('0x' || substring(md5({col}::VARCHAR || '|{salt}'), 1, 8))::BIGINT"
        f" / {_HASH_SPACE!r})"
    )


def split_by_hash(df: DataFrame, id_col: str, splits: Mapping[str, float],
                  salt: str = "split", split_col: str = "split") -> DataFrame:
    """Assign every row to a named split by salted id-hash.

    ``splits`` maps name → fraction (must sum to ~1; the LAST split
    absorbs the remainder, so float dust can't leave rows unassigned).
    Assignment is a pure projection — no shuffle, no sampling state — and
    each row's split depends only on (id, salt): stable across reruns,
    re-partitioning, and corpus growth."""
    fracs = list(splits.items())
    if not fracs:
        raise ValueError("split_by_hash: need at least one split")
    total = sum(f for _, f in fracs)
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split_by_hash: fractions sum to {total}, expected 1")
    u = hash_unit(id_col, salt)
    expr = F.lit(fracs[-1][0])  # last split absorbs the remainder
    cum = 0.0
    branches = []
    for name, frac in fracs[:-1]:
        cum += frac
        branches.append((cum, name))
    for cum, name in reversed(branches):
        expr = F.when(u < F.lit(cum), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def split_by_hash_sql(id_col: str, splits: Mapping[str, float],
                      salt: str = "split") -> str:
    """DuckDB CASE expression equivalent of :func:`split_by_hash`."""
    fracs = list(splits.items())
    if not fracs:
        raise ValueError("split_by_hash_sql: need at least one split")
    if len(fracs) == 1:  # zero-WHEN CASE is a SQL syntax error
        return f"'{fracs[0][0]}'"
    u = hash_unit_sql(id_col, salt)
    cases, cum = [], 0.0
    for name, frac in fracs[:-1]:
        cum += frac
        cases.append(f"WHEN {u} < {cum!r} THEN '{name}'")
    return "CASE " + " ".join(cases) + f" ELSE '{fracs[-1][0]}' END"


def stratified_sample_by_hash(df: DataFrame, strata_col: str,
                              fractions: Mapping[str, float], id_col: str,
                              default: float = 0.0,
                              salt: str = "strata") -> DataFrame:
    """Deterministic stratified sampling: keep a row iff its salted
    id-hash falls below its stratum's fraction.  A pure FILTER — exactly
    reproducible (same rows every run), no sampler state, and e.g. a 1%
    stratum yields 1% ± binomial noise exactly like sampleBy, but
    auditable.  Unlisted strata use ``default`` (0 = drop)."""
    u = hash_unit(id_col, salt)
    frac = F.lit(float(default))
    for name, f in fractions.items():
        frac = F.when(_c(strata_col) == F.lit(name), F.lit(float(f))).otherwise(frac)
    return df.filter(u < frac)


def stratified_sample_by_hash_sql(strata_col: str, fractions: Mapping[str, float],
                                  id_col: str, default: float = 0.0,
                                  salt: str = "strata") -> str:
    """DuckDB WHERE-clause equivalent of :func:`stratified_sample_by_hash`."""
    u = hash_unit_sql(id_col, salt)
    if not fractions:  # zero-WHEN CASE is a SQL syntax error
        return f"{u} < {float(default)!r}"
    cases = " ".join(
        f"WHEN {strata_col} = '{n}' THEN {float(f)!r}" for n, f in fractions.items()
    )
    return f"{u} < (CASE {cases} ELSE {float(default)!r} END)"


def pack_chunks(df: DataFrame, size_col, order_by: Sequence, budget: int,
                partition_by: Sequence = (), chunk_col: str = "chunk_id") -> DataFrame:
    """Concat-and-chunk sequence packing: rows are laid out in
    ``order_by`` order and cut into chunks of ``budget`` size units —
    chunk id = floor(exclusive-cumulative-size / budget), the standard
    pack-then-split layout LLM training uses (documents straddle chunk
    boundaries; the budget governs where cuts land).

    One window computation; ``partition_by`` shards it (chunk ids are
    per-shard).  At scale ALWAYS pass a shard key — an unpartitioned
    window is a single-reducer funnel."""
    if budget <= 0:  # ANSI mode would raise DIVIDE_BY_ZERO mid-job for 0
        raise ValueError(f"pack_chunks: budget must be positive, got {budget}")
    w = Window.orderBy(*[_c(c) for c in order_by])
    if partition_by:
        w = Window.partitionBy(*[_c(c) for c in partition_by]).orderBy(*[_c(c) for c in order_by])
    cum_excl = F.coalesce(
        F.sum(_c(size_col)).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return df.withColumn(chunk_col, F.floor(cum_excl / F.lit(budget)).cast("long"))


def shuffle_deterministic(df: DataFrame, id_col: str, salt: str = "epoch0",
                          pos_col: str | None = None) -> DataFrame:
    """Reproducible corpus shuffle: total order by md5(id || salt) with id
    tie-break.  Spark range-partitions the sort (no single reducer); a new
    salt is a fresh epoch permutation, the same salt replays the exact
    order.  ``pos_col`` additionally materializes the 0-based position
    (scale-safe two-phase rank via windows.ranked)."""
    h = F.md5(F.concat(_c(id_col).cast("string"), F.lit("|" + salt)))
    if pos_col is None:
        return df.orderBy(h, _c(id_col))
    from pigpen_spark.operators.windows import ranked

    tagged = df.withColumn("__sh", h)
    out = ranked(tagged, order_by=[F.col("__sh"), _c(id_col)], index_col=pos_col)
    return out.drop("__sh")


def sample_per_group(df: DataFrame, strata_col, id_col, k: int,
                     salt: str = "persample", rank_col: str | None = None) -> DataFrame:
    """Deterministic k-per-stratum sample: within each stratum keep the
    ``k`` rows with the smallest salted id-hash (a reproducible
    "random" k, unlike :func:`stratified_sample_by_hash`'s rate filter —
    use this when each group needs an exact COUNT, e.g. per-language
    caps or per-source eval slices).

    Scale shape: rank ≤ k over a window is rewritten by Spark's
    WindowGroupLimit rule into a map-side partial top-k per task BEFORE
    the shuffle — so a billion-row stratum moves only ~k rows per task,
    not the whole group, and a handful of huge strata don't funnel into
    single reducers.  Determinism: the order key is md5(id || salt) with
    an id tie-break; same salt → byte-identical sample across reruns and
    engines.
    """
    if k <= 0:
        raise ValueError(f"sample_per_group: k must be positive, got {k}")
    w = Window.partitionBy(_c(strata_col)).orderBy(
        F.md5(F.concat(_c(id_col).cast("string"), F.lit("|" + salt))), _c(id_col)
    )
    rn = F.row_number().over(w)
    if rank_col is not None:
        return df.withColumn(rank_col, rn.cast("long")).filter(F.col(rank_col) <= k)
    tmp = "__pp_rn"
    return df.withColumn(tmp, rn).filter(F.col(tmp) <= k).drop(tmp)


def sample_per_group_sql(table: str, strata_col: str, id_col: str, k: int,
                         salt: str = "persample") -> str:
    """DuckDB oracle for :func:`sample_per_group` (same md5 order key)."""
    return f"""
    SELECT * EXCLUDE (__rn) FROM (
      SELECT *, row_number() OVER (
        PARTITION BY {strata_col}
        ORDER BY md5({id_col}::VARCHAR || '|{salt}'), {id_col}
      ) AS __rn FROM {table}
    ) WHERE __rn <= {k}
    """
