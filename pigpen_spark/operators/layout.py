"""Data-layout operators: Z-order (Morton) clustering for multi-column
locality.

At 100 TB the dominant cost of a selective query is how many files its
predicates let the scan SKIP.  Sorting on one column gives perfect
min/max pruning on that column and none on the others; interleaving the
bits of several columns (the Z-order / Morton curve) gives every
interleaved column partial pruning — the layout trick behind
Delta/Iceberg ``OPTIMIZE ZORDER BY``.

Everything here is pure integer arithmetic on Catalyst expressions
(shift/and/or — whole-stage codegen, no UDF), so the key carries an
exact DuckDB oracle and the clustering write is an ordinary
``repartitionByRange`` + ``sortWithinPartitions`` — Spark's scalable
total-order machinery, no custom partitioner.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pigpen_spark.relation import _to_col as _c


def zorder_key(cols: Sequence, bits: int = 16) -> Column:
    """Morton-interleaved key over ``cols`` (non-negative integers,
    truncated to the low ``bits`` bits each; len(cols) × bits ≤ 63).

    Bit ``i`` of column ``j`` lands at output bit ``i·n_cols + j`` — the
    classic Z-curve.  The expression expands to ``bits × n_cols``
    shift/and/or terms: all JVM-side, codegen'd, zero UDFs.  Callers with
    unbounded or skewed domains should pre-bucket (e.g. quantile bins)
    so the low ``bits`` bits carry signal; truncation keeps only the low
    bits, which preserves locality for dense ids but aliases sparse ones.
    """
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_key: need at least one column")
    if n * bits > 63:
        raise ValueError(f"zorder_key: {n} cols × {bits} bits exceeds a signed long")
    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        v = _c(c).cast("long")
        for i in range(bits):
            # bit i of column j → output bit i*n + j
            key = key.bitwiseOR(
                F.shiftleft(F.shiftright(v, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return key


def zorder_key_sql(cols: Sequence[str], bits: int = 16) -> str:
    """DuckDB oracle for :func:`zorder_key` — same shift/and/or terms."""
    n = len(cols)
    terms = [
        f"((({c}::BIGINT >> {i}) & 1) << {i * n + j})"
        for j, c in enumerate(cols)
        for i in range(bits)
    ]
    return "(" + " | ".join(terms) + ")"


def cluster_by_zorder(df: DataFrame, cols: Sequence, bits: int = 16,
                      num_partitions: int | None = None) -> DataFrame:
    """Physically cluster ``df`` on the Z-curve: range-partition + sort
    within partitions by the Morton key, then drop it.

    The write-side half of Z-ordering: follow with ``store_parquet`` and
    every interleaved column's min/max file statistics become selective.
    ``repartitionByRange`` samples the key distribution, so skewed
    composites still split evenly; the intra-partition sort is the
    standard spillable Spark sort."""
    key = zorder_key(cols, bits).alias("__pp_zkey")
    out = df.withColumn("__pp_zkey", key)
    if num_partitions is not None:
        out = out.repartitionByRange(num_partitions, "__pp_zkey")
    else:
        out = out.repartitionByRange("__pp_zkey")
    return out.sortWithinPartitions("__pp_zkey").drop("__pp_zkey")


def compact_files(spark, path_in: str, path_out: str,
                  target_records_per_file: int, fmt: str = "parquet",
                  order_by: Sequence | None = None) -> int:
    """Small-file compaction: rewrite a directory of too-many-small
    files into ⌈n / target⌉ right-sized ones — the maintenance job every
    streaming/append sink eventually needs (a 100 TB lake of 1 MB part
    files pays per-file open/footer cost on every scan and floods the
    driver's file index).

    One count + one shuffle: ``repartition(n_files)`` for plain packing,
    or ``repartitionByRange(order_by)`` to simultaneously re-cluster (the
    poor man's OPTIMIZE ... ZORDER — compose with
    :func:`cluster_by_zorder` keys for the multi-column form).
    ``maxRecordsPerFile`` caps stragglers.  Returns the file count."""
    reader = getattr(spark.read, fmt)
    df = reader(path_in)
    n = df.count()
    n_files = max(1, -(-n // target_records_per_file))
    if order_by is not None:
        keys = [_c(c) for c in order_by]
        # sortWithinPartitions matters: without it a partition that the
        # maxRecordsPerFile cap splits would emit interleaved key ranges,
        # defeating the min/max file statistics this mode exists for
        df = df.repartitionByRange(n_files, *keys).sortWithinPartitions(*keys)
    else:
        df = df.repartition(n_files)
    (df.write.mode("overwrite")
       .option("maxRecordsPerFile", target_records_per_file)
       .format(fmt).save(path_out))
    return n_files
