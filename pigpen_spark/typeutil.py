"""Small type-coercion helpers shared by operators.

Spark 4 (ANSI) refuses a direct ``CAST(timestamp_ntz AS DOUBLE)`` while
allowing ``timestamp -> double``; parquet files whose timestamps carry no
timezone are read as TIMESTAMP_NTZ, so any epoch arithmetic written as
``col.cast("double")`` breaks the moment the input lake switches timestamp
flavor.  ``epoch_seconds`` resolves the column's actual type against the
DataFrame and routes timestamps (either flavor) through an explicit
timestamp cast first — with the session pinned to UTC (session.py) the NTZ
interpretation matches DuckDB's ``epoch()`` on naive timestamps.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def epoch_seconds(df: DataFrame, col: str | Column) -> Column:
    """Numeric seconds for gap/ordering arithmetic, robust to the column
    being numeric, TIMESTAMP, or TIMESTAMP_NTZ.

    Resolves the expression's data type via analysis only (no job), then:
    timestamps -> ``cast(timestamp)`` (no-op for LTZ, session-tz
    interpretation for NTZ) -> ``cast(double)``; everything else casts to
    double directly.
    """
    c = F.col(col) if isinstance(col, str) else col
    dt = df.select(c.alias("__t")).schema["__t"].dataType.simpleString()
    if dt.startswith("timestamp"):
        c = c.cast("timestamp")
    return c.cast("double")
