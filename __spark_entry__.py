"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in :mod:`pigpen_spark.catalog`; this module is the
thin, stable entry surface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pigpen_spark import catalog  # noqa: E402
from pigpen_spark import catalog_ext  # noqa: E402,F401 — registers extension queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7.1): TPC-H-Q1-shaped group/fold over
    lineitem at sf0.001 — exercises load$, filter, group$, fold, project."""
    return catalog.q1_groupby_fold(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted ⇒ rows-only)."""
    return catalog.oracle_sql()
