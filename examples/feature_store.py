"""Point-in-time feature assembly on pigpen_spark — the feature-store
core loop, leakage-free by construction:

    raw event stream
      → hourly per-user activity features           (resample_ffill)
    slowly-changing user attributes
      → SCD2 versioned dimension                    (scd2_apply)
    label events (purchases)
      → as-of join features AT LABEL TIME           (as_of_join)
      → interval lookup of the attribute version
        VALID at label time                         (SCD2 [from, to) filter)

The leakage property every feature store exists to guarantee: no
feature row carries information from after its label's timestamp —
both lookups are backward-only (as-of ≤, SCD2 valid_from ≤ t < valid_to),
so the assembled training table is reproducible at any later date.

Run:  python examples/feature_store.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from pigpen_spark import get_spark
from pigpen_spark.catalog import tables
from pigpen_spark.operators.analytics import scd2_apply
from pigpen_spark.operators.joins import as_of_join
from pigpen_spark.operators.windows import resample_ffill


def build(spark, sf_dir: str) -> dict:
    t = tables(spark, sf_dir)
    events = t["events"].df
    customer = t["customer"].df
    orders = t["orders"].df

    # 1. hourly per-user activity features with forward fill
    feats = resample_ffill(events, ["user_id"], "ts", ["value"],
                           interval_seconds=3600,
                           tiebreak=["event_id"]).cache()

    # 2. SCD2 attribute dimension: balances versioned by order day
    dim = customer.select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 100, 0).cast("bigint").alias("cents"),
        F.lit(0).cast("bigint").alias("valid_from"),
        F.lit(None).cast("bigint").alias("valid_to"))
    changes = (orders.groupBy(
        F.col("o_custkey").alias("c_custkey"),
        F.datediff(F.col("o_orderdate").cast("date"),
                   F.to_date(F.lit("1970-01-01"))).cast("bigint").alias("ts"))
        .agg(F.max(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
             .alias("cents")))
    versioned = scd2_apply(dim, changes, ["c_custkey"], "ts",
                           ["cents"]).cache()

    # 3. labels: purchases; features as-of the label instant
    labels = (events.filter(F.col("event_type") == "purchase")
              .select("user_id", "ts", "event_id"))
    feat_rows = feats.select(
        F.col("user_id"),
        F.timestamp_micros(F.col("bucket_ts_us")).alias("ts"),
        F.col("value").alias("hourly_value"))
    training = as_of_join(labels, feat_rows, on="user_id",
                          payload=["hourly_value"])

    # 4. the attribute version VALID at each label's day ([from, to))
    lab_day = training.withColumn(
        "day", F.expr("CAST(unix_micros(CAST(ts AS timestamp)) "
                      "DIV 86400000000 AS BIGINT)"))
    enriched = (lab_day.join(
        versioned,
        (lab_day["user_id"] == versioned["c_custkey"])
        & (versioned["valid_from"] <= lab_day["day"])
        & (versioned["valid_to"].isNull()
           | (versioned["valid_to"] > lab_day["day"])),
        "left"))

    n_labels = labels.count()
    assembled = enriched.count()
    # point-in-time soundness audit: SCD2 intervals partition time, so
    # each label must match EXACTLY one attribute version — a label
    # matching two versions (assembled > labels) would mean overlapping
    # validity, i.e. a leaky dimension
    return {
        "feature_rows": feats.count(),
        "dim_versions": versioned.count(),
        "labels": n_labels,
        "training_rows": assembled,
        "coverage_ppm": int(
            training.filter(F.col("hourly_value").isNotNull()).count()
            * 1_000_000 // max(n_labels, 1)),
        "versions_overlap": assembled != n_labels,
    }


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("feature-store")
    spark.sparkContext.setLogLevel("ERROR")
    print(build(spark, sf))
