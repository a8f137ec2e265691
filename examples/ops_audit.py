"""Data-ops lifecycle on pigpen_spark: validate → diff → rollup → monitor.

The operational loop every recurring ingest runs around its corpus,
composed entirely from engine operators:

    new drop (events)
      → data-quality gate                      (functions/validate)
      → CDC diff vs the previous snapshot      (operators/analytics.snapshot_diff)
      → CDC apply / MERGE promotion            (operators/analytics.apply_changes)
      → incremental rollup maintenance         (operators/analytics.merge_rollups)
      → distribution monitoring                (functions/sketch.histogram_quantiles)

Run:  python examples/ops_audit.py [sf_dir]

Every stage is a lazy DataFrame plan; the rollup merge touches only
day-sized partials, the quantile monitor is a fixed-size mergeable
sketch, and the diff is one co-partitioned full-outer join — the same
script runs unchanged against a 100 TB events lake.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from pigpen_spark import get_spark
from pigpen_spark.functions import validate as V
from pigpen_spark.functions.sketch import histogram_quantiles
from pigpen_spark.operators.analytics import (apply_changes, changes_from_diff,
                                              merge_rollups, snapshot_diff)


def audit(spark, sf_dir: str) -> dict:
    from pigpen_spark.catalog import tables

    ev = tables(spark, sf_dir)["events"].df

    # 1. quality gate: one aggregate pass, all rules
    checks = V.check_rules(ev, {
        "value_present": F.col("value").isNotNull(),
        "value_positive": F.col("value") > 0,
        "ts_present": F.col("ts").isNotNull(),
        "known_type": F.col("event_type").isin(
            "click", "view", "purchase", "signup", "error"),
    }).collect()
    gate = {r.rule: r.n_violations for r in checks}

    # 2. CDC diff: this week's per-user rollup vs last week's
    cut_old = F.lit("2024-01-15").cast("timestamp_ntz")
    cut_new = F.lit("2024-01-22").cast("timestamp_ntz")

    def snap(hi):
        return ev.where(F.col("ts") < hi).groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"))

    # each snapshot feeds TWO consumers (diff + apply/drift-check below) —
    # cache so the events scan+groupBy runs once per snapshot, not per use
    old_snap = snap(cut_old).cache()
    new_snap = snap(cut_new).cache()
    diff = snapshot_diff(old_snap, new_snap, keys=["user_id"])
    changes = {r.status: r.cnt for r in
               diff.groupBy("status").agg(F.count(F.lit(1)).alias("cnt")).collect()}

    # 2b. CDC apply: the MERGE that promotes last week's snapshot to this
    # week's — diff -> change set -> apply must reproduce the new
    # snapshot EXACTLY (the self-certifying round trip)
    ch = changes_from_diff(diff, ["user_id"], ["n_events"])
    applied = apply_changes(old_snap, ch, ["user_id"])
    drift = applied.unionByName(new_snap) \
        .groupBy("user_id", "n_events").agg(F.count(F.lit(1)).alias("c")) \
        .filter(F.col("c") != 2).count()
    assert drift == 0, f"apply_changes round trip drifted on {drift} rows"
    old_snap.unpersist()
    new_snap.unpersist()

    # 3. incremental rollup: merge the new slice into the standing rollup
    def part(pred):
        return ev.where(pred).groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("first_us"))
    rollup = merge_rollups(
        [part(F.col("ts") < cut_old), part(F.col("ts") >= cut_old)],
        ["user_id"], {"n_events": "count", "first_us": "min"})

    # 4. distribution monitor: value quantiles from the mergeable sketch
    micros = F.round(F.col("value") * 1_000_000, 0).cast("bigint")
    q = {r.p_permille: r.est for r in histogram_quantiles(
        ev.where(F.col("value").isNotNull()), micros,
        lo=0, hi=1_000_000_000, n_bins=256).collect()}

    return {
        "violations": gate,
        "diff": changes,
        "rollup_users": rollup.count(),
        "value_quantiles_micro": q,
    }


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("ops-audit-example")
    spark.sparkContext.setLogLevel("WARN")
    report = audit(spark, sf_dir)
    for k, v in report.items():
        print(f"{k}: {v}")
