"""Rank / top-n-per-group / sessionize (SURVEY §2.5 + extensions)."""

import datetime

from pyspark.sql import functions as F

from pigpen_spark.operators.windows import ranked, sessionize, top_n_per_group
from pigpen_spark.relation import return_


def test_ranked_zero_based(spark):
    df = return_(spark, [(30,), (10,), (20,)], "x long").df
    out = ranked(df, ["x"], index_col="index")
    assert sorted((r["x"], r["index"]) for r in out.collect()) == [(10, 0), (20, 1), (30, 2)]


def test_top_n_per_group(spark):
    df = return_(spark, [("a", 3), ("a", 1), ("a", 2), ("b", 9)], "k string, v long").df
    out = top_n_per_group(df, ["k"], [F.col("v").desc()], 2)
    rows = sorted((r["k"], r["v"]) for r in out.collect())
    assert rows == [("a", 2), ("a", 3), ("b", 9)]


def test_sessionize_gap(spark):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0), (1, t0 + datetime.timedelta(seconds=10)),          # session 1
        (1, t0 + datetime.timedelta(seconds=4000)),                  # session 2 (gap > 1800)
        (2, t0),                                                     # other user
    ]
    df = return_(spark, rows, "user_id long, ts timestamp").df
    out = sessionize(df, "user_id", "ts", gap_seconds=1800)
    per_user = out.groupBy("user_id").agg(F.count_distinct("session_id").alias("n")).collect()
    assert {r["user_id"]: r["n"] for r in per_user} == {1: 2, 2: 1}


def test_plan_viz(spark):
    from pigpen_spark.plans import explain_str, plan_dot
    df = return_(spark, [(1,)], "x long").df.filter(F.col("x") > 0)
    s = explain_str(df)
    assert "Filter" in s or "filter" in s.lower()
    dot = plan_dot(df)
    assert dot.startswith("digraph") and "->" in dot or "n0" in dot
