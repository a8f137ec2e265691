"""Structured Streaming variants — file sources with availableNow triggers
so every test is deterministic and bounded."""

import json

from pyspark.sql import functions as F

from pigpen_spark.streaming import core as st

SCHEMA = "user string, v double, ts timestamp"


def write_batch(path, rows, name):
    path.mkdir(parents=True, exist_ok=True)
    with open(path / f"{name}.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_windowed_agg_stream(spark, tmp_path):
    src = tmp_path / "in1"
    write_batch(src, [
        {"user": "a", "v": 1.0, "ts": "2024-01-01 00:05:00"},
        {"user": "a", "v": 2.0, "ts": "2024-01-01 00:20:00"},
        {"user": "b", "v": 5.0, "ts": "2024-01-01 01:10:00"},
    ], "b0")
    # second file far in the future: with maxFilesPerTrigger=1 the
    # watermark advances between micro-batches, finalizing the hour-0/1
    # windows so append mode emits them
    write_batch(src, [{"user": "z", "v": 0.0, "ts": "2024-01-02 00:00:00"}], "b1")
    rel = st.read_stream_json(spark, str(src), SCHEMA, maxFilesPerTrigger=1)
    out = st.windowed_agg(
        rel.df, "ts", "1 hour",
        aggs={"n": F.count(F.lit(1)), "total": F.sum("v")},
        keys=["user"], watermark="1 minute",
    )
    q = (
        out.writeStream.format("memory").queryName("win1").outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from win1").collect()
    got = {(r["user"], str(r["window_start"])): (r["n"], r["total"]) for r in rows}
    assert got[("a", "2024-01-01 00:00:00")] == (2, 3.0)
    assert got[("b", "2024-01-01 01:00:00")] == (1, 5.0)


def test_dedup_stream(spark, tmp_path):
    src = tmp_path / "in2"
    write_batch(src, [
        {"user": "a", "v": 1.0, "ts": "2024-01-01 00:00:00"},
        {"user": "a", "v": 9.0, "ts": "2024-01-01 00:00:30"},  # retry 30s later: same key
        {"user": "b", "v": 2.0, "ts": "2024-01-01 00:01:00"},
    ], "b0")
    rel = st.read_stream_json(spark, str(src), SCHEMA)
    out = st.dedup_stream(rel.df, ["user"], "ts", watermark="1 minute")
    q = (
        out.writeStream.format("memory").queryName("dd1").outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select user, count(*) n from dd1 group by user").collect()
    assert {r["user"]: r["n"] for r in rows} == {"a": 1, "b": 1}


def test_sessionize_stream(spark, tmp_path):
    src = tmp_path / "in3"
    write_batch(src, [
        {"user": "a", "v": 1.0, "ts": "2024-01-01 00:00:00"},
        {"user": "a", "v": 1.0, "ts": "2024-01-01 00:10:00"},   # same session
        {"user": "a", "v": 1.0, "ts": "2024-01-01 02:00:00"},   # new session
    ], "b0")
    rel = st.read_stream_json(spark, str(src), SCHEMA)
    out = st.sessionize_stream(rel.df, "ts", "user", gap="30 minutes", watermark="1 minute")
    q = (
        out.writeStream.format("memory").queryName("ss1").outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from ss1").collect()
    assert len(rows) == 2  # two sessions for user a
    ns = sorted(r["n_events"] for r in rows)
    assert ns == [1, 2]


def test_running_totals_stateful(spark, tmp_path):
    src = tmp_path / "in4"
    write_batch(src, [
        {"user": "a", "v": 1.5, "ts": "2024-01-01 00:00:00"},
        {"user": "a", "v": 2.5, "ts": "2024-01-01 00:01:00"},
        {"user": "b", "v": 4.0, "ts": "2024-01-01 00:02:00"},
    ], "b0")
    rel = st.read_stream_json(spark, str(src), SCHEMA)
    out = st.running_totals(rel.df, "user", "v", "ts")
    q = (
        out.writeStream.format("memory").queryName("rt1").outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck4"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from rt1").collect()
    got = {r["user"]: (r["n"], r["total"]) for r in rows}
    assert got["a"] == (2, 4.0)
    assert got["b"] == (1, 4.0)


def test_foreach_batch_many(spark, tmp_path):
    src = tmp_path / "in5"
    write_batch(src, [{"user": "a", "v": 1.0, "ts": "2024-01-01 00:00:00"},
                      {"user": "b", "v": 3.0, "ts": "2024-01-01 00:01:00"}], "b0")
    rel = st.read_stream_json(spark, str(src), SCHEMA)
    d1, d2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    q = st.foreach_batch_many(
        rel.df, str(tmp_path / "ck5"),
        writers=[
            lambda df, bid: df.write.mode("append").parquet(d1),
            lambda df, bid: df.filter(F.col("v") > 2).write.mode("append").parquet(d2),
        ],
        available_now=True,
    )
    q.awaitTermination(120)
    assert spark.read.parquet(d1).count() == 2
    assert spark.read.parquet(d2).count() == 1
