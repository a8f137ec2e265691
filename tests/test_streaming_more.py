"""Stream-static joins + the Relation API applied to streaming frames."""

import json

from pyspark.sql import functions as F

from pigpen_spark import fold
from pigpen_spark.relation import Relation
from pigpen_spark.streaming import core as st


def write_batch(path, rows, name):
    path.mkdir(parents=True, exist_ok=True)
    with open(path / f"{name}.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def drain(df, tmp_path, name, mode="append"):
    q = (
        df.writeStream.format("memory").queryName(name).outputMode(mode)
        .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)


def test_stream_static_join(spark, tmp_path):
    src = tmp_path / "ss1"
    write_batch(src, [
        {"user": "u1", "v": 1.0, "ts": "2024-01-01 00:00:00"},
        {"user": "u2", "v": 2.0, "ts": "2024-01-01 00:01:00"},
        {"user": "u9", "v": 9.0, "ts": "2024-01-01 00:02:00"},  # no dim row
    ], "b0")
    stream = st.read_stream_json(spark, str(src), "user string, v double, ts timestamp").df
    dim = spark.createDataFrame([("u1", "US"), ("u2", "DE")], "uid string, country string")
    joined = st.stream_static_join(stream, dim, on="user", right_on="uid", how="left")
    drain(joined.select("user", "country", "v"), tmp_path, "ssj")
    rows = {r["user"]: r["country"] for r in spark.sql("select * from ssj").collect()}
    assert rows == {"u1": "US", "u2": "DE", "u9": None}


def test_relation_api_on_stream(spark, tmp_path):
    # the same Relation operators run unchanged on a streaming frame
    src = tmp_path / "ss2"
    write_batch(src, [
        {"user": "a", "v": 4.0, "ts": "2024-01-01 00:00:00"},
        {"user": "a", "v": 6.0, "ts": "2024-01-01 00:01:00"},
        {"user": "b", "v": 1.0, "ts": "2024-01-01 00:02:00"},
    ], "b0")
    rel = st.read_stream_json(spark, str(src), "user string, v double, ts timestamp")
    assert isinstance(rel, Relation)
    out = (
        rel.filter(F.col("v") > 2)
        .map("user", doubled=F.col("v") * 2, ts=F.col("ts"))
        .group_by("user")
        .fold(total=fold.sum_("doubled"), n=fold.count())
    )
    drain(out.df, tmp_path, "ras", mode="complete")
    rows = {r["user"]: (r["total"], r["n"]) for r in spark.sql("select * from ras").collect()}
    assert rows == {"a": (20.0, 2)}
