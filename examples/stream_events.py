"""Streaming event-analytics pipeline on pigpen_spark.

A micro-batch pipeline over an events directory: enrich with a static
dimension, aggregate into watermarked hourly windows, fan the batch out to
two sinks.  Bounded (availableNow) for demo/test; remove the trigger for a
continuous deployment — the code is identical.

Run:  python examples/stream_events.py [src_dir] [out_dir]
(no args: stages a copy of the sf0.001 events table as the stream input)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from pigpen_spark import get_spark
from pigpen_spark.streaming import (
    foreach_batch_many,
    read_stream_json,
    stream_static_join,
    windowed_agg,
)

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def run(spark, src_dir: str, out_dir: str) -> dict:
    stream = read_stream_json(spark, src_dir, SCHEMA).df

    # static dimension: event-type metadata (broadcast per micro-batch)
    dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "engagement"),
         ("purchase", "revenue"), ("signup", "growth"), ("error", "ops")],
        "etype string, category string",
    )
    enriched = stream_static_join(stream, dim, on="event_type", right_on="etype", how="left")

    windows = windowed_agg(
        enriched, "ts", "1 hour",
        aggs={"n": F.count(F.lit(1)), "total": F.round(F.sum("value"), 2)},
        keys=["category"], watermark="30 minutes",
    )
    wq = (
        windows.writeStream.format("parquet")
        .option("path", f"{out_dir}/windows").option("checkpointLocation", f"{out_dir}/ck_w")
        .trigger(availableNow=True).start()
    )

    # raw enriched fan-out: archive everything + revenue-only sink
    fq = foreach_batch_many(
        enriched, f"{out_dir}/ck_f",
        writers=[
            lambda df, _b: df.write.mode("append").parquet(f"{out_dir}/archive"),
            lambda df, _b: df.filter(F.col("category") == "revenue")
                             .write.mode("append").parquet(f"{out_dir}/revenue"),
        ],
        available_now=True,
    )
    wq.awaitTermination(300)
    fq.awaitTermination(300)

    return {
        "windows": spark.read.parquet(f"{out_dir}/windows").count(),
        "archived": spark.read.parquet(f"{out_dir}/archive").count(),
        "revenue_events": spark.read.parquet(f"{out_dir}/revenue").count(),
    }


def main() -> None:
    spark = get_spark("stream-events")
    spark.sparkContext.setLogLevel("ERROR")
    if len(sys.argv) > 2:
        src_dir, out_dir = sys.argv[1], sys.argv[2]
    else:
        import shutil

        from pigpen_spark.catalog import load_events

        out_dir = "/tmp/stream_events_out"
        src_dir = "/tmp/stream_events_src"
        shutil.rmtree(out_dir, ignore_errors=True)
        shutil.rmtree(src_dir, ignore_errors=True)
        load_events(spark, "/root/testdata/sf0.001").df.write.json(src_dir)
    report = run(spark, src_dir, out_dir)
    for k, v in report.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
