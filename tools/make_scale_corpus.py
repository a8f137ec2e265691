"""Synthesize a 10× perf corpus ("sf1") from /root/testdata/sf0.1.

The driver ships sf0.001/0.01/0.1 only; the 2×-of-baseline rule is
therefore certified at sf0.1 alone.  This tool derives a 10× corpus for
SCALE-FACTOR ESCALATION MEASUREMENT (SCALE.md §scaling-evidence):

- fact tables (orders, lineitem, events, documents, embeddings) are
  replicated 10× with copy-offset primary keys, so fact↔fact joins and
  windows see real 10× key cardinality;
- fact→dim foreign keys are left in-range (dims are NOT scaled — at
  real TPC-H sf1 the dims grow too, but dim size is never what these
  queries are bound by, and keeping them fixed isolates the fact-side
  scaling exponent);
- near-duplicate pathology is avoided deliberately: each document copy
  gets a distinct trailing token and each embedding copy perturbs one
  dimension by a copy-specific epsilon — otherwise every vector would
  gain 9 exact twins and pair-generating operators would measure an
  artificial O(copies²) blow-up instead of their scaling exponent.

This is a PERFORMANCE corpus only — the sf0.01 DuckDB oracle gate is
the correctness surface; nothing here feeds CORRECTNESS runs.

Usage:  python tools/make_scale_corpus.py [out_dir] [copies]
        (default /tmp/scale_sf1, 10 copies; 100 copies ≈ "sf10" — the
        100× point for the scaling-exponent table in SCALE.md)
Then:   SPARK_GRAFT_SF_DIR=<out_dir> python bench.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pigpen_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
COPIES = 10

#: per-table (key columns to offset, max-key expression source)
FACTS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation", "customer", "supplier", "part"]


def main() -> None:
    global COPIES
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_sf1"
    if len(sys.argv) > 2:
        COPIES = int(sys.argv[2])
    spark = get_spark("make-scale-corpus")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)

    for t in DIMS:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite") \
            .parquet(f"{out}/{t}.parquet")

    copies = spark.range(COPIES).withColumnRenamed("id", "__copy")
    for t, keys in FACTS.items():
        # events.parquet carries TIMESTAMP(NANOS): route through the
        # catalog loader, which sets the legacy nanos conf
        if t == "events":
            from pigpen_spark.catalog import load_events
            df = load_events(spark, SRC).df
        else:
            df = spark.read.parquet(f"{SRC}/{t}.parquet")
        offsets = {k: df.agg(F.max(k)).first()[0] + 1 for k in keys}
        rep = df.crossJoin(F.broadcast(copies))
        for k in keys:
            rep = rep.withColumn(k, F.col(k) + F.col("__copy") * F.lit(offsets[k]))
        if t == "documents":
            rep = rep.withColumn(
                "text", F.concat(F.col("text"), F.lit(" copy"),
                                 F.col("__copy").cast("string")))
        if t == "embeddings":
            # perturb dimension (copy % dim) by copy·2⁻⁷ — distinct
            # vectors per copy, geometry otherwise intact
            rep = rep.withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x, i: F.when(
                        i == F.col("__copy") % F.size("embedding"),
                        x + F.col("__copy").cast("double") / F.lit(128.0),
                    ).otherwise(x),
                ),
            )
        rep.drop("__copy").write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        print(f"wrote {t}: {spark.read.parquet(f'{out}/{t}.parquet').count()} rows")


if __name__ == "__main__":
    main()
