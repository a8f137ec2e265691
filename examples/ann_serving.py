"""Compressed-ANN serving lifecycle on pigpen_spark: index-as-data.

A vector corpus is served from STORED artifacts — PQ codes + codebook
(compressed, ADC search) next to an LSH index (bucketed, cosine search)
— through the full operational loop:

    build (once)
      pq_index        → codes.parquet + codebook.parquet   (8 B/vector)
      lsh_index       → lsh.parquet (id, vec, bucket, nrm) + drift baseline

    serve (every query batch)
      pq_topk_against → ADC top-k off the stored codes; the raw corpus
                        is never re-read (m + codebook come OFF the
                        artifacts)
      recall audit    → ann_recall vs brute_force_topk on a probe batch

    maintain (every delta drop)
      pq_index_append  → ONLY the delta is coded (frozen codebook)
      lsh_index_append → ONLY the delta is hashed (stored plane count)
      lsh_index_drift  → occupancy drift + re-derived auto sizing:
                        `stale` schedules the one real rebuild;
                        shape drift without staleness = retrain signal
                        (PQ codebooks inherit the same trigger)

Run:  python examples/ann_serving.py [sf_dir] [work_dir]

Every serving call touches the QUERY BATCH plus code/bucket columns —
at 10^10 vectors the ADC scan reads 8 bytes of codes per candidate
instead of 256+ bytes of floats, and each day's maintenance costs one
scan of the delta.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from pigpen_spark import get_spark
from pigpen_spark.functions import similarity as S


def build(spark, emb, work: str) -> None:
    """One-time artifact build on the base corpus."""
    codes, cb_df = S.pq_index(emb, dim=64)
    codes.write.mode("overwrite").parquet(f"{work}/pq_codes")
    cb_df.write.mode("overwrite").parquet(f"{work}/pq_codebook")
    # density-auto sizing at build time: the drift monitor re-derives
    # the same formula later, so `stale` fires only when the corpus has
    # actually outgrown the build-time sizing
    lsh = S.lsh_index(emb, n_planes="auto", dim=64)
    lsh.write.mode("overwrite").parquet(f"{work}/lsh")
    # the drift baseline is the build-time index snapshot (slim columns)
    lsh.select("id", "bucket").write.mode("overwrite") \
        .parquet(f"{work}/lsh_baseline")


def serve(spark, queries, work: str, k: int = 5):
    """ADC top-k for a query batch off the stored artifacts."""
    codes = spark.read.parquet(f"{work}/pq_codes")
    cb_df = spark.read.parquet(f"{work}/pq_codebook")
    return S.pq_topk_against(codes, cb_df, queries, k=k)


def maintain(spark, delta, work: str) -> dict:
    """Admit a delta drop: code + hash ONLY the delta, then read the
    drift monitor for the rebuild/retrain decision."""
    codes = spark.read.parquet(f"{work}/pq_codes")
    cb_df = spark.read.parquet(f"{work}/pq_codebook")
    # localCheckpoint BEFORE overwriting a path the plan reads (the
    # lazy-index-re-read landmine ingest_increment.py pins): only the
    # delta is coded/hashed; the stored rows pass through as data
    appended = S.pq_index_append(codes, cb_df, delta).localCheckpoint()
    appended.write.mode("overwrite").parquet(f"{work}/pq_codes")
    lsh = spark.read.parquet(f"{work}/lsh")
    lsh_new = S.lsh_index_append(lsh, delta, dim=64).localCheckpoint()
    lsh_new.write.mode("overwrite").parquet(f"{work}/lsh")
    drift = S.lsh_index_drift(
        spark.read.parquet(f"{work}/lsh_baseline"),
        spark.read.parquet(f"{work}/lsh").select("id", "bucket"),
    ).collect()[0]
    return {"stale": bool(drift["stale"]),
            "l1_ppm": int(drift["l1_ppm"]),
            "planes_stored": int(drift["planes_stored"]),
            "planes_auto": int(drift["planes_auto"])}


def run(spark, sf_dir: str, work: str) -> dict:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    base = emb.filter(F.col("vec_id") < n - 100).transform(
        lambda df: df.localCheckpoint())
    delta = emb.filter(F.col("vec_id") >= n - 100)

    build(spark, base, work)

    # day-0 serving + recall audit on a 10-query probe batch
    probes = emb.filter(F.col("vec_id") < 10)
    day0 = serve(spark, probes, work).localCheckpoint()
    exact = S.brute_force_topk(base, probes, k=5)
    recall = S.ann_recall(day0, exact).filter(F.col("q_id").isNull()) \
        .collect()[0]["recall_ppm"]

    # the delta's vectors are NOT retrievable before maintenance
    delta_ids = {r["vec_id"] for r in delta.select("vec_id").collect()}
    pre_hits = {r["n_id"] for r in day0.collect()} & delta_ids

    report = {"n_base": base.count(), "n_delta": delta.count(),
              "recall_ppm_day0": int(recall), "pre_maintenance_hits": len(pre_hits)}
    report.update(maintain(spark, delta, work))

    # day-1: a delta vector queried against the maintained index must
    # retrieve ITSELF as rank-1 when self-exclusion is off — proof the
    # appended codes serve
    probe1 = delta.limit(3)
    codes = spark.read.parquet(f"{work}/pq_codes")
    cb_df = spark.read.parquet(f"{work}/pq_codebook")
    day1 = S.pq_topk_against(codes, cb_df, probe1, k=1, exclude_self=False)
    firsts = {(r["q_id"], r["n_id"]) for r in day1.collect()}
    report["delta_self_retrieved"] = sum(1 for q, nid in firsts if q == nid)
    report["index_rows"] = codes.count()

    # refine dial: exact re-rank of the ADC shortlist (IndexRefineFlat)
    # recovers recall the compressed scan lost — audited against the
    # post-maintenance corpus (index now includes the delta)
    codes1 = spark.read.parquet(f"{work}/pq_codes")
    exact_full = S.brute_force_topk(emb, probes, k=5)
    plain1 = S.pq_topk_against(codes1, cb_df, probes, k=5).localCheckpoint()
    refined = S.pq_topk_against_refined(
        codes1, cb_df, emb, probes, k=5, refine=4).localCheckpoint()
    report["recall_ppm_day1_plain"] = int(
        S.ann_recall(plain1, exact_full).filter(F.col("q_id").isNull())
        .collect()[0]["recall_ppm"])
    report["recall_ppm_refined"] = int(
        S.ann_recall(refined, exact_full).filter(F.col("q_id").isNull())
        .collect()[0]["recall_ppm"])
    return report


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="annserve_")
    spark = get_spark("ann-serving-example")
    spark.sparkContext.setLogLevel("ERROR")
    report = run(spark, sf_dir, work)
    for k, v in report.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
