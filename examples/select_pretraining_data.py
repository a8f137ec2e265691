"""Target-driven pretraining-data selection on pigpen_spark.

Composes this round's selection operators into the workflow a data team
actually runs when curating a fresh crawl against a target distribution:

    per-source KMV shingle sketches            (sketch.kmv_sketch)
      → cross-source overlap graph             (sketch synopses join)
      → PageRank "aggregator" score            (dedup.pagerank)
         sources whose content re-appears across many other sources are
         link-farm/aggregator-shaped; high rank ⇒ deprioritize
      → DSIR target-likeness per document      (classify.dsir_*)
      → quality gate                           (text.quality_score)
      → token-budgeted selection               (windows.take_budget)
         ordered by (target-likeness, quality) with aggregator sources
         penalized — stop exactly at the budget.

Every stage is a lazy DataFrame plan over synopsis-sized intermediates:
the corpus is scanned for sketches/scores but never re-shuffled whole;
pairwise source comparison happens on ≤k-row sketches, never documents.

Run:  python examples/select_pretraining_data.py [sf_dir] [token_budget]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from pigpen_spark import get_spark
from pigpen_spark.functions import classify as C
from pigpen_spark.functions import dedup as D
from pigpen_spark.functions import sketch as K
from pigpen_spark.functions import text as T
from pigpen_spark.operators.windows import take_budget
from pigpen_spark.relation import load_parquet


def select_data(spark, sf_dir: str, token_budget: int = 20_000,
                target_lang: str = "en", overlap_min: int = 8,
                k: int = 64) -> dict:
    docs = load_parquet(spark, f"{sf_dir}/documents.parquet").df

    # 1. per-source KMV sketches over 3-gram shingles (k rows per source)
    sh = docs.select("source",
                     F.explode(T.shingles(F.col("text"), 3)).alias("t"))
    sk = K.kmv_sketch(sh, F.col("t"), k, key=["source"]).cache()

    # 2. overlap graph: sources sharing >= overlap_min sketch hashes.
    #    The join runs on synopses (n_sources * k rows), not documents.
    a = sk.select(F.col("source").alias("sa"), "h")
    b = sk.select(F.col("source").alias("sb"), "h")
    pairs = (a.join(b, on="h").filter(F.col("sa") < F.col("sb"))
             .groupBy("sa", "sb").agg(F.count(F.lit(1)).alias("shared"))
             .filter(F.col("shared") >= overlap_min))
    edges = (pairs.select(F.col("sa").alias("src"), F.col("sb").alias("dst"))
             .union(pairs.select(F.col("sb").alias("src"),
                                 F.col("sa").alias("dst"))))

    # 3. aggregator score: PageRank over the overlap graph — content
    #    shared across many sources concentrates rank on its spreaders.
    n_edges = edges.count()
    if n_edges:
        agg_rank = D.pagerank(edges, iterations=3).withColumnRenamed(
            "node", "source").withColumnRenamed("rank", "agg_rank")
    else:  # no overlap at all: every source neutral
        agg_rank = docs.select("source").distinct().withColumn(
            "agg_rank", F.lit(0).cast("long"))
    med = agg_rank.approxQuantile("agg_rank", [0.5], 0.0)[0]

    # 4. DSIR target-likeness: target = the docs labeled target_lang
    target = docs.filter(F.col("lang") == target_lang)
    ratio = C.dsir_ratio_table(
        spark, C.dsir_bucket_counts(target, "text", 1024),
        C.dsir_bucket_counts(docs, "text", 1024), 1024)
    dsir = C.dsir_importance(docs, "doc_id", "text", ratio, 1024)

    # 5. quality + assembly; aggregator sources (rank above the median)
    #    take a flat target-likeness penalty rather than a hard drop
    scored = (
        docs.select("doc_id", "source", "text",
                    T.token_count("text").alias("n_tokens"),
                    T.quality_score("text").alias("quality"))
        .join(dsir.select("doc_id", "w_ppm"), on="doc_id")
        .join(F.broadcast(agg_rank), on="source", how="left")
        .withColumn("penalized_w",
                    F.when(F.coalesce("agg_rank", F.lit(0)) > F.lit(med),
                           F.col("w_ppm") - 50_000).otherwise(F.col("w_ppm")))
    )

    # 6. budgeted selection: best target-fit first until the token budget
    chosen = take_budget(
        scored.filter(F.col("quality") >= 0.4),
        [F.col("penalized_w").desc(), F.col("quality").desc(),
         F.col("doc_id")],
        "n_tokens", budget=token_budget).cache()

    stats = chosen.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        F.avg("w_ppm").alias("mean_w_ppm")).collect()[0]
    return {
        "input_docs": docs.count(),
        "overlap_edges": n_edges,
        "aggregator_sources": agg_rank.filter(
            F.col("agg_rank") > F.lit(med)).count(),
        "selected_docs": stats["docs"],
        "selected_tokens": stats["tokens"],
        "mean_selected_w_ppm": float(stats["mean_w_ppm"] or 0.0),
        "budget": token_budget,
    }


def plan_and_mix(spark, sf_dir: str, targets: dict[str, int],
                 token_budget: int = 10_000, chunk_budget: int = 512) -> dict:
    """Phase 2 — the r10 composition: given target token SHARES per
    source (ppm), derive the mixture worksheet (pipeline.mix_plan) and
    run the SAME integer-ppm rates through the end-to-end selection DAG
    (pipeline.mix_select: plan → deterministic fractional sampling →
    token-budget cut → chunk layout).  The worksheet's deficit column is
    the renegotiate signal; the selection output is the packed corpus a
    trainer reads.  One token-count groupBy + a broadcast rate join —
    nothing corpus-sized moves beyond the selection itself."""
    from pigpen_spark.functions import pipeline as P

    docs = load_parquet(spark, f"{sf_dir}/documents.parquet").df
    plan = P.mix_plan(docs, "source", "text", targets, token_budget).cache()
    picked = P.mix_select(docs, "source", "text", "doc_id", targets,
                          token_budget, chunk_budget=chunk_budget).cache()
    stats = picked.agg(
        F.count(F.lit(1)).alias("copies"),
        F.sum("n_tokens").alias("tokens"),
        (F.max("chunk_id") + 1).alias("chunks")).collect()[0]
    return {
        "plan": {r["source"]: {"rate_ppm": r["rate_ppm"],
                               "deficit_tokens": r["deficit_tokens"]}
                 for r in plan.collect()},
        "selected_copies": stats["copies"],
        "selected_tokens": stats["tokens"],
        "chunks": stats["chunks"],
        "budget": token_budget,
    }


def fill_and_order(spark, sf_dir: str, targets: dict[str, int],
                   token_budget: int = 10_000, n_stages: int = 4) -> dict:
    """Phase 3 — the r10 second-pass composition: when the epoch cap
    binds, WATER-FILL the worksheet (pipeline.mix_plan_fill reassigns
    the capped sources' unfilled budget to the uncapped ones), convert
    the filled takes into blend weights, and lay the corpus out with
    blend_by_weight so the loader sees the FILLED mix in every prefix.
    Alongside, difficulty-pace the same corpus with curriculum_blend
    (token count as the difficulty signal) — the alternative schedule
    where quality ramps and the mix holds only in aggregate.  Both
    orderings are deterministic integer layouts; re-running with a new
    salt is a fresh epoch."""
    from pigpen_spark.functions import pipeline as P
    from pigpen_spark.functions import text as T

    docs = load_parquet(spark, f"{sf_dir}/documents.parquet").df
    fill = P.mix_plan_fill(docs, "source", "text", targets, token_budget)
    takes = {r["source"]: int(r["take_tokens"]) for r in fill.collect()
             if r["take_tokens"] > 0}
    total = sum(takes.values()) or 1
    weights = {s: max(1, t * 1_000_000 // total) for s, t in takes.items()}
    ordered = P.blend_by_weight(docs.select("source", "doc_id"),
                                "source", "doc_id", weights).cache()
    n = ordered.count()
    prefix = {
        r["source"]: r["cnt"]
        for r in ordered.filter(F.col("blend_pos") < F.lit(max(n // 10, 1)))
        .groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    curr = P.curriculum_blend(
        docs.select("doc_id", T.token_count("text").alias("difficulty")),
        "doc_id", "difficulty", n_stages=n_stages).cache()
    stage_mean = {
        int(r["stage"]): float(r["mean_diff"])
        for r in curr.groupBy("stage")
        .agg(F.avg("difficulty").alias("mean_diff")).collect()
    }
    return {
        "filled_takes": takes,
        "blend_weights": weights,
        "prefix_10pct_mix": prefix,
        "curriculum_stage_mean_difficulty": stage_mean,
        "ordered_docs": n,
    }


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    budget = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    spark = get_spark("select-pretraining-data")
    spark.sparkContext.setLogLevel("ERROR")
    print(select_data(spark, sf, budget))
    print(plan_and_mix(spark, sf, {"src0": 500_000, "src1": 300_000,
                                   "src2": 150_000, "src3": 50_000},
                       token_budget=budget))
    print(fill_and_order(spark, sf, {"src0": 500_000, "src1": 300_000,
                                     "src2": 150_000, "src3": 50_000},
                         token_budget=budget))
