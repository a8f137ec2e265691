"""End-to-end training-corpus curation pipeline on pigpen_spark.

The canonical LLM-data workflow, composed entirely from engine operators:

    raw documents
      → text stats + quality score + language ID     (functions/text)
      → quality & language filter                    (Relation.filter)
      → exact dedup (digest, keep min doc_id)        (functions/dedup)
      → MinHash-LSH near-dup candidates → drop dups  (functions/dedup)
      → token accounting + final store               (store_parquet)

Run:  python examples/curate_corpus.py [sf_dir] [out_dir]

Every stage is a lazy DataFrame plan — one job graph, no driver loops;
at 100 TB the same script runs unchanged on a cluster master.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from pigpen_spark import fold, get_spark
from pigpen_spark.functions import dedup as D
from pigpen_spark.functions import text as T
from pigpen_spark.relation import Relation, load_parquet


def curate(spark, sf_dir: str, out_dir: str, min_quality: float = 0.5,
           langs: tuple[str, ...] = ("en", "fr"), jaccard_cut: float = 0.8) -> dict:
    docs = load_parquet(spark, f"{sf_dir}/documents.parquet")

    # 1. annotate: stats, quality, predicted language
    # (note: this synthetic corpus uses English vocabulary under every
    # `lang` label, so lang_pred is 'en' throughout — we filter on the
    # metadata label AND the prediction, which is the realistic combo)
    annotated = docs.map(
        "doc_id", "text", "source", "lang",
        n_tokens=T.token_count("text"),
        bpe_tokens=T.bpe_token_count("text"),
        quality=T.quality_score("text"),
        lang_pred=T.lang_id("text"),
    ).cache()

    # 2. filter: quality floor + language allowlist (label or prediction)
    kept = annotated.filter(
        (F.col("quality") >= min_quality)
        & (F.col("lang").isin(*langs) | F.col("lang_pred").isin(*langs))
    )

    # 3. exact dedup: keep the min doc_id per content digest
    reps = D.exact_dedup(kept.df, "text", "doc_id").select("keep_id")
    exact_unique = kept.filter_by("doc_id", Relation(reps), keys_col="keep_id")

    # 4. near-dup removal: LSH candidates, drop the higher id of any pair
    # whose signature agreement clears the cut
    cands = D.minhash_candidates(exact_unique.df, "doc_id", "text", k=12, bands=4)
    drop = Relation(cands.filter(F.col("est_jaccard") >= jaccard_cut).select("id_b").distinct())
    final = exact_unique.remove_by("doc_id", drop, keys_col="id_b")

    # 5. store + corpus accounting
    final.store_parquet(f"{out_dir}/corpus")
    stats_rel = final.reduce_rel(
        n_docs=fold.count(),
        total_tokens=fold.sum_("n_tokens"),
        total_bpe=fold.sum_("bpe_tokens"),
        avg_quality=fold.avg("quality").post(lambda c: F.round(c, 4)),
    )
    [stats] = stats_rel.dump()
    return {
        "input_docs": docs.count(),
        "after_filter": kept.count(),
        "after_exact_dedup": exact_unique.count(),
        "final_docs": stats["n_docs"],
        "total_tokens": stats["total_tokens"],
        "total_bpe_tokens": stats["total_bpe"],
        "avg_quality": stats["avg_quality"],
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_corpus"
    spark = get_spark("curate-corpus")
    spark.sparkContext.setLogLevel("ERROR")
    report = curate(spark, sf_dir, out_dir)
    for k, v in report.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
