"""Incremental corpus ingest on pigpen_spark: the index-as-data loop.

A recurring crawl drop is admitted against a STORED corpus without ever
re-reading the corpus text — only its compact indexes:

    stored corpus (one-time build)
      digest index   (id, md5)            — exact-dedup key
      minhash index  (id, 12-int sig)     — near-dup key (functions/dedup)
      lsh index      (id, vec, bucket)    — embedding ANN (functions/similarity)

    new batch (every drop)
      → markup strip + normalization     (functions/text)
      → quality gate                     (functions/text.quality_score)
      → exact dedup vs digest index      (broadcast equi-join)
      → near-dup vs minhash index        (dedup.minhash_candidates_against)
      → embedding near-dup vs lsh index  (similarity.lsh_topk_against)
      → append survivors + index deltas  (parquet appends)

Run:  python examples/ingest_increment.py [sf_dir] [work_dir]

Every per-drop stage touches the BATCH plus fixed-size index columns:
the corpus text never moves after the one-time build, so the same script
admits a 1 GB drop against a 100 TB corpus.  Index updates are parquet
APPENDS of the batch's own rows — no rewrite of existing index files.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from pigpen_spark import get_spark
from pigpen_spark.functions import dedup as D
from pigpen_spark.functions import similarity as S
from pigpen_spark.functions import text as T

_PLANES, _DIM = 4, 64


def build_indexes(spark, docs, emb, work: str) -> None:
    """One-time corpus index build (at 100 TB: the ingest-side cost,
    paid once; each index row is O(bytes of key), not document bytes)."""
    norm = T.normalize_text("text")
    docs.select("doc_id", F.md5(norm).alias("digest")).write.mode(
        "overwrite").parquet(f"{work}/digest_index")
    D.minhash_index(docs, "doc_id", "text").write.mode(
        "overwrite").parquet(f"{work}/minhash_index")
    S.lsh_index(emb, n_planes=_PLANES, dim=_DIM).write.mode(
        "overwrite").parquet(f"{work}/lsh_index")


def ingest(spark, batch, batch_emb, work: str,
           quality_min: float = 0.3, jaccard_min: float = 0.6,
           cosine_max: float = 0.98) -> dict:
    """Admit one drop. Returns per-stage counts (the drop report)."""
    report: dict[str, int] = {"arrived": batch.count()}

    # 1. extraction + normalization (per-row codegen, zero shuffles)
    clean = batch.select(
        "doc_id",
        T.normalize_text(T.strip_markup("text")).alias("text"),
    )

    # 2. cheap quality gate
    gated = clean.filter(T.quality_score("text") >= quality_min)
    report["passed_quality"] = gated.count()

    # 3. exact dedup vs the stored digest index (batch side hashes; the
    # index is a slim (id, digest) join — broadcast when the batch is
    # small, shuffled equi-join otherwise; corpus text untouched)
    digests = spark.read.parquet(f"{work}/digest_index")
    gated = gated.withColumn("digest", F.md5(F.col("text")))
    exact_new = gated.join(digests, on="digest", how="left_anti").drop("digest")
    report["after_exact_dedup"] = exact_new.count()

    # 4. near-dup vs the stored minhash index: only the batch computes
    # signatures; the corpus contributes 12 ints/doc
    idx = spark.read.parquet(f"{work}/minhash_index")
    near = D.minhash_candidates_against(exact_new, idx, "doc_id", "text")
    dup_ids = near.filter(F.col("est_jaccard") >= jaccard_min) \
                  .select(F.col("new_id").alias("doc_id")).distinct()
    survivors = exact_new.join(dup_ids, on="doc_id", how="left_anti")
    report["after_near_dedup"] = survivors.count()

    # 5. embedding near-dup vs the stored LSH index (query side hashes;
    # exclude_self=False — batch ids are a fresh id space)
    lsh = spark.read.parquet(f"{work}/lsh_index")
    sem_hits = S.lsh_topk_against(
        lsh, batch_emb, k=1, n_planes=_PLANES, dim=_DIM, exclude_self=False,
    ).filter(F.col("score") >= cosine_max)
    sem_ids = sem_hits.select(F.col("q_id").alias("doc_id")).distinct()
    survivors = survivors.join(sem_ids, on="doc_id", how="left_anti")
    # PIN the admitted set before mutating the indexes it was computed
    # from: every stage above lazily re-reads the index parquet, so the
    # appends below would otherwise re-evaluate the anti-joins against
    # the already-updated indexes and admit zero rows on the later writes
    survivors = survivors.localCheckpoint(eager=True)
    report["admitted"] = survivors.count()

    # 6. append survivors + index deltas (append-only: existing index
    # files are never rewritten)
    survivors.write.mode("append").parquet(f"{work}/corpus")
    survivors.select(
        "doc_id", F.md5(F.col("text")).alias("digest")
    ).write.mode("append").parquet(f"{work}/digest_index")
    D.minhash_index(survivors, "doc_id", "text").write.mode(
        "append").parquet(f"{work}/minhash_index")
    admitted_emb = batch_emb.join(
        survivors.select(F.col("doc_id").alias("vec_id")), on="vec_id")
    S.lsh_index(admitted_emb, n_planes=_PLANES, dim=_DIM).write.mode(
        "append").parquet(f"{work}/lsh_index")
    return report


def run(spark, sf_dir: str, work: str) -> dict:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    corpus = docs.filter(F.col("doc_id") < 400)
    corpus_emb = emb.filter(F.col("vec_id") < 400)
    build_indexes(spark, corpus, corpus_emb, work)

    # the drop: fresh docs wrapped in crawl markup, PLUS exact copies of
    # corpus docs (must die at stage 3) — re-keyed into a fresh id space
    fresh = docs.filter(F.col("doc_id") >= 400).select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.concat(F.lit("<html><body><p>"), F.col("text"),
                 F.lit("</p></body></html>")).alias("text"),
    )
    replays = docs.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 20_000).alias("doc_id"),
        F.col("text"),
    )
    # "paraphrases": token order reversed — md5 differs (beats exact dedup)
    # and the 3-shingle set is destroyed (beats minhash), but the stored
    # EMBEDDING is identical, so only the ANN stage can catch them
    paraphrases = docs.filter(F.col("doc_id").between(100, 119)).select(
        (F.col("doc_id") + 30_000).alias("doc_id"),
        F.array_join(F.reverse(T.tokens("text")), " ").alias("text"),
    )
    batch = fresh.unionByName(replays).unionByName(paraphrases)
    batch_emb = emb.filter(F.col("vec_id") >= 400).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
    ).unionByName(
        emb.filter(F.col("vec_id").between(100, 119)).select(
            (F.col("vec_id") + 30_000).alias("vec_id"), "embedding")
    )

    return ingest(spark, batch, batch_emb, work)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="ingest_")
    spark = get_spark("ingest-increment")
    spark.sparkContext.setLogLevel("ERROR")
    report = run(spark, sf_dir, work)
    for k, v in report.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
