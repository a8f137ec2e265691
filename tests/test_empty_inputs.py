"""Degenerate-input sweep: every text/dedup/similarity operator must
survive empty strings, whitespace-only docs, and empty relations without
raising (Spark 4 ANSI mode turns sloppy division/cast into runtime
crashes — this is the regression net for that class of bug)."""

import pytest
from pyspark.sql import functions as F

from pigpen_spark.functions import dedup as D
from pigpen_spark.functions import similarity as S
from pigpen_spark.functions import text as T


@pytest.fixture()
def degenerate_docs(spark):
    return spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "x"), (4, "normal text with some words here")],
        "doc_id long, text string",
    )


TEXT_EXPRS = [
    ("token_count", T.token_count),
    ("bpe_token_count", T.bpe_token_count),
    ("lang_id", T.lang_id),
    ("punct_ratio", T.punct_ratio),
    ("digit_ratio", T.digit_ratio),
    ("stopword_ratio", T.stopword_ratio),
    ("mean_token_len", T.mean_token_len),
    ("quality_score", T.quality_score),
    ("fingerprint", T.fingerprint),
    ("shingle_fingerprint", T.shingle_fingerprint),
    ("simhash", D.simhash),
    ("minhash_signature", lambda c: D.minhash_signature(c, k=4)),
]


@pytest.mark.parametrize("name,builder", TEXT_EXPRS, ids=[n for n, _ in TEXT_EXPRS])
def test_text_expr_survives_degenerate_docs(spark, degenerate_docs, name, builder):
    rows = degenerate_docs.select("doc_id", builder("text").alias("out")).collect()
    assert len(rows) == 4  # no exception; values may be NULL for empty docs


def test_dedup_ops_on_degenerate_docs(degenerate_docs):
    assert D.exact_dedup(degenerate_docs, "text", "doc_id").count() == 4
    D.minhash_candidates(degenerate_docs, "doc_id", "text").collect()
    D.simhash_candidates(degenerate_docs, "doc_id", "text").collect()
    D.ngram_jaccard_pairs(degenerate_docs, "doc_id", "text").collect()


def test_similarity_zero_vectors(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 2.0]), (2, [3.0, 4.0])],
        "vec_id long, embedding array<float>",
    )
    # zero-norm vector: cosine NULL, must not raise, must not rank
    out = S.brute_force_topk(df, df, k=2).collect()
    assert all(r["q_id"] is not None for r in out)
    pairs = S.embedding_near_dup_pairs(df, threshold=0.5).collect()
    assert all(r["score"] is not None for r in pairs)


def test_empty_relation_through_operators(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert D.exact_dedup(empty, "text", "doc_id").count() == 0
    assert D.minhash_candidates(empty, "doc_id", "text").count() == 0
    out = empty.select(T.quality_score("text").alias("q"))
    assert out.collect() == []
