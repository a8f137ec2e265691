"""Tokenizer lab on pigpen_spark — the train/compare/pack loop a team
runs before committing to a tokenizer:

    raw documents
      → train BPE merges + unigram pieces + WordPiece (bpe / unigram /
        inventory                                      wordpiece)
      → encode the corpus with ALL THREE             (Arrow-batched)
      → compare fertility (pieces per word)          (one readout agg)
      → pack the winner's piece stream               (tokenize_pack)
      → audit shard balance + manifest the output    (shard_balance,
                                                      partition_checksums)

Run:  python examples/tokenizer_lab.py [sf_dir]

Training counts the corpus ONCE (the shared word histogram); encoding
and packing are Arrow-batched, shard-partitioned plans — at 100 TB the
same script runs unchanged on a cluster master.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from pigpen_spark import get_spark
from pigpen_spark.functions import bpe as B
from pigpen_spark.functions import pipeline as P
from pigpen_spark.functions import unigram as U
from pigpen_spark.functions import validate as V
from pigpen_spark.functions import wordpiece as W


def lab(spark, sf_dir: str) -> dict:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # -- train all three tokenizers (one corpus-sized histogram pass
    # each — the shared word_histogram groupBy) ------------------------
    merges = B.train_bpe(docs, "text", n_merges=60)
    pieces = U.train_unigram(docs, "text", vocab_size=48, em_rounds=2)
    wp_start, wp_cont = W.train_wordpiece(docs, "text", vocab_size=72)

    # -- encode the corpus with all three, compare fertility -----------
    bpe_enc = B.bpe_encode(docs, "doc_id", "text", merges)
    uni_enc = U.unigram_encode(docs, "doc_id", "text", pieces,
                               unk_score=-1500)
    wp_enc = W.wordpiece_encode(docs, "doc_id", "text", wp_start, wp_cont)
    # count words the way the encoders do: empty/whitespace-only docs are
    # 0 words (size(split('')) would say 1) and NULL text is 0 (F.size of
    # NULL is -1) — otherwise the fertility-ppm readout skews vs n_pieces
    n_words = docs.select(
        F.sum(F.size(F.filter(
            F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), " +"),
            lambda x: x != ""))).alias("w")
    ).collect()[0]["w"]
    bpe_pieces = bpe_enc.agg(F.sum("n_pieces")).collect()[0][0]
    uni_pieces = uni_enc.agg(F.sum("n_pieces")).collect()[0][0]
    wp_row = wp_enc.agg(F.sum("n_pieces"), F.sum("n_unk_words")).collect()[0]
    wp_pieces, wp_unks = int(wp_row[0]), int(wp_row[1])
    # WordPiece competes only if it actually covers the corpus — a low
    # piece count bought by collapsing words to [UNK] is not fertility
    cands = {"bpe": int(bpe_pieces), "unigram": int(uni_pieces)}
    if wp_unks == 0:
        cands["wordpiece"] = wp_pieces
    winner = min(sorted(cands), key=lambda k: cands[k])

    # -- pack the winner's piece stream into training rows -------------
    enc = {"unigram": uni_enc, "bpe": bpe_enc, "wordpiece": wp_enc}[winner]
    pieces_text = enc.select(
        F.col("id").alias("doc_id"),
        F.array_join("pieces", " ").alias("pieces"))
    packed = P.tokenize_pack(pieces_text, "doc_id", "pieces",
                             seq_len=64, shards=8)

    # -- audits: shard balance + output manifest -----------------------
    balance = P.shard_balance(
        pieces_text, "doc_id",
        F.size(F.split(F.trim("pieces"), " +")), shards=8).collect()
    masses = [r["tokens"] for r in balance]
    manifest = V.partition_checksums(
        packed.select(F.col("shard").cast("string").alias("shard"),
                      "seq_no", "n_tokens"),
        ["shard"]).collect()

    return {
        "n_words": int(n_words),
        "bpe_pieces": int(bpe_pieces),
        "unigram_pieces": int(uni_pieces),
        "wordpiece_pieces": wp_pieces,
        "wordpiece_unk_words": wp_unks,
        "bpe_fertility_ppm": int(bpe_pieces) * 1_000_000 // int(n_words),
        "unigram_fertility_ppm": int(uni_pieces) * 1_000_000 // int(n_words),
        "wordpiece_fertility_ppm": wp_pieces * 1_000_000 // int(n_words),
        "winner": winner,
        "packed_sequences": packed.count(),
        "shard_imbalance_ppm": (max(masses) - min(masses)) * 1_000_000
        // max(max(masses), 1),
        "manifest_partitions": len(manifest),
    }


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = lab(get_spark("tokenizer-lab"), sf)
    for k, v in out.items():
        print(f"{k}: {v}")
