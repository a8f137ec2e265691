"""Post-training (SFT) data preparation on pigpen_spark.

The conversation half of the corpus story — raw interaction events to
model-ready packed sequences:

    event stream
      → multi-turn conversation assembly        (windows.assemble_conversations)
      → structural gates: turn count, role
        alternation, wall-clock span            (plain filters on the stats)
      → exact transcript dedup (keep min id)    (dedup.exact_keep)
      → near-dup transcript pairs for audit     (dedup.winnow_overlap_pairs)
      → fixed-length sequence packing           (pipeline.tokenize_pack)

Every stage is a lazy DataFrame plan; the streaming twin
(streaming.conversation_stream) feeds the same gates live because it
assembles THROUGH the same batch operator.

Run:  python examples/sft_prep.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from pigpen_spark import get_spark
from pigpen_spark.catalog import tables
from pigpen_spark.functions import dedup as D
from pigpen_spark.functions import pipeline as P
from pigpen_spark.operators.windows import assemble_conversations


def prep(spark, sf_dir: str, min_turns: int = 2, max_repeat_ratio_ppm: int = 500_000,
         seq_len: int = 64) -> dict:
    events = tables(spark, sf_dir)["events"].df

    # 1. assemble conversations (30-min sessions, deterministic order)
    convs = assemble_conversations(
        events, "user_id", "ts", "event_type", "props", "event_id",
        gap_seconds=1800).cache()

    # 2. structural gates an SFT pipeline applies before any model sees
    #    the data: enough turns, bounded same-role runs
    gated = convs.filter(
        (F.col("n_turns") >= min_turns)
        & (F.col("n_role_repeats") * 1_000_000
           <= F.lit(max_repeat_ratio_ppm) * F.col("n_turns")))

    # 3. exact transcript dedup — identical conversations collapse
    deduped = D.exact_keep(gated, "transcript", "session_id").cache()

    # 4. near-dup audit: winnowed fingerprints over transcripts surface
    #    template-generated conversations sharing long spans
    near = D.winnow_overlap_pairs(
        deduped.select(F.col("session_id").alias("doc_id"),
                       F.col("transcript").alias("text")),
        "doc_id", "text", shingle_n=3, w=4, min_shared=3, max_df=50)

    # 5. pack the surviving transcripts into fixed-length id sequences
    packed = P.tokenize_pack(
        deduped.select("session_id", "transcript"),
        "session_id", "transcript", seq_len=seq_len)

    # 5b. NO-SPLIT sample packing (r10): an SFT example must not
    #     straddle sequences — a truncated conversation is a corrupted
    #     training example — so the greedy walk closes a sequence when
    #     the next transcript would overflow, and oversize transcripts
    #     sit alone (flagged, never silently cut).  Sharded by a
    #     session-hash key so the sequential walk parallelizes.
    from pigpen_spark.functions.text import token_count

    no_split = P.pack_greedy(
        deduped.select(
            "session_id",
            F.pmod(F.crc32(F.col("session_id").cast("string")), F.lit(8))
            .alias("shard"),
            token_count("transcript").alias("n_tokens"),
        ),
        "n_tokens", order_by=["session_id"], capacity=seq_len,
        partition_by=["shard"],
    ).cache()
    oversize = no_split.filter(F.col("n_tokens") > seq_len).count()
    n_chunks = no_split.select("shard", "chunk_id").distinct().count()

    return {
        "conversations": convs.count(),
        "after_gates": gated.count(),
        "after_exact_dedup": deduped.count(),
        "near_dup_pairs": near.count(),
        "packed_sequences": packed.count(),
        "full_sequences": packed.filter(F.col("n_tokens") == seq_len).count(),
        "no_split_sequences": n_chunks,
        "oversize_transcripts": oversize,
    }


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("sft-prep")
    spark.sparkContext.setLogLevel("ERROR")
    print(prep(spark, sf))
