"""Multimodal curation pipeline on pigpen_spark: triage → decode → gate.

The production order of operations for a mixed media corpus, composed
from engine operators:

    binary payloads (here: synthesized PNG/JPEG/WAV/GIF/MJPEG-mp4)
      → container/codec triage at header speed      (video_meta /
        decode_image_meta — no entropy decode)
      → REAL decode of the decodable media           (image_stats,
        audio_features_wav, frame_sample_gif, frame_sample_mp4)
      → quality gates on decoded numbers             (Relation.filter:
        resolution floor, duration band, frame budget)
      → per-source accounting                        (group_by + fold)

Run:  python examples/multimodal_curate.py [sf_dir]

Everything decode-side runs inside Arrow-batched mapInPandas with the
payloads executor-local; the fused synth_* variants show the
one-crossing form the benchmark uses.  At 100 TB the synth stage is
replaced by `spark.read.format("binaryFile")` or a parquet binary
column — every downstream stage is unchanged.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from pigpen_spark.functions import multimodal as M  # noqa: E402
from pigpen_spark.relation import Relation  # noqa: E402
from pigpen_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("multimodal-curate")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")

    # 1. triage pass: container metadata only (header speed, no decode)
    clips = M.synth_mjpeg(docs, "doc_id")
    meta = M.video_meta(clips, "id")
    decodable = meta.filter(F.col("codec") == "jpeg")
    print("triage: mjpeg-decodable clips:", decodable.count(),
          "of", meta.count())

    # 2. real frame decode of what triage admitted, with a frame budget
    frames = M.frame_sample_mp4(
        clips.join(decodable.select("id"), "id"), "id", every_n=2)
    print("sampled frames:", frames.count())

    # 3. image decode + resolution gate (fused one-crossing form)
    imgs = M.synth_image_stats(docs, "doc_id", fmt="png")
    kept_imgs = Relation(imgs).filter(
        (F.col("width") >= 10) & (F.col("height") >= 10))
    print("images passing the resolution floor:",
          kept_imgs.df.count(), "of", imgs.count())

    # 4. audio decode + duration band
    audio = M.synth_audio_stats(docs, "doc_id")
    kept_audio = Relation(audio).filter(F.col("duration_ms").between(13, 18))
    print("audio passing the duration band:", kept_audio.df.count())

    # 5. per-modality accounting in one fold pass each
    acct = (
        Relation(imgs).group_by(F.lit("image").alias("modality"))
        .fold(n=F.count(F.lit(1)), px=F.sum("px_sum")).df
        .unionByName(
            Relation(audio).group_by(F.lit("audio").alias("modality"))
            .fold(n=F.count(F.lit(1)), px=F.sum("sample_sum")).df)
    )
    acct.show(truncate=False)

    # 6. (round 5) the OTHER containers, same triage-then-decode order:
    #    Matroska MJPEG decodes frames for real; MP3 profiles at header
    #    speed through the Xing/VBRI fast path
    mkv_frames = M.synth_frame_stats_webm(docs.limit(500), "doc_id", every_n=2)
    print("matroska frames sampled:", mkv_frames.count())
    vbr = M.synth_audio_profile_vbr(docs.limit(500), "doc_id")
    fast_exact = vbr.filter(
        F.col("duration_ms_walk") - F.col("duration_ms_fast") >= 0).count()
    print("mp3 VBR streams profiled (header fast path):", fast_exact)

    # 7. (round 5) the flagship end-to-end: mixed png/jpeg/gif decode →
    #    brightness gate → fingerprint dedup → pixel-budget packing
    stats = M.synth_mixed_image_stats(docs.limit(500), "doc_id")
    packed = M.image_curation_pack(stats, "id")
    packed.orderBy("shard", "seq_no").show(8, truncate=60)
    spark.stop()


if __name__ == "__main__":
    main()
