"""Stream-static joins + the Relation API applied to streaming frames."""

import json

from pyspark.sql import functions as F

from pigpen_spark import fold
from pigpen_spark.relation import Relation
from pigpen_spark.streaming import core as st


def write_batch(path, rows, name):
    path.mkdir(parents=True, exist_ok=True)
    with open(path / f"{name}.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def drain(df, tmp_path, name, mode="append"):
    q = (
        df.writeStream.format("memory").queryName(name).outputMode(mode)
        .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)


def test_stream_static_join(spark, tmp_path):
    src = tmp_path / "ss1"
    write_batch(src, [
        {"user": "u1", "v": 1.0, "ts": "2024-01-01 00:00:00"},
        {"user": "u2", "v": 2.0, "ts": "2024-01-01 00:01:00"},
        {"user": "u9", "v": 9.0, "ts": "2024-01-01 00:02:00"},  # no dim row
    ], "b0")
    stream = st.read_stream_json(spark, str(src), "user string, v double, ts timestamp").df
    dim = spark.createDataFrame([("u1", "US"), ("u2", "DE")], "uid string, country string")
    joined = st.stream_static_join(stream, dim, on="user", right_on="uid", how="left")
    drain(joined.select("user", "country", "v"), tmp_path, "ssj")
    rows = {r["user"]: r["country"] for r in spark.sql("select * from ssj").collect()}
    assert rows == {"u1": "US", "u2": "DE", "u9": None}


def test_relation_api_on_stream(spark, tmp_path):
    # the same Relation operators run unchanged on a streaming frame
    src = tmp_path / "ss2"
    write_batch(src, [
        {"user": "a", "v": 4.0, "ts": "2024-01-01 00:00:00"},
        {"user": "a", "v": 6.0, "ts": "2024-01-01 00:01:00"},
        {"user": "b", "v": 1.0, "ts": "2024-01-01 00:02:00"},
    ], "b0")
    rel = st.read_stream_json(spark, str(src), "user string, v double, ts timestamp")
    assert isinstance(rel, Relation)
    out = (
        rel.filter(F.col("v") > 2)
        .map("user", doubled=F.col("v") * 2, ts=F.col("ts"))
        .group_by("user")
        .fold(total=fold.sum_("doubled"), n=fold.count())
    )
    drain(out.df, tmp_path, "ras", mode="complete")
    rows = {r["user"]: (r["total"], r["n"]) for r in spark.sql("select * from ras").collect()}
    assert rows == {"a": (20.0, 2)}


def test_stream_stream_join_inner_band(spark, tmp_path):
    # clicks join impressions on ad_id within a ±5 minute event-time band
    imp_src, clk_src = tmp_path / "imp", tmp_path / "clk"
    write_batch(imp_src, [
        {"ad_id": "a1", "imp_ts": "2024-01-01 00:00:00", "slot": "top"},
        {"ad_id": "a2", "imp_ts": "2024-01-01 00:00:30", "slot": "side"},
        {"ad_id": "a3", "imp_ts": "2024-01-01 00:01:00", "slot": "top"},
    ], "b0")
    write_batch(clk_src, [
        {"ad_id": "a1", "clk_ts": "2024-01-01 00:02:00"},   # in band
        {"ad_id": "a2", "clk_ts": "2024-01-01 00:30:00"},   # out of band
        {"ad_id": "a9", "clk_ts": "2024-01-01 00:02:30"},   # no impression
    ], "b0")
    imps = st.read_stream_json(spark, str(imp_src), "ad_id string, imp_ts timestamp, slot string").df
    clks = st.read_stream_json(spark, str(clk_src), "ad_id string, clk_ts timestamp").df
    joined = st.stream_stream_join(
        imps, clks, on="ad_id", left_ts="imp_ts", right_ts="clk_ts",
        tolerance="5 minutes", watermark="10 minutes",
    )
    drain(joined.select("ad_id", "slot", "clk_ts"), tmp_path, "ssj_inner")
    rows = [(r["ad_id"], r["slot"]) for r in spark.sql("select * from ssj_inner").collect()]
    assert rows == [("a1", "top")]


def test_stream_stream_join_left_outer(spark, tmp_path):
    imp_src, clk_src = tmp_path / "imp2", tmp_path / "clk2"
    write_batch(imp_src, [
        {"ad_id": "a1", "imp_ts": "2024-01-01 00:00:00"},
        {"ad_id": "a2", "imp_ts": "2024-01-01 00:00:30"},
    ], "b0")
    write_batch(clk_src, [
        {"ad_id": "a1", "clk_ts": "2024-01-01 00:01:00"},
    ], "b0")
    imps = st.read_stream_json(spark, str(imp_src), "ad_id string, imp_ts timestamp").df
    clks = st.read_stream_json(spark, str(clk_src), "ad_id string, clk_ts timestamp").df
    joined = st.stream_stream_join(
        imps, clks, on="ad_id", left_ts="imp_ts", right_ts="clk_ts",
        tolerance="2 minutes", watermark="1 minutes", how="left",
    )
    out, ck = tmp_path / "ssj_left_out", tmp_path / "ssj_left_ck"

    def drain_to_parquet():
        q = st.write_stream_parquet(joined, str(out), str(ck), available_now=True)
        q.awaitTermination(120)

    drain_to_parquet()
    # a2's null-padded row may only finalize in a batch AFTER the watermark
    # has moved past imp_ts + tolerance: feed a watermark-advancing event
    # and run the (checkpoint-resumed) query again.
    # ...on BOTH sides (the global watermark is the min across inputs),
    # and run once more: the advance registers at the end of one batch,
    # eviction+emission happen in the next.
    write_batch(clk_src, [{"ad_id": "zc", "clk_ts": "2024-01-01 09:00:00"}], "b1")
    write_batch(imp_src, [{"ad_id": "zi", "imp_ts": "2024-01-01 09:00:00"}], "b1")
    drain_to_parquet()
    drain_to_parquet()
    rows = {r["ad_id"]: r["clk_ts"] for r in spark.read.parquet(str(out)).collect()}
    assert {"a1", "a2"} <= set(rows)
    assert rows["a1"] is not None and rows["a2"] is None


def test_curate_stream_end_to_end(spark, tmp_path):
    """Streaming corpus curation: quality gate drops junk, watermarked
    exact dedup keeps first occurrence, split labels are the same
    deterministic hash assignment the batch pipeline uses."""
    import json as _json

    from pigpen_spark.functions.pipeline import split_by_hash
    from pigpen_spark.streaming import core as stc

    good = "the quick brown fox jumps of the lazy dog and it runs to town today"
    src = tmp_path / "cin"
    src.mkdir(parents=True, exist_ok=True)
    rows = [
        {"doc_id": 1, "text": good, "ts": "2024-01-01 00:00:01"},
        {"doc_id": 2, "text": good, "ts": "2024-01-01 00:00:02"},  # exact dup
        {"doc_id": 3, "text": "!!", "ts": "2024-01-01 00:00:03"},  # junk
        {"doc_id": 4, "text": good + " extra words here make it differ",
         "ts": "2024-01-01 00:00:04"},
    ]
    with open(src / "b0.json", "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
    rel = stc.read_stream_json(
        spark, str(src), "doc_id long, text string, ts timestamp"
    )
    out = stc.curate_stream(rel.df, "doc_id", "text", "ts")
    q = (
        out.writeStream.format("memory").queryName("curated")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"]: r["split"] for r in spark.sql("select * from curated").collect()}
    assert set(got) == {1, 4}  # dup 2 and junk 3 dropped
    # split labels match the batch assignment exactly
    batch = split_by_hash(
        spark.createDataFrame([(1,), (4,)], "doc_id long"), "doc_id",
        {"train": 0.9, "val": 0.05, "test": 0.05}, salt="cp",
    )
    expect = {r["doc_id"]: r["split"] for r in batch.collect()}
    assert got == expect


def test_curate_stream_model_gates(spark, tmp_path):
    """Classifier/LM gates are stateless per-row expressions, so they
    compose into the stream unchanged; an impossible margin threshold
    drops everything, and batch scores predict exactly who survives a
    real threshold."""
    import json as _json

    from pigpen_spark.functions.classify import hashed_linear_score
    from pigpen_spark.streaming import core as stc

    good = "the quick brown fox jumps of the lazy dog and it runs to town today"
    other = "a completely different sentence with many plain common words in it"
    src = tmp_path / "min"
    src.mkdir(parents=True, exist_ok=True)
    rows = [
        {"doc_id": 1, "text": good, "ts": "2024-01-01 00:00:01"},
        {"doc_id": 2, "text": other, "ts": "2024-01-01 00:00:02"},
    ]
    with open(src / "b0.json", "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
    margins = {r["doc_id"]: r["m"] for r in spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in rows], "doc_id long, text string"
    ).select("doc_id", hashed_linear_score("text").alias("m")).collect()}
    cut = sorted(margins.values())[1]  # keeps exactly the higher-margin doc
    rel = stc.read_stream_json(
        spark, str(src), "doc_id long, text string, ts timestamp"
    )
    out = stc.curate_stream(rel.df, "doc_id", "text", "ts",
                            min_quality=0.0, min_margin=cut)
    q = (
        out.writeStream.format("memory").queryName("gated")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "mck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"] for r in spark.sql("select * from gated").collect()}
    assert got == {d for d, m in margins.items() if m >= cut}
    assert len(got) == 1


def test_dedup_stream_incremental(spark, tmp_path):
    """Micro-batch MinHash dedup against a stored signature index:
    batch docs near-dup of the seed corpus are gated on estimated
    Jaccard; survivors' signatures append to the index, so a later
    batch is deduped against an earlier batch's survivors; within a
    batch the smallest id of a near-dup pair wins."""
    import json as _json

    from pigpen_spark.functions.dedup import minhash_index
    from pigpen_spark.streaming import core as stc

    base = ("the quick brown fox jumps over the lazy dog while the rain "
            "falls on the quiet green hills of the northern valley today")
    novel = ("completely different subject matter entirely about compilers "
             "and register allocation strategies in modern optimizing backends")
    novel2 = ("a third topic again unrelated to anything prior namely deep "
              "sea biology and the bioluminescent creatures of the abyss")

    # seed index: corpus doc 100 = base text
    corpus = spark.createDataFrame([(100, base)], "doc_id long, text string")
    idx = tmp_path / "index"
    minhash_index(corpus, "doc_id", "text").write.parquet(str(idx))

    src = tmp_path / "in"
    src.mkdir()
    # batch b0: 1 ≈ corpus dup; 2 novel; 3 ≈ 2 (within-batch pair → keep 2)
    with open(src / "b0.json", "w") as f:
        for r in [
            {"doc_id": 1, "text": base + " extra"},
            {"doc_id": 2, "text": novel},
            {"doc_id": 3, "text": novel + " ok"},
        ]:
            f.write(_json.dumps(r) + "\n")
    # batch b1: 4 ≈ batch-0 survivor 2 (cross-batch!); 5 novel
    with open(src / "b1.json", "w") as f:
        for r in [
            {"doc_id": 4, "text": novel + " tweaked"},
            {"doc_id": 5, "text": novel2},
        ]:
            f.write(_json.dumps(r) + "\n")
    # the file source orders ties by modification time — pin b0 first
    import os

    os.utime(src / "b0.json", (1_700_000_000, 1_700_000_000))
    os.utime(src / "b1.json", (1_700_000_100, 1_700_000_100))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = tmp_path / "out"
    q = stc.dedup_stream_incremental(
        stream, str(idx), str(out), str(tmp_path / "ck"),
        threshold=0.5, available_now=True,
    )
    q.awaitTermination(180)

    kept = {r["doc_id"] for r in spark.read.parquet(str(out)).collect()}
    assert kept == {2, 5}
    # the index grew by exactly the survivors
    idx_ids = {r["id"] for r in spark.read.parquet(str(idx)).collect()}
    assert idx_ids == {100, 2, 5}


def test_curate_stream_extract_markup(spark, tmp_path):
    """extract=True strips crawl markup BEFORE quality/dedup: a wrapped
    copy of a clean doc must dedup against the bare one (same digest
    after extraction), and script payloads must not pollute quality."""
    import json as _json

    from pigpen_spark.streaming import core as stc

    good = "the quick brown fox jumps of the lazy dog and it runs to town today"
    src = tmp_path / "ein"
    src.mkdir(parents=True, exist_ok=True)
    rows = [
        {"doc_id": 1, "text": good, "ts": "2024-01-01 00:00:01"},
        {"doc_id": 2, "text": f"<html><body><p>{good}</p></body></html>",
         "ts": "2024-01-01 00:00:02"},  # wrapped dup -> must dedup vs 1
        {"doc_id": 3, "text": "<script>junk();</script><b>!!</b>",
         "ts": "2024-01-01 00:00:03"},  # only junk survives extraction
    ]
    with open(src / "b0.json", "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
    rel = stc.read_stream_json(
        spark, str(src), "doc_id long, text string, ts timestamp")
    out = stc.curate_stream(rel.df, "doc_id", "text", "ts", extract=True)
    q = (
        out.writeStream.format("memory").queryName("extracted")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "eck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"] for r in spark.sql("select * from extracted").collect()}
    assert got == {1}


def test_boilerplate_stream_cumulative_ban(spark, tmp_path):
    """Cross-batch span frequencies: 'x y' reaches min_docs=3 only in
    batch 1, so batch-0 docs keep it (monotone online semantics) and
    batch-1 docs lose it; unique spans always survive."""
    import json as _json

    from pigpen_spark.streaming import core as stc

    src = tmp_path / "bin"
    src.mkdir()
    freq, out, ck = (str(tmp_path / p) for p in ("freq", "out", "ck"))

    def drain():
        rel = stc.read_stream_json(spark, str(src), "doc_id long, text string")
        q = stc.boilerplate_stream(rel.df, "doc_id", "text", freq, out, ck,
                                   chunk=2, min_docs=3, available_now=True)
        q.awaitTermination(120)

    with open(src / "b0.json", "w") as f:
        for r in [{"doc_id": 1, "text": "x y a b"},
                  {"doc_id": 2, "text": "x y c d"}]:
            f.write(_json.dumps(r) + "\n")
    drain()
    with open(src / "b1.json", "w") as f:
        for r in [{"doc_id": 3, "text": "x y e f"},
                  {"doc_id": 4, "text": "g h i j"}]:
            f.write(_json.dumps(r) + "\n")
    drain()
    got = {r.doc_id: (r.clean_text, r.n_removed)
           for r in spark.read.parquet(out).collect()}
    assert got[1] == ("x y a b", 0)   # banned only later; no retro-edit
    assert got[2] == ("x y c d", 0)
    assert got[3] == ("e f", 1)       # cumulative count hit 3 this batch
    assert got[4] == ("g h i j", 0)
    # frequency table carries the cumulative counts
    freqs = {r.c: r.n for r in
             spark.read.parquet(f"{freq}/v1").collect()}
    assert freqs["x y"] == 3


def test_parquet_versions_ignores_and_clears_partial_writes(spark, tmp_path):
    """A version dir without _SUCCESS is a crashed write: it must not
    count as applied (that would base cumulative state on partial data
    or wedge errorifexists retries) and must be cleared for rewrite."""
    from pigpen_spark.streaming.core import _parquet_versions

    base = tmp_path / "state"
    spark.createDataFrame([(1,)], "x long").write.parquet(str(base / "v0"))
    (base / "v1").mkdir()                       # partial: no _SUCCESS
    (base / "v1" / "part-0.parquet").write_bytes(b"junk")
    (base / "ignored").mkdir()
    assert _parquet_versions(str(base)) == [0]
    assert not (base / "v1").exists()           # cleared for retry
    assert (base / "ignored").exists()          # non-version dirs untouched


def test_boilerplate_stream_sink_is_batch_keyed(spark, tmp_path):
    """The sink writes batch=N subdirectories with _SUCCESS markers —
    the replay-idempotence contract (a bare append would duplicate a
    replayed batch)."""
    import json as _json

    from pigpen_spark.streaming import core as stc

    src = tmp_path / "bk"
    src.mkdir()
    freq, out, ck = (str(tmp_path / p) for p in ("f2", "o2", "c2"))
    with open(src / "b0.json", "w") as f:
        f.write(_json.dumps({"doc_id": 1, "text": "a b c d"}) + "\n")
    rel = stc.read_stream_json(spark, str(src), "doc_id long, text string")
    q = stc.boilerplate_stream(rel.df, "doc_id", "text", freq, out, ck,
                               chunk=2, min_docs=2, available_now=True)
    q.awaitTermination(120)
    from pathlib import Path as _P
    assert (_P(out) / "batch=0" / "_SUCCESS").exists()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1 and rows[0].clean_text == "a b c d"


def test_boilerplate_stream_min_docs_guard(spark, tmp_path):
    import pytest

    from pigpen_spark.streaming import core as stc

    rel = stc.read_stream_rate(spark, 1)
    with pytest.raises(ValueError):
        stc.boilerplate_stream(rel.df, "value", "value", "x", "y", "z",
                               min_docs=1)
