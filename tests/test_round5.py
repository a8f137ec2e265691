"""Round-5 additions: density-auto LSH sizing, Matroska frame decode,
MP3 VBR headers, giant-group auto-fallback, flagship multimodal pipeline.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pigpen_spark.functions import similarity as S
from pigpen_spark.tuning import lsh_planes_for


class TestLshPlanesAuto:
    def test_integer_exact_formula(self):
        # ceil(log2(ceildiv(n, target))) identity vs the float form
        import math

        for n in [1, 199, 200, 201, 399, 400, 401, 500, 2000, 6400, 6401,
                  20000, 10**6, 10**9, 2**40]:
            for t in [1, 32, 200]:
                got = lsh_planes_for(n, t, floor=0, cap=64)
                want = max(0, min(64, math.ceil(math.log2(max(n / t, 1.0)))))
                assert got == want, (n, t, got, want)

    def test_clamps(self):
        assert lsh_planes_for(1) == 8          # floor
        assert lsh_planes_for(10**12) == 32    # cap (2^32 buckets)
        assert lsh_planes_for(500, 32, floor=4, cap=12) == 4
        assert lsh_planes_for(2000, 32, floor=4, cap=12) == 6
        assert lsh_planes_for(20000, 32, floor=4, cap=12) == 10

    def test_rejects_bad_inputs(self):
        with pytest.raises(ValueError):
            lsh_planes_for(0)
        with pytest.raises(ValueError):
            lsh_planes_for(100, 0)

    def test_bucket_prefix_property(self, spark):
        # lsh_bucket at n planes == n-char prefix of the bucket at cap
        # planes (what lets the oracle substr the cap-length bucket)
        df = spark.createDataFrame(
            [(i, [float(i * 7 % 13 - 6 + d % 5) for d in range(8)])
             for i in range(20)],
            "id long, v array<double>",
        )
        out = df.select(
            S.lsh_bucket(F.col("v"), 4, 8).alias("b4"),
            S.lsh_bucket(F.col("v"), 12, 8).alias("b12"),
        ).collect()
        for r in out:
            assert r["b12"][:4] == r["b4"]

    def test_resolve_planes_auto_sizing(self, spark):
        df = spark.range(500).select(
            F.col("id"), F.array(F.lit(1.0)).alias("v"))
        assert S.resolve_planes("auto", df, 32, 4, 12) == 4
        assert S.resolve_planes(7, df, 32, 4, 12) == 7  # explicit passthrough

    def test_lsh_topk_auto_end_to_end(self, spark):
        # n_planes="auto" resolves from the corpus count and produces a
        # valid top-k (candidates only within buckets, rank <= k)
        import random

        rng = random.Random(5)
        df = spark.createDataFrame(
            [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)],
            "vec_id long, embedding array<double>",
        )
        out = S.lsh_topk(df, k=3, n_planes="auto", dim=8,
                         auto_sizing=(16, 2, 10)).collect()
        assert out, "auto-sized LSH returned no candidates"
        assert all(r["rank"] <= 3 for r in out)

    def test_plane_stride_anchors_tables(self, spark):
        # with plane_stride=cap, table 1's bucket at auto planes is a
        # prefix of the cap-length bucket at offset cap — i.e. the plane
        # family is fixed regardless of the resolved count
        df = spark.createDataFrame(
            [(i, [float((i * 11 + d * 3) % 9 - 4) for d in range(8)])
             for i in range(10)],
            "id long, v array<double>",
        )
        out = df.select(
            S.lsh_bucket(F.col("v"), 4, 8, plane_offset=12).alias("short"),
            S.lsh_bucket(F.col("v"), 12, 8, plane_offset=12).alias("full"),
        ).collect()
        for r in out:
            assert r["full"][:4] == r["short"]


def _mjpeg_samples(n, bw, bh, a):
    import numpy as np

    from pigpen_spark.functions import codecs as C

    samples, sums = [], []
    for f in range(n):
        blocks = a + f + np.arange(bw)[None, :] + np.arange(bh)[:, None]
        img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1).astype("uint8")
        samples.append(C.jpeg_encode(img))
        sums.append(int(img.sum(dtype="int64")))
    return samples, sums


class TestWebmFrames:
    def test_roundtrip_multi_cluster(self):
        from pigpen_spark.functions import codecs as C

        samples, sums = _mjpeg_samples(5, 2, 3, 40)
        data = C.webm_encode_mjpeg(samples, 16, 24, fps=24, cluster_len=2)
        w, h, frames = C.webm_frames(data)
        assert (w, h) == (16, 24)
        assert [int(f.sum(dtype="int64")) for f in frames] == sums
        # 5 frames at cluster_len=2 really spans 3 clusters
        assert data.count(bytes.fromhex("1F43B675")) == 3

    def test_blockgroup_block_form(self):
        # demuxer accepts Block-inside-BlockGroup, not just SimpleBlock
        import struct

        from pigpen_spark.functions import codecs as C

        samples, sums = _mjpeg_samples(2, 1, 1, 10)
        blk0 = b"\x81" + struct.pack(">h", 0) + b"\x80" + samples[0]
        blk1 = b"\x81" + struct.pack(">h", 41) + b"\x80" + samples[1]
        body = (C._el_uint(0xE7, 0)
                + C._el(0xA0, C._el(0xA1, blk0))
                + C._el(0xA0, C._el(0xA1, blk1)))
        ebml = C._el(0x1A45DFA3, C._el(0x4282, b"matroska"))
        info = C._el(0x1549A966, C._el_uint(0x2AD7B1, 1_000_000)
                     + C._el(0x4489, struct.pack(">d", 83.0)))
        track = C._el(0xAE, C._el_uint(0xD7, 1) + C._el_uint(0x83, 1)
                      + C._el(0x86, b"V_MJPEG")
                      + C._el(0xE0, C._el_uint(0xB0, 8) + C._el_uint(0xBA, 8)))
        seg = C._el(0x18538067, info + C._el(0x1654AE6B, track)
                    + C._el(0x1F43B675, body))
        w2, h2, frames2 = C.webm_frames(ebml + seg)
        assert [int(f.sum(dtype="int64")) for f in frames2] == sums
        assert (w2, h2) == (8, 8)

    def test_timecode_order_not_storage_order(self):
        # blocks stored out of presentation order come back sorted by
        # cluster+block timecode
        import struct

        from pigpen_spark.functions import codecs as C

        samples, sums = _mjpeg_samples(2, 1, 2, 20)
        blk_late = b"\x81" + struct.pack(">h", 41) + b"\x80" + samples[1]
        blk_early = b"\x81" + struct.pack(">h", 0) + b"\x80" + samples[0]
        body = C._el_uint(0xE7, 0) + C._el(0xA3, blk_late) + C._el(0xA3, blk_early)
        ebml = C._el(0x1A45DFA3, C._el(0x4282, b"matroska"))
        info = C._el(0x1549A966, C._el_uint(0x2AD7B1, 1_000_000)
                     + C._el(0x4489, struct.pack(">d", 83.0)))
        track = C._el(0xAE, C._el_uint(0xD7, 1) + C._el_uint(0x83, 1)
                      + C._el(0x86, b"V_MJPEG")
                      + C._el(0xE0, C._el_uint(0xB0, 8) + C._el_uint(0xBA, 16)))
        seg = C._el(0x18538067, info + C._el(0x1654AE6B, track)
                    + C._el(0x1F43B675, body))
        _, _, frames = C.webm_frames(ebml + seg)
        assert [int(f.sum(dtype="int64")) for f in frames] == sums

    def test_other_track_blocks_skipped(self):
        import struct

        from pigpen_spark.functions import codecs as C

        samples, sums = _mjpeg_samples(1, 1, 1, 30)
        vid = b"\x81" + struct.pack(">h", 0) + b"\x80" + samples[0]
        aud = b"\x82" + struct.pack(">h", 0) + b"\x80" + b"\x00\x01garbage"
        body = C._el_uint(0xE7, 0) + C._el(0xA3, aud) + C._el(0xA3, vid)
        ebml = C._el(0x1A45DFA3, C._el(0x4282, b"matroska"))
        info = C._el(0x1549A966, C._el_uint(0x2AD7B1, 1_000_000)
                     + C._el(0x4489, struct.pack(">d", 41.0)))
        tracks = (C._el(0xAE, C._el_uint(0xD7, 1) + C._el_uint(0x83, 1)
                        + C._el(0x86, b"V_MJPEG")
                        + C._el(0xE0, C._el_uint(0xB0, 8) + C._el_uint(0xBA, 8)))
                  + C._el(0xAE, C._el_uint(0xD7, 2) + C._el_uint(0x83, 2)
                          + C._el(0x86, b"A_OPUS")))
        seg = C._el(0x18538067, info + C._el(0x1654AE6B, tracks)
                    + C._el(0x1F43B675, body))
        _, _, frames = C.webm_frames(ebml + seg)
        assert [int(f.sum(dtype="int64")) for f in frames] == sums

    def test_refusals(self):
        import struct

        import pytest

        from pigpen_spark.functions import codecs as C

        samples, _ = _mjpeg_samples(1, 1, 1, 5)
        with pytest.raises(ValueError):
            C.webm_frames(b"\x00" * 16)                  # no EBML magic
        with pytest.raises(ValueError):
            C.webm_encode_mjpeg([], 8, 8)                # empty clip
        # VP9 skeleton (no MJPEG track) raises
        skel = C.webm_encode_skeleton(1000, [
            {"handler": "vide", "codec": "V_VP9", "width": 64, "height": 64,
             "fps": 25}])
        with pytest.raises(ValueError):
            C.webm_frames(skel)
        # laced block refused loudly
        laced = b"\x81" + struct.pack(">h", 0) + b"\x06" + samples[0]
        body = C._el_uint(0xE7, 0) + C._el(0xA3, laced)
        ebml = C._el(0x1A45DFA3, C._el(0x4282, b"matroska"))
        info = C._el(0x1549A966, C._el_uint(0x2AD7B1, 1_000_000)
                     + C._el(0x4489, struct.pack(">d", 41.0)))
        track = C._el(0xAE, C._el_uint(0xD7, 1) + C._el_uint(0x83, 1)
                      + C._el(0x86, b"V_MJPEG")
                      + C._el(0xE0, C._el_uint(0xB0, 8) + C._el_uint(0xBA, 8)))
        seg = C._el(0x18538067, info + C._el(0x1654AE6B, track)
                    + C._el(0x1F43B675, body))
        with pytest.raises(ValueError):
            C.webm_frames(ebml + seg)

    def test_frame_sample_webm_operator(self, spark):
        from pigpen_spark.functions import multimodal as M

        ids = spark.range(8).withColumnRenamed("id", "doc_id")
        payloads = M.synth_webm_mjpeg(ids, "doc_id")
        out = M.frame_sample_webm(payloads, "id", every_n=2).collect()
        fused = M.synth_frame_stats_webm(ids, "doc_id", every_n=2).collect()
        assert sorted([tuple(r) for r in out], key=lambda t: t[:2]) == \
            sorted([tuple(r) for r in fused], key=lambda t: t[:2])
        assert out, "no frames sampled"


class TestMp3Vbr:
    def test_xing_and_vbri_roundtrip(self):
        from pigpen_spark.functions import codecs as C

        for hdr in ("xing", "vbri"):
            idxs = [9, 12, 10, 14, 9]
            data = C.mp3_encode_vbr(5, 1, idxs, header=hdr)
            info = C.mp3_vbr_info(data)
            assert info["method"] == hdr
            assert info["n_frames"] == 5
            # bytes field covers header frame + music chain exactly
            assert info["n_bytes"] == len(data) - C._mp3_id3_skip(data)
            fast = C.mp3_meta_fast(data)
            walk = C.mp3_meta(data)
            assert fast["n_frames"] == 5 and walk["n_frames"] == 6
            assert fast["duration_ms"] == 5 * 1152 * 1000 // 48000
            assert walk["vbr"] is True

    def test_info_tag_cbr(self):
        # 'Info' magic (LAME's CBR variant of Xing) parses identically
        from pigpen_spark.functions import codecs as C

        data = bytearray(C.mp3_encode_vbr(4, 0, header="xing"))
        pos = C._mp3_id3_skip(bytes(data))
        p = pos + 4 + 32
        assert bytes(data[p:p + 4]) == b"Xing"
        data[p:p + 4] = b"Info"
        info = C.mp3_vbr_info(bytes(data))
        assert info["method"] == "xing" and info["n_frames"] == 4

    def test_chain_fallback_no_header(self):
        from pigpen_spark.functions import codecs as C

        data = C.mp3_encode_skeleton(9, 2)
        fast = C.mp3_meta_fast(data)
        assert fast["method"] == "chain" and fast["n_frames"] == 9
        assert fast["duration_ms"] == C.mp3_meta(data)["duration_ms"]

    def test_corrupt_header_frame_raises_on_walk(self):
        import pytest

        from pigpen_spark.functions import codecs as C

        data = bytearray(C.mp3_encode_vbr(3, 0, header="vbri"))
        # corrupt the SECOND frame's sync header (first music frame):
        # the walk must break the chain loudly; the fast path, which
        # never visits it, still answers from the VBRI header
        pos = C._mp3_id3_skip(bytes(data))
        fb, _, _, _ = C.mp3_frame_header(bytes(data), pos)
        data[pos + fb] = 0x00
        fast = C.mp3_meta_fast(bytes(data))
        assert fast["method"] == "vbri" and fast["n_frames"] == 3
        with pytest.raises(ValueError):
            C.mp3_meta(bytes(data))

    def test_rejects_bad_args(self):
        import pytest

        from pigpen_spark.functions import codecs as C

        with pytest.raises(ValueError):
            C.mp3_encode_vbr(3, 0, header="toc")
        with pytest.raises(ValueError):
            C.mp3_encode_vbr(3, 0, header="xing", header_bitrate_idx=0)

    def test_operator_parity(self, spark):
        from pigpen_spark.functions import multimodal as M

        ids = spark.range(10).withColumnRenamed("id", "doc_id")
        fused = M.synth_audio_profile_vbr(ids, "doc_id").collect()
        assert len(fused) == 10
        for r in fused:
            assert r["n_frames_walk"] == r["n_frames_fast"] + 1
            assert r["method"] in ("xing", "vbri")


class TestMultimodalPipeline:
    def test_stage_discrimination(self, spark):
        # every stage must actually do work on a 500-id corpus
        from pigpen_spark.functions import multimodal as M

        ids = spark.range(500).withColumnRenamed("id", "doc_id")
        stats = M.synth_mixed_image_stats(ids, "doc_id")
        n_all = stats.count()
        gated = stats.filter(
            (F.least("width", "height") >= 8)
            & (F.col("px_sum") < 70 * F.col("width") * F.col("height") * F.col("channels")))
        n_gated = gated.count()
        kept = M.image_curation_pack(stats, "id")
        rows = kept.collect()
        n_kept = sum(r["n_images"] for r in rows)
        assert n_all == 500
        assert 0 < n_gated < n_all, "gate is vacuous"
        assert 0 < n_kept < n_gated, "dedup removed nothing"
        # packing respects the budget: every sequence STARTS under budget
        # (an image may straddle the boundary, tokenize_pack semantics)
        for r in rows:
            assert r["n_images"] >= 1
        # membership string is id-ordered
        for r in rows:
            ids_ = [int(x) for x in r["doc_ids"].split(",")]
            assert ids_ == sorted(ids_)

    def test_mixed_decode_matches_direct(self):
        from pigpen_spark.functions import multimodal as M

        for i in range(12):
            r = M._mm_stats_row(i, M._mm_payload(i))
            assert r["width"] > 0 and r["px_sum"] >= 0
            # format cycle: png/jpeg/gif channels 3/1/3
            assert r["channels"] == (1 if i % 3 == 1 else 3)


class TestRound5Rows:
    def test_minhash_sig_set_semantics(self, spark):
        # the signature is a function of the shingle SET: repeating and
        # reordering the shingle hashes changes nothing (what makes a
        # persisted signature reusable by every downstream consumer)
        from pigpen_spark.functions import dedup as D

        hs = [11, 7, 42, 99, 7, 11, 42]
        df = spark.createDataFrame(
            [(1, hs), (2, list(reversed(hs)) + hs)],
            "doc_id long, hs array<long>",
        )
        out = df.select(
            "doc_id",
            F.array_join(F.transform(
                D.minhash_from_hashes(F.col("hs"), k=12),
                lambda h: h.cast("string")), ",").alias("sig"),
        ).collect()
        sigs = {r["doc_id"]: r["sig"] for r in out}
        assert sigs[1] == sigs[2]

    def test_minhash_sig_matches_sigs_cte_family(self, spark):
        # the materialized signature equals what the banded-candidate
        # path computes (same minhash_signature expression)
        from pigpen_spark.functions import dedup as D

        df = spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog")],
            "doc_id long, text string",
        )
        a = df.select(D.minhash_signature(F.col("text"), k=12, shingle_n=3)
                      .alias("sig")).collect()[0]["sig"]
        b = df.select(D.minhash_from_hashes(
            D.shingle_hashes(D.token_hashes(F.col("text")), 3), k=12)
            .alias("sig")).collect()[0]["sig"]
        assert len(a) == 12 and a == b

    def test_session_stats_model(self, spark):
        from pigpen_spark.operators.windows import session_stats

        rows = [
            (1, 0), (1, 100), (1, 3000),       # user 1: 2 sessions (2 ev, 1 ev)
            (2, 0),                            # user 2: 1 bounce
        ]
        df = spark.createDataFrame(rows, "user_id long, ts long")
        out = {r["user_id"]: r for r in
               session_stats(df, "user_id", "ts", gap_seconds=1800).collect()}
        assert out[1]["n_sessions"] == 2
        assert out[1]["n_events"] == 3
        assert out[1]["bounces"] == 1
        assert out[1]["max_session_events"] == 2
        assert out[1]["max_duration_s"] == 100   # numeric ts: caller's unit
        assert out[2]["bounces"] == 1 and out[2]["max_duration_s"] == 0

    def test_vocab_coverage_model(self, spark):
        from pigpen_spark.functions import pipeline as P

        df = spark.createDataFrame(
            [(1, "a a a b b c")], "doc_id long, text string")
        out = {r["vocab_size"]: r for r in
               P.vocab_coverage(df, "text", sizes=(1, 2, 3)).collect()}
        assert out[1]["covered_tokens"] == 3        # top-1 = 'a'
        assert out[2]["covered_tokens"] == 5
        assert out[3]["covered_tokens"] == 6
        assert out[3]["coverage_ppm"] == 1_000_000
        assert out[1]["coverage_ppm"] == 500_000
        assert all(r["n_types"] == 3 and r["total_tokens"] == 6
                   for r in out.values())

    def test_vocab_coverage_empty_and_bad_args(self, spark):
        from pigpen_spark.functions import pipeline as P

        df = spark.createDataFrame([(1, "")], "doc_id long, text string")
        out = P.vocab_coverage(df, "text", sizes=(4,)).collect()
        assert len(out) == 1
        assert out[0]["total_tokens"] == 0 and out[0]["coverage_ppm"] is None
        with pytest.raises(ValueError):
            P.vocab_coverage(df, "text", sizes=())
        with pytest.raises(ValueError):
            P.vocab_coverage(df, "text", sizes=(0,))


class TestAutoStreamDispatch:
    """VERDICT r4 next #6: data-driven fast/stream escalation.  The
    'tight memory cap' is simulated INSIDE accumulate: a guard raises
    MemoryError on any chunk over the cap — the whole-group default
    path must trip it on a giant key, the auto path must escalate to
    the chunked stream and succeed."""

    CAP = 20_000

    @staticmethod
    def _trio(cap):
        def init(key):
            return {"n": 0, "s": 0}

        def accumulate(st, chunk):
            if len(chunk) > cap:
                raise MemoryError(
                    f"chunk of {len(chunk)} rows over the {cap}-row cap")
            st["n"] += len(chunk)
            st["s"] += int(chunk["v"].sum())
            return st

        def finish(key, st):
            return {"k": key[0], "n": st["n"], "s": st["s"]}

        return init, accumulate, finish

    def _giant(self, spark):
        # one 60k-row key + a few small ones
        from pigpen_spark.relation import Relation

        df = spark.range(60_000).select(
            F.lit(1).alias("g"), F.col("id").alias("v"),
        ).unionAll(spark.range(50).select(
            (F.col("id") % 5 + 2).alias("g"), F.col("id").alias("v")))
        return Relation(df)

    def test_default_path_trips_memory_cap(self, spark):
        from py4j.protocol import Py4JJavaError  # noqa: F401

        init, accumulate, finish = self._trio(self.CAP)

        def whole(key, pdf):
            import pandas as pd

            st = accumulate(init(key), pdf.rename(columns={"v": "v"}))
            return pd.DataFrame([finish(key, st)])

        rel = self._giant(spark)
        with pytest.raises(Exception, match="MemoryError|over the"):
            rel.group_by("g").apply_py(whole, "k long, n long, s long").df.collect()

    def test_auto_path_escalates_and_succeeds(self, spark):
        init, accumulate, finish = self._trio(self.CAP)
        rel = self._giant(spark)
        out = rel.group_by("g").apply_auto(
            init, accumulate, finish, "k long, n long, s long",
            threshold_rows=self.CAP,
        )
        rows = {r["k"]: r for r in out.df.collect()}
        assert rows[1]["n"] == 60_000
        assert rows[1]["s"] == sum(range(60_000))
        assert len(rows) == 6

    def test_auto_fast_path_below_threshold(self, spark):
        init, accumulate, finish = self._trio(cap=10**9)
        rel = self._giant(spark)
        fast = rel.group_by("g").apply_auto(
            init, accumulate, finish, "k long, n long, s long",
            threshold_rows=10**9)
        plan = fast.df._jdf.queryExecution().executedPlan().toString()
        assert "FlatMapGroupsInPandas" in plan     # applyInPandas form
        stream = rel.group_by("g").apply_auto(
            init, accumulate, finish, "k long, n long, s long",
            threshold_rows=10)
        plan2 = stream.df._jdf.queryExecution().executedPlan().toString()
        assert "FlatMapGroupsInPandas" not in plan2  # escalated: mapInPandas
        a = sorted(tuple(r) for r in fast.df.collect())
        b = sorted(tuple(r) for r in stream.df.collect())
        assert a == b

    def test_auto_order_by_matches_stream(self, spark):
        # order-sensitive accumulator: running string of v in order
        from pigpen_spark.relation import Relation

        df = spark.createDataFrame(
            [(1, 3), (1, 1), (1, 2), (2, 9), (2, 8)], "g long, v long")
        rel = Relation(df)

        def init(key):
            return []

        def accumulate(st, chunk):
            st.extend(int(x) for x in chunk["v"])
            return st

        def finish(key, st):
            return {"k": key[0], "seq": ",".join(map(str, st))}

        fast = rel.group_by("g").apply_auto(
            init, accumulate, finish, "k long, seq string",
            order_by=[F.col("v")], threshold_rows=10**9)
        stream = rel.group_by("g").apply_auto(
            init, accumulate, finish, "k long, seq string",
            order_by=[F.col("v")], threshold_rows=1)
        a = sorted(tuple(r) for r in fast.df.collect())
        b = sorted(tuple(r) for r in stream.df.collect())
        assert a == b == [(1, "1,2,3"), (2, "8,9")]

    def test_cogroup_auto_equivalence_and_escalation(self, spark):
        from pigpen_spark.relation import Relation

        left = Relation(spark.createDataFrame(
            [(1, "a"), (2, "b")], "k long, name string"))
        right = Relation(spark.range(30_000).select(
            F.lit(1).alias("k"), F.col("id").alias("v")))

        def init(key):
            return {"name": None, "n": 0, "s": 0}

        def accumulate(st, tag, chunk):
            if tag == 0:
                st["name"] = chunk["name"].iloc[0]
            else:
                st["n"] += len(chunk)
                st["s"] += int(chunk["v"].sum())
            return st

        def finish(key, st):
            return {"k": key[0], "name": st["name"], "n": st["n"], "s": st["s"]}

        schema = "k long, name string, n long, s long"
        fast = left.cogroup_auto([(right, F.col("k"))], F.col("k"),
                                 init, accumulate, finish, schema,
                                 threshold_rows=10**9)
        stream = left.cogroup_auto([(right, F.col("k"))], F.col("k"),
                                   init, accumulate, finish, schema,
                                   threshold_rows=100)
        plan_fast = fast.df._jdf.queryExecution().executedPlan().toString()
        plan_stream = stream.df._jdf.queryExecution().executedPlan().toString()
        assert "FlatMapGroupsInPandas" in plan_fast
        assert "FlatMapGroupsInPandas" not in plan_stream
        a = sorted(tuple(r) for r in fast.df.collect())
        b = sorted(tuple(r) for r in stream.df.collect())
        assert a == b
        assert (1, "a", 30_000, sum(range(30_000))) in a

    def test_probe_max_group_rows(self, spark):
        from pigpen_spark.operators.group_stream import max_group_rows

        df = spark.createDataFrame([(1,), (1,), (2,)], "g long")
        assert max_group_rows(df, ["g"]) == 2
        assert max_group_rows(df.filter("g > 99"), ["g"]) == 0


class TestRound5EmptyInputs:
    """Degenerate-input net for the round-5 operators (Spark 4 ANSI:
    sloppy division/cast raises at runtime — probe empty/edge inputs
    the synthetic corpus never produces)."""

    def test_image_curation_pack_empty_and_all_gated(self, spark):
        from pigpen_spark.functions import multimodal as M

        empty = spark.createDataFrame(
            [], "id long, width int, height int, channels int, px_sum long,"
                " px_min int, px_max int")
        assert M.image_curation_pack(empty, "id").count() == 0
        # every row fails the gate -> empty output, no division errors
        dark = spark.createDataFrame(
            [(1, 4, 4, 3, 10_000, 0, 255)],
            "id long, width int, height int, channels int, px_sum long,"
            " px_min int, px_max int")
        assert M.image_curation_pack(dark, "id", min_dim=8).count() == 0

    def test_session_stats_empty_and_single_event(self, spark):
        from pigpen_spark.operators.windows import session_stats

        empty = spark.createDataFrame([], "user_id long, ts long")
        assert session_stats(empty, "user_id", "ts", 1800).count() == 0

    def test_apply_auto_empty_relation(self, spark):
        from pigpen_spark.relation import Relation

        rel = Relation(spark.createDataFrame([], "g long, v long"))
        out = rel.group_by("g").apply_auto(
            lambda k: 0, lambda st, c: st + len(c),
            lambda k, st: {"k": k[0], "n": st}, "k long, n long")
        assert out.df.count() == 0

    def test_cogroup_auto_empty_inputs(self, spark):
        from pigpen_spark.relation import Relation

        a = Relation(spark.createDataFrame([], "k long, x long"))
        b = Relation(spark.createDataFrame([], "k long, y long"))
        out = a.cogroup_auto(
            [(b, F.col("k"))], F.col("k"),
            lambda k: 0, lambda st, tag, c: st + len(c),
            lambda k, st: {"k": k[0], "n": st}, "k long, n long")
        assert out.df.count() == 0

    def test_webm_and_vbr_on_empty_frame(self, spark):
        from pigpen_spark.functions import multimodal as M

        none = spark.createDataFrame([], "doc_id long")
        assert M.synth_frame_stats_webm(none, "doc_id").count() == 0
        assert M.synth_audio_profile_vbr(none, "doc_id").count() == 0
        assert M.synth_mixed_image_stats(none, "doc_id").count() == 0

    def test_lsh_auto_single_vector(self, spark):
        # resolve_planes on a 1-row corpus floor-clamps; no div-by-zero
        df = spark.createDataFrame(
            [(1, [1.0] * 4)], "vec_id long, embedding array<double>")
        out = S.lsh_topk(df, k=3, n_planes="auto", dim=4,
                         auto_sizing=(16, 2, 10))
        assert out.count() == 0  # no pairs from one vector


class TestWeightedSample:
    def test_weight_bias_and_exact_count(self, spark):
        from pigpen_spark.functions import pipeline as P

        # 200 rows, first 50 with 20x the weight of the rest
        df = spark.createDataFrame(
            [(i, "g", 200_000 if i < 50 else 10_000) for i in range(200)],
            "id long, g string, w long",
        )
        out = P.weighted_sample_per_group(df, "g", "id", "w", k=40).collect()
        assert len(out) == 40                       # exact count
        heavy = sum(1 for r in out if r["id"] < 50)
        # heavy rows are 25% of the population but 20x-weighted; they
        # must be clearly overrepresented in the kept 40 (deterministic)
        assert heavy > 20, f"only {heavy}/40 heavy rows kept"

    def test_zero_weight_never_sampled(self, spark):
        from pigpen_spark.functions import pipeline as P

        df = spark.createDataFrame(
            [(1, "g", 0), (2, "g", -5), (3, "g", 100)], "id long, g string, w long")
        out = P.weighted_sample_per_group(df, "g", "id", "w", k=10).collect()
        assert [r["id"] for r in out] == [3]

    def test_deterministic_and_salt_sensitive(self, spark):
        from pigpen_spark.functions import pipeline as P

        df = spark.createDataFrame(
            [(i, "g", 1000 + i) for i in range(100)], "id long, g string, w long")
        a = {r["id"] for r in P.weighted_sample_per_group(df, "g", "id", "w", 10).collect()}
        b = {r["id"] for r in P.weighted_sample_per_group(df, "g", "id", "w", 10).collect()}
        c = {r["id"] for r in P.weighted_sample_per_group(df, "g", "id", "w", 10,
                                                         salt="other").collect()}
        assert a == b
        assert a != c

    def test_window_group_limit_plan(self, spark):
        from pigpen_spark.functions import pipeline as P

        df = spark.createDataFrame(
            [(i, "g", 1000) for i in range(50)], "id long, g string, w long")
        plan = P.weighted_sample_per_group(df, "g", "id", "w", 5) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan

    def test_rejects_bad_k(self, spark):
        from pigpen_spark.functions import pipeline as P

        df = spark.createDataFrame([(1, "g", 10)], "id long, g string, w long")
        with pytest.raises(ValueError):
            P.weighted_sample_per_group(df, "g", "id", "w", 0)


class TestIndexPlaneDerivation:
    def test_serving_reads_plane_count_off_the_index(self, spark):
        import random

        rng = random.Random(11)
        corpus = spark.createDataFrame(
            [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(80)],
            "vec_id long, embedding array<double>",
        )
        idx = S.lsh_index(corpus, n_planes="auto", dim=8).cache()
        q = corpus.filter(F.col("vec_id") < 5)
        # n_planes="index" must equal passing the resolved count by hand
        resolved = S.resolve_planes("auto", corpus)
        a = sorted(tuple(r) for r in
                   S.lsh_topk_against(idx, q, k=3, n_planes="index").collect())
        b = sorted(tuple(r) for r in
                   S.lsh_topk_against(idx, q, k=3, n_planes=resolved).collect())
        assert a == b and a
        # a mismatched hand count silently matches nothing — the foot-gun
        # "index" mode exists to remove
        wrong = S.lsh_topk_against(idx, q, k=3, n_planes=resolved + 3)
        assert wrong.count() == 0

    def test_empty_index_raises(self, spark):
        import pytest

        empty = spark.createDataFrame(
            [], "id long, vec array<double>, nrm double, bucket string")
        q = spark.createDataFrame(
            [(1, [1.0] * 4)], "vec_id long, embedding array<double>")
        with pytest.raises(ValueError, match="empty index"):
            S.lsh_topk_against(empty, q, k=3, n_planes="index")


class TestSessionStatsStream:
    def test_streamed_rollup_matches_batch_operator(self, spark, tmp_path):
        import json as _json
        import os

        from pigpen_spark.operators.windows import session_stats
        from pigpen_spark.streaming import core as st

        src = tmp_path / "ss_src"
        src.mkdir(parents=True)
        # user 1: session (0..100) closed by batch-1 events; session
        # (5000..5010) closed by the flush; user 2: one bounce at 40.
        # Flush events at t=99999 open one final session per user that
        # stays open (never counted) — so the rollup covers exactly the
        # real sessions.
        batches = [
            [dict(uid=1, ts=0), dict(uid=1, ts=100), dict(uid=2, ts=40)],
            [dict(uid=1, ts=5000), dict(uid=1, ts=5010)],
            [dict(uid=1, ts=99999), dict(uid=2, ts=99999)],
        ]
        for bi, rows in enumerate(batches):
            p = src / f"b{bi}.json"
            with open(p, "w") as f:
                for r in rows:
                    f.write(_json.dumps(r) + "\n")
            os.utime(p, (1000 + bi, 1000 + bi))  # deterministic batch order

        schema = "uid long, ts long"
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).json(str(src)))
        q = st.session_stats_stream(
            stream, "uid", "ts", gap_seconds=1800,
            open_path=str(tmp_path / "ss_open"),
            rollup_path=str(tmp_path / "ss_roll"),
            checkpoint=str(tmp_path / "ss_ck"), available_now=True)
        q.awaitTermination(120)

        vs = sorted(os.listdir(tmp_path / "ss_roll"))
        live = {r["uid"]: r for r in
                spark.read.parquet(str(tmp_path / "ss_roll" / vs[-1])).collect()}
        # batch operator over the REAL (non-flush) events is the truth
        real = spark.createDataFrame(
            [(r["uid"], r["ts"]) for b in batches[:2] for r in b], schema)
        want = {r["uid"]: r for r in
                session_stats(real, "uid", "ts", 1800).collect()}
        assert set(live) == set(want)
        for uid in want:
            for c in ("n_sessions", "n_events", "bounces",
                      "max_session_events", "max_duration_s"):
                assert live[uid][c] == want[uid][c], (uid, c, live[uid], want[uid])
        # open store holds exactly the two flush events
        ovs = sorted(os.listdir(tmp_path / "ss_open"))
        tail = spark.read.parquet(str(tmp_path / "ss_open" / ovs[-1]))
        assert sorted(r["ts"] for r in tail.collect()) == [99999, 99999]

    def test_replay_idempotent(self, spark, tmp_path):
        import json as _json
        import os

        from pigpen_spark.streaming import core as st

        src = tmp_path / "ss2_src"
        src.mkdir(parents=True)
        rows = [dict(uid=1, ts=0), dict(uid=1, ts=50), dict(uid=1, ts=99999)]
        p = src / "b0.json"
        with open(p, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")
        os.utime(p, (1000, 1000))
        schema = "uid long, ts long"

        def run():
            stream = (spark.readStream.schema(schema)
                      .option("maxFilesPerTrigger", 1).json(str(src)))
            q = st.session_stats_stream(
                stream, "uid", "ts", gap_seconds=1800,
                open_path=str(tmp_path / "ss2_open"),
                rollup_path=str(tmp_path / "ss2_roll"),
                checkpoint=str(tmp_path / "ss2_ck"), available_now=True)
            q.awaitTermination(120)

        run()
        run()  # re-run over the same checkpoint: no double counting
        vs = sorted(os.listdir(tmp_path / "ss2_roll"))
        out = spark.read.parquet(str(tmp_path / "ss2_roll" / vs[-1])).collect()
        assert len(out) == 1
        assert out[0]["n_sessions"] == 1 and out[0]["n_events"] == 2


class TestReviewFixesR5:
    def test_cogroup_auto_probes_the_union(self, spark):
        # two inputs each under the threshold whose UNION is over it on
        # one key: the dispatcher must escalate (the fast path would
        # materialize the combined bag)
        from pigpen_spark.relation import Relation

        a = Relation(spark.range(900).select(F.lit(1).alias("k"),
                                             F.col("id").alias("x")))
        b = Relation(spark.range(900).select(F.lit(1).alias("k"),
                                             F.col("id").alias("y")))
        out = a.cogroup_auto(
            [(b, F.col("k"))], F.col("k"),
            lambda k: 0, lambda st, tag, c: st + len(c),
            lambda k, st: {"k": k[0], "n": st}, "k long, n long",
            threshold_rows=1000)   # each side 900 <= 1000, union 1800 > 1000
        plan = out.df._jdf.queryExecution().executedPlan().toString()
        assert "FlatMapGroupsInPandas" not in plan, "combined bag escaped escalation"
        assert out.df.collect()[0]["n"] == 1800

    def test_truncated_xing_header_raises(self):
        import pytest

        from pigpen_spark.functions import codecs as C

        data = bytearray(C.mp3_encode_vbr(3, 0, header="xing"))
        pos = C._mp3_id3_skip(bytes(data))
        # cut the stream right after the Xing flags word: magic present,
        # frames field truncated -> loud refusal, never garbage counts
        cut = bytes(data[:pos + 4 + 32 + 8 + 1])
        with pytest.raises(ValueError, match="truncated Xing"):
            C.mp3_vbr_info(cut)

    def test_serving_rejects_auto_mode(self, spark):
        import pytest

        idx = spark.createDataFrame(
            [(1, [1.0] * 4, 2.0, "0101")],
            "id long, vec array<double>, nrm double, bucket string")
        q = spark.createDataFrame(
            [(2, [1.0] * 4)], "vec_id long, embedding array<double>")
        with pytest.raises(ValueError, match="'index'"):
            S.lsh_topk_against(idx, q, k=1, n_planes="auto")

    def test_num_partitions_honored_on_fast_path(self, spark):
        from pigpen_spark.relation import Relation

        rel = Relation(spark.createDataFrame(
            [(i % 3, i) for i in range(30)], "g long, v long"))
        out = rel.group_by("g").apply_auto(
            lambda k: 0, lambda st, c: st + len(c),
            lambda k, st: {"k": k[0], "n": st}, "k long, n long",
            num_partitions=7, threshold_rows=10**9)
        assert out.df.rdd.getNumPartitions() == 7
        assert sorted(r["n"] for r in out.df.collect()) == [10, 10, 10]


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_H_SETTINGS = dict(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


class TestCodecProperties:
    @given(
        n=st.integers(1, 6),
        bw=st.integers(1, 3),
        bh=st.integers(1, 3),
        a=st.integers(0, 240),
        cluster_len=st.integers(1, 4),
        fps=st.sampled_from([12, 24, 25, 30]),
    )
    @settings(**_H_SETTINGS)
    def test_webm_mjpeg_roundtrip_any_params(self, n, bw, bh, a, cluster_len, fps):
        # any block-constant clip round-trips bit-exactly through
        # encode->demux->decode at any cluster split / frame rate
        import numpy as np

        from pigpen_spark.functions import codecs as C

        samples, sums = [], []
        for f in range(n):
            v = min(a + f, 255)
            img = np.full((bh * 8, bw * 8), v, dtype=np.uint8)
            samples.append(C.jpeg_encode(img))
            sums.append(int(img.sum(dtype="int64")))
        data = C.webm_encode_mjpeg(samples, bw * 8, bh * 8,
                                   fps=fps, cluster_len=cluster_len)
        w, h, frames = C.webm_frames(data)
        assert (w, h) == (bw * 8, bh * 8)
        assert [int(fr.sum(dtype="int64")) for fr in frames] == sums
        # meta stays consistent with the same bytes
        m = C.webm_meta(data)
        assert m["tracks"][0]["codec"] == "V_MJPEG"

    @given(
        n=st.integers(1, 40),
        rate_idx=st.integers(0, 2),
        header=st.sampled_from(["xing", "vbri"]),
        idxs=st.lists(st.integers(1, 14), min_size=1, max_size=40),
    )
    @settings(**_H_SETTINGS)
    def test_mp3_vbr_fast_equals_walk_arithmetic(self, n, rate_idx, header, idxs):
        from pigpen_spark.functions import codecs as C

        bidx = (idxs * n)[:n]
        data = C.mp3_encode_vbr(n, rate_idx, bidx, header=header)
        fast = C.mp3_meta_fast(data)
        walk = C.mp3_meta(data)
        rate = [44100, 48000, 32000][rate_idx]
        assert fast["method"] == header
        assert fast["n_frames"] == n
        assert walk["n_frames"] == n + 1
        assert fast["duration_ms"] == n * 1152 * 1000 // rate
        assert walk["duration_ms"] == (n + 1) * 1152 * 1000 // rate
        info = C.mp3_vbr_info(data)
        assert info["n_bytes"] == len(data) - C._mp3_id3_skip(data)


class TestRound5Plans:
    """Plan pins: the scale properties the round-5 operators claim."""

    def test_session_stats_single_exchange_chain(self, spark, sf_dir):
        # sessionize window + per-session groupBy + per-user groupBy all
        # cluster on user_id: HashPartitioning(user) satisfies every
        # downstream distribution -> ONE exchange for the whole chain
        from pigpen_spark.catalog import tables
        from pigpen_spark.operators.windows import session_stats

        e = tables(spark, sf_dir)["events"]
        p = session_stats(e.df, "user_id", "ts", 1800) \
            ._jdf.queryExecution().executedPlan().toString()
        assert p.count("Exchange") == 1, p

    def test_minhash_doc_sig_pure_expression(self, spark, sf_dir):
        # the signature column is JVM expression work only: no Python
        # nodes, no shuffle — a scan-speed projection
        from pigpen_spark.catalog import tables
        from pigpen_spark.functions import dedup as D

        docs = tables(spark, sf_dir)["documents"]
        sig = docs.df.select(
            "doc_id",
            F.array_join(F.transform(
                D.minhash_signature(F.col("text"), k=12, shingle_n=3),
                lambda h: h.cast("string")), ",").alias("sig"))
        p = sig._jdf.queryExecution().executedPlan().toString()
        assert not any(x in p for x in
                       ("BatchEvalPython", "MapInPandas", "FlatMapGroupsInPandas"))
        assert p.count("Exchange") == 0

    def test_multimodal_pipeline_dedup_is_window_group_limit(self, spark):
        # the keep-first dedup stage must compile to WindowGroupLimit
        # (map-side partial top-1 before the shuffle), not a full sort
        from pigpen_spark.functions import multimodal as M

        ids = spark.range(100).withColumnRenamed("id", "doc_id")
        stats = M.synth_mixed_image_stats(ids, "doc_id")
        p = M.image_curation_pack(stats, "id") \
            ._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in p

    def test_vocab_coverage_two_exchanges(self, spark, sf_dir):
        # probing more sizes must NOT add exchanges (single-pass curve).
        # The absolute count changed in round 9 when build_vocab's global
        # one-partition rank window became the two-phase scale-safe form
        # (range exchange + pid window over the TYPE table — vocabulary-
        # sized shuffles, the trade that removed the α=1.20 single-task
        # sort); the size-independence property is the pin.
        from pigpen_spark.catalog import tables
        from pigpen_spark.functions import pipeline as P

        docs = tables(spark, sf_dir)["documents"]
        p2 = P.vocab_coverage(docs.df, "text", sizes=(64, 256)) \
            ._jdf.queryExecution().executedPlan().toString()
        p5 = P.vocab_coverage(docs.df, "text", sizes=(16, 64, 256, 1024, 4096)) \
            ._jdf.queryExecution().executedPlan().toString()
        assert p2.count("Exchange") == p5.count("Exchange")
        # the rank rides the two-phase pid window, not a global one
        assert "__pp_pid" in p2


class TestPackDocSpans:
    def test_model_small_corpus(self, spark):
        from pigpen_spark.functions import pipeline as P

        rows = [(1, "a b c d e"), (2, "f g"), (3, ""), (4, "h i j k")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {(r["shard"], r["seq_no"]): r for r in
               P.pack_doc_spans(df, "doc_id", "text", seq_len=4, shards=1).collect()}
        # brute-force model: shard 0, id order 1..4, lens 5,2,0,4 ->
        # offsets 0,5,7,7; stream length 11 -> seqs 0..2
        # seq0 [0,4): doc1@0            seq1 [4,8): doc1@0(cont), doc2@1, doc4@3
        # seq2 [8,12): doc4@0(cont)
        assert out[(0, 0)]["doc_spans"] == "0:1"
        assert out[(0, 1)]["doc_spans"] == "0:1,1:2,3:4"
        assert out[(0, 2)]["doc_spans"] == "0:4"
        assert out[(0, 1)]["n_docs"] == 3
        # empty doc 3 occupies nothing
        assert all("3" not in r["doc_spans"].split(",")[-1].split(":")[1]
                   for r in out.values() if r["doc_spans"])

    def test_consistent_with_tokenize_pack(self, spark, sf_dir):
        # the span map and the token stream must describe the SAME
        # packing: identical (shard, seq) key sets, and each sequence's
        # token count never exceeds what its docs could contribute
        from pigpen_spark.catalog import tables
        from pigpen_spark.functions import pipeline as P

        docs = tables(spark, sf_dir)["documents"].df
        packed = P.tokenize_pack(docs, "doc_id", "text", seq_len=32, shards=8)
        spans = P.pack_doc_spans(docs, "doc_id", "text", seq_len=32, shards=8)
        a = {(r["shard"], r["seq_no"]): r["n_tokens"] for r in packed.collect()}
        b = {(r["shard"], r["seq_no"]): r["n_docs"] for r in spans.collect()}
        assert set(a) == set(b)
        # every full sequence has 32 tokens; every sequence has >=1 doc
        assert all(v >= 1 for v in b.values())

    def test_no_token_explode_in_plan(self, spark, sf_dir):
        # the whole point: spans come from offset arithmetic — exactly
        # ONE Generate (the per-doc touched-sequence explode), never the
        # per-token posexplode tokenize_pack pays
        from pigpen_spark.catalog import tables
        from pigpen_spark.functions import pipeline as P

        docs = tables(spark, sf_dir)["documents"].df
        p = P.pack_doc_spans(docs, "doc_id", "text", seq_len=32, shards=8) \
            ._jdf.queryExecution().executedPlan().toString()
        assert p.count("Generate") == 1, p

    def test_rejects_bad_seq_len(self, spark):
        from pigpen_spark.functions import pipeline as P

        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError):
            P.pack_doc_spans(df, "doc_id", "text", seq_len=0)


class TestMarginMine:
    def _pair_corpora(self, spark):
        # target 10 has a standout match for query 0; queries 1's best
        # is barely better than its other candidates (low margin)
        import random

        rng = random.Random(3)
        base = [rng.uniform(-1, 1) for _ in range(8)]
        near = [v + 0.01 for v in base]
        far = [rng.uniform(-1, 1) for _ in range(8)]
        src = spark.createDataFrame(
            [(0, base), (1, far)], "vec_id long, embedding array<double>")
        # tgt: 10 ~= base (standout), 11..13 random; 20..23 all ~= far
        # (query 1 gets four nearly-equal candidates -> margin ~= 1)
        tgts = [(10, near)] + [
            (11 + j, [rng.uniform(-1, 1) for _ in range(8)]) for j in range(3)
        ] + [(20 + j, [v + 0.02 * j for v in far]) for j in range(4)]
        tgt = spark.createDataFrame(tgts, "vec_id long, embedding array<double>")
        return src, tgt

    def test_margin_separates_standout_from_crowd(self, spark):
        src, tgt = self._pair_corpora(spark)
        out = S.margin_mine(src, tgt, k=4, n_planes=2, dim=8,
                            margin_threshold=0.0)
        rows = {r["src_id"]: r for r in out.collect()}
        if 0 in rows and 1 in rows:   # both got candidate evidence
            assert rows[0]["margin"] > rows[1]["margin"]
            assert rows[0]["tgt_id"] == 10
            assert rows[1]["margin"] < 1.2   # crowd of near-equals

    def test_threshold_and_determinism(self, spark):
        src, tgt = self._pair_corpora(spark)
        a = sorted(tuple(r) for r in
                   S.margin_mine(src, tgt, k=4, n_planes=2, dim=8,
                                 margin_threshold=1.2).collect())
        b = sorted(tuple(r) for r in
                   S.margin_mine(src, tgt, k=4, n_planes=2, dim=8,
                                 margin_threshold=1.2).collect())
        assert a == b
        assert all(r[3] >= 1.2 for r in a)

    def test_single_candidate_queries_absent(self, spark):
        # one target total -> every query has at most 1 candidate -> no
        # margin evidence -> empty output, no division errors
        src = spark.createDataFrame(
            [(0, [1.0] * 8)], "vec_id long, embedding array<double>")
        tgt = spark.createDataFrame(
            [(10, [1.0] * 8)], "vec_id long, embedding array<double>")
        assert S.margin_mine(src, tgt, k=4, n_planes=2, dim=8,
                             margin_threshold=0.0).count() == 0
