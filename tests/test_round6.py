"""Round-6 regressions for the ADVICE-r5 findings: wide-integer
sparse-cosine thresholding, string-id label propagation, and
empty-input target encoding."""

from pigpen_spark.functions import classify as C
from pigpen_spark.functions import dedup as D
from pigpen_spark.functions import ranking as R


class TestAdviceR5Regressions:
    def test_sparse_cosine_survives_huge_tf(self, spark):
        # max_df bounds document frequency, not term frequency: one
        # token repeated 30k times gives dot = 9e8, so the old BIGINT
        # inequality dot²·den² = 2.0e19 overflowed int64.  The
        # decimal(38,0)/HUGEINT comparison keeps the identical pair
        # (cosine exactly 1 ≥ 4/5) instead of silently dropping it.
        n = 30_000
        blob = "a " * n
        docs = spark.createDataFrame(
            [(1, blob), (2, blob)], "doc_id long, text string")
        out = R.sparse_cosine_pairs(docs, "doc_id", "text",
                                    threshold_num=4, threshold_den=5,
                                    max_df=10).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["id_a"], r["id_b"]) == (1, 2)
        assert r["dot"] == n * n
        assert r["norm_a"] == r["norm_b"] == n * n

    def test_label_propagation_string_node_ids(self, spark):
        # the old tie-break negated the label arithmetically, which
        # NULLed every community for non-numeric ids; min_by over
        # struct(-cnt, lbl) orders strings natively
        clique = lambda p: [(f"{p}{i}", f"{p}{j}")
                            for i in range(3) for j in range(i + 1, 3)]
        pairs = spark.createDataFrame(
            clique("x") + clique("y") + [("x2", "y0")],
            "id_a string, id_b string")
        out = {r["node"]: r["community"] for r in
               D.label_propagation(pairs, iterations=2).collect()}
        assert all(c is not None for c in out.values())
        # hand-traced 2-round synchronous LPA with (count desc, label
        # asc) ties: the x-clique converges to "x0"; y1/y2 tie between
        # r1 labels {x2, y0} and string order picks "x2"
        assert out["x0"] == out["x1"] == out["x2"] == "x0"
        assert out["y0"] == "y0"
        assert out["y1"] == out["y2"] == "x2"

    def test_label_propagation_long_ids_unchanged(self, spark):
        # the numeric path keeps its original typing (long in, long out)
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3)], "id_a long, id_b long")
        out = D.label_propagation(pairs, iterations=1)
        assert dict(out.dtypes)["community"] == "bigint"
        got = {r["node"]: r["community"] for r in out.collect()}
        # one round: every node adopts its neighbourhood's min label
        assert got[2] == 1

    def test_target_encode_empty_input(self, spark):
        # prior divide-by-zero is guarded with greatest(n, 1) on both
        # engines; the empty corpus yields an empty encoding table
        df = spark.createDataFrame([], "cat string, y long")
        assert C.target_encode(df, "cat", "y", m=5).count() == 0

    def test_target_encode_empty_oracle_parity(self, spark, tmp_path):
        import duckdb

        df = spark.createDataFrame([], "cat string, y long")
        p = str(tmp_path / "e.parquet")
        df.write.parquet(p)
        sql = C.target_encode_sql(f"read_parquet('{p}/*.parquet')",
                                  "cat", "y", m=5)
        assert duckdb.sql(sql).fetchall() == []


# ---------------------------------------------------------------------------
# Ogg (RFC 3533) page walk + FLAC STREAMINFO — round-6 audio formats
# ---------------------------------------------------------------------------

import pytest
from pyspark.sql import functions as F

from pigpen_spark.functions import codecs as CX
from pigpen_spark.functions import multimodal as M


class TestOggCodec:
    def test_opus_round_trip(self):
        d = CX.ogg_encode_skeleton("opus", n_audio_pages=4,
                                  packets_per_page=2, channels=2,
                                  sample_rate=44100, pre_skip=312)
        m = CX.ogg_meta(d)
        assert m["codec"] == "opus"
        assert (m["channels"], m["sample_rate"], m["pre_skip"]) == (2, 44100, 312)
        assert m["n_pages"] == 6            # BOS + tags + 4 audio
        assert m["n_packets"] == 2 + 8
        assert m["granule_last"] == 312 + 4 * 2 * 960
        # opus duration ticks the 48 kHz clock net of pre-skip
        assert m["duration_ms"] == 4 * 2 * 960 * 1000 // 48000

    def test_vorbis_round_trip(self):
        d = CX.ogg_encode_skeleton("vorbis", n_audio_pages=3,
                                  packets_per_page=3, channels=1,
                                  sample_rate=32000)
        m = CX.ogg_meta(d)
        assert m["codec"] == "vorbis"
        assert m["pre_skip"] == 0
        assert m["n_packets"] == 3 + 9      # id + tags + setup + audio
        assert m["duration_ms"] == 3 * 3 * 1024 * 1000 // 32000

    def test_crc_is_the_spec_variant(self):
        # RFC 3533 CRC of a known vector: non-reflected 0x04c11db7,
        # init 0 — must NOT equal zlib.crc32
        import zlib
        v = b"OggS\x00\x02" + bytes(20) + b"\x01\x05hello"
        assert CX._ogg_crc(v) != zlib.crc32(v)
        # self-consistency: encoder pages verify under the walk
        assert CX.ogg_meta(CX.ogg_encode_skeleton("opus", 1, 1))["n_pages"] == 3

    def test_flipped_byte_raises(self):
        d = bytearray(CX.ogg_encode_skeleton("opus", 2, 2))
        d[-1] ^= 0x01                       # corrupt last audio byte
        with pytest.raises(ValueError, match="CRC"):
            CX.ogg_meta(bytes(d))

    def test_truncated_page_raises(self):
        d = CX.ogg_encode_skeleton("opus", 2, 2)
        with pytest.raises(ValueError):
            CX.ogg_meta(d[:-5])

    def test_bad_magic_and_missing_bos_raise(self):
        with pytest.raises(ValueError, match="capture"):
            CX.ogg_meta(b"NotAnOggStream" + bytes(30))
        d = CX.ogg_encode_skeleton("opus", 2, 2)
        # drop the BOS page: walk fails on the sequence gap
        second = d.index(b"OggS", 4)
        with pytest.raises(ValueError):
            CX.ogg_meta(d[second:])

    def test_unknown_codec_raises(self):
        page = CX._ogg_page(7, 0, 0, [b"FAKECODEC"], htype=0x02 | 0x04)
        with pytest.raises(ValueError, match="codec"):
            CX.ogg_meta(page)

    def test_large_packet_lacing(self):
        # a >255-byte header packet spans multiple 255 lacing values
        d = CX.ogg_encode_skeleton("opus", 1, 1, samples_per_packet=960)
        m = CX.ogg_meta(d)
        assert m["n_packets"] == 3


class TestFlacCodec:
    def test_round_trip_all_fields(self):
        d = CX.flac_encode_streaminfo(48000, 2, 24, 987654, block_size=1024,
                                     n_padding_blocks=2)
        m = CX.flac_streaminfo(d)
        assert (m["sample_rate"], m["channels"], m["bits_per_sample"]) \
            == (48000, 2, 24)
        assert m["total_samples"] == 987654
        assert m["duration_ms"] == 987654 * 1000 // 48000
        assert m["min_block_size"] == m["max_block_size"] == 1024
        assert m["n_meta_blocks"] == 3

    def test_36bit_total_samples(self):
        big = (1 << 36) - 1
        m = CX.flac_streaminfo(CX.flac_encode_streaminfo(96000, 1, 16, big))
        assert m["total_samples"] == big

    def test_bad_magic_raises(self):
        with pytest.raises(ValueError, match="magic"):
            CX.flac_streaminfo(b"fLaK" + bytes(40))

    def test_first_block_not_streaminfo_raises(self):
        d = b"fLaC" + bytes([0x81]) + (8).to_bytes(3, "big") + bytes(8)
        with pytest.raises(ValueError, match="STREAMINFO"):
            CX.flac_streaminfo(d)

    def test_truncated_block_raises(self):
        d = CX.flac_encode_streaminfo(44100, 2, 16, 1000)
        with pytest.raises(ValueError):
            CX.flac_streaminfo(d[:-4])

    def test_rate_zero_raises(self):
        with pytest.raises(ValueError):
            CX.flac_encode_streaminfo(0, 2, 16, 1000)
        # hand-build a rate-0 STREAMINFO: parser must refuse too
        bits = (0 << 44) | (1 << 41) | (15 << 36) | 1000
        si = bytes(4) + bytes(6) + bits.to_bytes(8, "big") + bytes(16)
        d = b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + si
        with pytest.raises(ValueError, match="rate"):
            CX.flac_streaminfo(d)


class TestAdtsCodec:
    def test_round_trip(self):
        d = CX.adts_encode_skeleton(10, rate_idx=3, channels=2, profile=1)
        m = CX.adts_meta(d)
        assert m == {"n_frames": 10, "sample_rate": 48000, "channels": 2,
                     "profile": 1, "duration_ms": 10 * 1024 * 1000 // 48000}

    def test_layer_bits_separate_adts_from_mp3(self):
        # the two 0xFFF-sync families must never cross-parse
        mp3 = CX.mp3_encode_skeleton(3)
        pos = CX._mp3_id3_skip(mp3)
        assert CX.adts_frame_header(mp3, pos) is None
        aac = CX.adts_encode_skeleton(3)
        assert CX.mp3_frame_header(aac, 0) is None

    def test_broken_chain_raises(self):
        d = CX.adts_encode_skeleton(5)
        with pytest.raises(ValueError, match="adts"):
            CX.adts_meta(d[:-3])
        with pytest.raises(ValueError, match="adts"):
            CX.adts_meta(b"\xff\xf1" + bytes(5))   # frame_length < 7

    def test_rate_change_mid_stream_raises(self):
        d = CX.adts_encode_skeleton(2, rate_idx=3) \
            + CX.adts_encode_skeleton(1, rate_idx=8)
        with pytest.raises(ValueError, match="rate"):
            CX.adts_meta(d)


class TestAudioProfileSparkPaths:
    def test_ogg_fused_matches_unfused(self, spark):
        ids = spark.range(12).select(F.col("id").alias("doc_id"))
        payloads = spark.createDataFrame(
            [(i, M._ogg_payload(i)) for i in range(12)],
            "doc_id long, payload binary")
        fused = {r["id"]: r for r in
                 M.synth_audio_profile_ogg(ids, "doc_id").collect()}
        unfused = {r["id"]: r for r in
                   M.audio_profile_ogg(payloads, "doc_id").collect()}
        assert fused == unfused and len(fused) == 12

    def test_flac_fused_matches_unfused(self, spark):
        ids = spark.range(9).select(F.col("id").alias("doc_id"))
        payloads = spark.createDataFrame(
            [(i, M._flac_payload(i)) for i in range(9)],
            "doc_id long, payload binary")
        fused = {r["id"]: r for r in
                 M.synth_audio_profile_flac(ids, "doc_id").collect()}
        unfused = {r["id"]: r for r in
                   M.audio_profile_flac(payloads, "doc_id").collect()}
        assert fused == unfused and len(fused) == 9


# ---------------------------------------------------------------------------
# ANN index lifecycle: incremental append + staleness drift monitor
# ---------------------------------------------------------------------------

from pigpen_spark.functions import similarity as S


def _vecs(spark, ids, dim=8, shift=0.0):
    import hashlib

    def v(i):
        out = []
        for d in range(dim):
            h = int(hashlib.md5(f"{i}_{d}".encode()).hexdigest()[:6], 16)
            out.append((h % 1000) / 500.0 - 1.0 + shift)
        return out

    return spark.createDataFrame([(i, v(i)) for i in ids],
                                 "vec_id long, embedding array<double>")


class TestAnnIndexLifecycle:
    def test_append_equals_rebuild(self, spark):
        corpus = _vecs(spark, range(50, 200))
        batch = _vecs(spark, range(0, 50))
        both = _vecs(spark, range(0, 200))
        idx = S.lsh_index(corpus, n_planes=5, dim=8)
        appended = S.lsh_index_append(idx, batch, dim=8)
        rebuilt = S.lsh_index(both, n_planes=5, dim=8)
        a = sorted((r["id"], r["bucket"], round(r["nrm"], 9))
                   for r in appended.collect())
        b = sorted((r["id"], r["bucket"], round(r["nrm"], 9))
                   for r in rebuilt.collect())
        assert a == b and len(a) == 200

    def test_append_derives_planes_from_artifact(self, spark):
        # the stored width pins the plane count: appending to a 7-plane
        # index hashes the batch at 7 planes, whatever the default is
        idx = S.lsh_index(_vecs(spark, range(20)), n_planes=7, dim=8)
        out = S.lsh_index_append(idx, _vecs(spark, range(100, 110)), dim=8)
        widths = {len(r["bucket"]) for r in out.collect()}
        assert widths == {7}

    def test_append_to_empty_index_raises(self, spark):
        empty = S.lsh_index(_vecs(spark, []), n_planes=5, dim=8)
        with pytest.raises(ValueError, match="empty index"):
            S.lsh_index_append(empty, _vecs(spark, range(5)), dim=8)

    def test_drift_identical_index_is_quiet(self, spark):
        idx = S.lsh_index(_vecs(spark, range(100)), n_planes=4, dim=8)
        r = S.lsh_index_drift(idx, idx, target_bucket=10, floor=2,
                              cap=8).collect()[0]
        # same occupancy, and auto sizing for n=100 at target 10 is
        # bit_length(ceil(100/10)-1) = 4 = the stored width
        assert (r["l1_ppm"], r["linf_ppm"], r["n_bins_changed"]) == (0, 0, 0)
        assert (r["planes_stored"], r["planes_auto"]) == (4, 4)
        assert not r["stale"]

    def test_drift_flags_outgrown_sizing(self, spark):
        # corpus grows 100 -> 800: auto sizing moves 4 -> 7 planes while
        # the stored width stays 4 — the rebuild trigger fires
        base = S.lsh_index(_vecs(spark, range(100)), n_planes=4, dim=8)
        live = S.lsh_index_append(base, _vecs(spark, range(100, 800)),
                                  dim=8)
        r = S.lsh_index_drift(base, live, target_bucket=10, floor=2,
                              cap=8).collect()[0]
        assert (r["n_old"], r["n_new"]) == (100, 800)
        assert (r["planes_stored"], r["planes_auto"]) == (4, 7)
        assert r["stale"]

    def test_drift_sees_data_shift_without_staleness(self, spark):
        # same corpus SIZE, shifted distribution: occupancy moves
        # (l1 > 0) but the sizing trigger stays quiet — the
        # retrain-centroids signal, not the rebuild-index signal
        base = S.lsh_index(_vecs(spark, range(100)), n_planes=4, dim=8)
        live = S.lsh_index(_vecs(spark, range(100), shift=0.9),
                           n_planes=4, dim=8)
        r = S.lsh_index_drift(base, live, target_bucket=10, floor=2,
                              cap=8).collect()[0]
        assert r["l1_ppm"] > 0
        assert not r["stale"]


# ---------------------------------------------------------------------------
# Unigram-LM (SentencePiece-model) Viterbi encoder + trainer
# ---------------------------------------------------------------------------

from pigpen_spark.functions import unigram as U


def _brute_best(word, vocab, max_piece=4):
    """All-segmentations reference: enumerate every decomposition and
    apply the documented policy (max score, ties to the segmentation
    Viterbi's shortest-last-piece rule picks)."""
    segs = []

    def rec(pos, acc, score):
        if pos == len(word):
            segs.append((score, list(acc)))
            return
        for k in range(1, min(max_piece, len(word) - pos) + 1):
            p = word[pos:pos + k]
            if p in vocab:
                acc.append(p)
                rec(pos + k, acc, score + vocab[p])
                acc.pop()

    rec(0, [], 0)
    return segs


class TestUnigramEncoder:
    def test_reconstruction_whole_corpus_vocab(self):
        # pieces must concatenate back to the word, for every corpus word
        words = ("batch part spark line column order small sort fast value "
                 "scan hash slow group agg filter query big key window join "
                 "customer merge row data table stream vector the a").split()
        for w in words:
            pieces, score = U.viterbi_encode_word(w, U.FIXED_PIECES)
            assert "".join(pieces) == w
            assert score == sum(U.FIXED_PIECES[p] for p in pieces)

    def test_matches_brute_force_enumeration(self):
        import random

        rng = random.Random(13)
        alphabet = "abcde"
        vocab = {c: -700 for c in alphabet}
        # random multi-char pieces with random scores (tie-prone: coarse
        # score grid)
        for _ in range(30):
            k = rng.randint(2, 4)
            p = "".join(rng.choice(alphabet) for _ in range(k))
            vocab[p] = -100 * rng.randint(3, 14)
        for _ in range(200):
            w = "".join(rng.choice(alphabet)
                        for _ in range(rng.randint(1, 10)))
            pieces, score = U.viterbi_encode_word(w, vocab)
            segs = _brute_best(w, vocab)
            best = max(s for s, _ in segs)
            assert score == best
            assert "".join(pieces) == w

    def test_tie_breaks_to_shortest_last_piece(self):
        # 'ab'(-10) vs 'a'(-4)+'b'(-6): equal totals — DP at position 2
        # tests k=1 first, so a|b wins
        vocab = {"a": -4, "b": -6, "ab": -10}
        pieces, score = U.viterbi_encode_word("ab", vocab)
        assert pieces == ["a", "b"] and score == -10

    def test_uncoverable_word_raises(self):
        import pytest as _pt

        with _pt.raises(ValueError, match="not coverable"):
            U.viterbi_encode_word("axe", {"a": -1, "e": -1})

    def test_oracle_matches_python_on_adversarial_vocab(self):
        import duckdb

        vocab = {**{c: -700 for c in "abcdefgh"},
                 "ab": -1400, "abc": -1350, "bc": -650, "cd": -700,
                 "abcd": -2100, "d": -700}
        rows = [(i, w) for i, w in enumerate(
            ["abcd", "abcdabcd", "aabbccdd", "dcba", "abcabc", ""])]
        vals = ", ".join(f"({i}, '{w}')" for i, w in rows)
        sql = U.unigram_encode_fixed_sql(
            f"(VALUES {vals}) t(doc_id, text)", "doc_id", "text", vocab)
        got = {r[0]: (r[1], r[2], r[3])
               for r in duckdb.sql(sql).fetchall()}
        for i, w in rows:
            if not w:
                assert got[i] == ("", 0, 0)
                continue
            pieces, score = U.viterbi_encode_word(w, vocab)
            assert got[i] == (" ".join(pieces), len(pieces), score), w

    def test_spark_encode_matches_python(self, spark):
        docs = spark.createDataFrame(
            [(1, "spark column sort"), (2, "the window merge"),
             (3, ""), (4, None)],
            "doc_id long, text string")
        out = {r["id"]: r for r in
               U.unigram_encode(docs, "doc_id", "text",
                                U.FIXED_PIECES).collect()}
        assert out[1]["pieces"] == ["s", "p", "a", "r", "k",
                                    "colu", "mn", "sort"]
        assert out[1]["score"] == -2892
        assert out[3]["pieces"] == [] and out[3]["score"] == 0
        assert out[4]["pieces"] == [] and out[4]["n_pieces"] == 0

    def test_trainer_learns_corpus_pieces(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        vocab = U.train_unigram(docs, "text", vocab_size=48, em_rounds=2)
        # coverage: every corpus word encodes, pieces reconstruct
        multi = [p for p in vocab if len(p) > 1]
        assert len(multi) > 10          # it actually learned subwords
        enc = U.unigram_encode(docs, "doc_id", "text", vocab)
        bad = enc.filter(F.size("pieces") <= 0).count()
        total = docs.count()
        assert bad == 0 and total > 0
        # determinism: retraining reproduces the table bit for bit
        assert vocab == U.train_unigram(docs, "text", vocab_size=48,
                                        em_rounds=2)

    def test_unk_fallback_policy(self):
        # out-of-charset chars become their own pieces at unk_score;
        # strict mode still raises
        import pytest as _pt

        pieces, score = U.viterbi_encode_word("copy0", U.FIXED_PIECES,
                                              unk_score=-1500)
        assert "".join(pieces) == "copy0" and "0" in pieces
        assert score == sum(U.FIXED_PIECES.get(p, -1500) for p in pieces)
        with _pt.raises(ValueError, match="not coverable"):
            U.viterbi_encode_word("copy0", U.FIXED_PIECES)
        # known pieces still always beat the fallback
        assert U.viterbi_encode_word("sort", U.FIXED_PIECES,
                                     unk_score=-1500)[0] == ["sort"]

    def test_unk_fallback_oracle_parity(self):
        import duckdb

        rows = [(1, "copy0 spark"), (2, "x9z q8"), (3, "sort")]
        vals = ", ".join(f"({i}, '{w}')" for i, w in rows)
        sql = U.unigram_encode_fixed_sql(
            f"(VALUES {vals}) t(doc_id, text)", "doc_id", "text",
            U.FIXED_PIECES, unk_score=-1500)
        got = {r[0]: (r[1], r[3]) for r in duckdb.sql(sql).fetchall()}
        for i, text in rows:
            pieces, score = [], 0
            for w in text.split():
                p, s = U.viterbi_encode_word(w, U.FIXED_PIECES,
                                             unk_score=-1500)
                pieces.extend(p)
                score += s
            assert got[i] == (" ".join(pieces), score)


class TestAudioProfileAuto:
    def test_dispatch_and_quarantine(self, spark):
        rows = [
            (0, M._wav_payload(0)),
            (1, M._mp3_payload(1)),
            (2, M._ogg_payload(0)),
            (3, M._flac_payload(0)),
            (4, b"\x00\x01\x02 not audio at all"),          # unknown
            (5, b"OggS" + bytes(40)),                        # corrupt ogg
            (6, b"fLaC" + b"\x81" + (8).to_bytes(3, "big")), # truncated flac
            (7, CX.adts_encode_skeleton(6, rate_idx=3, channels=2)),
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        out = {r["id"]: r for r in
               M.audio_profile_auto(df, "doc_id").collect()}
        assert out[0]["format"] == "wav" and out[0]["codec"] == "pcm"
        assert out[1]["format"] == "mp3" and out[1]["detail"] == 21
        assert out[2]["format"] == "ogg" and out[2]["codec"] == "opus"
        assert out[3]["format"] == "flac" and out[3]["channels"] == 1
        assert out[4]["format"] == "unknown"
        assert out[5]["format"] == "corrupt"
        assert out[6]["format"] == "corrupt"
        assert out[7]["format"] == "aac" and out[7]["detail"] == 6

    def test_fused_matches_unfused(self, spark):
        ids = spark.range(20).select(F.col("id").alias("doc_id"))
        payloads = spark.createDataFrame(
            [(i, M._audio_auto_payload(i)) for i in range(20)],
            "doc_id long, payload binary")
        fused = {r["id"]: r for r in
                 M.synth_audio_profile_auto(ids, "doc_id").collect()}
        unfused = {r["id"]: r for r in
                   M.audio_profile_auto(payloads, "doc_id").collect()}
        assert fused == unfused and len(fused) == 20
        assert {r["format"] for r in fused.values()} \
            == {"wav", "mp3", "ogg", "flac", "aac"}


# ---------------------------------------------------------------------------
# Streaming ANN index maintenance (live twin of lsh_index_append)
# ---------------------------------------------------------------------------


class TestAnnIndexStream:
    def test_streamed_index_equals_one_shot_build(self, spark, tmp_path):
        import json as _json
        import os

        from pigpen_spark.streaming import core as stc

        def vec(i):
            import hashlib
            return [(int(hashlib.md5(f"{i}_{d}".encode()).hexdigest()[:6],
                         16) % 1000) / 500.0 - 1.0 for d in range(8)]

        src = tmp_path / "in"
        src.mkdir()
        with open(src / "b0.json", "w") as f:
            for i in range(0, 40):
                f.write(_json.dumps({"vec_id": i, "embedding": vec(i)}) + "\n")
        with open(src / "b1.json", "w") as f:
            for i in range(40, 70):
                f.write(_json.dumps({"vec_id": i, "embedding": vec(i)}) + "\n")
        os.utime(src / "b0.json", (1_700_000_000, 1_700_000_000))
        os.utime(src / "b1.json", (1_700_000_100, 1_700_000_100))

        stream = (
            spark.readStream
            .schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        idx_path = str(tmp_path / "index")
        q = stc.ann_index_stream(
            stream, idx_path, str(tmp_path / "ckpt"),
            n_planes=5, dim=8, available_now=True)
        q.awaitTermination(120)

        from pigpen_spark.functions import similarity as S

        streamed = spark.read.parquet(idx_path)
        both = spark.createDataFrame(
            [(i, vec(i)) for i in range(70)],
            "vec_id long, embedding array<double>")
        rebuilt = S.lsh_index(both, n_planes=5, dim=8)
        a = sorted((r["id"], r["bucket"], round(r["nrm"], 9))
                   for r in streamed.collect())
        b = sorted((r["id"], r["bucket"], round(r["nrm"], 9))
                   for r in rebuilt.collect())
        assert a == b and len(a) == 70
        # the streamed artifact serves queries with the width-derived
        # plane count (the safe serving mode)
        batch = both.filter(F.col("vec_id") < 3)
        hits = S.lsh_topk_against(streamed, batch, k=3,
                                  n_planes="index", dim=8)
        assert hits.count() > 0


# ---------------------------------------------------------------------------
# k-core decomposition (graph-family completion)
# ---------------------------------------------------------------------------


class TestKcore:
    def test_barbell_with_tail(self, spark):
        # two 4-cliques + bridge + path tail: the 3-core keeps both
        # cliques AND the bridge edge between core members; the tail
        # peels away
        clique = lambda o: [(o + i, o + j)
                            for i in range(4) for j in range(i + 1, 4)]
        pairs = spark.createDataFrame(
            clique(0) + clique(10) + [(3, 10), (3, 20), (20, 21), (21, 22)],
            "id_a long, id_b long")
        from pigpen_spark.functions import dedup as DD

        out = {r["node"]: r["degree"]
               for r in DD.kcore(pairs, k=3).collect()}
        assert set(out) == {0, 1, 2, 3, 10, 11, 12, 13}
        assert out[3] == 4 and out[10] == 4        # bridge survives
        assert out[0] == 3

    def test_matches_python_model(self, spark):
        import random

        rng = random.Random(11)
        edges = sorted({tuple(sorted(rng.sample(range(16), 2)))
                        for _ in range(28)})

        def model(es, k):
            es = {frozenset(e) for e in es}
            while True:
                deg: dict = {}
                for e in es:
                    for n in e:
                        deg[n] = deg.get(n, 0) + 1
                keep = {n for n, d in deg.items() if d >= k}
                nes = {e for e in es if e <= keep}
                if nes == es:
                    return {n: sum(1 for e in es if n in e) for n in keep}
                es = nes

        from pigpen_spark.functions import dedup as DD

        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {r["node"]: r["degree"]
               for r in DD.kcore(pairs, k=2, rounds=16).collect()}
        assert got == model(edges, 2)

    def test_path_graph_needs_rounds(self, spark):
        # a 6-node path peels one endpoint layer per round at k=2 and
        # dies entirely; a triangle appended survives
        edges = [(i, i + 1) for i in range(5)] + [(100, 101), (101, 102),
                                                  (100, 102)]
        from pigpen_spark.functions import dedup as DD

        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        out = {r["node"] for r in DD.kcore(pairs, k=2, rounds=8).collect()}
        assert out == {100, 101, 102}

    def test_bad_args_raise(self, spark):
        from pigpen_spark.functions import dedup as DD

        pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        with pytest.raises(ValueError):
            DD.kcore(pairs, k=0)
        with pytest.raises(ValueError):
            DD.kcore(pairs, k=2, rounds=0)


# ---------------------------------------------------------------------------
# Arrow IPC (Feather v2) shard source/sink
# ---------------------------------------------------------------------------


class TestArrowIpc:
    def test_round_trip(self, spark, tmp_path):
        from pigpen_spark.sources import io as pio

        df = spark.range(500).select(
            F.col("id"),
            (F.col("id") % 7).cast("string").alias("tag"),
            F.array(F.col("id") * 1.5, F.col("id") * 2.5).alias("vec"))
        p = str(tmp_path / "ipc")
        pio.store_arrow_ipc(df, p, shards=4)
        import glob
        files = glob.glob(p + "/part-*.arrow")
        assert 1 <= len(files) <= 4
        back = pio.load_arrow_ipc(spark, p)
        assert back.df.count() == 500
        a = sorted((r["id"], r["tag"], tuple(r["vec"]))
                   for r in back.df.collect())
        b = sorted((r["id"], r["tag"], tuple(r["vec"]))
                   for r in df.collect())
        assert a == b
        # schema preserved through the arrow footer probe
        assert dict(back.df.dtypes) == dict(df.dtypes)

    def test_files_are_real_ipc(self, spark, tmp_path):
        # readable by plain pyarrow — the interchange contract
        import glob

        import pyarrow.ipc as ipc

        from pigpen_spark.sources import io as pio

        df = spark.range(50).select(F.col("id"))
        p = str(tmp_path / "ipc2")
        pio.store_arrow_ipc(df, p, shards=2)
        total = 0
        for f in glob.glob(p + "/part-*.arrow"):
            with ipc.open_file(f) as r:
                total += r.read_all().num_rows
        assert total == 50

    def test_empty_dir_raises(self, spark, tmp_path):
        from pigpen_spark.sources import io as pio

        (tmp_path / "empty").mkdir()
        with pytest.raises(ValueError, match="no part-"):
            pio.load_arrow_ipc(spark, str(tmp_path / "empty"))


class TestImageTriage:
    def test_decode_image_meta_dispatches_gif_and_bmp(self, spark):
        rows = [(0, M._png_payload(3)), (1, M._jpeg_payload(4)),
                (2, M._gif_payload(5)), (3, M._bmp_payload(6)),
                (4, b"\x00garbage")]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        out = {r["id"]: r for r in
               M.decode_image_meta(df, "doc_id").collect()}
        assert out[0]["format"] == "png"
        assert out[1]["format"] == "jpeg"
        assert out[2]["format"] == "gif"
        assert (out[2]["width"], out[2]["height"]) == (6 + 5 % 8, 6 + 2 % 8)
        assert out[3]["format"] == "bmp"
        assert (out[3]["width"], out[3]["height"]) == (4 + 6 % 9, 3 + 3 % 7)
        # non-image bytes take the documented fake path, not an error
        assert out[4]["format"] not in ("png", "jpeg", "gif", "bmp", "corrupt")

    def test_bmp_codec_round_trip_and_raises(self):
        import numpy as np

        a = (np.arange(6 * 9 * 3) % 251).reshape(6, 9, 3).astype(np.uint8)
        d = CX.bmp_encode(a)
        assert CX.bmp_meta(d) == (9, 6, 24)
        assert (CX.bmp_decode(d) == a).all()
        with pytest.raises(ValueError, match="magic"):
            CX.bmp_meta(b"XX" + bytes(60))
        with pytest.raises(ValueError):
            CX.bmp_decode(d[:-10])


# ---------------------------------------------------------------------------
# Hypothesis differentials for the round-6 codecs (pure Python, no JVM)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


class TestRound6Properties:
    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.binary(min_size=0, max_size=600),
                    min_size=1, max_size=6))
    def test_ogg_page_lacing_round_trip(self, packets):
        # any packet sizes (incl. 0 and >255, which lace across
        # multiple 255-values) survive page assembly + walk: the
        # completed-packet count and the body bytes both round-trip
        page = CX._ogg_page(7, 0, 0, packets, htype=0x02 | 0x04)
        got = list(CX._ogg_pages(page))
        assert len(got) == 1
        assert got[0]["n_packets"] == len(packets)
        assert got[0]["body"] == b"".join(packets)

    @settings(max_examples=40, deadline=None)
    @given(st.integers(1, 40), st.integers(0, 12), st.integers(1, 7),
           st.integers(0, 3))
    def test_adts_chain_round_trip(self, n, rate_idx, channels, profile):
        d = CX.adts_encode_skeleton(n, rate_idx=rate_idx,
                                    channels=channels, profile=profile)
        m = CX.adts_meta(d)
        rate = CX._ADTS_RATES[rate_idx]
        assert m == {"n_frames": n, "sample_rate": rate,
                     "channels": channels, "profile": profile,
                     "duration_ms": n * 1024 * 1000 // rate}

    @settings(max_examples=40, deadline=None)
    @given(st.integers(1, 24), st.integers(1, 24), st.integers(0, 17))
    def test_bmp_round_trip_arbitrary_dims(self, w, h, seed):
        import numpy as np

        rng = np.random.default_rng(seed)
        a = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        d = CX.bmp_encode(a)
        assert CX.bmp_meta(d) == (w, h, 24)
        assert (CX.bmp_decode(d) == a).all()

    @settings(max_examples=40, deadline=None)
    @given(st.integers(1, (1 << 20) - 1), st.integers(1, 8),
           st.integers(4, 32), st.integers(0, (1 << 36) - 1),
           st.integers(0, 3))
    def test_flac_streaminfo_bitpack_round_trip(self, rate, ch, bps,
                                                total, pads):
        d = CX.flac_encode_streaminfo(rate, ch, bps, total,
                                      n_padding_blocks=pads)
        m = CX.flac_streaminfo(d)
        assert (m["sample_rate"], m["channels"], m["bits_per_sample"],
                m["total_samples"]) == (rate, ch, bps, total)
        assert m["n_meta_blocks"] == 1 + pads


# ---------------------------------------------------------------------------
# Partition manifests (the 100 TB pre-filter for snapshot diffs)
# ---------------------------------------------------------------------------

from pigpen_spark.functions import validate as V


class TestPartitionManifest:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "id long, part string, v string")

    def test_partition_sums_add_to_table_checksum(self, spark):
        df = self._df(spark, [(i, f"p{i % 3}", f"v{i}") for i in range(30)])
        parts = {r["part"]: r for r in
                 V.partition_checksums(df, ["part"]).collect()}
        total = V.dataset_checksum(df, columns=["id", "v"]).collect()[0]
        assert sum(int(r["checksum"]) for r in parts.values()) \
            == int(total["checksum"])
        assert sum(r["n_rows"] for r in parts.values()) == total["n_rows"]

    def test_diff_classifies_all_statuses(self, spark):
        old = self._df(spark, [(1, "a", "x"), (2, "a", "y"), (3, "b", "z"),
                               (4, "c", "w")])
        new = self._df(spark, [(1, "a", "x"), (2, "a", "EDITED"),   # changed
                               (4, "c", "w"),                        # same
                               (5, "d", "n")])                       # added; b removed
        d = {r["part"]: r for r in V.manifest_diff(
            V.partition_checksums(old, ["part"]),
            V.partition_checksums(new, ["part"]), ["part"]).collect()}
        assert d["a"]["status"] == "changed"
        assert d["b"]["status"] == "removed" and d["b"]["n_rows_new"] == 0
        assert d["d"]["status"] == "added" and d["d"]["n_rows_old"] == 0
        assert "c" not in d                      # unchanged drops out

    def test_reordered_rows_are_unchanged(self, spark):
        rows = [(i, "p", f"v{i}") for i in range(20)]
        old = self._df(spark, rows).repartition(8)
        new = self._df(spark, list(reversed(rows))).repartition(3)
        assert V.manifest_diff(
            V.partition_checksums(old, ["part"]),
            V.partition_checksums(new, ["part"]), ["part"]).count() == 0

    def test_arg_validation(self, spark):
        df = self._df(spark, [(1, "a", "x")])
        with pytest.raises(ValueError):
            V.partition_checksums(df, [])
        with pytest.raises(ValueError):
            V.partition_checksums(df.select("part"), ["part"])

    def test_null_partition_values_are_stable(self, spark):
        # a NULL partition value is a real partition: identical
        # manifests must diff to EMPTY (plain equi-join would emit it
        # as removed+added forever)
        df = spark.createDataFrame(
            [(1, None, "x"), (2, None, "y"), (3, "b", "z")],
            "id long, part string, v string")
        m = V.partition_checksums(df, ["part"])
        assert V.manifest_diff(m, m, ["part"]).count() == 0
        # and a change inside the NULL partition is still seen
        df2 = spark.createDataFrame(
            [(1, None, "x"), (2, None, "EDIT"), (3, "b", "z")],
            "id long, part string, v string")
        d = V.manifest_diff(m, V.partition_checksums(df2, ["part"]),
                            ["part"]).collect()
        assert len(d) == 1 and d[0]["status"] == "changed" \
            and d[0]["part"] is None


class TestManifestStream:
    def test_streamed_manifest_equals_batch(self, spark, tmp_path):
        import json as _json
        import os

        from pigpen_spark.streaming import core as stc

        src = tmp_path / "in"
        src.mkdir()
        rows0 = [{"id": i, "part": f"p{i % 3}", "v": f"v{i}"}
                 for i in range(40)]
        rows1 = [{"id": i, "part": f"p{i % 4}", "v": f"w{i}"}
                 for i in range(40, 70)]
        for name, rows, ts in (("b0.json", rows0, 1_700_000_000),
                               ("b1.json", rows1, 1_700_000_100)):
            with open(src / name, "w") as f:
                for r in rows:
                    f.write(_json.dumps(r) + "\n")
            os.utime(src / name, (ts, ts))

        stream = (
            spark.readStream.schema("id long, part string, v string")
            .option("maxFilesPerTrigger", 1).json(str(src))
        )
        mpath = str(tmp_path / "manifest")
        q = stc.manifest_stream(stream, ["part"], mpath,
                                str(tmp_path / "ckpt"), available_now=True)
        q.awaitTermination(120)

        streamed = {r["part"]: (r["n_rows"], r["checksum"]) for r in
                    stc.read_manifest(spark, mpath).collect()}
        both = spark.createDataFrame(
            [(r["id"], r["part"], r["v"]) for r in rows0 + rows1],
            "id long, part string, v string")
        batch = {r["part"]: (r["n_rows"], r["checksum"]) for r in
                 V.partition_checksums(both, ["part"]).collect()}
        assert streamed == batch
        # the live manifest diffs cleanly against a batch-side manifest
        assert V.manifest_diff(
            stc.read_manifest(spark, mpath),
            V.partition_checksums(both, ["part"]), ["part"]).count() == 0


class TestAutoSizingPlumbing:
    def test_lsh_index_auto_sizing_overrides_defaults(self, spark):
        vecs = _vecs(spark, range(100), dim=8)
        # defaults (200, 8, 32): 100 vectors -> floor 8 planes
        assert len(S.lsh_index(vecs, n_planes="auto", dim=8)
                   .first()["bucket"]) == 8
        # custom sizing (10, 2, 8): ceil(100/10)=10 -> bit_length(9)=4
        assert len(S.lsh_index(vecs, n_planes="auto", dim=8,
                               auto_sizing=(10, 2, 8))
                   .first()["bucket"]) == 4
        # explicit int ignores auto_sizing
        assert len(S.lsh_index(vecs, n_planes=5, dim=8,
                               auto_sizing=(10, 2, 8))
                   .first()["bucket"]) == 5
