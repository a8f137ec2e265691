"""Round-3 third-pass additions: ORC I/O, sort {:parallel} parity,
snapshot diff, perplexity buckets, mergeable histogram quantiles,
windowed event dedup, large-star/small-star WCC."""

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pigpen_spark.relation import Relation, return_  # noqa: E402
from pigpen_spark.sources import io as pio  # noqa: E402


class TestOrc:
    def test_store_load_roundtrip(self, spark, tmp_path):
        r = return_(spark, [(1, "foo"), (2, "bar")], "a long, b string")
        d = str(tmp_path / "out_orc")
        r.store_orc(d)
        back = pio.load_orc(spark, d)
        assert sorted(tuple(x) for x in back.df.collect()) == [(1, "foo"), (2, "bar")]

    def test_partitioned_write(self, spark, tmp_path):
        r = return_(spark, [(1, "x"), (2, "x"), (3, "y")], "a long, k string")
        d = str(tmp_path / "out_orc_p")
        r.store_orc(d, partition_by=["k"])
        assert (tmp_path / "out_orc_p" / "k=x").exists()
        assert pio.load_orc(spark, d).count() == 3

    def test_pushdown_reaches_scan(self, spark, tmp_path):
        # ORC scans must push filters + prune columns exactly like parquet.
        d = str(tmp_path / "orc_push")
        return_(spark, [(i, f"s{i}", i * 2) for i in range(100)],
                "a long, s string, b long").store_orc(d)
        df = pio.load_orc(spark, d).filter(F.col("a") > 50).df.select("s")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [IsNotNull(a), GreaterThan(a,50)]" in plan
        assert "ReadSchema: struct<a:bigint,s:string>" in plan


class TestSortParallel:
    def test_parallel_pins_partition_count(self, spark):
        r = return_(spark, [(i,) for i in range(1000)], "x long")
        s = r.sort(F.col("x"), parallel=3)
        assert s.df.rdd.getNumPartitions() == 3
        vals = [row.x for row in s.df.collect()]
        assert vals == sorted(vals)

    def test_parallel_descending(self, spark):
        r = return_(spark, [(i,) for i in range(100)], "x long")
        s = r.sort(F.col("x").desc(), parallel=2)
        vals = [row.x for row in s.df.collect()]
        assert vals == sorted(vals, reverse=True)

    def test_sort_by_parallel_consumes_key(self, spark):
        r = return_(spark, [(3,), (1,), (2,)], "x long")
        s = r.sort_by(F.col("x") * -1, parallel=2)
        assert s.df.columns == ["x"]
        assert [row.x for row in s.df.collect()] == [3, 2, 1]


from pigpen_spark.functions import dedup as D  # noqa: E402
from pigpen_spark.functions import sketch as K  # noqa: E402
from pigpen_spark.functions.classify import perplexity_buckets  # noqa: E402
from pigpen_spark.operators.analytics import snapshot_diff  # noqa: E402
from pigpen_spark.operators.windows import dedup_keyed_window  # noqa: E402


class TestStarWCC:
    def _check(self, spark, edges):
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        star = sorted(tuple(r) for r in D.dedup_clusters_star(pairs).collect())
        label = sorted(tuple(r) for r in
                       D.dedup_clusters(pairs, local_threshold=0).collect())
        assert star == label

    def test_path_graph(self, spark):
        # diameter-8 chain: the case min-label needs 8 rounds for and
        # star needs ~log; labels must agree exactly
        self._check(spark, [(i, i + 1) for i in range(8)])

    def test_random_graphs_match_min_label(self, spark):
        import random
        for seed in (1, 7, 42):
            rng = random.Random(seed)
            edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(25)]
            self._check(spark, edges)

    def test_star_and_isolated(self, spark):
        # hub star + self-loop-only node + 2-cycle
        self._check(spark, [(5, i) for i in range(5)] + [(9, 9), (7, 8), (8, 7)])


class TestSnapshotDiff:
    def _frames(self, spark):
        old = spark.createDataFrame(
            [(1, 10, "a"), (2, 20, "b"), (3, 30, "c")], "k long, v long, s string")
        new = spark.createDataFrame(
            [(2, 20, "b"), (3, 31, "c"), (4, 40, "d")], "k long, v long, s string")
        return old, new

    def test_statuses(self, spark):
        old, new = self._frames(spark)
        out = {r.k: r.status for r in snapshot_diff(old, new, ["k"]).collect()}
        assert out == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}

    def test_values_carried(self, spark):
        old, new = self._frames(spark)
        row = {r.k: r for r in snapshot_diff(old, new, ["k"]).collect()}[3]
        assert (row.old_v, row.new_v) == (30, 31)

    def test_null_safe_compare(self, spark):
        old = spark.createDataFrame([(1, None), (2, None)], "k long, v string")
        new = spark.createDataFrame([(1, None), (2, "x")], "k long, v string")
        out = {r.k: r.status for r in snapshot_diff(old, new, ["k"]).collect()}
        assert out == {1: "unchanged", 2: "changed"}

    def test_hash_compare_same_statuses(self, spark):
        old, new = self._frames(spark)
        a = {r.k: r.status for r in snapshot_diff(old, new, ["k"]).collect()}
        b = {r.k: r.status for r in
             snapshot_diff(old, new, ["k"], hash_compare=True).collect()}
        assert a == b

    def test_no_compare_columns_raises(self, spark):
        old = spark.createDataFrame([(1,)], "k long")
        with pytest.raises(ValueError):
            snapshot_diff(old, old, ["k"])


class TestHistogramQuantiles:
    def test_error_bounded_by_bin_width(self, spark):
        vals = [(i * 37 % 10_000,) for i in range(5000)]
        df = spark.createDataFrame(vals, "x long")
        n_bins = 100
        w = 10_000 // n_bins
        out = {r.p_permille: r.est for r in K.histogram_quantiles(
            df, F.col("x"), lo=0, hi=10_000, n_bins=n_bins).collect()}
        xs = sorted(v for (v,) in vals)
        for p in (500, 900, 990):
            exact = xs[max(0, -(-p * len(xs) // 1000) - 1)]
            assert abs(out[p] - exact) <= w, (p, out[p], exact)

    def test_sharded_equals_unsharded(self, spark):
        df = spark.createDataFrame(
            [(i % 1000, f"s{i % 7}") for i in range(3000)], "x long, shard string")
        a = sorted(tuple(r) for r in K.histogram_quantiles(
            df, F.col("x"), 0, 1000, 64).collect())
        b = sorted(tuple(r) for r in K.histogram_quantiles(
            df, F.col("x"), 0, 1000, 64, shard_col=F.col("shard")).collect())
        assert a == b

    def test_out_of_range_clamps(self, spark):
        df = spark.createDataFrame([(-50,), (50,), (99999,)], "x long")
        hist = {r.bin: r.cnt for r in K.histogram_sketch(
            df, F.col("x"), lo=0, hi=100, n_bins=10).collect()}
        assert hist == {0: 1, 5: 1, 9: 1}


class TestPerplexityBuckets:
    def test_exact_form_balanced(self, spark):
        rows = [(i, f"w{i} x{i} y{i} z{i} q{i} r{i}", "en") for i in range(9)]
        df = spark.createDataFrame(rows, "id long, text string, lang string")
        out = [r.bucket for r in perplexity_buckets(df, "id", "text", "lang").collect()]
        assert sorted(out) == [0, 0, 0, 1, 1, 1, 2, 2, 2]

    def test_degenerate_doc_null_bucket(self, spark):
        df = spark.createDataFrame(
            [(1, "single", "en"), (2, "two words here", "en")],
            "id long, text string, lang string")
        out = {r.id: r.bucket for r in
               perplexity_buckets(df, "id", "text", "lang").collect()}
        assert out[1] is None and out[2] is not None

    def test_threshold_form_no_window(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c", "en"), (2, "d e f", "en"), (3, "", "en")],
            "id long, text string, lang string")
        out = perplexity_buckets(df, "id", "text", "lang",
                                 thresholds={"en": [-0.2, -0.6]})
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan  # the scale form is windowless
        got = {r.id: r.bucket for r in out.collect()}
        assert got[3] is None
        assert all(v in (0, 1, 2) for k, v in got.items() if k != 3)


class TestDedupKeyedWindow:
    def test_keeps_first_per_window(self, spark):
        rows = [
            (1, "2024-01-01 00:00:05", 100, "click"),
            (2, "2024-01-01 00:03:00", 100, "click"),   # same 10-min window: drop
            (3, "2024-01-01 00:12:00", 100, "click"),   # next window: keep
            (4, "2024-01-01 00:04:00", 100, "view"),    # other type: keep
            (5, "2024-01-01 00:04:00", 200, "click"),   # other user: keep
        ]
        df = spark.createDataFrame(rows, "event_id long, ts string, user_id long, event_type string") \
                  .withColumn("ts", F.col("ts").cast("timestamp"))
        out = dedup_keyed_window(df, ["user_id", "event_type"], "ts", 600,
                                 tiebreak=["event_id"])
        assert sorted(r.event_id for r in out.collect()) == [1, 3, 4, 5]

    def test_tiebreak_deterministic(self, spark):
        rows = [(9, "2024-01-01 00:00:05", 1, "c"), (2, "2024-01-01 00:00:05", 1, "c")]
        df = spark.createDataFrame(rows, "event_id long, ts string, user_id long, event_type string") \
                  .withColumn("ts", F.col("ts").cast("timestamp"))
        out = dedup_keyed_window(df, ["user_id", "event_type"], "ts", 600,
                                 tiebreak=["event_id"])
        assert [r.event_id for r in out.collect()] == [2]

    def test_window_group_limit_plan(self, spark):
        df = spark.createDataFrame(
            [(1, "2024-01-01 00:00:05", 1, "c")],
            "event_id long, ts string, user_id long, event_type string") \
            .withColumn("ts", F.col("ts").cast("timestamp"))
        out = dedup_keyed_window(df, ["user_id", "event_type"], "ts", 600)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan


class TestBloom:
    def _items(self, spark, vals):
        return spark.createDataFrame([(v,) for v in vals], "h long")

    def test_no_false_negatives(self, spark):
        ins = list(range(0, 2000, 7))
        sk = K.bloom_build(self._items(spark, ins), m_bits=4096, k=3)
        out = K.bloom_maybe_contains(self._items(spark, ins), sk, m_bits=4096, k=3)
        assert all(r.maybe for r in out.collect())

    def test_false_positives_bounded(self, spark):
        ins = list(range(0, 500))
        sk = K.bloom_build(self._items(spark, ins), m_bits=1 << 14, k=3)
        probe = list(range(10_000, 12_000))
        out = K.bloom_maybe_contains(self._items(spark, probe), sk,
                                     m_bits=1 << 14, k=3)
        fp = sum(1 for r in out.collect() if r.maybe)
        # theoretical ~ (1-e^{-3*500/16384})^3 ≈ 6e-4 → expect ~1 of 2000
        assert fp <= 20

    def test_merge_is_bit_or(self, spark):
        a, b = list(range(100)), list(range(50, 150))
        ska = K.bloom_build(self._items(spark, a), m_bits=2048, k=3)
        skb = K.bloom_build(self._items(spark, b), m_bits=2048, k=3)
        merged = ska.unionByName(skb).groupBy("word").agg(
            F.bit_or("bits").alias("bits"))
        direct = K.bloom_build(self._items(spark, a + b), m_bits=2048, k=3)
        assert sorted(tuple(r) for r in merged.collect()) == \
               sorted(tuple(r) for r in direct.collect())

    def test_decontaminate_superset_of_exact(self, spark, sf_dir):
        # bloom flags ⊇ exact contamination (no false negatives end-to-end)
        from pigpen_spark.catalog_ext import (
            ext_bloom_decontaminate, ext_decontaminate)
        bloom = {r.doc_id for r in
                 ext_bloom_decontaminate(spark, sf_dir).collect() if r.flagged}
        # exact decontaminate shares ≥1 distinct 5-gram; bloom uses
        # 3-shingles, so compare against a 3-gram exact reference instead
        from pigpen_spark.catalog import tables as _tables
        from pigpen_spark.functions import dedup as _D
        from pigpen_spark.functions import pipeline as _P
        docs = _tables(spark, sf_dir)["documents"]
        lab = _P.split_by_hash(docs.df.select("doc_id", "text"), "doc_id",
                               {"train": 0.9, "test": 0.1}, salt="decon")
        sh = _D.shingle_hashes(_D.token_hashes(F.col("text")), 3)
        te = lab.filter(F.col("split") == "test").select(
            F.explode(sh).alias("h")).distinct()
        tr = lab.filter(F.col("split") == "train").select(
            "doc_id", F.explode(F.array_distinct(sh)).alias("h"))
        exact = {r.doc_id for r in
                 tr.join(te, on="h").select("doc_id").distinct().collect()}
        assert exact <= bloom


class TestGroupedQuantiles:
    def test_per_group_matches_solo(self, spark):
        df = spark.createDataFrame(
            [(i % 500 + (100 if g == "b" else 0), g)
             for i in range(2000) for g in ("a", "b")], "x long, g string")
        grouped = K.histogram_quantiles(df, F.col("x"), 0, 1000, 50,
                                        group_cols=["g"])
        for g in ("a", "b"):
            solo = sorted(
                (r.p_permille, r.est, r.n_total) for r in K.histogram_quantiles(
                    df.where(F.col("g") == g), F.col("x"), 0, 1000, 50).collect())
            sub = sorted(
                (r.p_permille, r.est, r.n_total)
                for r in grouped.collect() if r.g == g)
            assert sub == solo


class TestNewPlans:
    def test_snapshot_diff_single_smj(self, spark, sf_dir):
        from pigpen_spark.catalog_ext import ext_snapshot_diff
        plan = ext_snapshot_diff(spark, sf_dir)._jdf.queryExecution() \
            .executedPlan().toString()
        # the diff is ONE co-partitioned sort-merge join; a broadcast FO
        # join or a nested-loop here would not survive two 100 TB sides
        assert plan.count("SortMergeJoin") == 1
        assert "BroadcastNestedLoopJoin" not in plan

    def test_bloom_probe_joins_broadcast(self, spark, sf_dir):
        from pigpen_spark.catalog_ext import ext_bloom_decontaminate
        plan = ext_bloom_decontaminate(spark, sf_dir)._jdf.queryExecution() \
            .executedPlan().toString()
        # every join is broadcast (sketch + bounded flag/label sides) —
        # the probed corpus is never the build side of a shuffle join
        assert "SortMergeJoin" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert plan.count("BroadcastHashJoin") >= 2


class TestBatchStreamDedupConsistency:
    def test_windowed_dedup_agrees_with_streaming(self, spark, tmp_path):
        """Backfill/live consistency: dedup_keyed_window (batch) and the
        streaming dedup keyed on the SAME integer window id keep the same
        events when the stream arrives in event-time order."""
        import json as _json
        from pigpen_spark.streaming import core as st

        rows = [
            {"event_id": 1, "ts": "2024-01-01 00:00:05", "user_id": 1, "event_type": "c"},
            {"event_id": 2, "ts": "2024-01-01 00:03:00", "user_id": 1, "event_type": "c"},
            {"event_id": 3, "ts": "2024-01-01 00:12:00", "user_id": 1, "event_type": "c"},
            {"event_id": 4, "ts": "2024-01-01 00:04:00", "user_id": 2, "event_type": "c"},
        ]
        src = tmp_path / "bsd"
        src.mkdir(parents=True, exist_ok=True)
        with open(src / "b0.json", "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")

        schema = "event_id long, ts timestamp, user_id long, event_type string"
        batch_df = spark.read.schema(schema).json(str(src))
        batch = dedup_keyed_window(
            batch_df, ["user_id", "event_type"], "ts", 600, tiebreak=["event_id"])
        kept_batch = sorted(r.event_id for r in batch.collect())

        stream = st.read_stream_json(spark, str(src), schema).df
        micros = F.unix_micros(F.col("ts").cast("timestamp"))
        win = (micros - micros % (600 * 1_000_000)).alias("window_id")
        dd = st.dedup_stream(
            stream.withColumn("window_id", win),
            ["user_id", "event_type", "window_id"], "ts")
        q = (dd.writeStream.format("memory").queryName("bsd_out")
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ck_bsd"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        kept_stream = sorted(
            r.event_id for r in spark.sql("select * from bsd_out").collect())
        assert kept_batch == kept_stream == [1, 3, 4]


from pigpen_spark.functions import validate as V  # noqa: E402


class TestValidate:
    def _df(self, spark):
        return spark.createDataFrame(
            [(1, 10, "a"), (2, None, "b"), (3, 200, None), (4, 50, "d")],
            "id long, qty long, name string")

    def test_check_rules_counts(self, spark):
        out = {r.rule: (r.n_rows, r.n_violations, r.passed)
               for r in V.check_rules(self._df(spark), {
                   "qty_range": F.col("qty").between(1, 100),
                   "name_present": F.col("name").isNotNull(),
                   "id_positive": F.col("id") > 0,
               }).collect()}
        # NULL qty counts as a violation (completeness convention)
        assert out == {"qty_range": (4, 2, False),
                       "name_present": (4, 1, False),
                       "id_positive": (4, 0, True)}

    def test_violating_rows_tags(self, spark):
        out = {r.id: r.failed_rules for r in V.violating_rows(
            self._df(spark), {
                "qty_range": F.col("qty").between(1, 100),
                "name_present": F.col("name").isNotNull(),
            }).collect()}
        assert out == {2: "qty_range", 3: "name_present,qty_range"}

    def test_single_pass_plan(self, spark):
        df = self._df(spark)
        plan = V.check_rules(df, {
            "a": F.col("qty") > 0, "b": F.col("name").isNotNull(),
            "c": F.col("id") < 100,
        })._jdf.queryExecution().executedPlan().toString()
        # all rules in ONE aggregate over ONE scan — no per-rule jobs
        assert plan.count("Scan ") + plan.count("Scan\n") <= 1 or \
               plan.count("ExistingRDD") <= 1

    def test_fk_violations(self, spark):
        child = spark.createDataFrame(
            [(1, 10), (2, 20), (3, 99), (4, None)], "id long, fk long")
        parent = spark.createDataFrame([(10,), (20,)], "pk long")
        row = V.fk_violations(child, parent, "fk", "pk").collect()[0]
        # NULL fk passes (SQL FK semantics); 99 is the only orphan
        assert (row.rule, row.n_rows, row.n_violations, row.passed) == \
               ("fk_fk", 4, 1, False)

    def test_empty_rules_raise(self, spark):
        with pytest.raises(ValueError):
            V.check_rules(self._df(spark), {})


class TestMergeRollups:
    def test_merge_equals_direct(self, spark):
        from pigpen_spark.operators.analytics import merge_rollups
        df = spark.createDataFrame(
            [(i % 5, i, i * 2) for i in range(100)], "k long, a long, b long")
        def roll(d):
            return d.groupBy("k").agg(
                F.count(F.lit(1)).alias("n"), F.sum("a").alias("sa"),
                F.min("b").alias("mb"), F.max("b").alias("xb"))
        parts = [roll(df.where(F.col("a") < 30)),
                 roll(df.where((F.col("a") >= 30) & (F.col("a") < 70))),
                 roll(df.where(F.col("a") >= 70))]
        merged = merge_rollups(parts, ["k"],
                               {"n": "count", "sa": "sum", "mb": "min", "xb": "max"})
        assert sorted(tuple(r) for r in merged.collect()) == \
               sorted(tuple(r) for r in roll(df).collect())

    def test_non_associative_merge_rejected(self, spark):
        from pigpen_spark.operators.analytics import merge_rollups
        d = spark.createDataFrame([(1, 2.0)], "k long, avg double")
        with pytest.raises(ValueError, match="non-associative"):
            merge_rollups([d], ["k"], {"avg": "avg"})


class TestUnpivot:
    def test_melt_roundtrip(self, spark):
        r = return_(spark, [(1, 10, 20), (2, 30, 40)], "id long, a long, b long")
        m = r.unpivot(["id"], ["a", "b"])
        assert m.df.columns == ["id", "variable", "value"]
        got = sorted(tuple(x) for x in m.df.collect())
        assert got == [(1, "a", 10), (1, "b", 20), (2, "a", 30), (2, "b", 40)]
        # pivot back reverses the melt
        back = (m.group_by("id").pivot("variable", ["a", "b"])
                 .fold(F.first("value")))
        assert sorted(tuple(x) for x in back.df.collect()) == [(1, 10, 20), (2, 30, 40)]


class TestRollupStream:
    def test_incremental_rollup_matches_direct(self, spark, tmp_path):
        import json as _json
        from pigpen_spark.streaming import core as st

        src = tmp_path / "rs_src"
        src.mkdir(parents=True, exist_ok=True)
        rows0 = [{"k": 1, "v": 5}, {"k": 2, "v": 7}, {"k": 1, "v": 1}]
        rows1 = [{"k": 1, "v": 9}, {"k": 3, "v": 2}]
        for name, rows in (("b0", rows0), ("b1", rows1)):
            with open(src / f"{name}.json", "w") as f:
                for r in rows:
                    f.write(_json.dumps(r) + "\n")

        stream = (spark.readStream.schema("k long, v long")
                  .option("maxFilesPerTrigger", 1).json(str(src)))
        q = st.rollup_stream(
            stream, ["k"],
            aggs={"n": F.count(F.lit(1)), "s": F.sum("v"),
                  "lo": F.min("v"), "hi": F.max("v")},
            merges={"n": "count", "s": "sum", "lo": "min", "hi": "max"},
            rollup_path=str(tmp_path / "rs_rollup"),
            checkpoint=str(tmp_path / "rs_ck"),
            available_now=True,
        )
        q.awaitTermination(120)

        import os
        versions = sorted(os.listdir(tmp_path / "rs_rollup"))
        assert len([v for v in versions if v.startswith("v")]) == 1  # pruned
        latest = sorted(int(v[1:]) for v in versions if v.startswith("v"))[-1]
        got = sorted(tuple(r) for r in spark.read.parquet(
            str(tmp_path / "rs_rollup" / f"v{latest}")).collect())
        direct = spark.read.schema("k long, v long").json(str(src)).groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
            F.min("v").alias("lo"), F.max("v").alias("hi"))
        assert got == sorted(tuple(r) for r in direct.collect())


class TestSinkLayout:
    def test_max_records_per_file_bounds_files(self, spark, tmp_path):
        r = return_(spark, [(i,) for i in range(100)], "x long")
        d = tmp_path / "layout_pq"
        Relation(r.df.coalesce(1)).store_parquet(
            str(d), max_records_per_file=30, compression="zstd")
        files = list(d.glob("part-*.parquet"))
        assert len(files) == 4  # ceil(100/30)
        assert spark.read.parquet(str(d)).count() == 100


class TestMinhashEval:
    def test_planted_dups_recalled(self, spark):
        from pigpen_spark.functions.dedup import exact_jaccard_pairs, minhash_eval
        base = "the quick brown fox jumps over the lazy dog again and again"
        rows = [(1, base), (2, base + " tail"), (3, "completely different words here now"),
                (4, "another unrelated document about spark engines")]
        df = spark.createDataFrame(rows, "id long, text string")
        truth = sorted(tuple(r) for r in exact_jaccard_pairs(
            df, "id", "text", threshold_permille=500).collect())
        assert truth == [(1, 2)]
        row = minhash_eval(df, "id", "text", threshold_permille=500).collect()[0]
        assert row.n_true == 1
        assert row.n_hits == 1              # near-identical pair is blocked together
        assert row.recall_ppm == 1_000_000

    def test_empty_corpus(self, spark):
        from pigpen_spark.functions.dedup import minhash_eval
        df = spark.createDataFrame([], "id long, text string")
        row = minhash_eval(df, "id", "text").collect()[0]
        assert (row.n_true, row.n_candidates, row.n_hits) == (0, 0, 0)
        assert row.precision_ppm is None and row.recall_ppm is None


class TestBlockingEvalGeneric:
    def test_simhash_candidates_gradeable(self, spark):
        from pigpen_spark.functions.dedup import (
            blocking_eval, exact_jaccard_pairs, simhash_candidates)
        base = "the quick brown fox jumps over the lazy dog again and again"
        rows = [(1, base), (2, base + " tail"),
                (3, "completely different words entirely here now"),
                (4, "spark engines aggregate shuffled partitions nightly")]
        df = spark.createDataFrame(rows, "id long, text string")
        truth = exact_jaccard_pairs(df, "id", "text", threshold_permille=500)
        cand = simhash_candidates(df, "id", "text", chunks=8, max_hamming=12)
        row = blocking_eval(truth, cand).collect()[0]
        assert row.n_true == 1 and row.n_hits == 1
        assert row.recall_ppm == 1_000_000


class TestProfile:
    def test_counts(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (2, None), (2, "b"), (None, "b")], "x long, s string")
        out = {r.column: (r.n_rows, r.n_null, r.n_distinct)
               for r in V.profile(df).collect()}
        assert out == {"x": (4, 1, 2), "s": (4, 1, 2)}

    def test_approx_form_no_expand(self, spark):
        df = spark.createDataFrame([(1, "a")], "x long, s string")
        exact_plan = V.profile(df)._jdf.queryExecution().executedPlan().toString()
        approx_plan = V.profile(df, exact_distinct=False) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Expand" in exact_plan       # multi-distinct cost, documented
        assert "Expand" not in approx_plan  # the 100 TB-width path

    def test_no_columns_raise(self, spark):
        df = spark.createDataFrame([(1,)], "x long")
        with pytest.raises(ValueError):
            V.profile(df, columns=[])


class TestBlocklist:
    def test_literal_and_table_forms_agree(self, spark):
        from pigpen_spark.functions.text import blocklist_hit, blocklist_hits_join
        rows = [(1, "a clean doc"), (2, "contains BadWord here"),
                (3, "badword badword twice"), (4, "")]
        df = spark.createDataFrame(rows, "id long, text string")
        bl = ["badword", "otherbad"]
        lit = {r.id: r.hit for r in df.select(
            "id", blocklist_hit("text", bl).alias("hit")).collect()}
        words = spark.createDataFrame([(w,) for w in bl], "word string")
        tbl = {r.id: (r.hit, r.n_hits) for r in
               blocklist_hits_join(df, "id", "text", words).collect()}
        assert lit == {1: False, 2: True, 3: True, 4: False}
        assert {k: v[0] for k, v in tbl.items()} == lit
        assert tbl[3][1] == 2  # hit multiplicity only in the table form


class TestTrainedLM:
    def test_fluent_text_outscores_shuffled(self, spark):
        from pigpen_spark.functions.classify import (
            bigram_lm_score_counts, train_bigram_counts)
        corpus = [(i, "the cat sat on the mat and the dog sat too") for i in range(10)]
        train = spark.createDataFrame(corpus, "id long, text string")
        counts = train_bigram_counts(train, "text")
        test = spark.createDataFrame(
            [(100, "the cat sat on the mat"),       # in-distribution
             (101, "mat the on sat cat the"),        # shuffled
             (102, "zebra quantum flux"),            # OOV
             (103, "single")],                       # degenerate
            "id long, text string")
        out = {r.id: (r.n_bigrams, r.mean_p_ppm) for r in
               bigram_lm_score_counts(test, "id", "text", counts).collect()}
        assert out[100][1] > out[101][1] >= 0
        assert out[102][1] == 0
        assert out[103] == (0, None)


class TestTriangles:
    def test_known_graph(self, spark):
        from pigpen_spark.functions.dedup import triangle_counts
        # K4 on {1,2,3,4} (4 triangles, each node in 3) + chain 5-6-7 (none)
        edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
        edges += [(5, 6), (6, 7)]
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        out = {r.id: r.n_triangles for r in triangle_counts(df).collect()}
        assert out == {1: 3, 2: 3, 3: 3, 4: 3}

    def test_orientation_and_dups_ignored(self, spark):
        from pigpen_spark.functions.dedup import triangle_counts
        # same triangle given in mixed orientations + dup edges + self-loop
        edges = [(2, 1), (1, 3), (3, 2), (1, 2), (1, 1)]
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        out = {r.id: r.n_triangles for r in triangle_counts(df).collect()}
        assert out == {1: 1, 2: 1, 3: 1}


class TestExactKth:
    def test_matches_sorted(self, spark):
        import random
        rng = random.Random(3)
        xs = [rng.randrange(-10_000, 10_000) for _ in range(2000)]
        df = spark.createDataFrame([(x,) for x in xs], "x long")
        s = sorted(xs)
        for k in (1, 2, 1000, 1999, 2000):
            assert K.exact_kth(df, F.col("x"), k, n_bins=16) == s[k - 1]

    def test_duplicates_and_tiny_range(self, spark):
        df = spark.createDataFrame([(5,)] * 10 + [(7,)] * 3, "x long")
        assert K.exact_kth(df, F.col("x"), 10) == 5
        assert K.exact_kth(df, F.col("x"), 11) == 7

    def test_out_of_range_k(self, spark):
        df = spark.createDataFrame([(1,)], "x long")
        with pytest.raises(ValueError):
            K.exact_kth(df, F.col("x"), 2)


class TestHeavyExactAndCardinality:
    def test_heavy_exact_counts_are_exact(self, spark):
        rows = [(i, "hot " * 20 + f"rare{i}") for i in range(30)]
        df = spark.createDataFrame(rows, "id long, text string")
        out = {r.term: r.cnt for r in K.heavy_hitters_exact(
            df, "text", min_count=100).collect()}
        assert out == {"hot": 600}  # exact, not a CMS overestimate

    def test_join_cardinality(self, spark):
        from pigpen_spark.tuning import join_cardinality_estimate
        a = spark.createDataFrame([(1,), (1,), (2,), (3,)], "k long")
        b = spark.createDataFrame([(1,), (2,), (2,), (9,)], "j long")
        row = join_cardinality_estimate(a, b, "k", "j").collect()[0]
        # key 1: 2*1, key 2: 1*2 → 4; keys 3/9 unmatched
        assert (row.n_left, row.n_right, row.n_join) == (4, 4, 4)

    def test_join_cardinality_disjoint(self, spark):
        from pigpen_spark.tuning import join_cardinality_estimate
        a = spark.createDataFrame([(1,)], "k long")
        b = spark.createDataFrame([(2,)], "j long")
        assert join_cardinality_estimate(a, b, "k", "j").collect()[0].n_join == 0


class TestExactKthWideDomain:
    def test_values_beyond_double_precision(self, spark):
        # offsets near 2^60: double-division binning would misplace these
        base = 1 << 60
        xs = [base + i * 3 for i in range(50)] + [-(base // 2), 0]
        df = spark.createDataFrame([(x,) for x in xs], "x long")
        s = sorted(xs)
        for k in (1, 2, 26, 52):
            assert K.exact_kth(df, F.col("x"), k, n_bins=8) == s[k - 1]


class TestHistogramDrift:
    def test_identical_slices_zero_drift(self, spark):
        df = spark.createDataFrame([(i % 100,) for i in range(1000)], "x long")
        row = K.histogram_drift(df, df, F.col("x"), 0, 100, 20).collect()[0]
        assert (row.l1_ppm, row.linf_ppm, row.n_bins_changed) == (0, 0, 0)

    def test_disjoint_slices_max_drift(self, spark):
        a = spark.createDataFrame([(1,)] * 10, "x long")
        b = spark.createDataFrame([(99,)] * 10, "x long")
        row = K.histogram_drift(a, b, F.col("x"), 0, 100, 10).collect()[0]
        assert row.l1_ppm == 2_000_000 and row.n_bins_changed == 2

    def test_empty_side_survives(self, spark):
        a = spark.createDataFrame([], "x long")
        b = spark.createDataFrame([(5,)] * 4, "x long")
        row = K.histogram_drift(a, b, F.col("x"), 0, 100, 10).collect()[0]
        assert (row.n_old, row.n_new, row.l1_ppm) == (0, 4, 1_000_000)


class TestStarRoundCount:
    def test_long_path_converges_in_log_rounds(self, spark):
        # a 64-edge path has diameter 64: min-label needs ~64 rounds,
        # alternating stars must land in O(log n)
        from pigpen_spark.functions.dedup import dedup_clusters_star
        pairs = spark.createDataFrame([(i, i + 1) for i in range(64)],
                                      "id_a long, id_b long")
        stats = {}
        out = dedup_clusters_star(pairs, stats=stats)
        assert all(r.cluster == 0 for r in out.collect())
        assert stats["rounds"] <= 8, stats


class TestCompaction:
    def test_small_files_collapse(self, spark, tmp_path):
        from pigpen_spark.operators.layout import compact_files
        src = str(tmp_path / "many")
        spark.range(1000).repartition(40).write.parquet(src)
        assert len(list((tmp_path / "many").glob("part-*"))) == 40
        out = str(tmp_path / "few")
        n_files = compact_files(spark, src, out, target_records_per_file=500)
        assert n_files == 2
        parts = list((tmp_path / "few").glob("part-*.parquet"))
        assert len(parts) == 2
        assert spark.read.parquet(out).count() == 1000

    def test_ordered_compaction_clusters(self, spark, tmp_path):
        from pigpen_spark.operators.layout import compact_files
        src = str(tmp_path / "m2")
        spark.range(1000).withColumnRenamed("id", "k") \
            .repartition(20).write.parquet(src)
        out = str(tmp_path / "f2")
        compact_files(spark, src, out, 500, order_by=["k"])
        parts = sorted((tmp_path / "f2").glob("part-*.parquet"))
        import duckdb
        ranges = [duckdb.sql(f"select min(k), max(k) from '{p}'").fetchone()
                  for p in parts]
        ranges.sort()
        # range-partitioned: file key ranges must not interleave
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            assert hi1 <= lo2


class TestDriftMonitorStream:
    def test_alarm_fires_on_shifted_batch(self, spark, tmp_path):
        import json as _json
        from pigpen_spark.streaming import core as st

        src = tmp_path / "dm_src"
        src.mkdir(parents=True, exist_ok=True)
        # batch files process in order with maxFilesPerTrigger=1:
        # b0 seeds the baseline, b1 matches it, b2 is shifted
        batches = {
            "b0": [{"v": i % 10} for i in range(100)],
            "b1": [{"v": i % 10} for i in range(100)],
            "b2": [{"v": 90 + i % 10} for i in range(100)],
        }
        for name, rows in batches.items():
            with open(src / f"{name}.json", "w") as f:
                for r in rows:
                    f.write(_json.dumps(r) + "\n")
        stream = (spark.readStream.schema("v long")
                  .option("maxFilesPerTrigger", 1).json(str(src)))
        q = st.drift_monitor_stream(
            stream, F.col("v"), lo=0, hi=100,
            baseline_path=str(tmp_path / "dm_base"),
            alarms_path=str(tmp_path / "dm_alarms"),
            checkpoint=str(tmp_path / "dm_ck"),
            n_bins=10, available_now=True)
        q.awaitTermination(120)
        alarms = spark.read.parquet(str(tmp_path / "dm_alarms")).collect()
        assert len(alarms) == 1          # only the shifted batch alarms
        assert alarms[0].l1_ppm == 2_000_000  # disjoint support


class TestAnnRecall:
    def test_lsh_recall_vs_brute(self, spark, sf_dir):
        from pigpen_spark.functions.similarity import (
            ann_recall, brute_force_topk, lsh_topk)
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        queries = emb.where(F.col("vec_id") < 20)
        exact = brute_force_topk(emb, queries, "vec_id", "embedding", k=5)
        qid = queries.select(F.col("vec_id").alias("q_id"))
        single = lsh_topk(emb, "vec_id", "embedding", k=5).join(qid, on="q_id")
        probed = lsh_topk(emb, "vec_id", "embedding", k=5,
                          multi_probe=True).join(qid, on="q_id")
        r1 = ann_recall(single, exact).collect()
        r2 = ann_recall(probed, exact).collect()
        ov1 = [r for r in r1 if r.q_id is None][0]
        ov2 = [r for r in r2 if r.q_id is None][0]
        # multi-probe probes n_planes extra buckets: recall must not drop
        assert ov2.recall_ppm >= ov1.recall_ppm > 0
        per_q = [r for r in r1 if r.q_id is not None]
        assert all(0 <= r.recall_ppm <= 1_000_000 for r in per_q)
        assert ov1.n_exact == sum(r.n_exact for r in per_q)

    def test_perfect_recall_is_million(self, spark):
        from pigpen_spark.functions.similarity import ann_recall
        e = spark.createDataFrame([(1, 2), (1, 3), (2, 1)], "q_id long, n_id long")
        rows = {r.q_id: r.recall_ppm for r in ann_recall(e, e).collect()}
        assert rows == {1: 1_000_000, 2: 1_000_000, None: 1_000_000}
