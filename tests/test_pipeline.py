"""Corpus-pipeline operators: hash splits, stratified sampling, sequence
packing, deterministic shuffle, duplicate clustering."""

import pytest
from pyspark.sql import functions as F

from pigpen_spark.functions import dedup as D
from pigpen_spark.functions import pipeline as P


def _ids(spark, n):
    return spark.range(n).select(F.col("id").alias("doc_id"))


class TestSplitByHash:
    def test_assigns_every_row_deterministically(self, spark):
        df = _ids(spark, 1000)
        out = P.split_by_hash(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
        rows = {r["doc_id"]: r["split"] for r in out.collect()}
        assert len(rows) == 1000 and set(rows.values()) == {"train", "val", "test"}
        again = {r["doc_id"]: r["split"] for r in
                 P.split_by_hash(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
        assert rows == again
        n_train = sum(1 for v in rows.values() if v == "train")
        assert 740 <= n_train <= 860  # ±6σ-ish binomial bounds

    def test_split_stable_under_corpus_growth(self, spark):
        # the defining property vs random splits: existing docs never move
        small = P.split_by_hash(_ids(spark, 100), "doc_id", {"a": 0.5, "b": 0.5})
        big = P.split_by_hash(_ids(spark, 1000), "doc_id", {"a": 0.5, "b": 0.5})
        s = {r["doc_id"]: r["split"] for r in small.collect()}
        b = {r["doc_id"]: r["split"] for r in big.collect()}
        assert all(b[k] == v for k, v in s.items())

    def test_bad_fractions_raise(self, spark):
        with pytest.raises(ValueError):
            P.split_by_hash(_ids(spark, 1), "doc_id", {"a": 0.5, "b": 0.1})
        with pytest.raises(ValueError):
            P.split_by_hash(_ids(spark, 1), "doc_id", {})


class TestStratifiedSample:
    def test_filter_semantics(self, spark):
        df = spark.createDataFrame(
            [(i, "en" if i % 2 else "de") for i in range(400)], "doc_id long, lang string")
        out = P.stratified_sample_by_hash(df, "lang", {"en": 1.0, "de": 0.0}, "doc_id")
        rows = out.collect()
        assert rows and all(r["lang"] == "en" for r in rows)
        assert len(rows) == 200  # fraction 1.0 keeps every en row

    def test_default_rate_applies_to_unlisted(self, spark):
        df = spark.createDataFrame([(i, "fr") for i in range(200)], "doc_id long, lang string")
        none_kept = P.stratified_sample_by_hash(df, "lang", {"en": 1.0}, "doc_id")
        assert none_kept.count() == 0
        some = P.stratified_sample_by_hash(df, "lang", {"en": 1.0}, "doc_id", default=0.5)
        assert 60 <= some.count() <= 140


class TestPackChunks:
    def test_concat_and_chunk(self, spark):
        df = spark.createDataFrame(
            [(1, 3), (2, 4), (3, 5), (4, 2)], "doc_id long, n long")
        out = P.pack_chunks(df, "n", order_by=["doc_id"], budget=5)
        got = {r["doc_id"]: r["chunk_id"] for r in out.collect()}
        # exclusive cumsums 0,3,7,12 → floor/5 → 0,0,1,2
        assert got == {1: 0, 2: 0, 3: 1, 4: 2}

    def test_partitioned_chunks_are_per_shard(self, spark):
        df = spark.createDataFrame(
            [(1, "a", 4), (2, "a", 4), (3, "b", 4), (4, "b", 4)],
            "doc_id long, shard string, n long")
        out = P.pack_chunks(df, "n", order_by=["doc_id"], budget=5, partition_by=["shard"])
        got = {r["doc_id"]: r["chunk_id"] for r in out.collect()}
        assert got == {1: 0, 2: 0, 3: 0, 4: 0}  # each shard restarts at 0


class TestShuffleDeterministic:
    def test_same_salt_replays_other_salt_differs(self, spark):
        df = _ids(spark, 200)
        o1 = [r["doc_id"] for r in P.shuffle_deterministic(df, "doc_id", "e1").collect()]
        o2 = [r["doc_id"] for r in P.shuffle_deterministic(df, "doc_id", "e1").collect()]
        o3 = [r["doc_id"] for r in P.shuffle_deterministic(df, "doc_id", "e2").collect()]
        assert o1 == o2
        assert o1 != o3 and sorted(o3) == sorted(o1)
        assert o1 != sorted(o1)  # actually permuted

    def test_pos_col_is_dense_permutation(self, spark):
        out = P.shuffle_deterministic(_ids(spark, 100), "doc_id", "e1", pos_col="pos")
        rows = out.collect()
        assert sorted(r["pos"] for r in rows) == list(range(100))


class TestDedupClusters:
    def test_components_and_representatives(self, spark):
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
        got = {r["id"]: r["cluster"] for r in D.dedup_clusters(pairs).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    def test_chain_needs_multiple_rounds(self, spark):
        # a path graph: label 1 must propagate the full diameter
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(1, 8)], "id_a long, id_b long")
        got = {r["id"]: r["cluster"] for r in D.dedup_clusters(pairs).collect()}
        assert got == {i: 1 for i in range(1, 9)}

    def test_unconverged_raises(self, spark):
        pairs = spark.createDataFrame([(i, i + 1) for i in range(1, 8)], "id_a long, id_b long")
        with pytest.raises(RuntimeError):
            # local_threshold=0 forces the distributed loop: the driver-side
            # union-find path is exact and never hits the iteration bound
            D.dedup_clusters(pairs, max_iter=1, local_threshold=0)
