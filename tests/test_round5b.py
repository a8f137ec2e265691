"""Round-5b operators: candidate-graph analytics (label propagation,
common-neighbor link prediction), lexical all-pairs cosine, smoothed
target encoding, and shard balance planning."""

import pytest

from pyspark.sql import functions as F

from pigpen_spark.functions import classify as C
from pigpen_spark.functions import dedup as D
from pigpen_spark.functions import pipeline as P
from pigpen_spark.functions import ranking as R


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


class TestLabelPropagation:
    def test_barbell_splits_into_two_communities(self, spark):
        # two 4-cliques joined by ONE bridge edge: WCC would merge them;
        # LPA keeps two communities (each clique's min id wins locally)
        clique = lambda off: [(off + i, off + j)
                              for i in range(4) for j in range(i + 1, 4)]
        pairs = _pairs(spark, clique(0) + clique(10) + [(3, 10)])
        out = {r["node"]: r["community"] for r in
               D.label_propagation(pairs, iterations=2).collect()}
        left = {out[n] for n in (0, 1, 2)}
        right = {out[n] for n in (11, 12, 13)}
        assert len(left) == 1 and len(right) == 1
        assert left != right

    def test_matches_python_model(self, spark):
        # brute-force synchronous LPA with the same tie rule
        import random

        rng = random.Random(7)
        edges = sorted({tuple(sorted(rng.sample(range(12), 2)))
                        for _ in range(20)})
        pairs = _pairs(spark, [(a, b) for a, b in edges])
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        lbl = {v: v for v in adj}
        for _ in range(3):
            nxt = {}
            for v in adj:
                votes = {}
                for u in adj[v]:
                    votes[lbl[u]] = votes.get(lbl[u], 0) + 1
                best = min(votes, key=lambda l: (-votes[l], l))
                nxt[v] = best
            lbl = nxt
        out = {r["node"]: r["community"] for r in
               D.label_propagation(pairs, iterations=3).collect()}
        assert out == lbl

    def test_deterministic(self, spark):
        pairs = _pairs(spark, [(1, 2), (2, 3), (3, 1), (3, 4)])
        a = sorted(tuple(r) for r in
                   D.label_propagation(pairs, iterations=2).collect())
        b = sorted(tuple(r) for r in
                   D.label_propagation(pairs, iterations=2).collect())
        assert a == b

    def test_rejects_zero_iterations(self, spark):
        with pytest.raises(ValueError):
            D.label_propagation(_pairs(spark, [(1, 2)]), iterations=0)


class TestCommonNeighborPairs:
    def test_path_graph_closes_triangle(self, spark):
        # a-b-c path: (a,c) share center b, are not adjacent
        out = D.common_neighbor_pairs(_pairs(spark, [(1, 2), (2, 3)]),
                                      min_common=1).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["id_a"], r["id_b"], r["common"]) == (1, 3, 1)
        # deg(1)=deg(3)=1, common=1 -> jacc = 1/(1+1-1) = 1.0
        assert r["jacc_ppm"] == 1_000_000

    def test_adjacent_pairs_excluded(self, spark):
        # triangle: every distance-2 pair is already an edge -> empty
        out = D.common_neighbor_pairs(
            _pairs(spark, [(1, 2), (2, 3), (1, 3)]), min_common=1)
        assert out.count() == 0

    def test_min_common_filter(self, spark):
        # square 1-2-3-4-1: (1,3) share centers {2,4} => common=2;
        # with min_common=3 nothing survives
        sq = [(1, 2), (2, 3), (3, 4), (4, 1)]
        two = D.common_neighbor_pairs(_pairs(spark, sq), min_common=2)
        assert {(r["id_a"], r["id_b"]) for r in two.collect()} \
            == {(1, 3), (2, 4)}
        assert D.common_neighbor_pairs(_pairs(spark, sq),
                                       min_common=3).count() == 0

    def test_hub_cut_removes_wedges_but_keeps_true_degrees(self, spark):
        # star center 0 with leaves 1..5 plus path 1-6-2: center 0 is a
        # hub (deg 5 > max_degree 3) so its wedges vanish; (1,2) still
        # found through center 6, with TRUE degrees deg(1)=deg(2)=2
        edges = [(0, i) for i in range(1, 6)] + [(1, 6), (6, 2)]
        out = D.common_neighbor_pairs(_pairs(spark, edges),
                                      min_common=1, max_degree=3).collect()
        got = {(r["id_a"], r["id_b"]): r for r in out}
        assert (1, 2) in got
        r = got[(1, 2)]
        assert (r["deg_a"], r["deg_b"], r["common"]) == (2, 2, 1)
        # jacc = 1/(2+2-1) = 333333 ppm (floor)
        assert r["jacc_ppm"] == 333_333
        # no pair with both endpoints leaves of the hub only
        assert (3, 4) not in got and (1, 3) not in got


class TestSparseCosine:
    def test_exact_values_small_corpus(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b a"), (2, "a b"), (3, "c d")],
            "doc_id long, text string")
        out = {(r["id_a"], r["id_b"]): r for r in
               R.sparse_cosine_pairs(docs, "doc_id", "text",
                                     threshold_num=1, threshold_den=2,
                                     max_df=10).collect()}
        # docs 1,2: tf1={a:2,b:1} tf2={a:1,b:1} dot=3 norms 5,2
        # cos^2 = 9/10 >= 1/4 -> kept; doc 3 shares nothing
        assert set(out) == {(1, 2)}
        r = out[(1, 2)]
        assert (r["dot"], r["norm_a"], r["norm_b"]) == (3, 5, 2)

    def test_threshold_excludes_weak_pairs(self, spark):
        docs = spark.createDataFrame(
            [(1, "a x y z"), (2, "a p q r")], "doc_id long, text string")
        # dot=1, norms 4,4 -> cos = 1/4 < 0.8
        assert R.sparse_cosine_pairs(docs, "doc_id", "text",
                                     threshold_num=4, threshold_den=5,
                                     max_df=10).count() == 0
        assert R.sparse_cosine_pairs(docs, "doc_id", "text",
                                     threshold_num=1, threshold_den=5,
                                     max_df=10).count() == 1

    def test_max_df_projects_vocabulary(self, spark):
        # token "the" appears in all 3 docs; with max_df=2 it is dropped
        # from BOTH norms and dots, making docs 1,2 identical in the
        # projected space (cosine exactly 1)
        docs = spark.createDataFrame(
            [(1, "the cat"), (2, "the cat"), (3, "the dog dog")],
            "doc_id long, text string")
        out = {(r["id_a"], r["id_b"]): r for r in
               R.sparse_cosine_pairs(docs, "doc_id", "text",
                                     threshold_num=1, threshold_den=1,
                                     max_df=2).collect()}
        assert set(out) == {(1, 2)}
        assert out[(1, 2)]["norm_a"] == out[(1, 2)]["norm_b"] == 1

    def test_no_cartesian_in_plan(self, spark, sf_dir):
        from pigpen_spark.catalog import tables

        docs = tables(spark, sf_dir)["documents"].df
        plan = R.sparse_cosine_pairs(docs, "doc_id", "text") \
            ._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_rejects_bad_threshold(self, spark):
        docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError):
            R.sparse_cosine_pairs(docs, "doc_id", "text",
                                  threshold_num=0, threshold_den=5)
        with pytest.raises(ValueError):
            R.sparse_cosine_pairs(docs, "doc_id", "text",
                                  threshold_num=6, threshold_den=5)


class TestTargetEncode:
    def test_exact_smoothing_arithmetic(self, spark):
        # cat A: 3 rows 2 pos; cat B: 1 row 0 pos; prior = 2/4
        df = spark.createDataFrame(
            [("A", 1), ("A", 1), ("A", 0), ("B", 0)], "cat string, y long")
        out = {r["category"]: r for r in
               C.target_encode(df, "cat", "y", m=2).collect()}
        # prior_ppm = 2*1e6 // 4 = 500000
        # A: (2e6 + 2*500000) // (3+2) = 600000 ; B: (0 + 1e6) // 3 = 333333
        assert (out["A"]["cnt"], out["A"]["pos"], out["A"]["enc_ppm"]) \
            == (3, 2, 600_000)
        assert (out["B"]["cnt"], out["B"]["pos"], out["B"]["enc_ppm"]) \
            == (1, 0, 333_333)

    def test_m_zero_gives_raw_rate(self, spark):
        df = spark.createDataFrame(
            [("A", 1), ("A", 0)], "cat string, y long")
        out = C.target_encode(df, "cat", "y", m=0).collect()
        assert out[0]["enc_ppm"] == 500_000

    def test_column_expression_target(self, spark):
        df = spark.createDataFrame(
            [("A", "F"), ("A", "O"), ("B", "F")], "cat string, st string")
        out = {r["category"]: r["pos"] for r in
               C.target_encode(df, "cat", (F.col("st") == "F"),
                               m=10).collect()}
        assert out == {"A": 1, "B": 1}

    def test_rare_category_shrinks_to_prior(self, spark):
        # with huge m every category collapses to the prior
        df = spark.createDataFrame(
            [("A", 1), ("B", 0)], "cat string, y long")
        out = {r["category"]: r["enc_ppm"] for r in
               C.target_encode(df, "cat", "y", m=10**6).collect()}
        assert abs(out["A"] - 500_000) <= 1
        assert abs(out["B"] - 500_000) <= 1

    def test_rejects_negative_m(self, spark):
        df = spark.createDataFrame([("A", 1)], "cat string, y long")
        with pytest.raises(ValueError):
            C.target_encode(df, "cat", "y", m=-1)


class TestShardBalance:
    def test_striping_model(self, spark):
        # sizes 9,7,5,3 over 2 shards: rank order 9,7,5,3 ->
        # shard0 gets {9,5}=14, shard1 gets {7,3}=10
        df = spark.createDataFrame(
            [(1, 9), (2, 7), (3, 5), (4, 3)], "doc_id long, sz long")
        out = {r["shard"]: r for r in
               P.shard_balance(df, "doc_id", "sz", shards=2).collect()}
        assert (out[0]["n_docs"], out[0]["tokens"]) == (2, 14)
        assert (out[1]["n_docs"], out[1]["tokens"]) == (2, 10)

    def test_lpt_balance_bound(self, spark, sf_dir):
        # sorted striping bounds any shard's excess over the mean by one
        # max item
        from pigpen_spark.catalog import tables
        from pigpen_spark.functions.text import token_count

        docs = tables(spark, sf_dir)["documents"].df
        rows = P.shard_balance(docs, "doc_id", token_count("text"),
                               shards=8).collect()
        total = sum(r["tokens"] for r in rows)
        biggest = docs.select(F.max(token_count("text"))).first()[0]
        assert all(r["tokens"] <= total / 8 + biggest for r in rows)
        assert sum(r["n_docs"] for r in rows) == docs.count()

    def test_tie_broken_by_id(self, spark):
        # equal sizes -> rank by id ascending -> ids 1,3 on shard 0
        df = spark.createDataFrame(
            [(1, 5), (2, 5), (3, 5), (4, 5)], "doc_id long, sz long")
        out = {r["shard"]: r["n_docs"] for r in
               P.shard_balance(df, "doc_id", "sz", shards=2).collect()}
        assert out == {0: 2, 1: 2}

    def test_rejects_bad_shards(self, spark):
        df = spark.createDataFrame([(1, 5)], "doc_id long, sz long")
        with pytest.raises(ValueError):
            P.shard_balance(df, "doc_id", "sz", shards=0)
