"""Round-2 operators: dedup_keep, decontaminate, sample_per_group, Z-order."""

import pytest
from pyspark.sql import functions as F

from pigpen_spark.functions import dedup as D
from pigpen_spark.functions import pipeline as P
from pigpen_spark.operators import layout as L


# -- dedup_keep -------------------------------------------------------------


def test_dedup_keep_labels_whole_corpus(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    # components: {0,1,2} (chained), {4,5}; 3 untouched
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "id_a long, id_b long"
    )
    out = {r["doc_id"]: (r["cluster"], r["kept"])
           for r in D.dedup_keep(docs, pairs, "doc_id").collect()}
    assert out == {
        0: (0, True), 1: (0, False), 2: (0, False),
        3: (3, True), 4: (4, True), 5: (4, False),
    }


def test_dedup_keep_no_pairs(spark):
    docs = spark.createDataFrame([(1,), (2,)], "doc_id long")
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    out = D.dedup_keep(docs, pairs, "doc_id").collect()
    assert all(r["kept"] and r["cluster"] == r["doc_id"] for r in out)


# -- exact_keep -------------------------------------------------------------


def test_exact_keep_min_id_per_digest(spark):
    docs = spark.createDataFrame(
        [(3, "dup"), (1, "dup"), (2, "uniq"), (5, "dup2"), (4, "dup2")],
        "doc_id long, text string",
    )
    out = sorted(r["doc_id"] for r in D.exact_keep(docs, "text", "doc_id").collect())
    assert out == [1, 2, 4]


def test_exact_keep_plan_has_window_group_limit(spark):
    """The keep-one-row-per-digest must compile to WindowGroupLimit
    (map-side partial top-1) so the text column shuffles at most once —
    the property that distinguishes it from groupBy + join-back."""
    docs = spark.createDataFrame([(1, "a"), (2, "a")], "doc_id long, text string")
    plan = D.exact_keep(docs, "text", "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


# -- decontaminate ----------------------------------------------------------


def test_decontaminate_flags_ngram_overlap(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "totally unrelated text about something else entirely here"),
            (3, "short doc"),  # < n tokens: no n-grams, never flagged
        ],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(9, "xx quick brown fox jumps over yy")], "doc_id long, text string"
    )
    out = {r["doc_id"]: (r["n_shared"], r["contaminated"])
           for r in D.decontaminate(train, test, "doc_id", "text", n=5).collect()}
    assert out[1][1] is True and out[1][0] >= 1
    assert out[2] == (0, False)
    assert out[3] == (0, False)


def test_decontaminate_threshold(spark):
    train = spark.createDataFrame(
        [(1, "a b c d e f")], "doc_id long, text string"
    )
    test = spark.createDataFrame([(9, "a b c d e")], "doc_id long, text string")
    # shares exactly one distinct 5-gram ("a b c d e")
    out = D.decontaminate(train, test, "doc_id", "text", n=5, threshold=2).collect()
    assert out[0]["n_shared"] == 1 and out[0]["contaminated"] is False


# -- mix_by_weight ----------------------------------------------------------


def test_mix_by_weight_integer_weights_exact(spark):
    df = spark.createDataFrame(
        [(i, "a" if i < 10 else "b") for i in range(20)], "id long, g string"
    )
    out = P.mix_by_weight(df, "g", "id", {"a": 2.0, "b": 0.0})
    rows = out.collect()
    # every 'a' row exactly twice (copies 0,1); every 'b' row dropped
    assert len(rows) == 20
    assert {r["copy"] for r in rows} == {0, 1}
    assert all(r["g"] == "a" for r in rows)


def test_mix_by_weight_fractional_and_default(spark):
    df = spark.createDataFrame([(i, "a") for i in range(400)], "id long, g string")
    n = P.mix_by_weight(df, "g", "id", {"a": 1.5}).count()
    # 400 guaranteed + Binomial(400, 0.5) extras: 6-sigma bounds
    assert 540 <= n <= 660
    # unknown group passes through once by default
    other = spark.createDataFrame([(1, "z")], "id long, g string")
    assert P.mix_by_weight(other, "g", "id", {"a": 0.0}).count() == 1
    assert P.mix_by_weight(other, "g", "id", {"a": 0.0}, default=0.0).count() == 0


def test_mix_by_weight_deterministic_and_validated(spark):
    df = spark.createDataFrame([(i, "a") for i in range(100)], "id long, g string")
    ids1 = sorted((r["id"], r["copy"]) for r in P.mix_by_weight(df, "g", "id", {"a": 0.3}).collect())
    ids2 = sorted((r["id"], r["copy"]) for r in P.mix_by_weight(df, "g", "id", {"a": 0.3}).collect())
    ids3 = sorted((r["id"], r["copy"]) for r in P.mix_by_weight(df, "g", "id", {"a": 0.3}, salt="s2").collect())
    assert ids1 == ids2
    assert ids1 != ids3
    with pytest.raises(ValueError, match="negative"):
        P.mix_by_weight(df, "g", "id", {"a": -1.0})


# -- build_vocab / tokenize_pack --------------------------------------------


def test_build_vocab_rank_and_min_count(spark):
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "b a c")], "doc_id long, text string"
    )
    v = {r["token"]: (r["n"], r["token_id"]) for r in P.build_vocab(df, "text").collect()}
    assert v["a"] == (3, 1)
    assert v["b"] == (2, 2)
    assert v["c"] == (1, 3)
    assert set(P.build_vocab(df, "text", min_count=2).toPandas()["token"]) == {"a", "b"}


def test_tokenize_pack_reconstructs_shard_streams(spark):
    df = spark.createDataFrame(
        [(i, "t%d u%d v%d" % (i, i, i)) for i in range(6)],
        "doc_id long, text string",
    )
    out = P.tokenize_pack(df, "doc_id", "text", seq_len=4, shards=2).collect()
    vocab = {r["token"]: r["token_id"] for r in P.build_vocab(df, "text").collect()}
    import hashlib
    streams = {}
    for i in sorted(range(6)):
        sh = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 2
        streams.setdefault(sh, []).extend(
            vocab[t] for t in ("t%d" % i, "u%d" % i, "v%d" % i)
        )
    for r in sorted(out, key=lambda r: (r["shard"], r["seq_no"])):
        expect = streams[r["shard"]][r["seq_no"] * 4:(r["seq_no"] + 1) * 4]
        assert r["token_ids"] == expect
        assert r["n_tokens"] == len(expect)
    # trailing partials exist (9 tokens per shard, seq_len 4 -> last has 1)
    assert {r["n_tokens"] for r in out} == {4, 1}


def test_tokenize_pack_external_vocab_oov_zero(spark):
    df = spark.createDataFrame([(1, "a b zzz")], "doc_id long, text string")
    vocab = spark.createDataFrame([("a", 5), ("b", 9)], "token string, token_id long")
    out = P.tokenize_pack(df, "doc_id", "text", seq_len=8, shards=1, vocab=vocab).collect()
    assert out[0]["token_ids"] == [5, 9, 0]
    with pytest.raises(ValueError, match="positive"):
        P.tokenize_pack(df, "doc_id", "text", seq_len=0)


# -- sample_per_group -------------------------------------------------------


def test_sample_per_group_exact_counts_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3)) for i in range(100)], "id long, g string"
    )
    a = P.sample_per_group(df, "g", "id", k=5)
    counts = {r["g"]: r["n"] for r in a.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert counts == {"g0": 5, "g1": 5, "g2": 5}
    # same salt → identical sample; different salt → (almost surely) different
    ids_a = sorted(r["id"] for r in a.collect())
    ids_b = sorted(r["id"] for r in P.sample_per_group(df, "g", "id", k=5).collect())
    ids_c = sorted(r["id"] for r in P.sample_per_group(df, "g", "id", k=5, salt="other").collect())
    assert ids_a == ids_b
    assert ids_a != ids_c


def test_sample_per_group_small_group_keeps_all(spark):
    df = spark.createDataFrame([(1, "g"), (2, "g")], "id long, g string")
    assert P.sample_per_group(df, "g", "id", k=10).count() == 2
    with pytest.raises(ValueError, match="positive"):
        P.sample_per_group(df, "g", "id", k=0)


def test_sample_per_group_plan_has_window_group_limit(spark):
    """rank<=k must compile to WindowGroupLimit (map-side partial top-k),
    not a full per-group sort+filter — the property that makes the
    operator scale-safe on billion-row strata."""
    df = spark.createDataFrame([(i, "g%d" % (i % 3)) for i in range(100)], "id long, g string")
    plan = P.sample_per_group(df, "g", "id", k=5)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


# -- Z-order ----------------------------------------------------------------


def test_zorder_key_interleaves_bits(spark):
    df = spark.createDataFrame(
        [(0b101, 0b011)], "x long, y long"
    )
    # x bits at even positions, y bits at odd: x=101, y=011
    # bits LSB-up: x0=1,y0=1,x1=0,y1=1,x2=1,y2=0 -> 0b011011 = 27
    out = df.select(L.zorder_key(["x", "y"], bits=3).alias("z")).collect()[0]["z"]
    assert out == 0b011011
    # cross-engine identity with the SQL builder
    import duckdb
    sql = L.zorder_key_sql(["x", "y"], bits=3)
    assert duckdb.sql(f"SELECT {sql} FROM (SELECT 5 AS x, 3 AS y)").fetchone()[0] == out


def test_zorder_key_validates(spark):
    with pytest.raises(ValueError, match="at least one"):
        L.zorder_key([], bits=8)
    with pytest.raises(ValueError, match="exceeds"):
        L.zorder_key(["a", "b", "c", "d"], bits=16)


def test_cluster_by_zorder_orders_partitions(spark):
    df = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x long, y long"
    )
    out = L.cluster_by_zorder(df, ["x", "y"], bits=4, num_partitions=4)
    assert sorted((r["x"], r["y"]) for r in out.collect()) == sorted(
        (x, y) for x in range(16) for y in range(16)
    )
    # rows within each partition are sorted by the (recomputed) key
    rows = out.withColumn("pid", F.spark_partition_id()).withColumn(
        "z", L.zorder_key(["x", "y"], bits=4)
    ).collect()
    by_pid = {}
    for r in rows:
        by_pid.setdefault(r["pid"], []).append(r["z"])
    for zs in by_pid.values():
        assert zs == sorted(zs)


def test_dedup_clusters_local_matches_distributed(spark):
    """The threshold-gated driver-side union-find must produce byte-identical
    labels to the distributed min-label loop."""
    import random
    rng = random.Random(7)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(60)]
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges if a != b], "id_a long, id_b long"
    )
    local = {(r["id"], r["cluster"])
             for r in D.dedup_clusters(pairs).collect()}
    dist = {(r["id"], r["cluster"])
            for r in D.dedup_clusters(pairs, local_threshold=0).collect()}
    assert local == dist and len(local) > 0


# -- dedup_spans ------------------------------------------------------------


def test_token_chunks_shapes(spark):
    df = spark.createDataFrame(
        [("a b c d e",), ("a b",), ("",), ("  ",)], "text string"
    )
    out = [r["c"] for r in df.select(P.token_chunks("text", 2).alias("c")).collect()]
    assert out == [["a b", "c d", "e"], ["a b"], [], []]


def test_dedup_spans_first_occurrence_wins(spark):
    docs = spark.createDataFrame(
        [
            (0, "x y z a b c"),       # owns chunks "x y" "z a" "b c"
            (1, "x y q q b c"),       # "x y" and "b c" dups of doc0 -> dropped
            (2, "x y"),               # whole doc is a dup -> empty
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["clean_text"], r["n_dropped"])
           for r in P.dedup_spans(docs, "doc_id", "text", chunk=2).collect()}
    assert out[0] == ("x y z a b c", 0)
    assert out[1] == ("q q", 2)
    assert out[2] == ("", 1)


def test_dedup_spans_within_doc_repeats(spark):
    # repeated span INSIDE one doc: first position wins, later dropped
    docs = spark.createDataFrame([(7, "p q r s p q")], "doc_id long, text string")
    out = P.dedup_spans(docs, "doc_id", "text", chunk=2).collect()[0]
    assert out["clean_text"] == "p q r s" and out["n_dropped"] == 1


def test_dedup_spans_plan_has_no_window(spark):
    """Winner selection must stay the skew-safe partial-agg form — a
    row_number window over the span key would funnel mega-dup spans
    through single reducers."""
    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    plan = P.dedup_spans(docs, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_min" in plan or "HashAggregate" in plan


# -- n-gram let-binding (O(tokens) tokenization) ----------------------------


def test_ngram_exprs_tokenize_once(spark):
    """The token-array split must appear exactly once in the optimized
    n-gram expression: referencing it inside the per-index lambda makes
    Catalyst re-tokenize per gram (O(tokens^2) — the bug the _let binding
    fixes)."""
    from pigpen_spark.functions.text import _ngrams, shingles

    df = spark.createDataFrame([("a b c d e",)], "text string")
    for expr in (_ngrams(F.col("text"), 3), shingles("text", 3),
                 P.token_chunks("text", 3)):
        plan = df.select(expr.alias("g"))._jdf.queryExecution() \
                 .optimizedPlan().toString()
        assert plan.count("split(") == 1, plan


# -- incremental dedup (signature index) ------------------------------------


def test_minhash_index_roundtrip_and_candidates_against(spark, tmp_path):
    corpus = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely unrelated text about spark query planning"),
        ],
        "doc_id long, text string",
    )
    new_batch = spark.createDataFrame(
        [
            (11, "the quick brown fox jumps over the lazy dog today"),  # dup of 0
            (13, "nothing like anything in the corpus whatsoever ok"),
        ],
        "doc_id long, text string",
    )
    # index survives a parquet round-trip (the production artifact)
    idx_path = str(tmp_path / "mh_index")
    D.minhash_index(corpus, "doc_id", "text").write.parquet(idx_path)
    index = spark.read.parquet(idx_path)
    out = {(r["new_id"], r["corpus_id"]): r["est_jaccard"]
           for r in D.minhash_candidates_against(
               new_batch, index, "doc_id", "text").collect()}
    assert (11, 0) in out and out[(11, 0)] == 1.0
    assert all(nid != 13 for nid, _ in out)


def test_candidates_against_matches_self_join_form(spark):
    """Cross-corpus candidates over a split corpus must agree with the
    self-join form restricted to cross-split pairs."""
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta"),
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six seven eight nine"),
            (3, "one two three four five six seven eight nine"),
            (4, "totally different words in this particular document"),
        ],
        "doc_id long, text string",
    )
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    newb = docs.filter(F.col("doc_id") % 2 == 1)
    index = D.minhash_index(corpus, "doc_id", "text")
    inc = {(r["new_id"], r["corpus_id"]) for r in
           D.minhash_candidates_against(newb, index, "doc_id", "text").collect()}
    full = D.minhash_candidates(docs, "doc_id", "text").collect()
    cross = {(max(r["id_a"], r["id_b"]) if r["id_a"] % 2 == 0 else r["id_a"],
              r["id_a"] if r["id_a"] % 2 == 0 else r["id_b"])
             for r in full if (r["id_a"] % 2) != (r["id_b"] % 2)}
    cross = {(n if n % 2 == 1 else c, c if n % 2 == 1 else n) for n, c in cross}
    assert inc == cross


def test_candidates_against_k_bands_validation(spark):
    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        D.minhash_candidates_against(docs, docs, "doc_id", "text", k=10, bands=4)


# -- prune_by_quantile ------------------------------------------------------


def test_prune_by_quantile_exact_per_group(spark):
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 2), float(i)) for i in range(20)],
        "id long, g string, score double",
    )
    out = P.prune_by_quantile(df, "score", 0.3, partition_by=["g"], tiebreak="id")
    by_g = {}
    for r in out.collect():
        by_g.setdefault(r["g"], []).append(r["id"])
    # top ~30% by score desc in each 10-row group: percent_rank <= 0.3
    # keeps ranks 1..3 of 10 ((rank-1)/9 <= 0.3 -> rank <= 3.7 -> 3 rows)
    assert sorted(by_g["g0"]) == [14, 16, 18]
    assert sorted(by_g["g1"]) == [15, 17, 19]


def test_prune_by_quantile_approx_no_window(spark):
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 2), float(i)) for i in range(200)],
        "id long, g string, score double",
    )
    out = P.prune_by_quantile(df, "score", 0.3, partition_by=["g"], exact=False)
    n = out.count()
    assert 50 <= n <= 80  # ~30% of 200, boundary-inclusive
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # the whole point of the approx path


def test_prune_by_quantile_global_and_validation(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(10)], "id long, s double")
    top = P.prune_by_quantile(df, "s", 0.2, tiebreak="id")
    assert sorted(r["id"] for r in top.collect()) == [8, 9]
    with pytest.raises(ValueError, match="keep_frac"):
        P.prune_by_quantile(df, "s", 0.0)


# -- group_centroids --------------------------------------------------------


def test_group_centroids_elementwise_mean(spark):
    from pigpen_spark.functions import similarity as S
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (0, [3.0, 4.0]), (1, [10.0, 20.0])],
        "label int, embedding array<float>",
    )
    out = {r["label"]: r["centroid"]
           for r in S.group_centroids(df, "label", "embedding", dim=2).collect()}
    assert out[0] == [2.0, 3.0]
    assert out[1] == [10.0, 20.0]


# -- stop-shingle pruning ---------------------------------------------------


def test_jaccard_max_df_prunes_stop_shingles(spark):
    boiler = "copyright header all rights reserved"
    docs = spark.createDataFrame(
        [
            (0, boiler + " alpha beta gamma delta"),
            (1, boiler + " epsilon zeta eta theta"),
            (2, boiler + " one two three four"),
            (3, boiler + " five six seven eight"),
            # true near-dups sharing rare shingles
            (4, "unique matching content here exactly twin"),
            (5, "unique matching content here exactly twin"),
        ],
        "doc_id long, text string",
    )
    full = {(r["id_a"], r["id_b"]) for r in D.ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.1).collect()}
    pruned = {(r["id_a"], r["id_b"]) for r in D.ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.1, max_df=3).collect()}
    # boilerplate-only pairs vanish (their shared shingles have df=4);
    # the genuine twin pair survives pruning
    assert (4, 5) in pruned
    boiler_pairs = {(a, b) for a, b in pruned if a < 4 and b < 4}
    assert boiler_pairs == set()
    assert len(pruned) < len(full)
    with pytest.raises(ValueError, match="max_df"):
        D.ngram_jaccard_pairs(docs, "doc_id", "text", max_df=0)
