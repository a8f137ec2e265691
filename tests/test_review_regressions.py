"""Regression tests for the high-effort review findings."""

import pytest
from pyspark.sql import functions as F

from pigpen_spark import fold
from pigpen_spark.relation import return_


def test_join_multi_required_after_optional(spark):
    # A(required), B(optional), C(required): keys absent from A must NOT
    # appear even if C has them (was emitting them via a right join).
    a = return_(spark, [("k1", 1)], "k string, a long")
    b = return_(spark, [("k1", 10), ("k9", 90)], "kb string, b long")
    c = return_(spark, [("k1", 100), ("k9", 900)], "kc string, c long")
    out = a.join_multi(
        [(b, F.col("kb")), (c, F.col("kc"))],
        on=F.col("k"),
        required=[True, False, True],
    )
    rows = [(r["a"], r["b"], r["c"]) for r in out.df.collect()]
    assert rows == [(1, 10, 100)]  # no ('k9', ...) row


def test_join_multi_all_optional_two_inputs(spark):
    a = return_(spark, [("k1", 1)], "k string, a long")
    b = return_(spark, [("k2", 20)], "kb string, b long")
    out = a.join_multi([(b, F.col("kb"))], on=F.col("k"), required=[False, False])
    key = lambda t: tuple((x is None, x) for x in t)  # noqa: E731
    got = sorted(((r["a"], r["b"]) for r in out.df.collect()), key=key)
    assert got == sorted([(1, None), (None, 20)], key=key)


def test_join_multi_all_optional_many(spark):
    # r10: the all-optional N>2 branch is now implemented (was a raise).
    a = return_(spark, [("k1", 1)], "k string, a long")
    b = return_(spark, [("k2", 2)], "kb string, b long")
    c = return_(spark, [("k3", 3), ("k1", 30)], "kc string, c long")
    out = a.join_multi([(b, F.col("kb")), (c, F.col("kc"))],
                       on=F.col("k"), required=[False, False, False])
    key = lambda t: tuple((x is None, x) for x in t)  # noqa: E731
    got = sorted(((r["a"], r["b"], r["c"]) for r in out.df.collect()), key=key)
    assert got == sorted([(1, None, 30), (None, 2, None), (None, None, 3)], key=key)


def test_cogroup_required_with_null_fold(spark):
    # a key present in a required input whose fold is NULL (sum of NULLs)
    # must stay in the output with a NULL fold value
    left = return_(spark, [("k1", 1)], "k string, v long")
    right = return_(spark, [("k1", None), ("k2", 5)], "k2 string, w long")
    cg = left.cogroup(
        [(right, F.col("k2"))], on=F.col("k"),
        required=[False, True],
        folds={1: fold.sum_("w")},
    )
    rows = {r["key"]: r["bag_1"] for r in cg.df.collect()}
    assert rows == {"k1": None, "k2": 5}  # k1 kept despite NULL sum


def test_join_nils_same_name_single_key_column(spark):
    # schema must not depend on the join_nils flag: one merged 'k' column
    a = return_(spark, [("x", 1), (None, 2)], "k string, va long")
    b = return_(spark, [("x", 10), (None, 20)], "k string, vb long")
    out = a.join(b, on="k", join_nils=True)
    assert out.columns.count("k") == 1
    rows = {(r["k"], r["va"], r["vb"]) for r in out.df.collect()}
    assert rows == {("x", 1, 10), (None, 2, 20)}
    # and downstream column references work (the old schema was ambiguous)
    assert out.filter(F.col("k").isNull()).count() == 1


def test_simhash_sql_64bit_parity(spark):
    # simhash_sql must match simhash for bits>32 (extended digests)
    import duckdb

    from pigpen_spark.functions.dedup import simhash, simhash_sql
    texts = ["the quick brown fox", "完全 另一个 文本", "one"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    got_spark = {r["id"]: r["s"] for r in df.select("id", simhash("text", 64).alias("s")).collect()}
    con = duckdb.connect()
    sql = f"SELECT id, ({simhash_sql('text', 64)}) AS s FROM df"
    con.register("df", __import__("pandas").DataFrame({"id": range(len(texts)), "text": texts}))
    got_duck = {r[0]: r[1] for r in con.sql(sql).fetchall()}
    assert got_spark == got_duck


def test_ranked_dense_false_ties_share_rank(spark):
    from pigpen_spark.operators.windows import ranked
    df = return_(spark, [(10,), (10,), (20,)], "x long").df
    out = ranked(df, ["x"], dense=False)
    idx = sorted(r["index"] for r in out.collect())
    assert idx == [0, 0, 2]  # F.rank semantics, not row_number


def test_min_with_ignores_null_keys(spark):
    """Round-2 review: struct ordering sorts NULL fields FIRST, so a bare
    F.min(struct(key, v)) returned the NULL-key row's value."""
    from pigpen_spark import fold
    from pigpen_spark.relation import Relation

    df = spark.createDataFrame(
        [(10.0, 5.0), (99.0, None), (20.0, 1.0)], "v double, k double"
    )
    r = Relation(df).group_by(g=F.lit(1)).fold(
        lo=fold.min_with("v", F.col("k")),
        hi=fold.max_with("v", (F.col("k") * -1)),
    ).df.collect()[0]
    assert r["lo"] == 20.0   # k=1 smallest non-null key
    assert r["hi"] == 20.0   # -k largest at k=1


def test_min_with_all_null_keys_returns_null(spark):
    from pigpen_spark import fold
    from pigpen_spark.relation import Relation

    df = spark.createDataFrame([(1.0, None), (2.0, None)], "v double, k double")
    r = Relation(df).group_by(g=F.lit(1)).fold(
        lo=fold.min_with("v", F.col("k"))
    ).df.collect()[0]
    assert r["lo"] is None


def test_lsh_bucket_dim_mismatch_raises(spark):
    """Round-2 review: dim > len(vec) silently put every vector in one
    all-zeros bucket — collapsing blocked near-dup back to O(n^2)."""
    import pytest as _pytest

    from pigpen_spark.functions import similarity as S

    df = spark.createDataFrame([(1, [1.0, 2.0])], "id long, emb array<double>")
    with _pytest.raises(Exception, match="lsh_bucket"):
        df.select(S.lsh_bucket(F.col("emb"), 4, dim=8)).collect()


def test_split_sql_single_split_and_empty_fractions():
    import duckdb

    from pigpen_spark.functions import pipeline as P

    con = duckdb.connect()
    sql = P.split_by_hash_sql("x", {"only": 1.0})
    assert con.execute(f"SELECT {sql} FROM (SELECT 1 AS x)").fetchone()[0] == "only"
    where = P.stratified_sample_by_hash_sql("s", {}, "x", default=1.0)
    assert con.execute(f"SELECT count(*) FROM (SELECT 1 AS x, 'a' AS s) WHERE {where}").fetchone()[0] == 1


def test_pack_chunks_rejects_nonpositive_budget(spark):
    import pytest as _pytest

    from pigpen_spark.functions import pipeline as P

    df = spark.createDataFrame([(1, 10)], "id long, n long")
    with _pytest.raises(ValueError, match="budget"):
        P.pack_chunks(df, "n", order_by=["id"], budget=0)


def test_funnel_step_name_with_quote(spark):
    import datetime as dt

    from pigpen_spark.operators import analytics as A

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), "o'clock"), (1, dt.datetime(2024, 1, 2), "buy")],
        "user_id long, ts timestamp, event_type string",
    )
    out = {r["step_name"]: r["n_users"] for r in A.funnel(df, ["o'clock", "buy"]).collect()}
    assert out == {"o'clock": 1, "buy": 1}
    # oracle builder must also survive the quote
    import duckdb
    con = duckdb.connect()
    con.execute("CREATE TABLE events AS SELECT 1::BIGINT user_id, TIMESTAMP '2024-01-01' ts, 'o''clock' event_type")
    rows = con.execute(A.funnel_sql(["o'clock"])).fetchall()
    assert rows[0][2] == 1


def test_top_ngram_fraction_clamped(spark):
    from pigpen_spark.functions import text as T

    df = spark.createDataFrame([(1, "a a a a a"), (2, "")], "doc_id long, text string")
    rows = {r["doc_id"]: r["f"] for r in df.select(
        "doc_id", T.top_ngram_fraction("text", 2).alias("f")).collect()}
    assert rows[1] == 1.0       # overlapping 'a a' would be 1.6 unclamped
    assert rows[2] is None      # empty doc stays NULL (least() would give 1.0)
