"""flatten_struct / cogroup per-input folds / pickle round-trip."""

from pyspark.sql import functions as F

from pigpen_spark import fold
from pigpen_spark.relation import return_
from pigpen_spark.sources.io import load_pickle, store_pickle


def test_flatten_struct(spark):
    r = return_(spark, [((1, "a"), 9)], "m struct<x:long,y:string>, z long")
    out = r.flatten_struct("m")
    assert out.columns == ["z", "x", "y"]
    [row] = out.df.collect()
    assert (row["x"], row["y"], row["z"]) == (1, "a", 9)


def test_cogroup_with_folds(spark):
    left = return_(spark, [("a", 1), ("a", 2), ("b", 3)], "k string, v long")
    right = return_(spark, [("a", 10), ("c", 30)], "k2 string, w long")
    cg = left.cogroup(
        [(right, F.col("k2"))], on=F.col("k"),
        required=[False, False],
        folds={0: fold.sum_("v"), 1: fold.count()},
    )
    rows = {r["key"]: (r["bag_0"], r["bag_1"]) for r in cg.df.collect()}
    assert rows == {"a": (3, 1), "b": (3, None), "c": (None, 1)}


def test_pickle_roundtrip(spark, tmp_path):
    r = return_(spark, [(1, "foo"), (2, "bar")], "a long, b string")
    p = str(tmp_path / "pk")
    store_pickle(r, p)
    back = load_pickle(spark, p, schema="a long, b string")
    assert sorted((x["a"], x["b"]) for x in back.df.collect()) == [(1, "foo"), (2, "bar")]


def test_mapcat_twice_cross_product(spark):
    # project$ multi-flatten cross product (raw.clj:184-275): two explodes
    r = return_(spark, [(1,)], "x long")
    out = (
        r.map(a=F.array(F.lit(1), F.lit(2)), b=F.array(F.lit(10), F.lit(20)))
        .df.select(F.explode("a").alias("a"), "b")
        .select("a", F.explode("b").alias("b"))
    )
    assert sorted((row["a"], row["b"]) for row in out.collect()) == [
        (1, 10), (1, 20), (2, 10), (2, 20)]
