"""Opaque Python-object pipelines (the arbitrary-Clojure-value analog)."""

from pyspark.sql import functions as F

from pigpen_spark.pyobj import PyObjRelation, return_objects, to_pyobj
from pigpen_spark.relation import return_


def test_arbitrary_objects_roundtrip(spark):
    objs = [frozenset({1, 2}), ("a", [3, 4]), {"nested": {"deep": (5,)}}, None]
    rel = return_objects(spark, objs)
    got = rel.collect()
    assert sorted(map(repr, got)) == sorted(map(repr, objs))


def test_fused_chain_single_crossing(spark):
    rel = return_objects(spark, [(i, i * 10) for i in range(10)])
    out = (
        rel.map_obj(lambda t: (t[0], t[1] + 1))
        .filter_obj(lambda t: t[0] % 2 == 0)
        .mapcat_obj(lambda t: [t, (t[0], -1)])
    )
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    # the 3-op chain compiles to exactly ONE MapInPandas crossing
    assert plan.count("MapInPandas") == 1
    vals = out.collect()
    assert len(vals) == 10  # 5 evens × 2 outputs
    assert (0, 1) in vals and (0, -1) in vals


def test_to_pyobj_from_typed_and_back(spark):
    rel = return_(spark, [(1, "x"), (2, "y")], "a long, b string")
    obj = to_pyobj(rel, lambda row: (row["b"], row["a"] * 100))
    typed = obj.map_obj(lambda t: (t[0].upper(), t[1])).to_typed(
        "name string, v long", lambda t: {"name": t[0], "v": t[1]}
    )
    rows = sorted((r["name"], r["v"]) for r in typed.df.collect())
    assert rows == [("X", 100), ("Y", 200)]


def test_group_by_key_reduce(spark):
    # word-count over arbitrary tuple objects, map-side combining
    words = ["a", "b", "a", "c", "b", "a"]
    rel = return_objects(spark, words)
    out = rel.group_by_key(key_fn=lambda w: w, reduce_fn=lambda x, y: x)  # keep any
    counted = return_objects(spark, words).map_obj(lambda w: (w, 1)).group_by_key(
        key_fn=lambda t: t[0], reduce_fn=lambda x, y: (x[0], x[1] + y[1])
    )
    got = {k: v[1] for k, v in counted.collect()}
    assert got == {"a": 3, "b": 2, "c": 1}
    assert sorted(k for k, _ in out.collect()) == ["a", "b", "c"]


def test_distinct_obj(spark):
    rel = return_objects(spark, [(1, "x"), (1, "x"), (2, "y")])
    assert sorted(rel.distinct_obj().collect()) == [(1, "x"), (2, "y")]


def test_empty_chain(spark):
    rel = return_objects(spark, [1, 2, 3]).filter_obj(lambda x: False)
    assert rel.collect() == []
