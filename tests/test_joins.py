"""Join/cogroup/semi/anti semantics — the reference's critical matrix.

Fixture data replicates join-data1/join-data2 (FIXTURES.md §1;
reference: pigpen-core/src/test/clojure/pigpen/functional/join_test.clj:
228-242) — nullable keys, partial overlap, duplicates.
"""

import pytest
from pyspark.sql import functions as F

from pigpen_spark.relation import Relation, return_


@pytest.fixture()
def kv_left(spark):
    return return_(spark, [(None, 1), (None, 3), ("i", 5), ("i", 7), ("l", 9), ("l", 11)], "k string, v long")


@pytest.fixture()
def kv_right(spark):
    return return_(spark, [(None, 2), (None, 4), ("i", 6), ("i", 8), ("r", 10), ("r", 12)], "k string, v long")


def pairs(rel, lv="v", rv="v2"):
    key = lambda t: tuple((x is None, x) for x in t)  # noqa: E731 — None-safe sort
    return sorted(((r[lv], r[rv]) for r in rel.df.collect()), key=key)


class TestJoin:
    def test_inner_nulls_dont_match(self, kv_left, kv_right):
        # join_test.clj:244-299 — only 'i' keys cross-product (4 rows)
        r2 = kv_right.map(k2=F.col("k"), v2=F.col("v"))
        j = kv_left.join(r2, on="k", right_on="k2")
        assert pairs(j) == [(5, 6), (5, 8), (7, 6), (7, 8)]

    def test_join_nils(self, kv_left, kv_right):
        # join_test.clj:301-359 — {:join-nils true}: NULL keys match
        r2 = kv_right.map(k2=F.col("k"), v2=F.col("v"))
        j = kv_left.join(r2, on="k", right_on="k2", join_nils=True)
        assert pairs(j) == [(1, 2), (1, 4), (3, 2), (3, 4), (5, 6), (5, 8), (7, 6), (7, 8)]

    def test_left_outer(self, kv_left, kv_right):
        r2 = kv_right.map(k2=F.col("k"), v2=F.col("v"))
        j = kv_left.join(r2, on="k", right_on="k2", how="left")
        assert pairs(j) == [(1, None), (3, None), (5, 6), (5, 8), (7, 6), (7, 8), (9, None), (11, None)]

    def test_full_outer(self, kv_left, kv_right):
        r2 = kv_right.map(k2=F.col("k"), v2=F.col("v"))
        j = kv_left.join(r2, on="k", right_on="k2", how="full")
        assert pairs(j) == [
            (1, None), (3, None), (5, 6), (5, 8), (7, 6), (7, 8), (9, None), (11, None),
            (None, 2), (None, 4), (None, 10), (None, 12),
        ]

    def test_self_join(self, kv_left):
        # join_test.clj:600-611 — self-joins need no manual aliasing
        r2 = kv_left.map(k2=F.col("k"), v2=F.col("v"))
        j = kv_left.join(r2, on="k", right_on="k2")
        assert len(j.df.collect()) == 8  # 'i':2x2 + 'l':2x2

    def test_computed_key_fn(self, spark):
        # join on computed key (key-selector fn, join.clj:166-193)
        a = return_(spark, [(1,), (2,), (3,)], "x long")
        b = return_(spark, [(10,), (21,), (32,)], "y long")
        j = a.join(b, on=F.col("x") % 10, right_on=F.col("y") % 10)
        assert sorted((r["x"], r["y"]) for r in j.df.collect()) == [(1, 21), (2, 32)]


class TestSemiAnti:
    def test_filter_by_keeps_dup_keys(self, spark, kv_left):
        # join_test.clj:655-668 — dup keys in keys-rel duplicate rows
        keys = return_(spark, [("i",), ("i",), ("z",)], "kk string")
        out = kv_left.filter_by("k", keys)
        assert sorted(r["v"] for r in out.df.collect()) == [5, 5, 7, 7]

    def test_filter_by_null_key_matches_null(self, spark, kv_left):
        # join_test.clj:640-653 — NULL in keys-rel keeps NULL-key rows
        keys = return_(spark, [(None,), ("l",)], "kk string")
        out = kv_left.filter_by("k", keys)
        assert sorted(r["v"] for r in out.df.collect()) == [1, 3, 9, 11]

    def test_remove_by(self, spark, kv_left):
        keys = return_(spark, [("i",), ("i",)], "kk string")
        out = kv_left.remove_by("k", keys)
        assert sorted(r["v"] for r in out.df.collect()) == [1, 3, 9, 11]

    def test_remove_by_null(self, spark, kv_left):
        # NULL in keys removes NULL-key rows (null-safe anti)
        keys = return_(spark, [(None,)], "kk string")
        out = kv_left.remove_by("k", keys)
        assert sorted(r["v"] for r in out.df.collect()) == [5, 7, 9, 11]


class TestCogroup:
    def test_cogroup_outer(self, kv_left, kv_right):
        # local.clj:366-399 — key → bag per input; empty bag → NULL
        cg = kv_left.cogroup([(kv_right, "k")], on="k", required=[False, False])
        rows = {r["key"]: (r["bag_0"], r["bag_1"]) for r in cg.df.collect()}
        assert set(rows) == {None, "i", "l", "r"}
        assert sorted(x["v"] for x in rows["i"][0]) == [5, 7]
        assert sorted(x["v"] for x in rows["i"][1]) == [6, 8]
        assert rows["l"][1] is None
        assert rows["r"][0] is None
        # NULL keys group (not dropped) — each side's nils grouped under NULL
        assert sorted(x["v"] for x in rows[None][0]) == [1, 3]

    def test_cogroup_required(self, kv_left, kv_right):
        # :required input drops keys absent from it (inner side)
        cg = kv_left.cogroup([(kv_right, "k")], on="k", required=[True, True])
        keys = {r["key"] for r in cg.df.collect()}
        assert keys == {None, "i"}

    def test_group_by_fold_in_cogroup(self, spark):
        # join_test.clj:361-419 — fold applied per cogroup bag
        from pigpen_spark import fold
        data = return_(spark, [("foo", 1), ("foo", 2), ("foo", 3), ("bar", 4), ("bar", 5)], "k string, v long")
        out = data.group_by("k").fold(s=fold.sum_("v"), n=fold.count())
        rows = {r["k"]: (r["s"], r["n"]) for r in out.df.collect()}
        assert rows == {"foo": (6, 3), "bar": (9, 2)}
