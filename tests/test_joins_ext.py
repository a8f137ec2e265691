"""As-of join and salted skew-join (operators/joins.py)."""

from pyspark.sql import functions as F

from pigpen_spark.operators.joins import as_of_join, salted_join
from pigpen_spark.relation import return_


def ts(sec):
    import datetime
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=sec)


class TestAsOf:
    def test_backward_match(self, spark):
        left = return_(spark, [(1, ts(10), "l1"), (1, ts(25), "l2"), (2, ts(5), "l3")],
                       "k long, ts timestamp, lid string").df
        right = return_(spark, [(1, ts(5), "r1"), (1, ts(20), "r2"), (2, ts(50), "r3")],
                        "k long, ts timestamp, rid string").df
        out = as_of_join(left, right, on="k", payload=["rid"])
        got = {r["lid"]: r["rid"] for r in out.collect()}
        # l1@10 → r1@5; l2@25 → r2@20; l3@5 → nothing (r3@50 is later)
        assert got == {"l1": "r1", "l2": "r2", "l3": None}

    def test_equal_ts_matches(self, spark):
        left = return_(spark, [(1, ts(10), "l1")], "k long, ts timestamp, lid string").df
        right = return_(spark, [(1, ts(10), "r1")], "k long, ts timestamp, rid string").df
        out = as_of_join(left, right, on="k", payload=["rid"])
        assert out.collect()[0]["rid"] == "r1"  # >= semantics: ties match

    def test_tolerance(self, spark):
        left = return_(spark, [(1, ts(100), "l1")], "k long, ts timestamp, lid string").df
        right = return_(spark, [(1, ts(10), "r1")], "k long, ts timestamp, rid string").df
        out = as_of_join(left, right, on="k", payload=["rid"], tolerance_seconds=30)
        assert out.collect()[0]["rid"] is None  # 90s gap > 30s tolerance
        out2 = as_of_join(left, right, on="k", payload=["rid"], tolerance_seconds=120)
        assert out2.collect()[0]["rid"] == "r1"


class TestSalted:
    def test_result_matches_plain_join(self, spark):
        # heavy skew: 900 of 1000 left rows share key 7
        left_rows = [(7 if i < 900 else i % 50, i) for i in range(1000)]
        left = return_(spark, left_rows, "k long, lid long").df
        right = return_(spark, [(i, f"v{i}") for i in range(50)], "rk long, v string").df
        salted = salted_join(left, right, on="k", right_on="rk", salt=8)
        plain = left.join(right, left["k"] == right["rk"])
        assert salted.count() == plain.count()
        s = {(r["lid"], r["v"]) for r in salted.collect()}
        p = {(r["lid"], r["v"]) for r in plain.collect()}
        assert s == p

    def test_salt_spreads_hot_key(self, spark):
        left = return_(spark, [(7, i) for i in range(800)], "k long, lid long").df
        right = return_(spark, [(7, "x")], "rk long, v string").df
        salted = salted_join(left, right, on="k", right_on="rk", salt=8)
        # the salt column must actually be part of the join condition —
        # assert on the physical plan, not a recomputed stand-in
        plan = salted._jdf.queryExecution().executedPlan().toString()
        assert "__lsalt" in plan and "__rsalt" in plan
        assert salted.count() == 800

    def test_salted_same_name_key_single_column(self, spark):
        left = return_(spark, [(1, 10)], "k long, v long").df
        right = return_(spark, [(1, "x")], "k long, w string").df
        out = salted_join(left, right, on="k", salt=4)
        assert out.columns.count("k") == 1
        assert out.select("k").collect()[0]["k"] == 1  # no AMBIGUOUS_REFERENCE


class TestRangeJoin:
    def _naive(self, left, right, key=None):
        cond = (left["v"] >= right["lo"]) & (left["v"] <= right["hi"])
        if key:
            cond = cond & (left[key] == right[key])
        r = right.select(*[F.col(c).alias(f"r_{c}") for c in right.columns])
        cond = (left["v"] >= r["r_lo"]) & (left["v"] <= r["r_hi"])
        if key:
            cond = cond & (left[key] == r[f"r_{key}"])
        return {(x["lid"], x["rid"]) for x in left.join(r, cond).select(
            left["lid"], F.col("r_rid").alias("rid")).collect()}

    def test_matches_naive_theta_join(self, spark):
        from pigpen_spark.operators.joins import range_join
        import random
        rnd = random.Random(11)
        lrows = [(i, rnd.uniform(-50, 50)) for i in range(200)]
        rrows = []
        for j in range(60):
            lo = rnd.uniform(-60, 55)
            rrows.append((j, lo, lo + rnd.uniform(0, 12)))
        left = spark.createDataFrame(lrows, "lid long, v double")
        right = spark.createDataFrame(rrows, "rid long, lo double, hi double")
        got = {(x["lid"], x["rid"])
               for x in range_join(left, right, "v", "lo", "hi", bin_width=5.0)
               .select("lid", "rid").collect()}
        assert got == self._naive(left, right)
        # auto bin width gives identical rows
        auto = {(x["lid"], x["rid"])
                for x in range_join(left, right, "v", "lo", "hi")
                .select("lid", "rid").collect()}
        assert auto == got

    def test_inclusive_bounds_and_bin_edges(self, spark):
        from pigpen_spark.operators.joins import range_join
        left = spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (3, 9.999), (4, 20.001), (5, -10.0)],
            "lid long, v double")
        right = spark.createDataFrame(
            [(7, 10.0, 20.0), (8, -15.0, -10.0)], "rid long, lo double, hi double")
        got = {(x["lid"], x["rid"])
               for x in range_join(left, right, "v", "lo", "hi", bin_width=10.0)
               .select("lid", "rid").collect()}
        assert got == {(1, 7), (2, 7), (5, 8)}

    def test_keyed_and_degenerate(self, spark):
        from pigpen_spark.operators.joins import range_join
        left = spark.createDataFrame(
            [("a", 1, 5.0), ("b", 2, 5.0)], "k string, lid long, v double")
        right = spark.createDataFrame(
            [("a", 7, 0.0, 10.0), ("b", 8, 6.0, 10.0), ("a", 9, 9.0, 3.0)],
            "k string, rid long, lo double, hi double")
        out = range_join(left, right, "v", "lo", "hi", on="k", bin_width=2.0)
        assert {(x["lid"], x["rid"]) for x in out.select("lid", "rid").collect()} == {(1, 7)}
        # key column appears once
        assert out.columns.count("k") == 1
        # zero-width-interval table with auto bin width still works
        zw = spark.createDataFrame([("a", 7, 5.0, 5.0)], "k string, rid long, lo double, hi double")
        out2 = range_join(left, zw, "v", "lo", "hi", on="k")
        assert [x["rid"] for x in out2.collect()] == [7]


class TestIntervalOverlap:
    def test_matches_naive_and_no_dups(self, spark):
        from pigpen_spark.operators.joins import interval_overlap_join
        import random
        rnd = random.Random(23)
        lrows = [(i, lo := rnd.uniform(-40, 40), lo + rnd.uniform(0, 15)) for i in range(120)]
        rrows = [(j, lo := rnd.uniform(-45, 40), lo + rnd.uniform(0, 8)) for j in range(80)]
        left = spark.createDataFrame(lrows, "lid long, llo double, lhi double")
        right = spark.createDataFrame(rrows, "rid long, rlo double, rhi double")
        rows = (interval_overlap_join(left, right, "llo", "lhi", "rlo", "rhi", bin_width=6.0)
                .select("lid", "rid").collect())
        got = [(x["lid"], x["rid"]) for x in rows]
        assert len(got) == len(set(got)), "pair emitted more than once"
        naive = {(x["lid"], x["rid"])
                 for x in left.join(right, (F.col("llo") <= F.col("rhi")) & (F.col("rlo") <= F.col("lhi")))
                 .select("lid", "rid").collect()}
        assert set(got) == naive
        auto = (interval_overlap_join(left, right, "llo", "lhi", "rlo", "rhi")
                .select("lid", "rid").collect())
        assert {(x["lid"], x["rid"]) for x in auto} == naive

    def test_keyed_touching_endpoints(self, spark):
        from pigpen_spark.operators.joins import interval_overlap_join
        left = spark.createDataFrame(
            [("a", 1, 0.0, 5.0), ("b", 2, 0.0, 5.0)], "k string, lid long, llo double, lhi double")
        right = spark.createDataFrame(
            [("a", 7, 5.0, 9.0), ("a", 8, 5.1, 9.0), ("b", 9, 7.0, 3.0)],
            "k string, rid long, rlo double, rhi double")
        out = interval_overlap_join(left, right, "llo", "lhi", "rlo", "rhi", on="k", bin_width=2.0)
        # closed intervals: touching at 5.0 overlaps; inverted right row dropped
        assert {(x["lid"], x["rid"]) for x in out.select("lid", "rid").collect()} == {(1, 7)}
        assert out.columns.count("k") == 1
