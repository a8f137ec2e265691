"""Funnel / cohort-retention / BM25 / heavy-hitter functional tests —
covering the edge cases the synthetic corpus can't produce: out-of-order
funnels, exact-timestamp ties, users skipping steps, empty inputs."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from pigpen_spark.functions import ranking as R
from pigpen_spark.operators import analytics as A


def _ts(s: int):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture()
def events(spark):
    rows = [
        # u1: full clean funnel
        (1, _ts(0), "view"), (1, _ts(10), "click"), (1, _ts(20), "purchase"),
        # u2: purchase BEFORE the click -> stops at click
        (2, _ts(0), "view"), (2, _ts(5), "purchase"), (2, _ts(10), "click"),
        # u3: view only
        (3, _ts(0), "view"),
        # u4: click/purchase but never viewed -> not in funnel at all
        (4, _ts(0), "click"), (4, _ts(5), "purchase"),
        # u5: click at EXACTLY the view timestamp (tie counts, ts >= prev)
        (5, _ts(0), "view"), (5, _ts(0), "click"),
    ]
    return spark.createDataFrame(
        [(u, t, e, i) for i, (u, t, e) in enumerate(rows)],
        "user_id long, ts timestamp, event_type string, event_id long",
    )


class TestFunnel:
    def test_counts(self, events):
        out = {
            r["step_name"]: r["n_users"]
            for r in A.funnel(events, ["view", "click", "purchase"]).collect()
        }
        assert out == {"view": 4, "click": 3, "purchase": 1}

    def test_users_progression(self, events):
        rows = {
            r["user_id"]: r
            for r in A.funnel_users(events, ["view", "click", "purchase"]).collect()
        }
        assert rows[1]["step_3"] == _ts(20)
        assert rows[2]["step_2"] == _ts(10) and rows[2]["step_3"] is None
        assert rows[3]["step_2"] is None
        assert 4 not in rows or rows[4]["step_1"] is None
        assert rows[5]["step_2"] == _ts(0)  # tie at ts >= prev

    def test_empty_steps_raises(self, events):
        with pytest.raises(ValueError):
            A.funnel(events, [])

    def test_empty_events(self, spark):
        empty = spark.createDataFrame(
            [], "user_id long, ts timestamp, event_type string"
        )
        out = A.funnel(empty, ["view", "click"]).collect()
        assert [(r["step"], r["n_users"]) for r in out] == [(1, 0), (2, 0)]


class TestCohort:
    def test_offsets(self, spark):
        rows = [
            (1, dt.datetime(2024, 1, 1)),    # Mon, cohort week 0
            (1, dt.datetime(2024, 1, 10)),   # week 1
            (2, dt.datetime(2024, 1, 3)),    # same cohort week as u1
            (2, dt.datetime(2024, 1, 21)),   # Sun of week 2
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        out = {
            (r["cohort_epoch"], r["week_offset"]): r["n_users"]
            for r in A.cohort_retention(df).collect()
        }
        wk0 = int(dt.datetime(2024, 1, 1).timestamp())
        assert out[(wk0, 0)] == 2        # both users active in cohort week
        assert out[(wk0, 1)] == 1        # u1 returns week 1
        assert out[(wk0, 2)] == 1        # u2 returns week 2
        assert len(out) == 3


class TestRanking:
    @pytest.fixture()
    def docs(self, spark):
        return spark.createDataFrame(
            [
                (1, "spark spark spark engine"),
                (2, "spark engine"),
                (3, "database engine theory"),
                (4, ""),
            ],
            "doc_id long, text string",
        )

    def test_bm25_orders_by_relevance(self, docs):
        out = R.bm25_search(docs, ["spark"], topk=10).collect()
        ids = [r["doc_id"] for r in out]
        assert ids[0] == 1 and set(ids) == {1, 2}  # doc3/4 never match
        assert out[0]["score"] > out[1]["score"] > 0

    def test_bm25_multi_term_sums(self, docs):
        one = {r["doc_id"]: r["score"] for r in R.bm25_search(docs, ["theory"], topk=10).collect()}
        both = {r["doc_id"]: r["score"] for r in R.bm25_search(docs, ["database", "theory"], topk=10).collect()}
        assert set(both) == {3} and both[3] > one[3]

    def test_bm25_empty_query_raises(self, docs):
        with pytest.raises(ValueError):
            R.bm25_search(docs, [])

    def test_top_terms(self, spark):
        df = spark.createDataFrame(
            [(1, "a", "x x y"), (2, "a", "x z"), (3, "b", "q")],
            "doc_id long, grp string, text string",
        )
        out = {
            (r["grp"], r["pos"]): (r["term"], r["n"])
            for r in R.top_terms_per_group(df, "grp", topk=2).collect()
        }
        assert out[("a", 1)] == ("x", 3)
        assert out[("a", 2)] == ("y", 1)  # tie y/z broken by term asc
        assert out[("b", 1)] == ("q", 1)
