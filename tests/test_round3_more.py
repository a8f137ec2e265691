"""Round-3 continuation operators: fuzzy join, markup strip, collocations."""

import pytest
from pyspark.sql import functions as F

from pigpen_spark.functions import ranking as R
from pigpen_spark.functions import text as T
from pigpen_spark.operators.joins import fuzzy_join


def _lev(a: str, b: str) -> int:
    # reference Levenshtein (classic DP) for differential checks
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


class TestFuzzyJoin:
    NAMES = [
        (1, "kitten"), (2, "sitten"), (3, "sittin"), (4, "sitting"),
        (5, "kitchen"), (6, "mittens"), (7, "bitten"), (8, "written"),
        (9, "abc"), (10, "abd"), (11, "xbd"), (12, "zzzz"),
        (13, ""), (14, "a"), (15, "ab"),
    ]

    @pytest.mark.parametrize("d", [0, 1, 2])
    def test_differential_vs_bruteforce(self, spark, d):
        df = spark.createDataFrame(self.NAMES, ["id", "name"])
        got = {
            (r.id_l, r.id_r, r.dist)
            for r in fuzzy_join(df, df, "id", "name", max_dist=d)
            .filter(F.col("id_l") < F.col("id_r")).collect()
        }
        want = {
            (i1, i2, _lev(n1, n2))
            for i1, n1 in self.NAMES for i2, n2 in self.NAMES
            if i1 < i2 and _lev(n1, n2) <= d
        }
        assert got == want

    def test_two_sided(self, spark):
        left = spark.createDataFrame([(1, "color"), (2, "colour")], ["id", "s"])
        right = spark.createDataFrame([(10, "colour"), (11, "colours")], ["rid", "s"])
        got = {
            (r.id_l, r.id_r, r.dist)
            for r in fuzzy_join(left, right, "id", "s", right_id="rid",
                                max_dist=1).collect()
        }
        assert got == {(1, 10, 1), (2, 10, 0), (2, 11, 1)}

    def test_negative_dist_raises(self, spark):
        df = spark.createDataFrame([(1, "x")], ["id", "s"])
        with pytest.raises(ValueError):
            fuzzy_join(df, df, "id", "s", max_dist=-1)


class TestStripMarkup:
    CASES = [
        ("<p>hello world</p>", "hello world"),
        ("<script>var x = '<p>sneaky</p>';</script>after", "after"),
        ("<STYLE type=x>.a{color:red}</STYLE>ok", "ok"),
        ("<!-- a <b> comment -->kept", "kept"),
        ("a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39; c", "a & b <tag> \"q\" 's' c"),
        ("&amp;lt;", "&lt;"),  # decode once, not twice
        ("no markup at all", "no markup at all"),
        ("  <div> spaced   out </div>  ", "spaced out"),
        ("", ""),
    ]

    def test_cases(self, spark):
        df = spark.createDataFrame([(i, s) for i, (s, _) in enumerate(self.CASES)],
                                   ["i", "s"])
        got = {r.i: r.c for r in df.select("i", T.strip_markup("s").alias("c")).collect()}
        for i, (_, want) in enumerate(self.CASES):
            assert got[i] == want, f"case {i}"

    def test_sql_matches_spark(self, spark):
        import duckdb

        df = spark.createDataFrame([(i, s) for i, (s, _) in enumerate(self.CASES)],
                                   ["i", "s"])
        got = {r.i: r.c for r in df.select("i", T.strip_markup("s").alias("c")).collect()}
        con = duckdb.connect()
        for i, (s, _) in enumerate(self.CASES):
            (sql_out,) = con.execute(
                "SELECT " + T.strip_markup_sql("?::VARCHAR"), [s]
            ).fetchone()
            assert sql_out == got[i], f"case {i}: duckdb={sql_out!r} spark={got[i]!r}"


class TestCollocations:
    def test_pairs_and_assoc(self, spark):
        # "a b" adjacent twice + one window-2 pair; "b c" once
        df = spark.createDataFrame(
            [(1, "a b c"), (2, "a b"), (3, "b a")], ["id", "text"]
        )
        out = {
            r.pair: (r.pair_count, r.assoc_ppm)
            for r in R.collocations(df, "text", window=2, min_count=1).collect()
        }
        # token counts: a=3, b=3, c=1
        # pairs: (a,b) from doc1 off1, doc2 off1, doc3 off1 = 3
        #        (a,c) doc1 off2 = 1; (b,c) doc1 off1 = 1
        assert out["a b"] == (3, 1_000_000)  # 1e6*9 // 9
        assert out["a c"] == (1, 333_333)    # 1e6*1 // 3
        assert out["b c"] == (1, 333_333)
        assert len(out) == 3

    def test_identical_token_pairs_dropped(self, spark):
        df = spark.createDataFrame([(1, "x x x")], ["id", "text"])
        assert R.collocations(df, "text", window=2, min_count=1).count() == 0

    def test_min_count_prunes(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c"), (2, "a b")], ["id", "text"]
        )
        out = {r.pair for r in R.collocations(df, "text", min_count=2).collect()}
        assert out == {"a b"}

    def test_window_one_is_adjacent_only(self, spark):
        df = spark.createDataFrame([(1, "a b c")], ["id", "text"])
        out = {r.pair for r in
               R.collocations(df, "text", window=1, min_count=1).collect()}
        assert out == {"a b", "b c"}


class TestLshIndexSearch:
    def _emb(self, spark, sf_dir):
        # filter, not limit: both sides of the differential must see the
        # exact same row set regardless of scan order
        return spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
            F.col("vec_id") < 120
        )

    def test_matches_self_join_for_in_corpus_batch(self, spark, sf_dir):
        from pigpen_spark.functions import similarity as S

        emb = self._emb(spark, sf_dir)
        idx = S.lsh_index(emb, n_planes=4, dim=64)
        batch = emb.filter(F.col("vec_id") < 15)
        got = {
            (r.q_id, r.n_id, r.score, r.rank)
            for r in S.lsh_topk_against(idx, batch, k=3, n_planes=4, dim=64).collect()
        }
        want = {
            (r.q_id, r.n_id, r.score, r.rank)
            for r in S.lsh_topk(emb, k=3, n_planes=4, dim=64).collect()
            if r.q_id < 15
        }
        assert got == want and got

    def test_exclude_self_flag(self, spark, sf_dir):
        from pigpen_spark.functions import similarity as S

        emb = self._emb(spark, sf_dir)
        idx = S.lsh_index(emb, n_planes=4, dim=64)
        batch = emb.filter(F.col("vec_id") == 3)
        hit = (
            S.lsh_topk_against(idx, batch, k=1, n_planes=4, dim=64,
                               exclude_self=False)
            .filter((F.col("n_id") == 3) & (F.col("rank") == 1))
            .collect()
        )
        assert len(hit) == 1 and hit[0].score == 1.0
        none = (
            S.lsh_topk_against(idx, batch, k=100, n_planes=4, dim=64)
            .filter(F.col("n_id") == 3).count()
        )
        assert none == 0

    def test_multi_probe_superset(self, spark, sf_dir):
        from pigpen_spark.functions import similarity as S

        emb = self._emb(spark, sf_dir)
        idx = S.lsh_index(emb, n_planes=4, dim=64)
        batch = emb.filter(F.col("vec_id") < 10)
        base = S.lsh_topk_against(idx, batch, k=1000, n_planes=4, dim=64)
        mp = S.lsh_topk_against(idx, batch, k=1000, n_planes=4, dim=64,
                                multi_probe=True)
        b = {(r.q_id, r.n_id) for r in base.collect()}
        m = {(r.q_id, r.n_id) for r in mp.collect()}
        assert b <= m


class TestRemoveFrequentSpans:
    def test_removes_all_copies_above_threshold(self, spark):
        from pigpen_spark.functions.pipeline import remove_frequent_spans

        # span "x y" (chunk=2) in 3 docs -> banned at min_docs=3;
        # "a b" in 2 docs -> kept
        df = spark.createDataFrame(
            [(1, "x y a b"), (2, "x y c d"), (3, "x y e f"), (4, "a b g h")],
            ["id", "text"],
        )
        out = {r.id: (r.clean_text, r.n_removed)
               for r in remove_frequent_spans(df, "id", "text",
                                              chunk=2, min_docs=3).collect()}
        assert out[1] == ("a b", 1)
        assert out[2] == ("c d", 1)
        assert out[3] == ("e f", 1)
        assert out[4] == ("a b g h", 0)

    def test_no_ban_is_identity(self, spark):
        from pigpen_spark.functions.pipeline import remove_frequent_spans

        df = spark.createDataFrame([(1, "p q"), (2, "r s")], ["id", "text"])
        out = {r.id: r.clean_text
               for r in remove_frequent_spans(df, "id", "text",
                                              chunk=2, min_docs=2).collect()}
        assert out == {1: "p q", 2: "r s"}

    def test_fully_boilerplate_doc_empties(self, spark):
        from pigpen_spark.functions.pipeline import remove_frequent_spans

        df = spark.createDataFrame(
            [(1, "x y"), (2, "x y"), (3, "x y extra words")], ["id", "text"]
        )
        out = {r.id: (r.clean_text, r.n_removed)
               for r in remove_frequent_spans(df, "id", "text",
                                              chunk=2, min_docs=3).collect()}
        assert out[1] == ("", 1) and out[2] == ("", 1)
        assert out[3] == ("extra words", 1)

    def test_min_docs_guard(self, spark):
        from pigpen_spark.functions.pipeline import remove_frequent_spans

        df = spark.createDataFrame([(1, "a")], ["id", "text"])
        with pytest.raises(ValueError):
            remove_frequent_spans(df, "id", "text", min_docs=1)

    def test_within_doc_repeat_not_banned(self, spark):
        from pigpen_spark.functions.pipeline import remove_frequent_spans

        # "x y" repeats inside ONE doc: per-doc distinct means doc-count 1
        df = spark.createDataFrame([(1, "x y x y"), (2, "m n")], ["id", "text"])
        out = {r.id: r.clean_text
               for r in remove_frequent_spans(df, "id", "text",
                                              chunk=2, min_docs=2).collect()}
        assert out[1] == "x y x y"


class TestUrlOps:
    CASES = [
        ("https://www.a.com:443/p?utm_source=x&q=1#top", "https://www.a.com/p?q=1"),
        ("http://b.org:80/", "http://b.org/"),
        ("http://b.org:8080/x", "http://b.org:8080/x"),  # non-default port kept
        ("https://c.net/p?utm_a=1&utm_b=2", "https://c.net/p"),
        ("https://c.net/p?gclid=z&ref=r&fbclid=w", "https://c.net/p?ref=r"),
        ("https://d.io/p#frag", "https://d.io/p"),
        ("no-scheme plain text", "no-scheme plain text"),
        ("", ""),
    ]

    def test_normalize_cases(self, spark):
        df = spark.createDataFrame(
            [(i, s) for i, (s, _) in enumerate(self.CASES)], ["i", "u"])
        got = {r.i: r.n for r in df.select("i", T.url_normalize("u").alias("n")).collect()}
        for i, (_, want) in enumerate(self.CASES):
            assert got[i] == want, f"case {i}: {got[i]!r}"

    def test_sql_matches_spark(self, spark):
        import duckdb

        con = duckdb.connect()
        df = spark.createDataFrame(
            [(i, s) for i, (s, _) in enumerate(self.CASES)], ["i", "u"])
        got = {r.i: r.n for r in df.select("i", T.url_normalize("u").alias("n")).collect()}
        for i, (s, _) in enumerate(self.CASES):
            (o,) = con.execute("SELECT " + T.url_normalize_sql("?::VARCHAR"), [s]).fetchone()
            assert o == got[i], f"case {i}: duckdb={o!r} spark={got[i]!r}"

    def test_host_and_domain(self, spark):
        df = spark.createDataFrame(
            [(1, "https://www.ex.co.uk:443/a?b=1"), (2, "plain"), (3, "ftp://files.x.org/y")],
            ["i", "u"],
        )
        got = {r.i: (r.h, r.d) for r in df.select(
            "i", T.url_host("u").alias("h"), T.url_domain("u").alias("d")).collect()}
        assert got[1] == ("www.ex.co.uk", "ex.co.uk")
        assert got[2] == ("", "")
        assert got[3] == ("files.x.org", "files.x.org")


class TestDedupKeepBy:
    def _fixture(self, spark):
        # cluster {1,2,3} (chain), singleton 4; doc 2 is the longest
        docs = spark.createDataFrame(
            [(1, "a b"), (2, "a b c d e"), (3, "a b c"), (4, "zz")],
            ["id", "text"],
        )
        pairs = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
        return docs, pairs

    def test_default_keeps_min_id(self, spark):
        from pigpen_spark.functions.dedup import dedup_keep

        docs, pairs = self._fixture(spark)
        out = {r.id: (r.cluster, r.kept)
               for r in dedup_keep(docs, pairs, "id").collect()}
        assert out[1] == (1, True) and out[2] == (1, False)
        assert out[3] == (1, False) and out[4] == (4, True)

    def test_keep_by_longest(self, spark):
        from pigpen_spark.functions.dedup import dedup_keep
        from pigpen_spark.functions.text import token_count

        docs, pairs = self._fixture(spark)
        out = {r.id: (r.cluster, r.kept)
               for r in dedup_keep(docs, pairs, "id",
                                   keep_by=[token_count("text").desc()]).collect()}
        assert out[2] == (1, True)          # longest wins, not min id
        assert out[1] == (1, False) and out[3] == (1, False)
        assert out[4] == (4, True)          # singleton keeps itself

    def test_keep_by_tiebreak_is_min_id(self, spark):
        from pigpen_spark.functions.dedup import dedup_keep
        from pigpen_spark.functions.text import token_count

        docs = spark.createDataFrame(
            [(7, "x y"), (9, "p q")], ["id", "text"])  # equal lengths
        pairs = spark.createDataFrame([(7, 9)], ["id_a", "id_b"])
        out = {r.id: r.kept
               for r in dedup_keep(docs, pairs, "id",
                                   keep_by=[token_count("text").desc()]).collect()}
        assert out == {7: True, 9: False}


class TestTakeBudget:
    def test_greedy_prefix_with_boundary_row(self, spark):
        from pigpen_spark.operators.windows import take_budget

        df = spark.createDataFrame(
            [(1, 10, 5), (2, 9, 5), (3, 8, 5), (4, 7, 5)],
            ["id", "score", "sz"],
        )
        out = {r.id: r.cum_size for r in take_budget(
            df, [F.col("score").desc(), F.col("id")], "sz", budget=12).collect()}
        # 5 + 5 fills 10 < 12; row 3 starts at 10 < 12 so it is included
        assert out == {1: 5, 2: 10, 3: 15}

    def test_exact_boundary_excludes_next(self, spark):
        from pigpen_spark.operators.windows import take_budget

        df = spark.createDataFrame(
            [(1, 2, 6), (2, 1, 6)], ["id", "score", "sz"])
        out = {r.id for r in take_budget(
            df, [F.col("score").desc(), F.col("id")], "sz", budget=6).collect()}
        assert out == {1}  # budget exactly consumed before row 2

    def test_never_empty_and_matches_single_partition_window(self, spark):
        from pigpen_spark.operators.windows import take_budget
        from pyspark.sql import Window

        rows = [(i, (i * 37) % 100, 1 + (i * 13) % 50) for i in range(200)]
        df = spark.createDataFrame(rows, ["id", "score", "sz"]).repartition(8)
        got = {(r.id, r.cum_size) for r in take_budget(
            df, [F.col("score").desc(), F.col("id")], "sz", budget=900).collect()}
        w = (Window.orderBy(F.col("score").desc(), F.col("id"))
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        want = {
            (r.id, r.cum)
            for r in df.withColumn("cum", F.sum("sz").over(w)).collect()
            if r.cum - r.sz < 900
        }
        assert got == want and got

    def test_budget_smaller_than_first_row_keeps_it(self, spark):
        from pigpen_spark.operators.windows import take_budget

        df = spark.createDataFrame([(1, 1, 500), (2, 0, 10)], ["id", "s", "sz"])
        out = [r.id for r in take_budget(
            df, [F.col("s").desc(), F.col("id")], "sz", budget=100).collect()]
        assert out == [1]


class TestNegativeSampling:
    def test_deterministic_and_in_range(self, spark):
        from pigpen_spark.functions import similarity as S

        df = spark.createDataFrame([(i,) for i in range(20)], ["vec_id"])
        a = S.negative_samples(df, "vec_id", k=3, n_total=20).collect()
        b = S.negative_samples(df, "vec_id", k=3, n_total=20).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        assert len(a) == 60
        for r in a:
            assert 0 <= r.neg_id < 20 and r.neg_id != r.vec_id

    def test_salt_changes_epoch(self, spark):
        from pigpen_spark.functions import similarity as S

        df = spark.createDataFrame([(i,) for i in range(50)], ["vec_id"])
        e0 = {(r.vec_id, r.j): r.neg_id for r in
              S.negative_samples(df, "vec_id", k=2, n_total=50, salt="e0").collect()}
        e1 = {(r.vec_id, r.j): r.neg_id for r in
              S.negative_samples(df, "vec_id", k=2, n_total=50, salt="e1").collect()}
        assert e0 != e1 and e0.keys() == e1.keys()

    def test_k_guard(self, spark):
        from pigpen_spark.functions import similarity as S

        df = spark.createDataFrame([(1,)], ["vec_id"])
        with pytest.raises(ValueError):
            S.negative_samples(df, "vec_id", k=0, n_total=1)


class TestScoreBand:
    def test_band_filters_before_rank(self, spark, sf_dir):
        from pigpen_spark.functions import similarity as S

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
            F.col("vec_id") < 150)
        idx = S.lsh_index(emb, n_planes=4, dim=64)
        batch = emb.filter(F.col("vec_id") < 10)
        full = S.lsh_topk_against(idx, batch, k=10_000, n_planes=4, dim=64)
        banded = S.lsh_topk_against(idx, batch, k=10_000, n_planes=4, dim=64,
                                    score_min=0.0, score_max=0.2)
        fb = {(r.q_id, r.n_id): r.score for r in full.collect()
              if 0.0 <= r.score < 0.2}
        bb = {(r.q_id, r.n_id): r.score for r in banded.collect()}
        assert fb == bb and bb
        # ranks are contiguous within the band
        ranks = {}
        for r in banded.collect():
            ranks.setdefault(r.q_id, []).append(r.rank)
        for q, rs in ranks.items():
            assert sorted(rs) == list(range(1, len(rs) + 1))


class TestApplyChanges:
    def _target(self, spark):
        return spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["id", "s", "v"])

    def test_insert_update_delete(self, spark):
        from pigpen_spark.operators.analytics import apply_changes

        changes = spark.createDataFrame(
            [(2, "B", 99, "update"), (3, None, None, "delete"),
             (4, "d", 40, "insert")],
            "id long, s string, v long, op string")
        got = {r.id: (r.s, r.v)
               for r in apply_changes(self._target(spark), changes, ["id"]).collect()}
        assert got == {1: ("a", 10), 2: ("B", 99), 4: ("d", 40)}

    def test_unknown_op_raises(self, spark):
        from pigpen_spark.operators.analytics import apply_changes

        changes = spark.createDataFrame(
            [(2, "x", 1, "upsert")], "id long, s string, v long, op string")
        import pytest as _pytest

        with _pytest.raises(Exception, match="unknown op"):
            apply_changes(self._target(spark), changes, ["id"]).collect()

    def test_duplicate_change_keys_raise(self, spark):
        # an uncompacted CDC batch (two ops for one key) must fail loudly,
        # never emit a snapshot with duplicate keys
        from pigpen_spark.operators.analytics import apply_changes

        changes = spark.createDataFrame(
            [(2, "x", 1, "update"), (2, "y", 2, "update")],
            "id long, s string, v long, op string")
        import pytest as _pytest

        with _pytest.raises(Exception, match="multiple change rows"):
            apply_changes(self._target(spark), changes, ["id"]).collect()

    def test_upsert_semantics_documented_behavior(self, spark):
        # insert-on-existing and update-on-absent both act as upserts —
        # the documented contract (strict MERGE validation would cost a
        # target-side pass)
        from pigpen_spark.operators.analytics import apply_changes

        changes = spark.createDataFrame(
            [(2, "X", 1, "insert"), (9, "z", 9, "update")],
            "id long, s string, v long, op string")
        got = {r.id: (r.s, r.v)
               for r in apply_changes(self._target(spark), changes, ["id"]).collect()}
        assert got[2] == ("X", 1) and got[9] == ("z", 9)

    def test_roundtrip_with_snapshot_diff(self, spark):
        from pigpen_spark.operators.analytics import (
            apply_changes, changes_from_diff, snapshot_diff)

        old = self._target(spark)
        new = spark.createDataFrame(
            [(1, "a", 10), (2, "B2", 21), (5, "e", 50)], ["id", "s", "v"])
        d = snapshot_diff(old, new, ["id"], ["s", "v"])
        ch = changes_from_diff(d, ["id"], ["s", "v"])
        applied = {tuple(r) for r in apply_changes(old, ch, ["id"]).collect()}
        assert applied == {tuple(r) for r in new.collect()}
