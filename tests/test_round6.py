"""Round-6 regressions for the ADVICE-r5 findings: wide-integer
sparse-cosine thresholding, string-id label propagation, and
empty-input target encoding."""

from pigpen_spark.functions import classify as C
from pigpen_spark.functions import dedup as D
from pigpen_spark.functions import ranking as R


class TestAdviceR5Regressions:
    def test_sparse_cosine_survives_huge_tf(self, spark):
        # max_df bounds document frequency, not term frequency: one
        # token repeated 30k times gives dot = 9e8, so the old BIGINT
        # inequality dot²·den² = 2.0e19 overflowed int64.  The
        # decimal(38,0)/HUGEINT comparison keeps the identical pair
        # (cosine exactly 1 ≥ 4/5) instead of silently dropping it.
        n = 30_000
        blob = "a " * n
        docs = spark.createDataFrame(
            [(1, blob), (2, blob)], "doc_id long, text string")
        out = R.sparse_cosine_pairs(docs, "doc_id", "text",
                                    threshold_num=4, threshold_den=5,
                                    max_df=10).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["id_a"], r["id_b"]) == (1, 2)
        assert r["dot"] == n * n
        assert r["norm_a"] == r["norm_b"] == n * n

    def test_label_propagation_string_node_ids(self, spark):
        # the old tie-break negated the label arithmetically, which
        # NULLed every community for non-numeric ids; min_by over
        # struct(-cnt, lbl) orders strings natively
        clique = lambda p: [(f"{p}{i}", f"{p}{j}")
                            for i in range(3) for j in range(i + 1, 3)]
        pairs = spark.createDataFrame(
            clique("x") + clique("y") + [("x2", "y0")],
            "id_a string, id_b string")
        out = {r["node"]: r["community"] for r in
               D.label_propagation(pairs, iterations=2).collect()}
        assert all(c is not None for c in out.values())
        # hand-traced 2-round synchronous LPA with (count desc, label
        # asc) ties: the x-clique converges to "x0"; y1/y2 tie between
        # r1 labels {x2, y0} and string order picks "x2"
        assert out["x0"] == out["x1"] == out["x2"] == "x0"
        assert out["y0"] == "y0"
        assert out["y1"] == out["y2"] == "x2"

    def test_label_propagation_long_ids_unchanged(self, spark):
        # the numeric path keeps its original typing (long in, long out)
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3)], "id_a long, id_b long")
        out = D.label_propagation(pairs, iterations=1)
        assert dict(out.dtypes)["community"] == "bigint"
        got = {r["node"]: r["community"] for r in out.collect()}
        # one round: every node adopts its neighbourhood's min label
        assert got[2] == 1

    def test_target_encode_empty_input(self, spark):
        # prior divide-by-zero is guarded with greatest(n, 1) on both
        # engines; the empty corpus yields an empty encoding table
        df = spark.createDataFrame([], "cat string, y long")
        assert C.target_encode(df, "cat", "y", m=5).count() == 0

    def test_target_encode_empty_oracle_parity(self, spark, tmp_path):
        import duckdb

        df = spark.createDataFrame([], "cat string, y long")
        p = str(tmp_path / "e.parquet")
        df.write.parquet(p)
        sql = C.target_encode_sql(f"read_parquet('{p}/*.parquet')",
                                  "cat", "y", m=5)
        assert duckdb.sql(sql).fetchall() == []
