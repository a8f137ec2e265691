"""Round-4 tests: ADVICE fixes, array-output stringification, and the
fixed-merge hash-exact BPE oracle equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


class TestTakeBudgetNullSize:
    def test_null_size_raises_loudly(self, spark):
        from pigpen_spark.operators.windows import take_budget

        df = spark.createDataFrame(
            [(1, 2, 5), (2, 1, None)], ["id", "score", "sz"])
        with pytest.raises(Exception, match="take_budget: NULL size"):
            take_budget(df, [F.col("score").desc(), F.col("id")], "sz",
                        budget=100).collect()

    def test_coalesced_sizes_still_work(self, spark):
        from pigpen_spark.operators.windows import take_budget

        df = spark.createDataFrame(
            [(1, 2, 5), (2, 1, None)], ["id", "score", "sz"])
        out = {r.id for r in take_budget(
            df, [F.col("score").desc(), F.col("id")],
            F.coalesce("sz", F.lit(0)), budget=100).collect()}
        assert out == {1, 2}


class TestSynthOutCol:
    def test_synth_payload_out_col_respected(self, spark):
        from pigpen_spark.functions import multimodal as M

        base = spark.range(3).withColumnRenamed("id", "doc_id")
        for fn in (M.synth_png, M.synth_wav, M.synth_gif, M.synth_jpeg,
                   M.synth_mp4):
            out = fn(base, "doc_id", out_col="blob")
            assert out.columns == ["id", "blob"], fn.__name__
            rows = out.collect()
            assert len(rows) == 3 and all(
                isinstance(r["blob"], (bytes, bytearray)) and len(r["blob"]) > 0
                for r in rows
            ), fn.__name__

    def test_synth_default_col_unchanged(self, spark):
        from pigpen_spark.functions import multimodal as M

        base = spark.range(2).withColumnRenamed("id", "doc_id")
        assert M.synth_png(base, "doc_id").columns == ["id", "payload"]


class TestBpeFixedOracleEquivalence:
    def test_sql_replace_chain_matches_encode_word(self, spark):
        """The delimited-string replace chain (the DuckDB oracle form)
        must equal the real greedy merge pass on vocabulary AND
        adversarial words — this is what licenses ext_bpe_encode's
        hash-exact status."""
        import random

        import duckdb

        from pigpen_spark.functions.bpe import (FIXED_MERGES,
                                                encode_word,
                                                encode_word_sql)

        con = duckdb.connect()
        rng = random.Random(4)
        words = ["scan", "column", "window", "order", "agg", "a", "er",
                 "ererer", "ananan", "scanscan", "colucolu"]
        words += ["".join(rng.choice("abcerstowlun") for _ in range(rng.randint(1, 16)))
                  for _ in range(200)]
        for w in words:
            got = con.execute(
                f"SELECT {encode_word_sql(repr(w), FIXED_MERGES)}"
            ).fetchone()[0]
            want = " ".join(encode_word(w, FIXED_MERGES))
            assert got == want, (w, got, want)

    def test_equal_sided_pair_rejected(self):
        from pigpen_spark.functions.bpe import encode_word_sql

        with pytest.raises(ValueError, match="equal-sided"):
            encode_word_sql("'x'", [("a", "a")])

    def test_fixed_merges_all_distinct_sided(self):
        from pigpen_spark.functions.bpe import FIXED_MERGES

        assert all(left != right for left, right in FIXED_MERGES)
        assert len(FIXED_MERGES) == 24

    def test_spark_encoder_matches_oracle_on_docs(self, spark):
        """End-to-end: the pandas_udf encoder over real doc rows equals
        the SQL chain applied per word."""
        import duckdb

        from pigpen_spark.functions import bpe as B

        df = spark.createDataFrame(
            [(1, "scan column order"), (2, ""), (3, "agg  agg"),
             (4, "windowwindow part")],
            ["doc_id", "text"],
        )
        enc = B.bpe_encode(df, "doc_id", "text", B.FIXED_MERGES)
        got = {r["id"]: (r["pieces"], r["n_pieces"])
               for r in enc.select(
                   "id", F.array_join("pieces", " ").alias("pieces"),
                   "n_pieces").collect()}
        con = duckdb.connect()
        for doc_id, text in [(1, "scan column order"), (2, ""),
                             (3, "agg  agg"), (4, "windowwindow part")]:
            pieces = []
            for w in text.lower().split(" "):
                if w:
                    pieces.append(con.execute(
                        f"SELECT {B.encode_word_sql(repr(w), B.FIXED_MERGES)}"
                    ).fetchone()[0])
            want = " ".join(pieces)
            assert got[doc_id][0] == want
            assert got[doc_id][1] == (len(want.split(" ")) if want else 0)


class TestStringifiedCatalogOutputs:
    def test_no_complex_typed_output_columns(self, spark, sf_dir):
        """Catalog determinism rule #4 enforced repo-wide: no registered
        query may emit array/struct/map columns (the driver canonicalizer
        cannot hash them — r3's two RED rows)."""
        import __spark_entry__ as E

        offenders = []
        for name, fn in E.queries().items():
            df = fn(spark, sf_dir)
            for field in df.schema.fields:
                if field.dataType.typeName() in ("array", "struct", "map"):
                    offenders.append((name, field.name))
        assert offenders == []
