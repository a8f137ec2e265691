"""I/O round-trips — io_test.clj:26-236 analog (FIXTURES.md §5)."""

import gzip
import json

from pyspark.sql import functions as F

from pigpen_spark.relation import return_
from pigpen_spark.sources import io as pio


class TestLoad:
    def test_load_string(self, spark, tmp_path):
        p = tmp_path / "t.txt"
        p.write_text("The quick brown fox\njumps over the lazy dog\n")
        out = pio.load_string(spark, str(p))
        assert sorted(r["value"] for r in out.df.collect()) == [
            "The quick brown fox", "jumps over the lazy dog"]

    def test_load_tsv(self, spark, tmp_path):
        p = tmp_path / "t.tsv"
        p.write_text("a\tb\tc\n1\t2\t3\n")
        out = pio.load_tsv(spark, str(p))
        assert sorted(r["value"] for r in out.df.collect()) == [["1", "2", "3"], ["a", "b", "c"]]

    def test_load_tsv_select_indexed(self, spark, tmp_path):
        # runtime.clj:130-148 indexed-field-selector: untyped tsv rows →
        # first-n typed positional columns + untyped rest; short rows → NULL
        p = tmp_path / "t.tsv"
        p.write_text("1\tfoo\t2.5\textra1\textra2\n2\tbar\t3.5\n3\tbaz\n")
        out = pio.load_tsv(spark, str(p)).select_indexed(
            "value", [("id", "long"), ("name", "string"), ("score", "double")],
            rest_col="rest",
        )
        rows = {r["id"]: (r["name"], r["score"], r["rest"]) for r in out.df.collect()}
        assert rows == {
            1: ("foo", 2.5, ["extra1", "extra2"]),
            2: ("bar", 3.5, []),
            3: ("baz", None, []),
        }
        assert [f.name for f in out.df.schema.fields] == ["id", "name", "score", "rest"]

    def test_load_tsv_wrong_delimiter(self, spark, tmp_path):
        # io_test: wrong delimiter → single-element rows
        p = tmp_path / "t.tsv"
        p.write_text("a\tb\tc\n")
        out = pio.load_tsv(spark, str(p), delimiter=",")
        assert [r["value"] for r in out.df.collect()] == [["a\tb\tc"]]

    def test_load_csv_quoted(self, spark, tmp_path):
        # io_test.clj quoting edge cases incl. escaped quotes
        p = tmp_path / "t.csv"
        p.write_text('"a string",123,5.0\n"a ""complex"" string",-532,23.7\n')
        out = pio.load_csv(spark, str(p))
        rows = sorted(tuple(r) for r in out.df.collect())
        assert rows == [("a \"complex\" string", "-532", "23.7"), ("a string", "123", "5.0")]

    def test_load_csv_semicolon_single_quote(self, spark, tmp_path):
        # io_test.clj:99-110 — non-comma separator, single-quote quoting
        p = tmp_path / "t2.csv"
        p.write_text("'a string';123;5.0\n'another string';-532;23.7\n")
        out = pio.load_csv(spark, str(p), delimiter=";", quote="'")
        rows = sorted(tuple(r) for r in out.df.collect())
        assert rows == [("a string", "123", "5.0"), ("another string", "-532", "23.7")]

    def test_avro_container_roundtrip(self):
        # pure-python codec: nested record + [null,T] union + array + map +
        # enum + double, null and deflate codecs (avro/core.clj:52-87 shapes)
        from pigpen_spark.sources import avro_py

        schema = {
            "type": "record", "name": "Doc", "fields": [
                {"name": "id", "type": "long"},
                {"name": "score", "type": "double"},
                {"name": "label", "type": ["null", "string"]},
                {"name": "tags", "type": {"type": "array", "items": "string"}},
                {"name": "props", "type": {"type": "map", "values": "int"}},
                {"name": "kind", "type": {"type": "enum", "name": "K", "symbols": ["A", "B"]}},
                {"name": "loc", "type": {"type": "record", "name": "Loc", "fields": [
                    {"name": "lat", "type": "double"}, {"name": "lon", "type": "double"}]}},
            ],
        }
        rows = [
            {"id": 1, "score": 2.5, "label": "x", "tags": ["a", "b"], "props": {"n": 3},
             "kind": "A", "loc": {"lat": 1.0, "lon": -2.0}},
            {"id": 2, "score": -0.5, "label": None, "tags": [], "props": {},
             "kind": "B", "loc": {"lat": 0.0, "lon": 0.0}},
        ]
        for codec in ("null", "deflate"):
            blob = avro_py.write_container(schema, rows, codec=codec)
            got_schema, got = avro_py.read_container(blob)
            assert got == rows
            assert got_schema["name"] == "Doc"
        assert avro_py.to_spark_type(schema) == (
            "struct<id: bigint, score: double, label: string, tags: array<string>, "
            "props: map<string, int>, kind: string, loc: struct<lat: double, lon: double>>"
        )

    def test_load_avro_distributed_fallback(self, spark, tmp_path):
        # no spark-avro jar in this container → load_avro must fall back to
        # the binaryFile + mapInPandas decode and still return typed rows
        from pigpen_spark.sources import avro_py

        schema = {
            "type": "record", "name": "Ev", "fields": [
                {"name": "id", "type": "long"},
                {"name": "name", "type": ["null", "string"]},
                {"name": "vals", "type": {"type": "array", "items": "double"}},
            ],
        }
        d = tmp_path / "avro"
        d.mkdir()
        (d / "part-0.avro").write_bytes(avro_py.write_container(
            schema, [{"id": 1, "name": "a", "vals": [1.0, 2.0]},
                     {"id": 2, "name": None, "vals": []}]))
        (d / "part-1.avro").write_bytes(avro_py.write_container(
            schema, [{"id": 3, "name": "c", "vals": [3.5]}], codec="deflate"))
        out = pio.load_avro(spark, str(d))
        rows = {r["id"]: (r["name"], r["vals"]) for r in out.df.collect()}
        assert rows == {1: ("a", [1.0, 2.0]), 2: (None, []), 3: ("c", [3.5])}
        assert dict(out.df.dtypes) == {"id": "bigint", "name": "string", "vals": "array<double>"}

    def test_load_json(self, spark, tmp_path):
        p = tmp_path / "t.json"
        p.write_text('{"a": 1, "b": "foo"}\n{"a": 2, "b": "bar"}\n')
        out = pio.load_json(spark, str(p))
        assert sorted((r["a"], r["b"]) for r in out.df.collect()) == [(1, "foo"), (2, "bar")]

    def test_load_json_gzip(self, spark, tmp_path):
        # io_test.clj:122-134 — gzip transparency
        p = tmp_path / "t.json.gz"
        with gzip.open(p, "wt") as f:
            f.write('{"a": 1}\n{"a": 2}\n')
        out = pio.load_json(spark, str(p))
        assert sorted(r["a"] for r in out.df.collect()) == [1, 2]


class TestStore:
    def test_store_json_roundtrip(self, spark, tmp_path):
        r = return_(spark, [(1, "foo"), (2, "bar")], "a long, b string")
        d = str(tmp_path / "out_json")
        r.store_json(d)
        back = pio.load_json(spark, d)
        assert sorted((x["a"], x["b"]) for x in back.df.collect()) == [(1, "foo"), (2, "bar")]

    def test_store_tsv_content(self, spark, tmp_path):
        r = return_(spark, [(1, "x")], "a long, b string")
        d = str(tmp_path / "out_tsv")
        r.store_tsv(d)
        lines = []
        for f in (tmp_path / "out_tsv").glob("part-*"):
            lines += f.read_text().splitlines()
        assert lines == ["1\tx"]

    def test_store_parquet_roundtrip(self, spark, tmp_path):
        r = return_(spark, [(1, "foo")], "a long, b string")
        d = str(tmp_path / "out_pq")
        r.store_parquet(d)
        back = pio.load_parquet(spark, d)
        assert [tuple(x) for x in back.df.collect()] == [(1, "foo")]

    def test_store_many_shared_lineage(self, spark, tmp_path):
        # store-many$ (raw.clj:144-158): one lineage, several sinks
        r = return_(spark, [(i,) for i in range(5)], "x long").map(y=F.col("x") * 2)
        d1, d2 = str(tmp_path / "m1"), str(tmp_path / "m2")
        r.store_many(
            lambda rel: rel.store_parquet(d1),
            lambda rel: rel.filter(F.col("y") > 4).store_parquet(d2),
        )
        assert pio.load_parquet(spark, d1).count() == 5
        assert pio.load_parquet(spark, d2).count() == 2

    def test_return_literal(self, spark):
        # return/constantly (io.clj:265-300)
        r = return_(spark, [(1,), (2,)], "x long")
        assert sorted(x["x"] for x in r.df.collect()) == [1, 2]
