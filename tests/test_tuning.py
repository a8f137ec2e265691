"""tuning.py — scale-aware configuration helpers."""

from pigpen_spark import tuning
from pigpen_spark.relation import return_


def test_estimate_shuffle_partitions_scales():
    assert tuning.estimate_shuffle_partitions(1024, cores=32) == 32  # floor at cores
    one_tb = 1024**4
    est = tuning.estimate_shuffle_partitions(one_tb, cores=32)
    assert 5000 < est < 8000  # ~150MiB per partition
    assert tuning.estimate_shuffle_partitions(100 * one_tb, cores=32) == tuning.MAX_SHUFFLE_PARTITIONS


def test_input_size_bytes_from_stats(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    size = tuning.input_size_bytes(df)
    assert size > 10000  # footer stats, no scan


def test_configure_for_input_sets_conf(spark):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        out = tuning.configure_for_input(spark, 10 * 1024**4)
        assert int(out["spark.sql.shuffle.partitions"]) == tuning.MAX_SHUFFLE_PARTITIONS
        assert spark.conf.get("spark.sql.shuffle.partitions") == out["spark.sql.shuffle.partitions"]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


def test_auto_configure_roundtrip(spark):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        r = return_(spark, [(i,) for i in range(100)], "x long")
        out = tuning.auto_configure(spark, r.df)
        assert int(out["spark.sql.shuffle.partitions"]) >= 1
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


def test_skew_report_finds_hot_key(spark):
    from pigpen_spark.tuning import skew_report

    rows = [(0, "hot")] * 80 + [(i, "k%d" % i) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "id long, k string")
    rep = skew_report(df, "k", top=3, target_rows_per_partition=25)
    assert rep["total_rows"] == 100
    assert rep["top_keys"][0]["key"] == ("hot",)
    assert rep["top_keys"][0]["rows"] == 80
    assert abs(rep["top_keys"][0]["share"] - 0.8) < 1e-9
    assert rep["suggested_salt"] == 4  # ceil(80 / 25)
    empty = skew_report(df.filter("id < 0"), "k")
    assert empty["total_rows"] == 0 and empty["suggested_salt"] == 1
