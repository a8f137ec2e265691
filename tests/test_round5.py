"""Round-5 additions: density-auto LSH sizing, Matroska frame decode,
MP3 VBR headers, giant-group auto-fallback, flagship multimodal pipeline.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pigpen_spark.functions import similarity as S
from pigpen_spark.tuning import lsh_planes_for


class TestLshPlanesAuto:
    def test_integer_exact_formula(self):
        # ceil(log2(ceildiv(n, target))) identity vs the float form
        import math

        for n in [1, 199, 200, 201, 399, 400, 401, 500, 2000, 6400, 6401,
                  20000, 10**6, 10**9, 2**40]:
            for t in [1, 32, 200]:
                got = lsh_planes_for(n, t, floor=0, cap=64)
                want = max(0, min(64, math.ceil(math.log2(max(n / t, 1.0)))))
                assert got == want, (n, t, got, want)

    def test_clamps(self):
        assert lsh_planes_for(1) == 8          # floor
        assert lsh_planes_for(10**12) == 32    # cap (2^32 buckets)
        assert lsh_planes_for(500, 32, floor=4, cap=12) == 4
        assert lsh_planes_for(2000, 32, floor=4, cap=12) == 6
        assert lsh_planes_for(20000, 32, floor=4, cap=12) == 10

    def test_rejects_bad_inputs(self):
        with pytest.raises(ValueError):
            lsh_planes_for(0)
        with pytest.raises(ValueError):
            lsh_planes_for(100, 0)

    def test_bucket_prefix_property(self, spark):
        # lsh_bucket at n planes == n-char prefix of the bucket at cap
        # planes (what lets the oracle substr the cap-length bucket)
        df = spark.createDataFrame(
            [(i, [float(i * 7 % 13 - 6 + d % 5) for d in range(8)])
             for i in range(20)],
            "id long, v array<double>",
        )
        out = df.select(
            S.lsh_bucket(F.col("v"), 4, 8).alias("b4"),
            S.lsh_bucket(F.col("v"), 12, 8).alias("b12"),
        ).collect()
        for r in out:
            assert r["b12"][:4] == r["b4"]

    def test_resolve_planes_auto_sizing(self, spark):
        df = spark.range(500).select(
            F.col("id"), F.array(F.lit(1.0)).alias("v"))
        assert S.resolve_planes("auto", df, 32, 4, 12) == 4
        assert S.resolve_planes(7, df, 32, 4, 12) == 7  # explicit passthrough

    def test_plane_stride_anchors_tables(self, spark):
        # with plane_stride=cap, table 1's bucket at auto planes is a
        # prefix of the cap-length bucket at offset cap — i.e. the plane
        # family is fixed regardless of the resolved count
        df = spark.createDataFrame(
            [(i, [float((i * 11 + d * 3) % 9 - 4) for d in range(8)])
             for i in range(10)],
            "id long, v array<double>",
        )
        out = df.select(
            S.lsh_bucket(F.col("v"), 4, 8, plane_offset=12).alias("short"),
            S.lsh_bucket(F.col("v"), 12, 8, plane_offset=12).alias("full"),
        ).collect()
        for r in out:
            assert r["full"][:4] == r["short"]
