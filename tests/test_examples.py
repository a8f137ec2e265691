"""The end-to-end curation pipeline example must stay runnable."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

from curate_corpus import curate  # noqa: E402


def test_curate_pipeline(spark, sf_dir, tmp_path):
    report = curate(spark, sf_dir, str(tmp_path / "out"))
    assert report["input_docs"] == 500
    assert 0 < report["final_docs"] <= report["after_exact_dedup"] <= report["after_filter"]
    # near-dup stage must actually remove the planted near-dups at sf0.001
    assert report["final_docs"] < report["input_docs"]
    stored = spark.read.parquet(str(tmp_path / "out" / "corpus"))
    assert stored.count() == report["final_docs"]
    assert report["total_tokens"] > 0
