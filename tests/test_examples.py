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


def test_ops_audit_pipeline(spark, sf_dir):
    from ops_audit import audit
    report = audit(spark, sf_dir)
    assert set(report["violations"]) == {
        "value_present", "value_positive", "ts_present", "known_type"}
    assert report["rollup_users"] > 0
    assert set(report["value_quantiles_micro"]) == {500, 900, 990}
    # per-user event counts only grow → no 'removed' users in the diff
    assert "removed" not in report["diff"]
    assert report["diff"].get("added", 0) >= 0
