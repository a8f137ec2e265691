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


def test_ingest_increment_pipeline(spark, sf_dir, tmp_path):
    from ingest_increment import run

    work = str(tmp_path / "work")
    report = run(spark, sf_dir, work)
    # 100 fresh (markup-wrapped) + 50 exact replays + 20 reversed-token
    # paraphrases with stored embeddings
    assert report["arrived"] == 170
    # replays die at the digest index (markup strip + normalize must make
    # the wrapped/raw texts hash-identical)
    assert report["after_exact_dedup"] == report["passed_quality"] - 50
    # paraphrases survive text dedup but die at the ANN stage
    assert report["after_near_dedup"] - report["admitted"] == 20
    # appended survivors + index deltas are readable and consistent
    corpus = spark.read.parquet(f"{work}/corpus")
    assert corpus.count() == report["admitted"]
    digest = spark.read.parquet(f"{work}/digest_index")
    assert digest.count() == 400 + report["admitted"]
    mh = spark.read.parquet(f"{work}/minhash_index")
    assert mh.count() == 400 + report["admitted"]

    # idempotence guarantee of the index loop: re-ingesting the already-
    # admitted docs admits zero (everything now hits the digest index)
    from ingest_increment import ingest
    from pyspark.sql import functions as F

    batch2 = corpus.select("doc_id", "text")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    report2 = ingest(spark, batch2,
                     emb.limit(0).select(F.col("vec_id"), "embedding"), work)
    assert report2["admitted"] == 0


def test_select_pretraining_data_pipeline(spark, sf_dir):
    from select_pretraining_data import select_data

    report = select_data(spark, sf_dir, token_budget=5000)
    assert report["input_docs"] == 500
    assert report["selected_docs"] > 0
    # budget respected up to the boundary row (take_budget keeps the row
    # that crosses the line, so allow one max-doc overshoot)
    assert report["selected_tokens"] <= 5000 + 400
    # selection prefers target-like docs: mean weight at/above neutral 1e6*0.97
    assert report["mean_selected_w_ppm"] > 970_000


def test_sft_prep_pipeline(spark, sf_dir):
    from sft_prep import prep

    report = prep(spark, sf_dir, seq_len=64)
    assert report["conversations"] > 0
    assert 0 < report["after_gates"] <= report["conversations"]
    assert report["after_exact_dedup"] <= report["after_gates"]
    assert report["packed_sequences"] >= report["full_sequences"] > 0
    # no-split layout: at least one sequence per non-empty shard, and
    # never more sequences than transcripts (greedy always fills)
    assert 0 < report["no_split_sequences"] <= report["after_exact_dedup"]
    assert report["oversize_transcripts"] >= 0


def test_feature_store_pipeline(spark, sf_dir):
    from feature_store import build

    report = build(spark, sf_dir)
    assert report["labels"] > 0
    # every label assembled, exactly one SCD2 version matched per label
    assert report["training_rows"] == report["labels"]
    assert report["versions_overlap"] is False
    assert report["coverage_ppm"] == 1_000_000
    assert report["dim_versions"] > 0 and report["feature_rows"] > 0


def test_tokenizer_lab_pipeline(spark, sf_dir):
    from tokenizer_lab import lab

    report = lab(spark, sf_dir)
    assert report["n_words"] > 0
    # subword tokenizers must beat character-splitting but cost >= 1
    # piece per word
    assert report["bpe_pieces"] >= report["n_words"]
    assert report["unigram_pieces"] >= report["n_words"]
    # [UNK] collapses whole words, so wordpiece may emit fewer pieces
    # than words — but then it is excluded from the fertility contest
    assert report["wordpiece_pieces"] > 0
    assert report["winner"] in ("bpe", "unigram", "wordpiece")
    if report["wordpiece_unk_words"] > 0:
        assert report["winner"] in ("bpe", "unigram")
    assert report["packed_sequences"] > 0
    assert 0 <= report["shard_imbalance_ppm"] < 1_000_000
    assert report["manifest_partitions"] == 8


def test_ann_serving_lifecycle(spark, sf_dir, tmp_path):
    from ann_serving import run

    report = run(spark, sf_dir, str(tmp_path / "work"))
    assert report["n_base"] == 400 and report["n_delta"] == 100
    # day-0 serving finds SOMETHING relevant and nothing from the
    # unadmitted delta
    assert report["recall_ppm_day0"] > 0
    assert report["pre_maintenance_hits"] == 0
    # maintenance admits the delta: every probed delta vector retrieves
    # itself at rank 1, and the stored codes cover the whole corpus
    assert report["delta_self_retrieved"] == 3
    assert report["index_rows"] == 500
    # auto-sized build: +25% growth must NOT flag a rebuild, while the
    # occupancy shape registers the new mass (the retrain signal)
    assert report["stale"] is False
    assert report["planes_stored"] == report["planes_auto"]
    assert report["l1_ppm"] > 0
    # the refine dial recovers recall the compressed scan lost: same
    # post-maintenance index, same exact baseline — the exactly
    # re-ranked shortlist cannot score below the plain ADC readout
    assert report["recall_ppm_refined"] >= report["recall_ppm_day1_plain"]


def test_plan_and_mix_composition(spark, sf_dir):
    from select_pretraining_data import plan_and_mix

    report = plan_and_mix(spark, sf_dir,
                          {"src0": 500_000, "src1": 300_000,
                           "src2": 150_000, "src3": 50_000},
                          token_budget=5000, chunk_budget=256)
    assert report["selected_copies"] > 0
    # budget respected up to the boundary row
    assert report["selected_tokens"] <= 5000 + 400
    # chunk count consistent with the packed token mass
    assert report["chunks"] == -(-report["selected_tokens"] // 256) or \
        report["chunks"] >= 1
    # every planned source reports a rate; dropped sources rate 0
    assert set(report["plan"]) >= {"src0", "src1", "src2", "src3"}


def test_fill_and_order_composition(spark, sf_dir):
    from select_pretraining_data import fill_and_order

    report = fill_and_order(spark, sf_dir,
                            {"src0": 500_000, "src1": 300_000,
                             "src2": 150_000, "src3": 50_000},
                            token_budget=10_000)
    # water-fill assigns every targeted source a positive take and
    # stays within budget
    assert set(report["filled_takes"]) == {"src0", "src1", "src2", "src3"}
    assert sum(report["filled_takes"].values()) <= 10_000
    # the blended prefix contains every weighted source from the start
    assert set(report["prefix_10pct_mix"]) == set(report["blend_weights"])
    # curriculum stages ramp difficulty: stage 0 easiest on average
    means = report["curriculum_stage_mean_difficulty"]
    assert means[0] == min(means.values())
    assert means[0] < means[max(means)]
