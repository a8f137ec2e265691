"""Per-query SCALING EXPONENTS across sf0.1 → 10× → 100× corpora.

The r6 full-suite 10× re-run proved that only running everything AT
SCALE catches quadratic regimes (ext_margin_mine's fixed-plane index:
36.7× at 10×, invisible in isolated runs).  This tool extends that
doctrine one decade: run the heaviest catalog queries at three corpus
sizes and fit the per-query scaling exponent

    alpha = log(t_100x / t_10x) / log(10)

so a 100×-extrapolation is a measurement, not an argument.  alpha ≈ 0
means fixed-overhead-dominated (will amortize on a cluster), alpha ≈ 1
parallel-linear (ideal at fixed core count), alpha > 1.3 names a
super-linear regime that needs a documented contract or a fix.

Corpora: sf0.1 is driver-shipped; build the others with
    python tools/make_scale_corpus.py /tmp/scale_sf1 10
    python tools/make_scale_corpus.py /tmp/scale_sf10 100

Usage:  python tools/scale_exponents.py [--n 2] [query ...]
        (default: the HEAVY list below; writes scale_exponents.json)

Run SOLO — a concurrent Spark JVM skews everything 3×.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pigpen_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry  # noqa: E402

#: The pair-regime, iterative, and CPU-constant families — the queries
#: whose 100 TB posture the scaling table certifies.
HEAVY = [
    "ext_margin_mine_auto",      # density-auto pair mining (the r6 catch's fix)
    "ext_winnow_overlap",        # O(sum df^2) by contract, df<=50 hub cut
    "ext_embed_near_dup_auto",   # density-auto LSH blocking
    "ext_unigram_pack",          # Viterbi encode -> two-phase pack
    "ext_pagerank",              # iterative: per-iter slim shuffles
    "ext_kcore",                 # iterative peeling, early-exit
    "ext_sparse_cosine",         # inverted-index all-pairs, df<=50 cut
    "ext_corpus_pipeline",       # multi-consumer curation DAG
    "ext_dedup_keep",            # WCC + keep (iterative + broadcast)
    "ext_minhash_doc_sig",       # md5/token CPU constant
    "ext_text_stats",            # HOF expression scan CPU constant
    "ext_image_decode",          # per-payload PNG decode CPU constant
    "ext_bloom_decontaminate",   # broadcast-filter probe (r7 rework)
    "ext_decontaminate",         # gram equi-join decontamination
    "ext_tokenize_pack",         # token explode + sharded pack
    "ext_ann_lsh_auto",          # density-auto ANN search
]

SFS = [
    ("sf0.1", "/root/testdata/sf0.1", 1.0),
    ("10x", "/tmp/scale_sf1", 10.0),
    ("100x", "/tmp/scale_sf10", 100.0),
]


def main() -> None:
    argv = sys.argv[1:]
    n = 2
    names: list[str] = []
    only_sfs: set[str] | None = None
    i = 0
    while i < len(argv):
        if argv[i] == "--n":
            n = int(argv[i + 1]); i += 2
        elif argv[i] == "--sfs":
            # e.g. --sfs sf0.1,10x — restrict the sweep (per-SF merge
            # keeps the other scale factors' stored records intact);
            # lets an instrument row whose 100x point is training-bound
            # skip the half-hour run the production twin doesn't pay
            only_sfs = set(argv[i + 1].split(",")); i += 2
        else:
            names.append(argv[i]); i += 1
    if not names:
        names = HEAVY
    spark = get_spark("scale-exponents")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    from pigpen_spark.tuning import clear_engine_caches

    results: dict[str, dict] = {name: {} for name in names}
    for sf_name, sf_dir, _ratio in SFS:
        if only_sfs is not None and sf_name not in only_sfs:
            continue
        if not os.path.isdir(sf_dir):
            print(f"# skipping {sf_name}: {sf_dir} missing", file=sys.stderr)
            continue
        for name in names:
            try:
                # warm-up once (codegen/JIT), then min of n steady passes
                clear_engine_caches(spark)
                qs[name](spark, sf_dir).write.mode("overwrite") \
                    .format("noop").save()
                times = []
                for _ in range(n):
                    clear_engine_caches(spark)
                    t0 = time.perf_counter()
                    qs[name](spark, sf_dir).write.mode("overwrite") \
                        .format("noop").save()
                    times.append(time.perf_counter() - t0)
                results[name][sf_name] = round(min(times), 3)
                print(f"# {sf_name} {name}: {min(times):.3f}s", file=sys.stderr)
            except Exception as e:
                results[name][sf_name] = None
                print(f"# {sf_name} {name}: FAILED {e}", file=sys.stderr)

    # MERGE into the existing table per SCALE FACTOR — a partial
    # re-measure (one query, or a run with a scale corpus dir missing)
    # must never clobber another scale factor's prior record, and a
    # failed measurement (None) must never erase a prior success.
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scale_exponents.json")
    merged: dict[str, dict] = {}
    if os.path.exists(out):
        with open(out) as fh:
            merged = json.load(fh)
    for name, r in results.items():
        row = merged.setdefault(name, {})
        row.update({k: v for k, v in r.items() if v is not None})
    # recompute derived ratios/alpha from the MERGED rows, so a re-run
    # of just the 100x point picks up the stored sf0.1/10x timings
    for name, row in merged.items():
        t1, t10, t100 = row.get("sf0.1"), row.get("10x"), row.get("100x")
        if t1 and t10:
            row["ratio_10x"] = round(t10 / t1, 2)
        if t10 and t100:
            row["ratio_100x_vs_10x"] = round(t100 / t10, 2)
            row["alpha"] = round(math.log(t100 / t10) / math.log(10), 2)
    with open(out, "w") as fh:
        json.dump(merged, fh, indent=1, sort_keys=True)
    print(json.dumps({n: merged[n] for n in results}, sort_keys=True))


if __name__ == "__main__":
    main()
