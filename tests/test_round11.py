"""Round-11 optimization pins.

The r10 regression root-cause and its guard rails:

- `_dense_rank`'s two-phase rank tagged rows with `spark_partition_id()`
  under a persist, and the offsets pass + output pass were assumed to
  read the same cache.  When the output is consumed through a SELF-JOIN
  (`_dense_rank_join`'s join-back), the analyzer's relation
  deduplication re-assigns the subtree's expression ids, the cache
  lookup misses, and the range exchange re-samples its boundaries with
  the offsets frozen from the first sampling — nondeterministically
  collapsed ranks (the r10 red invariance pin).  The fix freezes the
  tagged frame with an eager localCheckpoint.
- Checkpoint blocks are now freed deterministically through the cache
  registry (`hold_ckpt`/`release_ckpt_since`/`free_ckpt`) instead of the
  no-op `DataFrame.unpersist()` on checkpoint-backed frames.
"""

import pytest
from pyspark.sql import functions as F


class TestDenseRankSelfJoinConsistency:
    """The exact r10 failure shape: rank a distinct key set, join the
    ranks back onto the full table, and REPEAT — every materialization
    must agree with the single-threaded ground truth."""

    def _paired(self, spark, n=5000, seed=7):
        import random
        rng = random.Random(seed)
        rows = [(i, rng.randrange(0, 97), rng.randrange(0, 89),
                 rng.randrange(0, 83), rng.randrange(0, 79))
                for i in range(n)]
        return spark.createDataFrame(
            rows, "pos long, r0 long, r1 long, r2 long, r3 long")

    def test_join_back_matches_ground_truth_repeatedly(self, spark):
        from pigpen_spark.functions import suffix as X
        cols = ["r0", "r1", "r2", "r3"]
        df = self._paired(spark).persist()
        base = df.collect()
        tuples = sorted(set((r.r0, r.r1, r.r2, r.r3) for r in base))
        truth = {t: i for i, t in enumerate(tuples)}
        for trial in range(3):
            out, total = X._dense_rank_join(df, cols)
            assert total == len(tuples)
            got = out.select("pos", *cols, "rank").collect()
            assert len(got) == len(base)
            bad = [r for r in got
                   if r.rank != truth[(r.r0, r.r1, r.r2, r.r3)]]
            assert not bad, f"trial {trial}: {len(bad)} wrong ranks, " \
                            f"first {bad[:3]}"
        df.unpersist()

    def test_dense_rank_tagged_frame_is_checkpoint_backed(self, spark):
        """The tagged (pid) frame must be an ExistingRDD — a persist
        alone is what made the r10 join-back nondeterministic."""
        from pigpen_spark.functions import suffix as X
        keys = spark.range(200).select(
            (F.col("id") % 50).alias("k")).distinct()
        out, total = X._dense_rank(keys, ["k"])
        assert total == 50
        plan = out._jdf.queryExecution().analyzed().toString()
        assert "LogicalRDD" in plan or "ExistingRDD" in plan


class TestSuffixCheckpointRelease:
    """VERDICT r10 #2/#8: rank-table checkpoint blocks must be freed
    deterministically after maximal_repeats — unpersist() on the derived
    selects was a no-op and ~log(L) corpus-sized tables lingered."""

    def _persistent_rdd_count(self, spark):
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    def test_blocks_released_after_build(self, spark):
        from pigpen_spark.functions import suffix as X
        docs = (spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet").limit(80))
        before = self._persistent_rdd_count(spark)
        reps = X.maximal_repeats(docs, "doc_id", "text", min_len=6)
        rows = reps.collect()
        assert len(rows) > 0
        after = self._persistent_rdd_count(spark)
        # survivors: pack_positions' toks + positions persists and the
        # final descent checkpoint the returned plan still reads.  The
        # ~5 round-table checkpoints + rank-internal tagged checkpoints
        # + superseded descent levels must all be gone (pre-fix this
        # delta measured >10).
        assert after - before <= 5, (before, after)

    def test_two_builds_do_not_accumulate_round_tables(self, spark):
        from pigpen_spark.functions import suffix as X
        from pigpen_spark import cache as _cache
        docs = (spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet").limit(80))
        X.maximal_repeats(docs, "doc_id", "text", min_len=6).collect()
        mid = self._persistent_rdd_count(spark)
        X.maximal_repeats(docs, "doc_id", "text", min_len=6).collect()
        after = self._persistent_rdd_count(spark)
        # each run may add its survivors (2 persists + 1 descent ckpt)
        # but never a round's worth of rank tables
        assert after - mid <= 5, (mid, after)


class TestPackPositionsSparseIds:
    """ADVICE r10: derived doc_id buckets assume roughly dense ids —
    sparse/clustered ids must fall back to a sampled range partition
    instead of landing everything in one window partition."""

    def test_sparse_ids_same_repeats(self, spark):
        from pigpen_spark.functions import suffix as X
        docs = (spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet").limit(30))
        dense = sorted(map(tuple, X.maximal_repeats(
            docs, "doc_id", "text", min_len=6).collect()))
        k = 1 << 45  # span >> 4096 * n_docs → sampled-range fallback
        sparse_docs = docs.select(
            (F.col("doc_id") * k).alias("doc_id"), "text")
        sparse = sorted(map(tuple, X.maximal_repeats(
            sparse_docs, "doc_id", "text", min_len=6).collect()))
        assert len(dense) > 0
        remapped = sorted((a * k, oa, b * k, ob, ln)
                          for a, oa, b, ob, ln in dense)
        assert remapped == sparse

    def test_sparse_positions_are_dense_permutation(self, spark):
        from pigpen_spark.functions import suffix as X
        docs = (spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet").limit(20)
            .select((F.col("doc_id") * (1 << 45)).alias("doc_id"), "text"))
        pos = X.pack_positions(docs, "doc_id", "text")
        rows = pos.select("pos").collect()
        got = sorted(r["pos"] for r in rows)
        assert got == list(range(len(rows)))


class TestOffsetExprMixedKeys:
    """ADVICE r10: the sparse create_map fallback must cast key literals
    uniformly — mixed int/long keys are an AnalysisException."""

    def test_mixed_small_and_huge_bucket_ids(self, spark):
        from pigpen_spark.functions import suffix as X
        counts = {-(1 << 40): 3, 5: 2, (1 << 40) + 7: 4}
        expr = X._offset_expr(counts, "b")
        df = spark.createDataFrame(
            [(-(1 << 40),), (5,), ((1 << 40) + 7,)], "b long")
        got = {r["b"]: r["o"] for r in df.select(
            "b", expr.alias("o")).collect()}
        assert got == {-(1 << 40): 0, 5: 3, (1 << 40) + 7: 5}


class TestWinnowDfCutEquivalence:
    """r11: the max_df cut is now a count window over the fp
    partitioning instead of a groupBy + join-back (which re-executed the
    shingle scan per consumer).  Survivors must be identical."""

    def test_window_cut_matches_join_back(self, spark):
        from pigpen_spark.functions import dedup as D
        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet").limit(60)
        got = sorted(map(tuple, D.winnow_overlap_pairs(
            docs, "doc_id", "text", shingle_n=3, w=4,
            min_shared=2, max_df=10).collect()))
        # reference: the pre-r11 join-back form, inlined
        th = docs.select(F.col("doc_id").alias("id"),
                         D.token_hashes(F.col("text")).alias("th"))
        hs = th.select("id", D.shingle_hashes(F.col("th"), 3).alias("hs"))
        fp = hs.select("id", F.explode(
            D.winnow_fingerprints(F.col("hs"), 4)).alias("fp")).distinct()
        keep = fp.groupBy("fp").agg(F.count(F.lit(1)).alias("__df")) \
            .filter(F.col("__df") <= 10).select("fp")
        fp = fp.join(keep, on="fp")
        sizes = fp.groupBy("id").agg(F.count(F.lit(1)).alias("n_fp"))
        a = fp.select(F.col("id").alias("id_a"), "fp")
        b = fp.select(F.col("id").alias("id_b"), "fp")
        pairs = (a.join(b, on="fp").filter(F.col("id_a") < F.col("id_b"))
                 .groupBy("id_a", "id_b")
                 .agg(F.count(F.lit(1)).alias("shared"))
                 .filter(F.col("shared") >= 2))
        ref = sorted(map(tuple, pairs
                     .join(sizes.withColumnsRenamed(
                         {"id": "id_a", "n_fp": "n_a"}), on="id_a")
                     .join(sizes.withColumnsRenamed(
                         {"id": "id_b", "n_fp": "n_b"}), on="id_b")
                     .select("id_a", "id_b", "shared",
                             F.expr("shared * 1000000 DIV least(n_a, n_b)")
                             .alias("containment_ppm")).collect()))
        assert len(got) > 0
        assert got == ref


class TestCommonNeighborAdjFromEdgeList:
    """r11: the anti-join adjacency is derived from the persisted
    symmetric edge list (e filtered to src < dst) instead of re-running
    the candidate generator — results must match brute force."""

    def test_matches_brute_force(self, spark):
        from itertools import combinations

        from pigpen_spark.functions import dedup as D
        import random
        rng = random.Random(11)
        pairs = sorted(set(tuple(sorted(rng.sample(range(40), 2)))
                           for _ in range(120)))
        df = spark.createDataFrame(pairs, "id_a long, id_b long")
        got = sorted(map(tuple, D.common_neighbor_pairs(
            df, min_common=2, max_degree=8).collect()))
        # brute force
        adj: dict[int, set[int]] = {}
        for x, y in pairs:
            adj.setdefault(x, set()).add(y)
            adj.setdefault(y, set()).add(x)
        deg = {n: len(s) for n, s in adj.items()}
        from collections import Counter
        common = Counter()
        for c, nbrs in adj.items():
            if deg[c] <= 8:
                for a, b in combinations(sorted(nbrs), 2):
                    common[(a, b)] += 1
        exp = []
        edge = set(pairs)
        for (a, b), k in common.items():
            if k >= 2 and (a, b) not in edge:
                exp.append((a, b, k, deg[a], deg[b],
                            k * 10**6 // (deg[a] + deg[b] - k)))
        assert got == sorted(exp)
        assert len(got) > 0
