"""Driver-checkable differential oracles for the rows-only twins.

Every catalog query whose computation is not SQL-expressible (runtime
k-means / EM / tokenizer training, ICU normalization, BLAS rotations)
has carried a ``no_oracle`` row in the driver's CORRECTNESS window —
verified only by pytest pins.  This module closes that gap the way the
reference closes backend gaps (cross-backend differential testing,
pigpen-core/src/test/clojure/pigpen/functional_suite.clj:44-57): each
``*_diff`` query re-computes the twin's pipeline through a SECOND,
independent execution path (Arrow kernel vs retained expression form,
cogroup kernel vs candidate join, trained artifact vs a re-train) and
emits ONE row of integer invariants — retrain mismatches, row-set
mismatches, reconstruction failures, conservation checks — that a
DuckDB oracle of literals (plus SQL-computable corpus counts) verifies
hash-exactly.  A broken trainer, kernel, or wiring flips an integer
and the driver window goes red; the original rows-only twins stay
registered for output inspection.

All comparisons are BIT-exact (struct-packed doubles, exceptAll row
sets) — the same discipline as the TestArrow* equivalence pins.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pigpen_spark.cache import persisted as _persisted
from pigpen_spark.catalog import register, tables
from pigpen_spark.functions import bpe as B
from pigpen_spark.functions import similarity as S
from pigpen_spark.functions import text as T
from pigpen_spark.functions import unigram as UG
from pigpen_spark.functions import wordpiece as WP
from pigpen_spark.relation import spread


def _one_row(spark: SparkSession, **vals: int) -> DataFrame:
    """1-row integer-invariant result frame (kwargs keep column order)."""
    schema = ", ".join(f"{k} long" for k in vals)
    return spark.createDataFrame([tuple(int(v) for v in vals.values())], schema)


def _flat_mismatch(a, b) -> int:
    """Count of positions where two nested float artifacts (codebooks,
    centroid lists, rotation matrices) differ BIT-for-bit; a shape
    mismatch counts as at least 1."""
    def flat(x):
        out = []
        stack = [x]
        while stack:
            v = stack.pop()
            if isinstance(v, (list, tuple)):
                stack.extend(reversed(v))
            else:
                out.append(float(v))
        return out

    fa, fb = flat(a), flat(b)
    if len(fa) != len(fb):
        return max(abs(len(fa) - len(fb)), 1)
    return sum(1 for x, y in zip(fa, fb)
               if struct.pack("<d", x) != struct.pack("<d", y))


def _df_mismatch(a: DataFrame, b: DataFrame) -> int:
    """Multiset row difference |a∖b| + |b∖a| (0 ⇔ identical row sets)."""
    return a.exceptAll(b).count() + b.exceptAll(a).count()


def _ivf_expr_reference(base: DataFrame, cents: DataFrame,
                        k: int, n_probe: int) -> DataFrame:
    """The candidate-JOIN + expression-cosine IVF search (the pre-round-8
    plan) — the independent scoring path the cogroup kernel is diffed
    against.  Cell assignment shares :func:`nearest_cells` (itself
    expression-pinned by TestNearestCells); scoring runs through the
    interpreted HOF dot, a fully disjoint float path."""
    from pyspark.sql import Window

    ranked = S.nearest_cells(
        base, cents, "id", "vec", "nrm", max_rank=max(n_probe, 1)
    ).transform(_persisted)
    assigned = (
        ranked.filter(F.col("crank") == 1)
        .select("id", F.col("cent_id").alias("cell"))
        .join(base, "id")
        .select("cell", "id", "vec", "nrm")
    )
    probes = (
        ranked.filter(F.col("crank") <= n_probe)
        .select("id", F.col("cent_id").alias("cell"))
        .join(base, "id")
        .select("cell", F.col("id").alias("q_id"),
                F.col("vec").alias("q_vec"), F.col("nrm").alias("q_nrm"))
    )
    score = F.round(F.try_divide(
        S.dot(F.col("q_vec"), F.col("vec")),
        F.col("q_nrm") * F.col("nrm")), 6)
    cand = (
        probes.join(assigned, "cell")
        .filter(F.col("q_id") != F.col("id"))
        .select("q_id", F.col("id").alias("n_id"), score.alias("score"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("n_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "score", F.col("rank").cast("long").alias("rank"))
    )


def _emb_base(emb: DataFrame) -> DataFrame:
    return (
        spread(emb)
        .select(F.col("vec_id").alias("id"),
                S.to_double(F.col("embedding")).alias("vec"))
        .withColumn("nrm", S.arrow_norm(F.col("vec")))
        .transform(_persisted)
    )


# ---------------------------------------------------------------------------
# trained-ANN twins
# ---------------------------------------------------------------------------


@register("ext_ann_pq_trained_diff",
          "SELECT 0 AS cb_mismatch, 0 AS row_mismatch, 50 AS n_rows")
def ext_ann_pq_trained_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential oracle for ext_ann_pq_trained: the k-means PQ
    codebook must retrain bit-identically (cb_mismatch), and the Arrow
    ADC kernel must return exactly the expression form's rows on the
    TRAINED codebook (row_mismatch) with the expected 10×k result size."""
    emb = tables(spark, sf_dir)["embeddings"]
    cb1 = S.train_pq_codebook(emb.df, dim=64, seed=7, train_fraction=1.0)
    cb2 = S.train_pq_codebook(emb.df, dim=64, seed=7, train_fraction=1.0)
    q = emb.filter(F.col("vec_id") < 10)
    a = S.pq_adc_topk(emb.df, q.df, k=5, dim=64, codebook=cb1).transform(_persisted)
    b = S.pq_adc_topk_expr(emb.df, q.df, k=5, dim=64, codebook=cb1)
    return _one_row(spark, cb_mismatch=_flat_mismatch(cb1, cb2),
                    row_mismatch=_df_mismatch(a, b), n_rows=a.count())


@register("ext_ann_ivf_pq_trained_diff",
          "SELECT 0 AS cb_mismatch, 0 AS cent_mismatch, "
          "0 AS row_mismatch, 50 AS n_rows")
def ext_ann_ivf_pq_trained_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential oracle for ext_ann_ivf_pq_trained: both trained
    quantizers must retrain bit-identically, and the cogrouped ADC
    kernel must return exactly the candidate-join expression form's rows
    under the SAME trained artifacts."""
    emb = tables(spark, sf_dir)["embeddings"]
    cb1 = S.train_pq_codebook(emb.df, dim=64, seed=7)
    cb2 = S.train_pq_codebook(emb.df, dim=64, seed=7)
    ce1 = S.train_coarse_centroids(emb.df, n_centroids=16, seed=7)
    ce2 = S.train_coarse_centroids(emb.df, n_centroids=16, seed=7)
    q = emb.filter(F.col("vec_id") < 10)
    a = S.ivf_pq_topk(emb.df, q.df, k=5, dim=64, codebook=cb1,
                      coarse_centroids=ce1).transform(_persisted)
    b = S.ivf_pq_topk_expr(emb.df, q.df, k=5, dim=64, codebook=cb1,
                           coarse_centroids=ce1)
    return _one_row(spark, cb_mismatch=_flat_mismatch(cb1, cb2),
                    cent_mismatch=_flat_mismatch(ce1, ce2),
                    row_mismatch=_df_mismatch(a, b), n_rows=a.count())


@register("ext_ann_opq_trained_diff",
          "SELECT 0 AS nonortho, 0 AS row_mismatch, 50 AS n_rows")
def ext_ann_opq_trained_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential oracle for ext_ann_opq_trained: the trained OPQ
    rotation must be orthogonal (|R·Rᵀ − I| entries beyond 1e-9 — the
    property that makes ADC ranks in rotated space valid at all), and
    the Arrow ADC kernel must match the expression form on the rotated
    corpus."""
    import numpy as np

    emb = tables(spark, sf_dir)["embeddings"]
    R = np.asarray(S.train_opq_rotation(emb.df, dim=64, m=8), dtype=np.float64)
    nonortho = int((np.abs(R @ R.T - np.eye(R.shape[0])) > 1e-9).sum())
    rot = S.rotate_vectors(emb.df, "vec_id", "embedding",
                           [list(map(float, r)) for r in R]).transform(_persisted)
    cb = S.train_pq_codebook(rot, dim=64, seed=7)
    q = rot.filter(F.col("vec_id") < 10)
    a = S.pq_adc_topk(rot, q, k=5, dim=64, codebook=cb).transform(_persisted)
    b = S.pq_adc_topk_expr(rot, q, k=5, dim=64, codebook=cb)
    return _one_row(spark, nonortho=nonortho,
                    row_mismatch=_df_mismatch(a, b), n_rows=a.count())


@register("ext_semdedup_trained_diff",
          "SELECT 0 AS cent_mismatch, 0 AS pair_mismatch, "
          "(SELECT count(*) FROM embeddings) AS n_vecs")
def ext_semdedup_trained_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential oracle for ext_semdedup_trained: trained cells must
    retrain bit-identically; the grouped intra-cell Arrow kernel must
    emit exactly the pairs of the cell SELF-JOIN + expression-cosine
    form under the SAME trained centroids; and the labeled output stays
    one row per corpus vector (n_vecs, SQL-mirrored)."""
    emb = tables(spark, sf_dir)["embeddings"]
    ce1 = S.train_coarse_centroids(emb.df, n_centroids=16, seed=7)
    ce2 = S.train_coarse_centroids(emb.df, n_centroids=16, seed=7)
    base = _emb_base(emb.df)
    cents = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(ce1)],
        "cent_id int, cent_vec array<double>",
    ).withColumn("cent_nrm", S.norm(F.col("cent_vec")))
    assigned = (
        S.nearest_cells(base, cents, "id", "vec", "nrm", max_rank=1)
        .select("id", F.col("cent_id").alias("cell"))
        .join(base, "id")
        .transform(_persisted)
    )
    kernel_pairs = (
        S._intra_cell_scored_pairs(assigned)
        .select("id_a", "id_b",
                F.round(F.try_divide(F.col("dot"), F.col("den")), 6).alias("score"))
        .filter(F.col("score") >= 0.45)
    )
    a = assigned.select(F.col("cell"), F.col("id").alias("id_a"),
                        F.col("vec").alias("va"), F.col("nrm").alias("na"))
    b = assigned.select(F.col("cell"), F.col("id").alias("id_b"),
                        F.col("vec").alias("vb"), F.col("nrm").alias("nb"))
    join_pairs = (
        a.join(b, ["cell"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                F.round(F.try_divide(S.dot(F.col("va"), F.col("vb")),
                                     F.col("na") * F.col("nb")), 6).alias("score"))
        .filter(F.col("score") >= 0.45)
    )
    labeled = S.semantic_dedup(emb.df, threshold=0.45, centroids=ce1)
    return _one_row(spark, cent_mismatch=_flat_mismatch(ce1, ce2),
                    pair_mismatch=_df_mismatch(kernel_pairs, join_pairs),
                    n_vecs=labeled.count())


@register("ext_ann_ivf_kmeans_diff",
          "SELECT 0 AS cent_mismatch, 0 AS row_mismatch, "
          "(SELECT count(*) FROM embeddings) AS n_vecs")
def ext_ann_ivf_kmeans_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential oracle for ext_ann_ivf_kmeans (the full-fit
    instrument): k-means centroids must retrain bit-identically, and
    the cogrouped block-scoring search must return exactly the
    candidate-join + expression-cosine reference's rows under the SAME
    trained centroids."""
    from pigpen_spark.catalog_ext import _IVF_C, _IVF_P

    emb = tables(spark, sf_dir)["embeddings"]
    ce1 = S.train_coarse_centroids(emb.df, n_centroids=_IVF_C, seed=7)
    ce2 = S.train_coarse_centroids(emb.df, n_centroids=_IVF_C, seed=7)
    base = _emb_base(emb.df)
    cents = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(ce1)],
        "cent_id int, cent_vec array<double>",
    ).withColumn("cent_nrm", S.norm(F.col("cent_vec")))
    a = S._ivf_search(base, cents, k=5, n_probe=_IVF_P).transform(_persisted)
    b = _ivf_expr_reference(base, cents, k=5, n_probe=_IVF_P)
    return _one_row(spark, cent_mismatch=_flat_mismatch(ce1, ce2),
                    row_mismatch=_df_mismatch(a, b), n_vecs=emb.df.count())


@register("ext_ann_ivf_kmeans_auto_diff",
          "SELECT 0 AS cent_mismatch, 0 AS row_mismatch, "
          "(SELECT count(*) FROM embeddings) AS n_vecs")
def ext_ann_ivf_kmeans_auto_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential oracle for ext_ann_ivf_kmeans_auto (the production
    count-derived sizing): same two invariants as the instrument's diff,
    under the auto-resolved training cap and centroid count."""
    from pigpen_spark.catalog_ext import (_IVF_C, _IVF_CELL_T, _IVF_P,
                                          _IVF_TRAIN_CAP)

    emb = tables(spark, sf_dir)["embeddings"]
    n = emb.df.count()
    frac = min(1.0, _IVF_TRAIN_CAP / max(n, 1))
    n_cents = max(_IVF_C, -(-n // _IVF_CELL_T))
    ce1 = S.train_coarse_centroids(emb.df, n_centroids=n_cents, seed=7,
                                   train_fraction=frac)
    ce2 = S.train_coarse_centroids(emb.df, n_centroids=n_cents, seed=7,
                                   train_fraction=frac)
    base = _emb_base(emb.df)
    cents = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(ce1)],
        "cent_id int, cent_vec array<double>",
    ).withColumn("cent_nrm", S.norm(F.col("cent_vec")))
    a = S._ivf_search(base, cents, k=5, n_probe=_IVF_P).transform(_persisted)
    b = _ivf_expr_reference(base, cents, k=5, n_probe=_IVF_P)
    return _one_row(spark, cent_mismatch=_flat_mismatch(ce1, ce2),
                    row_mismatch=_df_mismatch(a, b), n_vecs=n)


# ---------------------------------------------------------------------------
# trained record linkage
# ---------------------------------------------------------------------------


@register("ext_record_linkage_trained_diff",
          "SELECT 0 AS retrain_mismatch, 1 AS bands_ordered, 1 AS conserved, "
          "0 AS bad_decisions")
def ext_record_linkage_trained_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential oracle for ext_record_linkage_trained: the
    histogram-EM fit must retrain to identical integer weights
    (retrain_mismatch — the EM is deterministic driver arithmetic over
    one distributed groupBy), thresholds must order (bands_ordered),
    every blocked pair must land in exactly one decision band
    (conserved), and no row may carry an unknown decision label."""
    from pigpen_spark.catalog_ext import (_FS_SCALE, _doc_em_agreements,
                                          _doc_em_pairs)
    from pigpen_spark.operators.joins import (fs_thresholds, fs_weights_em,
                                              record_linkage)

    pairs = _doc_em_pairs(spark, sf_dir).transform(_persisted)
    ag = _doc_em_agreements()
    w1 = fs_weights_em(pairs, ag, scale=_FS_SCALE)
    w2 = fs_weights_em(pairs, ag, scale=_FS_SCALE)
    upper, lower = fs_thresholds(w1)
    out = record_linkage(pairs, {k: (ag[k], w1[k]) for k in ag},
                         upper=upper, lower=lower).transform(_persisted)
    n_pairs = pairs.count()
    n_out = out.count()
    bad = out.filter(
        ~F.col("decision").isin("match", "review", "non_match")).count()
    return _one_row(
        spark,
        retrain_mismatch=0 if w1 == w2 else 1,
        bands_ordered=1 if upper > lower else 0,
        conserved=1 if n_out == n_pairs else 0,
        bad_decisions=bad,
    )


# ---------------------------------------------------------------------------
# trained tokenizers (determinism + reconstruction invariants)
# ---------------------------------------------------------------------------
#
# Each tokenizer's encoder is hash-verified by its FIXED-inventory
# catalog row; the trained twins add only (a) the trainer, and (b) the
# wiring of a runtime inventory into the same encoder.  The diffs pin
# (a) by bit-identical retraining and (b) by the segmentation invariant:
# concatenating the emitted pieces (markers stripped) reproduces the
# encoder's own tokenization of the document (lower + split-on-' '),
# i.e. lower(text) with spaces removed.  Documents containing the
# marker glyphs themselves are excluded from the reconstruction count
# (a marker-stripping false positive, not an encoder defect).


def _recon_fail(enc: DataFrame, docs: DataFrame, marker: str | None,
                exclude_glyph: str | None = None) -> int:
    joined = F.array_join("pieces", "")
    if marker is not None:
        joined = F.replace(joined, F.lit(marker), F.lit(""))
    want = F.replace(F.lower(F.coalesce(F.col("text"), F.lit(""))),
                     F.lit(" "), F.lit(""))
    df = enc.join(docs.select(F.col("doc_id").alias("id"), "text"), "id")
    if exclude_glyph is not None:
        df = df.filter(
            ~F.coalesce(F.col("text"), F.lit("")).contains(exclude_glyph))
    return df.filter(joined != want).count()


@register("ext_bpe_encode_trained_diff",
          "SELECT 0 AS retrain_mismatch, 0 AS recon_fail, "
          "(SELECT count(*) FROM documents) AS n_docs")
def ext_bpe_encode_trained_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential oracle for ext_bpe_encode_trained: the Sennrich
    trainer must retrain to the identical merge table, and every
    document's pieces (EOW markers stripped) must concatenate back to
    its own tokenization — a wrong merge application loses or duplicates
    characters."""
    docs = tables(spark, sf_dir)["documents"].df
    m1 = B.train_bpe(docs, "text", n_merges=80)
    m2 = B.train_bpe(docs, "text", n_merges=80)
    enc = B.bpe_encode(docs, "doc_id", "text", m1)
    return _one_row(
        spark,
        retrain_mismatch=0 if m1 == m2 else 1,
        recon_fail=_recon_fail(enc, docs, B.EOW, exclude_glyph="<"),
        n_docs=docs.count(),
    )


@register("ext_wordpiece_encode_trained_diff",
          "SELECT 0 AS retrain_mismatch, 0 AS recon_fail, "
          "(SELECT count(*) FROM documents) AS n_docs")
def ext_wordpiece_encode_trained_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential oracle for ext_wordpiece_encode_trained: the
    likelihood-criterion trainer must retrain to the identical
    inventory, and every FULLY-COVERED document (n_unk_words = 0 — [UNK]
    replaces whole words by contract) must reconstruct after stripping
    the ## continuation markers."""
    docs = tables(spark, sf_dir)["documents"].df
    i1 = WP.train_wordpiece(docs, "text", vocab_size=72)
    i2 = WP.train_wordpiece(docs, "text", vocab_size=72)
    enc = WP.wordpiece_encode(docs, "doc_id", "text", i1[0], i1[1])
    covered = enc.filter(F.col("n_unk_words") == 0)
    return _one_row(
        spark,
        retrain_mismatch=0 if (sorted(i1[0]), sorted(i1[1]))
        == (sorted(i2[0]), sorted(i2[1])) else 1,
        recon_fail=_recon_fail(covered, docs, "##", exclude_glyph="#"),
        n_docs=docs.count(),
    )


@register("ext_unigram_encode_trained_diff",
          "SELECT 0 AS retrain_mismatch, 0 AS recon_fail, "
          "(SELECT count(*) FROM documents) AS n_docs")
def ext_unigram_encode_trained_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential oracle for ext_unigram_encode_trained: Viterbi-EM
    must retrain to the identical integer piece table, and every
    document's pieces must concatenate back to its own tokenization
    (unigram pieces SEGMENT each word — no markers)."""
    docs = tables(spark, sf_dir)["documents"].df
    v1 = UG.train_unigram(docs, "text", vocab_size=48, em_rounds=3)
    v2 = UG.train_unigram(docs, "text", vocab_size=48, em_rounds=3)
    enc = UG.unigram_encode(docs, "doc_id", "text", v1)
    return _one_row(
        spark,
        retrain_mismatch=0 if v1 == v2 else 1,
        recon_fail=_recon_fail(enc, docs, None),
        n_docs=docs.count(),
    )


# ---------------------------------------------------------------------------
# ICU normalization
# ---------------------------------------------------------------------------


@register("ext_normalize_unicode_diff",
          "SELECT 0 AS non_idempotent, "
          "(SELECT count(*) FROM documents) AS n_docs")
def ext_normalize_unicode_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential oracle for ext_normalize_unicode: the normalizer's
    FIXED POINT is reached by the second application — Unicode
    guarantees NFKC and casefold are each idempotent alone, but
    casefold(NFKC(x)) need not be NFKC-normalized (this is why
    NFKC_Casefold re-normalizes: NFKC_CF = NFKC∘casefold∘NFKC), so the
    invariant asserted here is normalize(normalize(x)) ==
    normalize(normalize(normalize(x))) — the NFKC_CF fixed point, which
    a truncation, double-escape, or non-canonical mapping bug still
    breaks, without false-positives on the affected codepoints."""
    docs = tables(spark, sf_dir)["documents"].df
    once = docs.select("doc_id",
                       T.normalize_text_unicode("text").alias("norm1"))
    fixed = once.withColumn(
        "norm2", T.normalize_text_unicode(F.col("norm1"))
    ).withColumn(
        "norm3", T.normalize_text_unicode(F.col("norm2")))
    return _one_row(
        spark,
        non_idempotent=fixed.filter(
            ~F.col("norm3").eqNullSafe(F.col("norm2"))).count(),
        n_docs=docs.count(),
    )
