"""Round-3 operators: trained PQ codebooks (per-subspace k-means)."""

import pytest
from pyspark.sql import functions as F

from pigpen_spark.functions import similarity as S

EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(EMB)


class TestTrainedPQCodebook:
    def test_shape_and_format(self, emb):
        cb = S.train_pq_codebook(emb, dim=64, m=8, n_codes=16, seed=7)
        assert len(cb) == 16
        assert all(len(entry) == 64 for entry in cb)
        assert all(isinstance(x, float) for entry in cb for x in entry)

    def test_m_must_divide_dim(self, emb):
        with pytest.raises(ValueError, match="must divide"):
            S.train_pq_codebook(emb, dim=64, m=7)

    def test_trained_mse_beats_first_n(self, emb):
        """k-means minimizes exactly the quantization MSE product_quantize
        reports, so the trained codebook must reconstruct better than the
        arbitrary first-N stand-in on average."""
        trained = S.train_pq_codebook(emb, dim=64, seed=7)
        mse_t = (
            S.product_quantize(emb, dim=64, codebook=trained)
            .agg(F.avg("mse")).collect()[0][0]
        )
        mse_d = S.product_quantize(emb, dim=64).agg(F.avg("mse")).collect()[0][0]
        assert mse_t < mse_d

    def test_trained_recall_beats_or_matches_first_n(self, emb):
        """Ground truth must be EXACT L2 (what ADC approximates) — cosine
        brute force would fold the metric mismatch into the comparison.
        sf0.001 is small, so the exact neighbors come from a test-side
        numpy pass; the operators under test stay distributed."""
        import numpy as np

        rows = sorted(
            ((r["vec_id"], r["embedding"]) for r in emb.collect()),
        )
        ids = [i for i, _ in rows]
        mat = np.array([v for _, v in rows], dtype=np.float64)
        k, nq = 5, 100  # 20-query samples flip on ±3-pair noise; 100 is stable
        bf = set()
        for qi in range(nq):
            qpos = ids.index(qi)
            d2 = ((mat - mat[qpos]) ** 2).sum(axis=1)
            order = [ids[p] for p in np.argsort(d2, kind="stable") if ids[p] != qi]
            bf |= {(qi, n) for n in order[:k]}

        q = emb.filter(F.col("vec_id") < nq)
        trained = S.train_pq_codebook(emb, dim=64, seed=7)
        tr = {(r["q_id"], r["n_id"])
              for r in S.pq_adc_topk(emb, q, k=k, dim=64, codebook=trained).collect()}
        fn = {(r["q_id"], r["n_id"])
              for r in S.pq_adc_topk(emb, q, k=k, dim=64).collect()}
        tr_recall = len(bf & tr) / len(bf)
        fn_recall = len(bf & fn) / len(bf)
        assert tr_recall >= fn_recall
        assert tr_recall > 0.0

    def test_drops_into_ivf_pq(self, emb):
        cb = S.train_pq_codebook(emb, dim=64, seed=7)
        q = emb.filter(F.col("vec_id") < 5)
        out = S.ivf_pq_topk(emb, q, k=3, dim=64, codebook=cb)
        rows = out.collect()
        assert len(rows) > 0
        assert {r["q_id"] for r in rows} <= {0, 1, 2, 3, 4}
        assert all(r["rank"] <= 3 for r in rows)


# ---------------------------------------------------------------------------
# max_repeats: maximal ≥L-token repeated spans
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from pigpen_spark.functions import pipeline as P  # noqa: E402

_SET = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
_word = st.sampled_from(["a", "b", "c", "d"])
_doc = st.lists(_word, min_size=0, max_size=10).map(" ".join)


def _model_max_repeats(docs: dict, L: int) -> set:
    """Pure-Python model: duplicated L-window starts merge into maximal
    runs; run [s..e] reports span (start=s, n_tokens=e-s+L, text)."""
    from collections import Counter

    toks = {i: [t for t in docs[i].lower().split(" ") if t] for i in docs}
    cnt = Counter(
        " ".join(ts[p:p + L])
        for ts in toks.values() for p in range(len(ts) - L + 1)
    )
    out = set()
    for i, ts in toks.items():
        dup = [p for p in range(len(ts) - L + 1) if cnt[" ".join(ts[p:p + L])] > 1]
        run: list[int] = []
        for p in dup + [None]:
            if run and (p is None or p != run[-1] + 1):
                s, e = run[0], run[-1]
                out.add((i, s, e - s + L, " ".join(ts[s:e + L])))
                run = []
            if p is not None:
                run = run + [p] if run else [p]
        # trailing run handled by the sentinel above
    return out


class TestMaxRepeats:
    def test_min_len_must_be_positive(self, spark):
        df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
        with pytest.raises(ValueError, match="positive"):
            P.max_repeats(df, "doc_id", "text", min_len=0)

    def test_unaligned_repeat_reported_at_both_sites(self, spark):
        df = spark.createDataFrame(
            [(0, "a b c d e f"), (1, "z a b c d e w")],
            "doc_id long, text string",
        )
        got = {(r["doc_id"], r["start_tok"], r["n_tokens"], r["repeat_text"])
               for r in P.max_repeats(df, "doc_id", "text", min_len=3).collect()}
        # consecutive duplicated 3-window starts merge into ONE maximal
        # 5-token span per site, not three overlapping windows
        assert got == {(0, 0, 5, "a b c d e"), (1, 1, 5, "a b c d e")}

    def test_within_doc_repeat(self, spark):
        df = spark.createDataFrame(
            [(0, "x y x y")], "doc_id long, text string"
        )
        got = {(r["start_tok"], r["n_tokens"])
               for r in P.max_repeats(df, "doc_id", "text", min_len=2).collect()}
        assert got == {(0, 2), (2, 2)}

    def test_no_repeats_empty(self, spark):
        df = spark.createDataFrame(
            [(0, "a b c"), (1, "d e f")], "doc_id long, text string"
        )
        assert P.max_repeats(df, "doc_id", "text", min_len=2).count() == 0

    @given(texts=st.lists(_doc, min_size=0, max_size=6), L=st.integers(1, 3))
    @settings(**_SET)
    def test_matches_python_model(self, spark, texts, L):
        docs = {i: t for i, t in enumerate(texts)}
        df = spark.createDataFrame(
            [(i, t) for i, t in docs.items()], "doc_id long, text string"
        )
        got = {(r["doc_id"], r["start_tok"], r["n_tokens"], r["repeat_text"])
               for r in P.max_repeats(df, "doc_id", "text", min_len=L).collect()}
        assert got == _model_max_repeats(docs, L)


# ---------------------------------------------------------------------------
# normalize_text_unicode: NFKC + full casefold (Arrow-batched)
# ---------------------------------------------------------------------------

from pigpen_spark.functions import text as T  # noqa: E402


def _norm_u(spark, values):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)],
                               "i long, text string")
    out = df.select("i", T.normalize_text_unicode("text").alias("n"))
    return [r["n"] for r in out.orderBy("i").collect()]


class TestNormalizeTextUnicode:
    def test_nfkc_compatibility_forms(self, spark):
        got = _norm_u(spark, ["ﬁle", "Ｆｕｌｌｗｉｄｔｈ", "①②", "ｶﾀｶﾅ"])
        assert got[0] == "file"          # ligature fi decomposes
        assert got[1] == "fullwidth"     # full-width latin → ascii + casefold
        assert got[2] == "12"            # circled digits → digits
        assert got[3] == "カタカナ"       # half-width katakana → full-width

    def test_full_casefold_one_to_many(self, spark):
        got = _norm_u(spark, ["Straße", "ΣΊΣΥΦΟΣ", "İstanbul"])
        assert got[0] == "strasse"           # ß → ss
        assert got[1] == "σίσυφοσ"           # casefold maps final ς and Σ to σ
        assert got[2] == "i̇stanbul"          # İ → i + combining dot (full fold)

    def test_whitespace_and_controls(self, spark):
        got = _norm_u(spark, ["a b　c", "x\x00y\t z\r\n", "  lead  "])
        # NBSP and ideographic space are NFKC/\s whitespace → collapsed
        assert got[0] == "a b c"
        assert got[1] == "x y z"
        assert got[2] == "lead"

    def test_null_passthrough_and_idempotence(self, spark):
        df = spark.createDataFrame([(0, None), (1, "MIXED  Case")],
                                   "i long, text string")
        out = df.select("i", T.normalize_text_unicode("text").alias("n"))
        rows = {r["i"]: r["n"] for r in out.collect()}
        assert rows[0] is None
        assert rows[1] == "mixed case"
        twice = df.select(
            T.normalize_text_unicode(T.normalize_text_unicode("text")).alias("n")
        ).collect()
        assert {r["n"] for r in twice} == {None, "mixed case"}

    def test_agrees_with_ascii_normalize_on_ascii(self, spark):
        vals = ["Hello,  World!", "A\tB\x7fC", "  x  Y z  "]
        df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                                   "i long, text string")
        out = df.select(
            T.normalize_text("text").alias("a"),
            T.normalize_text_unicode("text").alias("u"),
        ).collect()
        assert all(r["a"] == r["u"] for r in out)


# ---------------------------------------------------------------------------
# lsh_topk score_mode: the Arrow default is BIT-identical to "expr"
# (strict-left-fold contract, similarity._arrow_cosine_raw) — full rows,
# ranks included, not a tolerance comparison
# ---------------------------------------------------------------------------


class TestArrowScoreMode:
    def test_arrow_default_bit_identical_to_expr(self, spark, emb):
        ex = S.lsh_topk(emb, k=5, n_planes=6, dim=64, score_mode="expr").collect()
        ar = S.lsh_topk(emb, k=5, n_planes=6, dim=64).collect()
        assert sorted(map(tuple, ex)) == sorted(map(tuple, ar))

    def test_unknown_mode_raises(self, spark, emb):
        with pytest.raises(ValueError, match="score_mode"):
            S.lsh_topk(emb, k=5, score_mode="numpy")


class TestTrainedIvfPq:
    def test_full_trained_ivf_pq_recall(self, emb, spark):
        """Both quantizers trained (coarse k-means + per-subspace PQ):
        candidate cells from real centroids must not lose to first-N at
        the same probe budget, measured against exact L2 ground truth."""
        import numpy as np

        rows = sorted((r["vec_id"], r["embedding"]) for r in emb.collect())
        ids = [i for i, _ in rows]
        mat = np.array([v for _, v in rows], dtype=np.float64)
        k, nq = 5, 100
        bf = set()
        for qi in range(nq):
            qpos = ids.index(qi)
            d2 = ((mat - mat[qpos]) ** 2).sum(axis=1)
            order = [ids[p] for p in np.argsort(d2, kind="stable") if ids[p] != qi]
            bf |= {(qi, n) for n in order[:k]}

        q = emb.filter(F.col("vec_id") < nq)
        cb = S.train_pq_codebook(emb, dim=64, seed=7)
        cents = S.train_coarse_centroids(emb, n_centroids=16, seed=7)
        tr = {(r["q_id"], r["n_id"])
              for r in S.ivf_pq_topk(emb, q, k=k, dim=64, codebook=cb,
                                     coarse_centroids=cents).collect()}
        fn = {(r["q_id"], r["n_id"])
              for r in S.ivf_pq_topk(emb, q, k=k, dim=64).collect()}
        tr_recall = len(bf & tr) / len(bf)
        fn_recall = len(bf & fn) / len(bf)
        assert tr_recall >= fn_recall
        assert tr_recall > 0.0

    def test_centroid_count_and_shape(self, emb):
        cents = S.train_coarse_centroids(emb, n_centroids=8, seed=7)
        assert len(cents) == 8
        assert all(len(c) == 64 for c in cents)
