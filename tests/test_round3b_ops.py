"""Round-3 second-pass operators: signed-permutation / OPQ rotations,
multi-probe near-dup blocking, trained SemDeDup cells, Count-Min heavy
hitters, overlapping chunking."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pigpen_spark.functions import pipeline as P
from pigpen_spark.functions import similarity as S
from pigpen_spark.functions import sketch as K

EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(EMB)


class TestSignPermutation:
    def test_is_permutation_with_unit_signs(self):
        perm, signs = S.sign_permutation(64, seed=3)
        assert sorted(perm) == list(range(64))
        assert set(signs) <= {-1.0, 1.0}

    def test_deterministic_and_seed_sensitive(self):
        assert S.sign_permutation(16, seed=1) == S.sign_permutation(16, seed=1)
        assert S.sign_permutation(16, seed=1) != S.sign_permutation(16, seed=2)

    def test_apply_matches_python_and_preserves_norm(self, spark):
        perm, signs = S.sign_permutation(8, seed=5)
        vec = [1.0, -2.0, 3.5, 0.0, 7.25, -0.5, 2.0, 9.0]
        df = spark.createDataFrame([Row(v=vec)])
        out = df.select(S.sign_permute(F.col("v"), perm, signs).alias("r")).collect()[0]["r"]
        expect = [vec[perm[i]] * signs[i] for i in range(8)]
        assert out == expect
        assert math.isclose(
            sum(x * x for x in out), sum(x * x for x in vec), rel_tol=0
        )  # ±1 multiplies are float-exact: norms match bit-for-bit

    def test_sql_literals_match(self):
        perm, signs = S.sign_permutation(4, seed=0)
        sql = S.sign_permute_sql("v", perm, signs)
        for p, s in zip(perm, signs):
            assert f"(v)[{p + 1}]::DOUBLE * {s!r}" in sql


class TestOPQRotation:
    def test_rotation_is_orthonormal(self, emb):
        import numpy as np

        R = np.asarray(S.train_opq_rotation(emb, dim=64, m=8))
        assert R.shape == (64, 64)
        assert np.allclose(R @ R.T, np.eye(64), atol=1e-8)

    def test_rotate_vectors_matches_numpy(self, spark):
        import numpy as np

        R = S.train_opq_rotation  # noqa: F841 — matmul check uses a literal
        rot = [[0.0, 1.0], [-1.0, 0.0]]  # 90° rotation
        df = spark.createDataFrame([Row(id=1, v=[3.0, 4.0])])
        out = S.rotate_vectors(df, "id", "v", rot).collect()[0]["v"]
        assert np.allclose(out, [4.0, -3.0])

    def test_opq_mse_beats_identity_on_anisotropic_data(self, spark):
        """The whole point of OPQ: when variance is concentrated in a few
        dims (here: dims 0..7 have 100× the spread), eigenvalue
        allocation re-deals information across subspaces and trained PQ
        reconstructs strictly better than identity-PQ with the same
        trained codebook procedure."""
        import numpy as np

        rng = np.random.RandomState(11)
        n, dim = 256, 16
        X = rng.normal(size=(n, dim))
        X[:, :4] *= 10.0  # anisotropy concentrated in subspace 0
        df = spark.createDataFrame(
            [Row(vec_id=i, embedding=[float(x) for x in X[i]]) for i in range(n)]
        )
        m, n_codes = 4, 8
        cb_id = S.train_pq_codebook(df, dim=dim, m=m, n_codes=n_codes, seed=7)
        mse_id = (
            S.product_quantize(df, dim=dim, m=m, n_codes=n_codes, codebook=cb_id)
            .agg(F.avg("mse")).collect()[0][0]
        )
        R = S.train_opq_rotation(df, dim=dim, m=m, sample_size=n)
        rot = S.rotate_vectors(df, "vec_id", "embedding", R)
        cb_r = S.train_pq_codebook(rot, dim=dim, m=m, n_codes=n_codes, seed=7)
        mse_r = (
            S.product_quantize(rot, dim=dim, m=m, n_codes=n_codes, codebook=cb_r)
            .agg(F.avg("mse")).collect()[0][0]
        )
        assert mse_r < mse_id

    def test_opq_adc_search_end_to_end(self, emb):
        R = S.train_opq_rotation(emb, dim=64, m=8)
        rot = S.rotate_vectors(emb, "vec_id", "embedding", R)
        q = rot.filter(F.col("vec_id") < 5)
        out = S.pq_adc_topk(rot, q, k=3, dim=64,
                            codebook=S.train_pq_codebook(rot, dim=64, seed=7))
        rows = out.collect()
        assert {r["q_id"] for r in rows} == set(range(5))
        for r in rows:
            assert 1 <= r["rank"] <= 3 and r["q_id"] != r["n_id"]


class TestSemDedupTrainedCells:
    def test_trained_cells_catch_planted_pair(self, spark):
        """Near-dup pair planted mid-corpus (NOT at ids 0/1 — first-N
        centroids would split a leading pair into its own cells); trained
        k-means cells must co-locate it and the keep labels must drop
        exactly one of the two."""
        import numpy as np

        rng = np.random.RandomState(4)
        n, dim = 120, 8
        X = rng.normal(size=(n, dim))
        X[77] = X[33] + rng.normal(scale=1e-3, size=dim)  # planted near-dup
        df = spark.createDataFrame(
            [Row(vec_id=i, embedding=[float(x) for x in X[i]]) for i in range(n)]
        )
        cents = S.train_coarse_centroids(df, n_centroids=4, seed=7)
        out = S.semantic_dedup(df, threshold=0.99, centroids=cents)
        rows = {r["vec_id"]: r for r in out.collect()}
        assert len(rows) == n
        assert rows[33]["cell"] == rows[77]["cell"]
        assert rows[33]["cluster"] == rows[77]["cluster"]
        assert rows[33]["kept"] and not rows[77]["kept"]

    def test_centroid_literals_change_cells_not_schema(self, emb):
        cents = S.train_coarse_centroids(emb, n_centroids=8, seed=7)
        trained = S.semantic_dedup(emb, threshold=0.45, centroids=cents)
        default = S.semantic_dedup(emb, threshold=0.45, n_centroids=8)
        assert trained.columns == default.columns
        assert trained.count() == default.count() == emb.count()


class TestMultiProbeNearDup:
    def test_superset_of_home_only_candidates(self, emb):
        base = S.embedding_near_dup_pairs(
            emb, threshold=0.3, n_tables=2, n_planes=4, dim=64)
        mp = S.embedding_near_dup_pairs(
            emb, threshold=0.3, n_tables=2, n_planes=4, dim=64, multi_probe=True)
        b = {(r["id_a"], r["id_b"]) for r in base.collect()}
        m = {(r["id_a"], r["id_b"]) for r in mp.collect()}
        assert b <= m
        assert len(m) > len(b)  # distance-1 probes must add candidates

    def test_scores_agree_with_exact(self, emb):
        mp = S.embedding_near_dup_pairs(
            emb, threshold=0.4, n_tables=2, n_planes=4, dim=64, multi_probe=True)
        exact = S.embedding_near_dup_pairs(emb, threshold=0.4, exact=True)
        ex = {(r["id_a"], r["id_b"]): r["score"] for r in exact.collect()}
        for r in mp.collect():
            assert ex[(r["id_a"], r["id_b"])] == r["score"]


class TestHeavyHitters:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        rows = []
        for i in range(50):
            words = ["common"] * 3 + [f"rare{i}"]
            if i % 2 == 0:
                words.append("even")
            rows.append(Row(doc_id=i, text=" ".join(words)))
        return spark.createDataFrame(rows)

    def test_estimates_never_undercount(self, docs, spark):
        out = {r["term"]: r["est"] for r in
               K.heavy_hitters(docs, "text", depth=4, width=32, min_est=1).collect()}
        true = {r["t"]: r["c"] for r in docs.select(
            F.explode(F.split(F.lower("text"), " ")).alias("t")
        ).groupBy("t").agg(F.count(F.lit(1)).alias("c")).collect()}
        for term, est in out.items():
            assert est >= true[term], term

    def test_no_false_negatives(self, docs):
        out = {r["term"] for r in
               K.heavy_hitters(docs, "text", depth=4, width=32, min_est=25).collect()}
        assert {"common", "even"} <= out  # common=150, even=25

    def test_wide_sketch_is_exact(self, docs):
        """With width ≫ distinct terms and depth 4, collisions in every
        row are overwhelmingly unlikely → estimates equal true counts."""
        out = {r["term"]: r["est"] for r in
               K.heavy_hitters(docs, "text", depth=4, width=4096, min_est=1).collect()}
        assert out["common"] == 150
        assert out["even"] == 25
        assert out["rare7"] == 1

    def test_sketch_row_sums_equal_token_count(self, docs):
        sk = K.cms_sketch(docs, "text", depth=3, width=16)
        total = docs.select(F.explode(F.split(F.lower("text"), " "))).count()
        sums = {r["r"]: r["s"] for r in
                sk.groupBy("r").agg(F.sum("cnt").alias("s")).collect()}
        assert sums == {0: total, 1: total, 2: total}


class TestChunkOverlap:
    def test_manual_windows(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=1, text="a b c d e f g h i j"), Row(doc_id=2, text="x y z v w")]
        )
        out = P.chunk_overlap(df, "doc_id", "text", size=4, stride=3)
        rows = sorted((r["id"], r["chunk_id"], r["chunk"], r["n_tokens"])
                      for r in out.collect())
        assert rows == [
            (1, 0, "a b c d", 4), (1, 1, "d e f g", 4), (1, 2, "g h i j", 4),
            (2, 0, "x y z v", 4), (2, 1, "v w", 2),
        ]

    def test_short_doc_single_chunk(self, spark):
        df = spark.createDataFrame([Row(doc_id=1, text="one two")])
        rows = P.chunk_overlap(df, "doc_id", "text", size=10, stride=5).collect()
        assert len(rows) == 1
        assert rows[0]["chunk"] == "one two" and rows[0]["n_tokens"] == 2

    def test_empty_and_null_docs_yield_no_rows(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=1, text="  "), Row(doc_id=2, text=None)],
            "doc_id int, text string",
        )
        assert P.chunk_overlap(df, "doc_id", "text", size=4, stride=2).count() == 0

    def test_adjacent_chunks_share_context(self, spark):
        df = spark.createDataFrame([Row(doc_id=1, text=" ".join(f"t{i}" for i in range(20)))])
        rows = sorted((r["chunk_id"], r["chunk"].split(" "))
                      for r in P.chunk_overlap(df, "doc_id", "text", size=8, stride=5).collect())
        for (_, cur), (_, nxt) in zip(rows, rows[1:]):
            assert cur[-3:] == nxt[:3]  # size − stride = 3 shared tokens

    def test_invalid_params_raise(self, spark):
        df = spark.createDataFrame([Row(doc_id=1, text="a")])
        with pytest.raises(ValueError, match="positive"):
            P.chunk_overlap(df, "doc_id", "text", size=0, stride=1)
