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
