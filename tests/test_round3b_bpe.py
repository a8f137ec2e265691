"""BPE trainer/encoder: differential vs an independent pure-Python
reference, plus the skew-profile relation."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pigpen_spark.functions import bpe as B
from pigpen_spark.tuning import key_skew_profile


# --- independent reference implementation (Sennrich 2016, alg. 1) -------

def _ref_learn(word_freqs, n_merges):
    import collections

    vocab = collections.Counter()
    for w, f in word_freqs:
        vocab[" ".join(list(w) + [B.EOW])] += f
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for word, f in vocab.items():
            syms = word.split(" ")
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        best = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        if pairs[best] < 2:
            break
        merges.append(best)
        joined = "".join(best)
        new_vocab = collections.Counter()
        for word, f in vocab.items():
            out, syms, i = [], word.split(" "), 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == best[0] and syms[i + 1] == best[1]:
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[" ".join(out)] += f
        vocab = new_vocab
    return merges


class TestLearnMerges:
    def test_sennrich_classic_example(self):
        hist = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
        merges = B.learn_merges(hist, 4)
        # 'es' occurs 9× (newest + widest) — the canonical first merge
        assert merges[0] == ("e", "s")
        assert merges[1] == ("es", "t")
        assert merges[2] == ("est", B.EOW)

    def test_matches_reference_implementation(self):
        import random

        rng = random.Random(9)
        alphabet = "abcdef"
        hist = [
            ("".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8))),
             rng.randint(1, 20))
            for _ in range(60)
        ]
        assert B.learn_merges(hist, 30) == _ref_learn(hist, 30)

    def test_stops_when_no_repeating_pair(self):
        merges = B.learn_merges([("ab", 1), ("cd", 1)], 100)
        assert merges == []  # every pair occurs once — nothing to merge


class TestEncode:
    def test_encode_word_applies_merges_in_order(self):
        hist = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
        merges = B.learn_merges(hist, 10)
        assert "".join(B.encode_word("newest", merges)) == "newest" + B.EOW
        # trained merges compress a trained word to few pieces
        assert len(B.encode_word("newest", merges)) < len("newest") + 1

    def test_unseen_word_falls_back_to_chars_plus_learned_pieces(self):
        merges = [("e", "s"), ("es", "t")]
        assert B.encode_word("best", merges) == ["b", "est", B.EOW]
        assert B.encode_word("xyz", merges) == ["x", "y", "z", B.EOW]

    def test_bpe_encode_reconstructs_text(self, spark):
        df = spark.createDataFrame([
            Row(doc_id=1, text="the newest tests are the widest tests"),
            Row(doc_id=2, text="lower and lower"),
            Row(doc_id=3, text=None),
        ], "doc_id int, text string")
        merges = B.train_bpe(df, "text", n_merges=20)
        out = {r["id"]: r for r in B.bpe_encode(df, "doc_id", "text", merges).collect()}
        joined = "".join(out[1]["pieces"]).replace(B.EOW, "")
        assert joined == "thenewesttestsarethewidesttests"
        assert out[1]["n_pieces"] == len(out[1]["pieces"])
        assert out[3]["pieces"] == [] and out[3]["n_pieces"] == 0
        # every doc-2 word ends with an EOW-terminated piece
        assert "".join(out[2]["pieces"]).count(B.EOW) == 3

    def test_train_bpe_distributed_matches_local_histogram(self, spark):
        df = spark.createDataFrame([
            Row(doc_id=i, text="aa bb aa cc aa bb") for i in range(10)
        ])
        merges = B.train_bpe(df, "text", n_merges=5)
        local = B.learn_merges([("aa", 30), ("bb", 20), ("cc", 10)], 5)
        assert merges == local


class TestKeySkewProfile:
    def test_counts_and_ppm_shares(self, spark):
        df = spark.createDataFrame(
            [Row(k="a")] * 5 + [Row(k="b")] * 3 + [Row(k="c")] * 2
        )
        rows = {r["key"]: r for r in key_skew_profile(df, "k", top_n=10).collect()}
        assert rows["a"]["cnt"] == 5 and rows["a"]["share_ppm"] == 500000
        assert rows["b"]["cnt"] == 3 and rows["b"]["share_ppm"] == 300000
        assert rows["c"]["cnt"] == 2 and rows["c"]["share_ppm"] == 200000

    def test_top_n_is_deterministic_under_ties(self, spark):
        df = spark.createDataFrame([Row(k=str(i % 7)) for i in range(70)])
        top = [r["key"] for r in key_skew_profile(df, "k", top_n=3).collect()]
        assert top == ["0", "1", "2"]  # equal counts → key ascending

    def test_plan_is_take_ordered_with_partial_agg(self, spark):
        df = spark.createDataFrame([Row(k=i % 5) for i in range(100)])
        p = (key_skew_profile(df, "k", top_n=3)
             ._jdf.queryExecution().executedPlan().toString())
        assert "TakeOrderedAndProject" in p
        assert p.count("HashAggregate") >= 2
