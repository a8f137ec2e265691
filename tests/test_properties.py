"""Property-based differential tests (hypothesis).

The reference achieves semantic confidence by running one test corpus on
four backends (SURVEY §5.1).  Our analog: random inputs, engine results
checked against a pure-Python model of the reference's documented
semantics (multiset algebra, fold algebra, null-key joins).

The reference itself has NO property-based tests (SURVEY §5.2) — this is
an extension of its strategy.
"""

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pigpen_spark.relation import return_

SET_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

small_ints = st.lists(st.integers(min_value=0, max_value=6), min_size=0, max_size=12)


def rel_of(spark, xs):
    if not xs:
        return return_(spark, [], "x long")
    return return_(spark, [(int(v),) for v in xs], "x long")


def multiset(rel):
    return Counter(r["x"] for r in rel.df.collect())


@pytest.mark.usefixtures("spark")
class TestMultisetAlgebra:
    """set_test.clj:25-122 semantics under random multisets."""

    @given(a=small_ints, b=small_ints)
    @settings(**SET_SETTINGS)
    def test_concat(self, spark, a, b):
        assert multiset(rel_of(spark, a).concat(rel_of(spark, b))) == Counter(a) + Counter(b)

    @given(a=small_ints, b=small_ints)
    @settings(**SET_SETTINGS)
    def test_intersection_multiset(self, spark, a, b):
        got = multiset(rel_of(spark, a).intersection_multiset(rel_of(spark, b)))
        assert got == Counter(a) & Counter(b)

    @given(a=small_ints, b=small_ints)
    @settings(**SET_SETTINGS)
    def test_difference_multiset(self, spark, a, b):
        got = multiset(rel_of(spark, a).difference_multiset(rel_of(spark, b)))
        assert got == Counter(a) - Counter(b)

    @given(a=small_ints, b=small_ints)
    @settings(**SET_SETTINGS)
    def test_difference_set_semantics(self, spark, a, b):
        got = set(multiset(rel_of(spark, a).difference(rel_of(spark, b))))
        assert got == set(a) - set(b)

    @given(a=small_ints, b=small_ints)
    @settings(**SET_SETTINGS)
    def test_union_distinct(self, spark, a, b):
        got = multiset(rel_of(spark, a).union(rel_of(spark, b)))
        assert got == Counter(set(a) | set(b))


kv_lists = st.lists(
    st.tuples(st.one_of(st.none(), st.integers(0, 3)), st.integers(0, 50)),
    min_size=0, max_size=10,
)


def kv_rel(spark, rows, vname="v"):
    return return_(spark, [(k, int(v)) for k, v in rows], f"k int, {vname} long")


@pytest.mark.usefixtures("spark")
class TestJoinSemantics:
    """join_test.clj nil-key matrix under random nullable-key tables."""

    @given(a=kv_lists, b=kv_lists)
    @settings(**SET_SETTINGS)
    def test_inner_join_null_keys_never_match(self, spark, a, b):
        j = kv_rel(spark, a).join(kv_rel(spark, b, "w").map(k2=F.col("k"), w=F.col("w")),
                                  on="k", right_on="k2")
        got = Counter((r["v"], r["w"]) for r in j.df.collect())
        want = Counter(
            (va, vb) for ka, va in a for kb, vb in b
            if ka is not None and ka == kb
        )
        assert got == want

    @given(a=kv_lists, b=kv_lists)
    @settings(**SET_SETTINGS)
    def test_join_nils_null_keys_match(self, spark, a, b):
        j = kv_rel(spark, a).join(kv_rel(spark, b, "w").map(k2=F.col("k"), w=F.col("w")),
                                  on="k", right_on="k2", join_nils=True)
        got = Counter((r["v"], r["w"]) for r in j.df.collect())
        want = Counter((va, vb) for ka, va in a for kb, vb in b if ka == kb)
        assert got == want

    @given(a=kv_lists, keys=st.lists(st.one_of(st.none(), st.integers(0, 3)), max_size=6))
    @settings(**SET_SETTINGS)
    def test_filter_by_multiplicities(self, spark, a, keys):
        krel = return_(spark, [(k,) for k in keys], "kk int")
        out = kv_rel(spark, a).filter_by("k", krel)
        got = Counter(r["v"] for r in out.df.collect())
        want = Counter(v for k, v in a for kk in keys if k == kk or (k is None and kk is None))
        assert got == want


asof_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 100)), min_size=0, max_size=8)


@pytest.mark.usefixtures("spark")
class TestAsOfJoinProperty:
    @given(left=asof_rows, right=asof_rows)
    @settings(**SET_SETTINGS)
    def test_asof_matches_bruteforce_model(self, spark, left, right):
        import datetime

        from pigpen_spark.operators.joins import as_of_join

        def ts(s):
            return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s)

        # dedupe right per (k, ts): keep max payload id (documented contract)
        rmap: dict = {}
        for i, (k, s) in enumerate(right):
            key = (k, s)
            rmap[key] = max(rmap.get(key, -1), i)
        rrows = [(k, ts(s), rid) for (k, s), rid in rmap.items()]
        lrows = [(i, k, ts(s)) for i, (k, s) in enumerate(left)]
        if not lrows:
            return
        ldf = spark.createDataFrame(lrows, "lid long, k long, ts timestamp")
        rdf = (spark.createDataFrame(rrows, "k long, ts timestamp, rid long")
               if rrows else spark.createDataFrame([], "k long, ts timestamp, rid long"))
        out = as_of_join(ldf, rdf, on="k", payload=["rid"])
        got = {r["lid"]: r["rid"] for r in out.collect()}
        want = {}
        for lid, k, lts in lrows:
            best = None
            for rk, rts, rid in rrows:
                if rk == k and rts <= lts and (best is None or rts > best[0] or (rts == best[0] and rid > best[1])):
                    best = (rts, rid)
            want[lid] = best[1] if best else None
        assert got == want


@pytest.mark.usefixtures("spark")
class TestCogroupProperty:
    @given(a=kv_lists, b=kv_lists, req_a=st.booleans(), req_b=st.booleans())
    @settings(**SET_SETTINGS)
    def test_cogroup_bags_match_model(self, spark, a, b, req_a, req_b):
        from pyspark.sql import functions as F

        if not a:
            return  # cogroup needs a non-empty self side schema; rows may still be few
        left = kv_rel(spark, a)
        right = kv_rel(spark, b, "w").map(k2=F.col("k"), w=F.col("w"))
        cg = left.cogroup([(right, F.col("k2"))], on=F.col("k"), required=[req_a, req_b])
        got = {
            r["key"]: (
                sorted(x["v"] for x in (r["bag_0"] or [])),
                sorted(x["w"] for x in (r["bag_1"] or [])),
            )
            for r in cg.df.collect()
        }
        # model: keys group null-safe across inputs; required side must
        # have rows at the key
        keys = {k for k, _ in a} | {k for k, _ in b}
        want = {}
        for k in keys:
            la = sorted(v for kk, v in a if kk == k)
            lb = sorted(v for kk, v in b if kk == k)
            if req_a and not la:
                continue
            if req_b and not lb:
                continue
            want[k] = (la, lb)
        assert got == want


@pytest.mark.usefixtures("spark")
class TestQuantileProperty:
    @given(vals=st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
                         min_size=1, max_size=30))
    @settings(**SET_SETTINGS)
    def test_percentile_matches_numpy_linear(self, spark, vals):
        import numpy as np

        from pigpen_spark import fold
        r = return_(spark, [(float(v),) for v in vals], "x double")
        out = r.reduce_rel(q=fold.quantiles("x", [0.25, 0.5, 0.9])).df.collect()
        got = out[0]["q"]
        want = [float(np.percentile(vals, p * 100, method="linear")) for p in (0.25, 0.5, 0.9)]
        for g, w in zip(got, want):
            assert g == pytest.approx(w, rel=1e-9, abs=1e-9)


@pytest.mark.usefixtures("spark")
class TestFoldProperties:
    @given(rows=kv_lists)
    @settings(**SET_SETTINGS)
    def test_group_fold_sum_count(self, spark, rows):
        from pigpen_spark import fold
        out = kv_rel(spark, rows).group_by("k").fold(s=fold.sum_("v"), n=fold.count())
        got = {r["k"]: (r["s"], r["n"]) for r in out.df.collect()}
        want: dict = {}
        for k, v in rows:
            s, n = want.get(k, (0, 0))
            want[k] = (s + v, n + 1)
        assert got == want

    @given(rows=small_ints)
    @settings(**SET_SETTINGS)
    def test_reduce_empty_iff_input_empty(self, spark, rows):
        from pigpen_spark import fold
        out = rel_of(spark, rows).reduce_rel(s=fold.sum_("x")).df.collect()
        if rows:
            assert len(out) == 1 and out[0]["s"] == sum(rows)
        else:
            assert out == []


# -- dedup_spans differential model -----------------------------------------

word = st.sampled_from(["aa", "bb", "cc", "dd"])
doc_text = st.lists(word, min_size=0, max_size=10).map(" ".join)


def _model_dedup_spans(docs: dict, chunk: int):
    """Pure-Python model: first (id, pos) occurrence of each chunk wins."""
    chunks = {}
    for i in sorted(docs):
        toks = [t for t in docs[i].lower().split(" ") if t]
        chunks[i] = [" ".join(toks[j:j + chunk]) for j in range(0, len(toks), chunk)]
    seen = {}
    for i in sorted(chunks):
        for p, c in enumerate(chunks[i]):
            seen.setdefault(c, (i, p))
    out = {}
    for i in sorted(chunks):
        keep = [c for p, c in enumerate(chunks[i]) if seen[c] == (i, p)]
        out[i] = (" ".join(keep), len(chunks[i]) - len(keep))
    return out


class TestDedupSpansProperties:
    @given(texts=st.lists(doc_text, min_size=0, max_size=6), chunk=st.integers(1, 3))
    @settings(**SET_SETTINGS)
    def test_matches_python_model(self, spark, texts, chunk):
        from pigpen_spark.functions import pipeline as P

        docs = {i: t for i, t in enumerate(texts)}
        df = spark.createDataFrame(
            [(i, t) for i, t in docs.items()],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: (r["clean_text"], r["n_dropped"])
               for r in P.dedup_spans(df, "doc_id", "text", chunk=chunk).collect()}
        assert got == _model_dedup_spans(docs, chunk)

    @given(texts=st.lists(doc_text, min_size=1, max_size=5))
    @settings(**SET_SETTINGS)
    def test_idempotent(self, spark, texts):
        from pigpen_spark.functions import pipeline as P

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        once = P.dedup_spans(df, "doc_id", "text", chunk=2)
        twice = P.dedup_spans(
            once.select("doc_id", F.col("clean_text").alias("text")),
            "doc_id", "text", chunk=2,
        )
        a = {r["doc_id"]: r["clean_text"] for r in once.collect()}
        b = {r["doc_id"]: r["clean_text"] for r in twice.collect()}
        assert a == b  # deduped corpus contains no cross-doc repeats


def _model_mix_by_weight(ids: list, groups: list, weights: dict, default: float, salt: str):
    """Pure-Python model of mix_by_weight's hash-fractional replication."""
    import hashlib

    out = []
    for i, g in zip(ids, groups):
        w = weights.get(g, default)
        nf, frac = int(w), float(w) - int(w)
        u = int(hashlib.md5(f"{i}|{salt}".encode()).hexdigest()[:8], 16) / float(1 << 32)
        for c in range(nf + 1):
            if c < nf or u < frac:
                out.append((i, c))
    return sorted(out)


class TestMixByWeightProperties:
    @given(
        rows=st.lists(
            st.tuples(st.integers(0, 50), st.sampled_from(["a", "b", "c"])),
            min_size=0, max_size=20, unique_by=lambda t: t[0],
        ),
        wa=st.floats(0.0, 3.0, allow_nan=False),
        wb=st.floats(0.0, 3.0, allow_nan=False),
        default=st.floats(0.0, 2.0, allow_nan=False),
    )
    @settings(**SET_SETTINGS)
    def test_matches_python_model(self, spark, rows, wa, wb, default):
        from pigpen_spark.functions import pipeline as P

        df = spark.createDataFrame(rows, "id long, g string")
        weights = {"a": wa, "b": wb}
        got = sorted(
            (r["id"], r["copy"])
            for r in P.mix_by_weight(df, "g", "id", weights, default=default).collect()
        )
        assert got == _model_mix_by_weight(
            [r[0] for r in rows], [r[1] for r in rows], weights, default, "mix"
        )


class TestTokenizePackProperties:
    @given(texts=st.lists(doc_text, min_size=0, max_size=6),
           seq_len=st.integers(1, 5))
    @settings(**SET_SETTINGS)
    def test_pack_partitions_each_shard_stream(self, spark, texts, seq_len):
        """Sequences of a shard, concatenated in seq_no order, must equal
        the shard's doc-order token-id stream exactly — nothing lost,
        nothing reordered, every non-final sequence full."""
        import hashlib

        from pigpen_spark.functions import pipeline as P

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        out = P.tokenize_pack(df, "doc_id", "text", seq_len=seq_len, shards=2).collect()
        vocab = {r["token"]: r["token_id"]
                 for r in P.build_vocab(df, "text").collect()}
        streams = {}
        for i, t in enumerate(texts):
            sh = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 2
            streams.setdefault(sh, []).extend(
                vocab[w] for w in t.lower().split(" ") if w
            )
        got = {}
        for r in sorted(out, key=lambda r: (r["shard"], r["seq_no"])):
            got.setdefault(r["shard"], []).extend(r["token_ids"])
            assert len(r["token_ids"]) == r["n_tokens"] <= seq_len
        assert got == {sh: s for sh, s in streams.items() if s}
        # every sequence except a shard's last is exactly full
        by_shard = {}
        for r in out:
            by_shard.setdefault(r["shard"], []).append((r["seq_no"], r["n_tokens"]))
        for pairs in by_shard.values():
            pairs.sort()
            assert all(n == seq_len for _, n in pairs[:-1])


def _model_dedup_substrings(docs: dict, n: int):
    """Pure-Python model of dedup_substrings: any n-token window seen at
    an earlier (id, pos) marks [pos, pos+n) for removal at later sites."""
    toks = {i: [t for t in docs[i].lower().split(" ") if t] for i in docs}
    first = {}
    for i in sorted(toks):
        for p in range(len(toks[i]) - n + 1):
            first.setdefault(" ".join(toks[i][p:p + n]), (i, p))
    out = {}
    for i in sorted(toks):
        covered = set()
        for p in range(len(toks[i]) - n + 1):
            if first[" ".join(toks[i][p:p + n])] != (i, p):
                covered.update(range(p, p + n))
        keep = [t for j, t in enumerate(toks[i]) if j not in covered]
        out[i] = (" ".join(keep), len(toks[i]) - len(keep))
    return out


class TestDedupSubstringsProperties:
    @given(texts=st.lists(doc_text, min_size=0, max_size=6), n=st.integers(1, 3))
    @settings(**SET_SETTINGS)
    def test_matches_python_model(self, spark, texts, n):
        from pigpen_spark.functions import pipeline as P

        docs = {i: t for i, t in enumerate(texts)}
        df = spark.createDataFrame(
            [(i, t) for i, t in docs.items()],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: (r["clean_text"], r["n_dropped_tokens"])
               for r in P.dedup_substrings(df, "doc_id", "text", n=n).collect()}
        assert got == _model_dedup_substrings(docs, n)

    def test_catches_unaligned_duplicates(self, spark):
        # the duplicated passage starts at offset 1 in doc 1 — invisible
        # to chunk-aligned span dedup with chunk=4, caught by the sliding
        # window at every alignment
        df = spark.createDataFrame(
            [(0, "p q r s t"), (1, "x p q r s y")],
            "doc_id long, text string",
        )
        sub = {r["doc_id"]: r["clean_text"]
               for r in P_dedup_substrings_helper(df).collect()}
        assert sub[0] == "p q r s t"
        assert sub[1] == "x y"


def P_dedup_substrings_helper(df):
    from pigpen_spark.functions import pipeline as P

    return P.dedup_substrings(df, "doc_id", "text", n=4)


class TestRound3cDifferentials:
    """Pure-Python models for the third-pass operators."""

    @given(edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=0, max_size=20))
    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture,
                                     HealthCheck.too_slow])
    def test_star_wcc_matches_union_find(self, spark, edges):
        from pigpen_spark.functions.dedup import dedup_clusters_star

        # model: min-labeled union-find
        parent = {}
        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x
        for a, b in edges:
            parent.setdefault(a, a); parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        expected = sorted((x, find(x)) for x in parent)

        if not edges:
            df = spark.createDataFrame([], "id_a long, id_b long")
        else:
            df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = sorted(tuple(r) for r in dedup_clusters_star(df).collect())
        assert got == expected

    @given(rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-50, 50)),
        min_size=1, max_size=30),
        cut=st.integers(-50, 50))
    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture,
                                     HealthCheck.too_slow])
    def test_merge_rollups_matches_direct(self, spark, rows, cut):
        from pigpen_spark.operators.analytics import merge_rollups
        df = spark.createDataFrame(rows, "k long, v long")
        def roll(d):
            return d.groupBy("k").agg(
                F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
                F.min("v").alias("lo"), F.max("v").alias("hi"))
        merged = merge_rollups(
            [roll(df.where(F.col("v") < cut)), roll(df.where(F.col("v") >= cut))],
            ["k"], {"n": "count", "s": "sum", "lo": "min", "hi": "max"})
        assert sorted(tuple(r) for r in merged.collect()) == \
               sorted(tuple(r) for r in roll(df).collect())

    @given(xs=st.lists(st.integers(0, 999), min_size=1, max_size=60),
           n_bins=st.sampled_from([4, 16, 50]))
    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture,
                                     HealthCheck.too_slow])
    def test_histogram_quantile_error_bound(self, spark, xs, n_bins):
        from pigpen_spark.functions.sketch import histogram_quantiles
        df = spark.createDataFrame([(x,) for x in xs], "x long")
        w = max(1, -((0 - 1000) // n_bins))
        out = {r.p_permille: r.est for r in histogram_quantiles(
            df, F.col("x"), 0, 1000, n_bins).collect()}
        ordered = sorted(xs)
        for p in (500, 900, 990):
            exact = ordered[max(0, -(-p * len(xs) // 1000) - 1)]
            assert abs(out[p] - exact) <= w


class TestRound3cDifferentials2:
    @given(old=st.dictionaries(st.integers(0, 8), st.integers(0, 3), max_size=8),
           new=st.dictionaries(st.integers(0, 8), st.integers(0, 3), max_size=8))
    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture,
                                     HealthCheck.too_slow])
    def test_snapshot_diff_matches_dict_model(self, spark, old, new):
        from pigpen_spark.operators.analytics import snapshot_diff
        def frame(d):
            if not d:
                return spark.createDataFrame([], "k long, v long")
            return spark.createDataFrame(list(d.items()), "k long, v long")
        if not old and not new:
            assert snapshot_diff(frame(old), frame(new), ["k"]).count() == 0
            return
        got = {r.k: r.status for r in
               snapshot_diff(frame(old), frame(new), ["k"]).collect()}
        expected = {}
        for k in set(old) | set(new):
            if k not in old:
                expected[k] = "added"
            elif k not in new:
                expected[k] = "removed"
            elif old[k] != new[k]:
                expected[k] = "changed"
            else:
                expected[k] = "unchanged"
        assert got == expected

    @given(events=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 3600), st.integers(0, 99)),
        min_size=1, max_size=25, unique_by=lambda e: e[2]))
    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture,
                                     HealthCheck.too_slow])
    def test_dedup_keyed_window_matches_model(self, spark, events):
        from pigpen_spark.operators.windows import dedup_keyed_window
        # model: first (ts, id) per (user, ts//600)
        best = {}
        for u, ts, eid in events:
            key = (u, ts // 600)
            if key not in best or (ts, eid) < best[key]:
                best[key] = (ts, eid)
        expected = sorted(eid for (_, eid) in best.values())

        rows = [(eid, f"2024-01-01 00:00:00", u, ts) for u, ts, eid in events]
        df = spark.createDataFrame(rows, "event_id long, base string, user_id long, off long") \
            .select("event_id", "user_id",
                    (F.col("base").cast("timestamp") +
                     F.make_interval(secs=F.col("off"))).alias("ts"))
        out = dedup_keyed_window(df, ["user_id"], "ts", 600,
                                 tiebreak=["event_id"])
        assert sorted(r.event_id for r in out.collect()) == expected


# ---------------------------------------------------------------------------
# codec round-trip properties (no Spark — pure codecs)
# ---------------------------------------------------------------------------

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _img(draw, max_ch=4):
    h = draw(st.integers(1, 12))
    w = draw(st.integers(1, 12))
    ch = draw(st.sampled_from([1, 3, 4][: max_ch]))
    data = draw(st.binary(min_size=h * w * ch, max_size=h * w * ch))
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, ch)


@settings(max_examples=25, deadline=None)
@given(_img(), st.sampled_from([0, 2]))
def test_png_roundtrip_property(arr, ft):
    from pigpen_spark.functions import codecs as C

    assert (C.png_decode(C.png_encode(arr, filter_type=ft)) == arr).all()


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 200), st.integers(1, 2), st.integers(1000, 48000),
       st.binary(min_size=2, max_size=400))
def test_wav_roundtrip_property(frames, chans, rate, raw):
    from pigpen_spark.functions import codecs as C

    need = frames * chans * 2
    buf = (raw * (need // len(raw) + 1))[:need]
    s = np.frombuffer(buf, dtype="<i2").reshape(frames, chans)
    r2, out = C.wav_decode(C.wav_encode(s, rate))
    assert r2 == rate and (out == s).all()


@settings(max_examples=15, deadline=None)
@given(st.integers(1, 8), st.integers(1, 8), st.integers(1, 4),
       st.booleans(), st.binary(min_size=1, max_size=256))
def test_gif_roundtrip_property(h, w, nf, compress, raw):
    from pigpen_spark.functions import codecs as C

    need = h * w * nf
    buf = (raw * (need // len(raw) + 1))[:need]
    px = np.frombuffer(buf, dtype=np.uint8).reshape(nf, h, w)
    data = C.gif_encode(list(px), compress=compress)
    gw, gh, frames = C.gif_decode(data)
    assert (gw, gh, len(frames)) == (w, h, nf)
    for f, d in zip(px, frames):
        assert (d[:, :, 0] == f).all()


@settings(max_examples=15, deadline=None)
@given(st.integers(1, 3), st.integers(1, 3), st.integers(0, 199))
def test_jpeg_block_constant_exact_property(bw, bh, a):
    from pigpen_spark.functions import codecs as C

    blocks = a + np.arange(bw)[None, :] + np.arange(bh)[:, None]
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1).astype(np.uint8)
    dec = C.jpeg_decode(C.jpeg_encode(img))
    assert (dec[:, :, 0] == img).all()


@settings(max_examples=10, deadline=None)
@given(st.integers(2, 20), st.integers(2, 20), st.binary(min_size=4, max_size=64))
def test_jpeg_quant1_within_one_property(h, w, raw):
    from pigpen_spark.functions import codecs as C

    need = h * w
    buf = (raw * (need // len(raw) + 1))[:need]
    img = np.frombuffer(buf, dtype=np.uint8).reshape(h, w)
    dec = C.jpeg_decode(C.jpeg_encode(img))[:, :, 0]
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1


# ---------------------------------------------------------------------------
# continuation-operator differentials
# ---------------------------------------------------------------------------


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(st.lists(st.text(alphabet="abcx", min_size=0, max_size=6),
                min_size=1, max_size=8),
       st.integers(0, 2))
def test_fuzzy_join_matches_bruteforce_property(spark, names, d):
    from pigpen_spark.operators.joins import fuzzy_join

    rows = list(enumerate(names))
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r.id_l, r.id_r, r.dist)
        for r in fuzzy_join(df, df, "id", "name", max_dist=d)
        .filter(F.col("id_l") < F.col("id_r")).collect()
    }
    want = {
        (i1, i2, _lev(n1, n2))
        for i1, n1 in rows for i2, n2 in rows
        if i1 < i2 and _lev(n1, n2) <= d
    }
    assert got == want


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(st.lists(st.lists(st.sampled_from("pqrs"), min_size=0, max_size=8),
                min_size=1, max_size=6),
       st.integers(2, 3))
def test_remove_frequent_spans_matches_model_property(spark, docs, min_docs):
    from collections import Counter

    from pigpen_spark.functions.pipeline import remove_frequent_spans

    texts = [" ".join(d) for d in docs]
    df = spark.createDataFrame(list(enumerate(texts)), "id long, text string")
    got = {r.id: (r.clean_text, r.n_removed)
           for r in remove_frequent_spans(df, "id", "text",
                                          chunk=2, min_docs=min_docs).collect()}

    # pure-Python model: chunk=2 spans, per-doc distinct doc counts, ban,
    # filter each doc's span list
    def chunks(toks):
        return [" ".join(toks[i:i + 2]) for i in range(0, len(toks), 2)]

    freq = Counter()
    for d in docs:
        for c in set(chunks(d)):
            freq[c] += 1
    ban = {c for c, n in freq.items() if n >= min_docs}
    for i, d in enumerate(docs):
        cs = chunks(d)
        kept = [c for c in cs if c not in ban]
        assert got[i] == (" ".join(kept), len(cs) - len(kept)), (i, d)


@pytest.mark.usefixtures("spark")
class TestRound4Properties:
    """Invariants of the round-4 second-pass operators under random
    inputs, each checked against a pure-Python model or an algebraic
    identity."""

    @given(edges=st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(lambda e: e[0] != e[1]),
        min_size=1, max_size=20))
    @settings(**SET_SETTINGS)
    def test_pagerank_matches_python_model(self, spark, edges):
        from pigpen_spark.functions.dedup import pagerank

        df = spark.createDataFrame(list(set(edges)), ["src", "dst"])
        got = {r.node: r["rank"] for r in pagerank(df, iterations=2).collect()}
        # pure-python model of the documented integer contract
        es = sorted(set(edges))
        nodes = sorted({u for e in es for u in e})
        outdeg = Counter(s for s, _ in es)
        base = 10**12 // len(nodes)
        tele = (15 * base) // 100
        rank = {u: base for u in nodes}
        for _ in range(2):
            sums = {u: 0 for u in nodes}
            for s, d in es:
                sums[d] += rank[s] // outdeg[s]
            rank = {u: tele + (85 * sums[u]) // 100 for u in nodes}
        assert got == rank

    @given(xs=st.lists(st.text(alphabet="abcdef", min_size=1, max_size=3),
                       min_size=1, max_size=40))
    @settings(**SET_SETTINGS)
    def test_kmv_duplication_invariant(self, spark, xs):
        """Sketching a multiset twice over == sketching it once (KMV sees
        distinct hashes only), and merge with itself is identity."""
        from pigpen_spark.functions import sketch as K

        df = spark.createDataFrame([(x,) for x in xs], ["x"])
        once = {r.h for r in K.kmv_sketch(df, F.col("x"), 8).collect()}
        twice = {r.h for r in K.kmv_sketch(df.union(df), F.col("x"), 8).collect()}
        assert once == twice
        a = K.kmv_sketch(df, F.col("x"), 8)
        merged = {r.h for r in K.kmv_merge(a, a, 8).collect()}
        assert merged == once

    @given(shared=st.integers(6, 12), seed=st.integers(0, 5))
    @settings(**SET_SETTINGS)
    def test_winnowing_guarantee(self, spark, shared, seed):
        """Schleimer guarantee: a common token run of >= w+n-1 tokens
        (w=4, n=3 => 6) always yields >= 1 shared fingerprint."""
        from pigpen_spark.functions.dedup import winnow_overlap_pairs

        run = " ".join(f"q{seed}w{i}" for i in range(shared))
        a = " ".join(f"a{seed}x{i}" for i in range(20)) + " " + run
        b = run + " " + " ".join(f"b{seed}y{i}" for i in range(20))
        df = spark.createDataFrame([(1, a), (2, b)], ["doc_id", "text"])
        pairs = winnow_overlap_pairs(df, "doc_id", "text",
                                     shingle_n=3, w=4, min_shared=1)
        assert pairs.count() == 1


@pytest.mark.usefixtures("spark")
class TestRound4ContinuationProperties:
    """Python-model differentials for the continuation operators."""

    @given(rows=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50),
                                   st.integers(0, 9)),
                         min_size=1, max_size=25, unique_by=lambda r: (r[0], r[1])))
    @settings(**SET_SETTINGS)
    def test_resample_ffill_matches_model(self, spark, rows):
        from pigpen_spark.operators.windows import resample_ffill

        df = spark.createDataFrame(
            [(i, k, ts, float(v)) for i, (k, ts, v) in enumerate(rows)],
            "event_id long, k long, ts long, v double")
        got = {(r.k, r.bucket_ts_us): r.v for r in resample_ffill(
            df, ["k"], "ts", ["v"], interval_seconds=10,
            tiebreak=["event_id"]).collect()}
        # model: per key, bucket b = ts // 10; latest (ts, event_id) per
        # bucket wins; grid [min_b, max_b] forward-filled
        want = {}
        bykey = {}
        for i, (k, ts, v) in enumerate(rows):
            bykey.setdefault(k, []).append((ts, i, v))
        for k, obs in bykey.items():
            per_bucket = {}
            for ts, i, v in obs:
                b = ts // 10
                if b not in per_bucket or (ts, i) > per_bucket[b][:2]:
                    per_bucket[b] = (ts, i, v)
            lo, hi = min(per_bucket), max(per_bucket)
            cur = None
            for b in range(lo, hi + 1):
                if b in per_bucket:
                    cur = per_bucket[b][2]
                want[(k, b * 10)] = float(cur)
        assert got == want

    @given(rows=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 30),
                                   st.sampled_from("abc")),
                         min_size=2, max_size=20))
    @settings(**SET_SETTINGS)
    def test_transition_matrix_matches_model(self, spark, rows):
        from pigpen_spark.operators.analytics import transition_matrix
        from pyspark.sql import functions as FF

        df = spark.createDataFrame(
            [(i, u, ts, s) for i, (u, ts, s) in enumerate(rows)],
            "event_id long, uid long, tsec long, s string")
        ev = df.select("event_id", "uid",
                       FF.timestamp_seconds(FF.col("tsec")).alias("ts"), "s")
        got = {(r.from_state, r.to_state): r.n for r in transition_matrix(
            ev, "uid", "ts", "s", "event_id").collect()}
        want = Counter()
        byuser = {}
        for i, (u, ts, s) in enumerate(rows):
            byuser.setdefault(u, []).append((ts, i, s))
        for u, evs in byuser.items():
            evs.sort()
            for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
                want[(a, b)] += 1
        assert got == dict(want)

    @given(xs=st.lists(st.tuples(st.integers(0, 5), st.text("xy", min_size=1, max_size=2)),
                       min_size=0, max_size=15))
    @settings(**SET_SETTINGS)
    def test_checksum_permutation_and_merge(self, spark, xs):
        from pigpen_spark.functions.validate import dataset_checksum

        import random

        if not xs:
            return
        perm = xs[:]
        random.Random(42).shuffle(perm)
        a = spark.createDataFrame(xs, ["id", "v"])
        b = spark.createDataFrame(perm, ["id", "v"])
        ca = dataset_checksum(a).collect()[0]
        cb = dataset_checksum(b).collect()[0]
        assert (ca.n_rows, ca.checksum) == (cb.n_rows, cb.checksum)
        half = len(xs) // 2
        if half and half < len(xs):
            c1 = dataset_checksum(
                spark.createDataFrame(xs[:half], ["id", "v"])).collect()[0]
            c2 = dataset_checksum(
                spark.createDataFrame(xs[half:], ["id", "v"])).collect()[0]
            assert int(c1.checksum) + int(c2.checksum) == int(ca.checksum)

    @given(rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 40),
                  st.sampled_from("abcP")),
        min_size=1, max_size=20))
    @settings(**SET_SETTINGS)
    def test_attribution_matches_model(self, spark, rows):
        from pigpen_spark.operators.analytics import attribution
        from pyspark.sql import functions as FF

        # distinct per-user second-offsets keep RANGE peers unambiguous
        seen = set()
        uniq = []
        for u, ts, ch in rows:
            if (u, ts) not in seen:
                seen.add((u, ts))
                uniq.append((u, ts, ch))
        df = spark.createDataFrame(
            [(i, u, ts, ch, ch == "P") for i, (u, ts, ch) in enumerate(uniq)],
            "event_id long, uid long, tsec long, ch string, conv boolean")
        ev = df.select("event_id", "uid",
                       FF.timestamp_seconds(FF.col("tsec")).alias("ts"),
                       "ch", "conv")
        got = {(r.uid, r.conv_ts_us): (r.first_touch, r.last_touch)
               for r in attribution(ev, "uid", "ts", "ch", FF.col("conv"),
                                    lookback_seconds=15,
                                    tiebreak_col="event_id").collect()}
        want = {}
        byuser = {}
        for i, (u, ts, ch) in enumerate(uniq):
            byuser.setdefault(u, []).append((ts, i, ch))
        for u, evs in byuser.items():
            evs.sort()
            for ts, i, ch in evs:
                if ch != "P":
                    continue
                win = [(t, j, c) for t, j, c in evs
                       if c != "P" and ts - 15 <= t < ts]
                first = win[0][2] if win else None
                last = win[-1][2] if win else None
                want[(u, ts * 1_000_000)] = (first, last)
        assert got == want


class TestJoinMultiFullOuterModel:
    """r10: N-ary all-optional join_multi vs the reference model
    (join_test.clj:244-299 semantics — per-key cross products across
    ALL inputs, keys from ANY input, nil keys never match)."""

    kv = st.lists(
        st.tuples(st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
                  st.integers(min_value=0, max_value=9)),
        min_size=0, max_size=6)

    @staticmethod
    def _rel(spark, rows, kcol, vcol):
        if not rows:
            return return_(spark, [], f"{kcol} long, {vcol} long")
        return return_(spark, [(k, int(v)) for k, v in rows],
                       f"{kcol} long, {vcol} long")

    @staticmethod
    def _model(a, b, c):
        out = Counter()
        keys = {k for k, _ in a + b + c if k is not None}
        for k in keys:
            xs = [v for kk, v in a if kk == k] or [None]
            ys = [v for kk, v in b if kk == k] or [None]
            zs = [v for kk, v in c if kk == k] or [None]
            for x in xs:
                for y in ys:
                    for z in zs:
                        out[(x, y, z)] += 1
        for kk, v in a:
            if kk is None:
                out[(v, None, None)] += 1
        for kk, v in b:
            if kk is None:
                out[(None, v, None)] += 1
        for kk, v in c:
            if kk is None:
                out[(None, None, v)] += 1
        return out

    @given(a=kv, b=kv, c=kv)
    @settings(**SET_SETTINGS)
    def test_matches_model(self, spark, a, b, c):
        ra = self._rel(spark, a, "ka", "va")
        rb = self._rel(spark, b, "kb", "vb")
        rc = self._rel(spark, c, "kc", "vc")
        out = ra.join_multi(
            [(rb, F.col("kb")), (rc, F.col("kc"))],
            on=F.col("ka"), required=[False, False, False])
        got = Counter((r["va"], r["vb"], r["vc"]) for r in out.df.collect())
        assert got == self._model(a, b, c)
