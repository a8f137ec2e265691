"""Query catalog — the driver-facing correctness contract.

Each entry exercises one operator family from SURVEY.md §2 through the
:class:`pigpen_spark.relation.Relation` API and pairs it with an ANSI-SQL
oracle that DuckDB runs over the same parquet tables.  Column names are
aliased identically on both sides (the driver's compare hashes values after
sorting columns by name).

Determinism rules used throughout:
- floating aggregates are ``round()``-ed (2dp for sums, 4dp for avgs) so
  summation-order noise between engines can't flip the value hash;
- every LIMIT/top-k is totally ordered with an explicit unique tie-break;
- timestamps leave the result as epoch seconds (bigint) to sidestep
  timestamp-representation differences;
- bags are emitted as sorted comma-joined strings, not arrays.
"""

from __future__ import annotations

import os
import weakref
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pigpen_spark import fold
from pigpen_spark.operators.windows import ranked, sessionize, top_n_per_group
from pigpen_spark.relation import Relation

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: Per-session memo of resolved parquet readers for the STATIC catalog
#: tables, keyed by (path, mtime_ns).  ``spark.read.parquet`` re-lists the
#: path and re-reads footers for schema inference on EVERY call — a
#: driver-side metadata job costing ~200 ms here (and minutes against
#: object stores at 100 TB; manifest-keeping table formats exist for
#: exactly this reason — guide §6).  A DataFrame is an immutable plan, so
#: reusing the resolved reader is pure metadata caching: every action
#: still scans the parquet data afresh.  The mtime key invalidates on any
#: rewrite; streaming/index artifact paths do NOT go through this memo
#: (they re-read their freshly written files each batch by design).
_READER_MEMO: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def _parquet_mtime_ns(path: str) -> int:
    """Invalidation key for a parquet path: for a directory of part
    files, the directory's own mtime only changes when entries are
    added/removed — an in-place part-file rewrite would be invisible —
    so take the max over the directory's entries as well.  Raises
    OSError for a missing path (the caller must NOT memoize a miss:
    a path that appears later has to be re-resolved)."""
    st = os.stat(path)
    mt = st.st_mtime_ns
    if os.path.isdir(path):
        with os.scandir(path) as it:
            for e in it:
                try:
                    mt = max(mt, e.stat().st_mtime_ns)
                except OSError:
                    continue
    return mt


def _cached_parquet(spark: SparkSession, path: str) -> DataFrame:
    try:
        mt = _parquet_mtime_ns(path)
    except OSError:
        # do not cache the miss: let the read fail (or succeed) afresh
        return spark.read.parquet(path)
    per_session = _READER_MEMO.setdefault(spark, {})
    df = per_session.get((path, mt))
    if df is None:
        df = spark.read.parquet(path)
        per_session[(path, mt)] = df
    return df


class _LazyTables:
    """Load tables on demand — a query touching 2 tables must not pay (or
    fail on) footer reads of the other 8."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self._spark = spark
        self._sf_dir = sf_dir

    def __getitem__(self, name: str) -> Relation:
        if name == "events":
            return load_events(self._spark, self._sf_dir)
        return Relation(_cached_parquet(
            self._spark, f"{self._sf_dir}/{name}.parquet"))


def tables(spark: SparkSession, sf_dir: str) -> _LazyTables:
    return _LazyTables(spark, sf_dir)


def load_events(spark: SparkSession, sf_dir: str) -> Relation:
    """events.parquet stores ``ts`` as parquet TIMESTAMP(NANOS), which
    Spark's reader rejects by default; read nanos as long (runtime-settable
    legacy conf) and convert to a microsecond TimestampType column.

    Sessions from :func:`pigpen_spark.session.get_spark` already carry the
    conf (DEFAULT_CONF); for vanilla sessions (the driver's) it is set
    here, conditionally, so a tuned session is never mutated at query
    time."""
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = _cached_parquet(spark, f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") in ("bigint", "long"):
        # integer floor-division, not float /: current-era nanos (~1.7e18)
        # exceed a double's 53-bit mantissa (float div shifts ~12% of
        # timestamps by 1µs), and DIV truncates toward zero which would
        # round pre-epoch values the wrong way — subtract pmod first.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("(ts - pmod(ts, 1000)) DIV 1000")))
    return Relation(df)


# Registry: name -> (query_fn, oracle_sql | None)
_REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def register(name: str, sql: str | None):
    def deco(fn):
        if name in _REGISTRY:  # last-wins would silently shadow a query
            raise ValueError(f"duplicate catalog query name: {name}")
        _REGISTRY[name] = (fn, sql)
        return fn
    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}


# ---------------------------------------------------------------------------
# group-by + fold (SURVEY §2.3-2.4) — the flagship TPC-H-Q1 shape
# ---------------------------------------------------------------------------


@register(
    "q1_groupby_fold",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                         AS sum_qty,
           round(sum(l_extendedprice), 2)                    AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4)                         AS avg_qty,
           round(avg(l_extendedprice), 4)                    AS avg_price,
           count(*)                                          AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_groupby_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """load → filter → group_by → juxt of folds (fold.clj sum/avg/count).
    One shuffle; partial aggregation map-side (HashAggregate)."""
    li = tables(spark, sf_dir)["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .group_by("l_returnflag", "l_linestatus")
        .fold(
            fold.sum_("l_quantity").post(lambda c: F.round(c, 2)).alias("sum_qty"),
            fold.sum_("l_extendedprice").post(lambda c: F.round(c, 2)).alias("sum_base_price"),
            fold.Fold(F.sum(disc_price)).post(lambda c: F.round(c, 2)).alias("sum_disc_price"),
            fold.avg("l_quantity").post(lambda c: F.round(c, 4)).alias("avg_qty"),
            fold.avg("l_extendedprice").post(lambda c: F.round(c, 4)).alias("avg_price"),
            fold.count().alias("count_order"),
        )
        .df
    )


@register(
    "q6_filter_reduce",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    HAVING count(*) > 0
    """,
)
def q6_filter_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pushed-down filter + whole-relation reduce (empty→empty semantics,
    join.clj:262-268 — HAVING count(*)>0 mirrors our existence guard)."""
    li = tables(spark, sf_dir)["lineitem"]
    return (
        li.filter(F.col("l_discount").between(0.05, 0.07) & (F.col("l_quantity") < 24))
        .reduce_rel(revenue=fold.Fold(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)))
        .df
    )


@register(
    "q_reduce_empty",
    """
    SELECT sum(l_quantity) AS s
    FROM lineitem
    WHERE l_quantity < 0
    HAVING count(*) > 0
    """,
)
def q_reduce_empty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empty input → EMPTY output (not one null row) — the reference's
    reduce/fold contract (join.clj:262-268, local.clj:361-364)."""
    li = tables(spark, sf_dir)["lineitem"]
    return li.filter(F.col("l_quantity") < 0).reduce_rel(s=fold.sum_("l_quantity")).df


@register(
    "q_group_collect",
    """
    SELECT l_returnflag,
           string_agg(l_linestatus, ',' ORDER BY l_linestatus) AS statuses,
           count(*) AS n
    FROM (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem)
    GROUP BY l_returnflag
    """,
)
def q_group_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """group-by → bag (join.clj:195-223), bag emitted as sorted string."""
    li = tables(spark, sf_dir)["lineitem"]
    return (
        li.map("l_returnflag", "l_linestatus")
        .distinct()
        .group_by("l_returnflag")
        .fold(
            statuses=fold.vec("l_linestatus", sort=True).post(lambda c: F.array_join(c, ",")),
            n=fold.count(),
        )
        .df
    )


@register(
    "q_minmax_fold",
    """
    SELECT o_orderpriority,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price,
           count(DISTINCT o_custkey)   AS n_cust
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_minmax_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fold/min, fold/max (fold.clj:411-495) + count-distinct."""
    o = tables(spark, sf_dir)["orders"]
    return (
        o.group_by("o_orderpriority")
        .fold(
            min_price=fold.min_("o_totalprice").post(lambda c: F.round(c, 2)),
            max_price=fold.max_("o_totalprice").post(lambda c: F.round(c, 2)),
            n_cust=fold.count_distinct("o_custkey"),
        )
        .df
    )


@register(
    "q_minmax_comparator",
    """
    SELECT o_orderpriority,
           min({'k': abs(o_totalprice - 150000.0), 'v': o_totalprice}).v AS closest_price,
           max({'k': abs(o_totalprice - 150000.0), 'v': o_totalprice}).v AS farthest_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_minmax_comparator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fold/min-max with a CUSTOM comparator (fold.clj:411-495: arbitrary
    compare fn) — comparator "distance from 150 000" via the struct-
    ordering trick; one native aggregate, map-side partials intact."""
    o = tables(spark, sf_dir)["orders"]
    dist = F.abs(F.col("o_totalprice") - 150000.0)
    return (
        o.group_by("o_orderpriority")
        .fold(
            closest_price=fold.min_with("o_totalprice", dist),
            farthest_price=fold.max_with("o_totalprice", dist),
        )
        .df
    )


# ---------------------------------------------------------------------------
# per-record transforms (SURVEY §2.2)
# ---------------------------------------------------------------------------


@register(
    "q_map_project",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           l_returnflag || '/' || l_linestatus AS flag
    FROM lineitem WHERE l_quantity >= 45
    """,
)
def q_map_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed map (map.clj:31-77) — pure Catalyst projection, column-pruned
    down to the 7 referenced columns at the parquet scan.  ``charge`` is
    deliberately NOT rounded: a single arithmetic expression over the same
    inputs is IEEE-deterministic in both engines, while round() at a
    half-way boundary is not."""
    li = tables(spark, sf_dir)["lineitem"]
    return (
        li.filter(F.col("l_quantity") >= 45)
        .map(
            "l_orderkey",
            "l_linenumber",
            charge=F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")),
            flag=F.concat_ws("/", "l_returnflag", "l_linestatus"),
        )
        .df
    )


@register(
    "q_mapcat_tokens",
    """
    SELECT token, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    WHERE token <> ''
    GROUP BY token
    """,
)
def q_mapcat_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapcat (map.clj:79-111) as explode — 1→N lateral view then fold."""
    docs = tables(spark, sf_dir)["documents"]
    return (
        docs.mapcat(F.split(F.col("text"), " "), alias="token")
        .filter(F.col("token") != "")
        .group_by("token")
        .fold(n=fold.count())
        .df
    )


@register(
    "q_rank",
    """
    SELECT o_orderkey, index FROM (
      SELECT o_orderkey,
             row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) - 1 AS index
      FROM orders
    ) WHERE index < 100
    """,
)
def q_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / map-indexed (raw.clj:357-371; map.clj:113-162): 0-based dense
    index over a total order.

    index<100 ≡ rank of the top-100: sort+limit compiles to TakeOrdered
    (per-partition heaps, no total sort), then ranking 100 rows in one
    tiny partition is free — the scale-safe plan for rank-then-head.
    Full-relation ranks use the two-phase ranked(scale_safe=True)."""
    o = tables(spark, sf_dir)["orders"]
    top = o.sort(F.col("o_totalprice").desc(), "o_orderkey").take(100)
    out = ranked(top.df, [F.col("o_totalprice").desc(), F.col("o_orderkey")],
                 index_col="index", scale_safe=False)
    return out.select("o_orderkey", "index")


@register(
    "q_sort_take",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS price
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def q_sort_take(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sort + take → TopK (Spark compiles orderBy.limit into TakeOrdered —
    no total sort materialized; reference: map.clj:164-250 + filter.clj:82-95)."""
    o = tables(spark, sf_dir)["orders"]
    return (
        o.sort(F.col("o_totalprice").desc(), "o_orderkey")
        .take(10)
        .map("o_orderkey", price=F.round("o_totalprice", 2))
        .df
    )


# ---------------------------------------------------------------------------
# joins (SURVEY §2.3)
# ---------------------------------------------------------------------------


@register(
    "q3_join_agg",
    """
    SELECT c_mktsegment,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c_mktsegment
    """,
)
def q3_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join on differing key names (join.clj:166-193), customer
    side broadcast (small dim)."""
    t = tables(spark, sf_dir)
    return (
        t["orders"]
        .join(t["customer"], on="o_custkey", right_on="c_custkey", broadcast_other=True)
        .group_by("c_mktsegment")
        .fold(n_orders=fold.count(), revenue=fold.sum_("o_totalprice").post(lambda c: F.round(c, 2)))
        .df
    )


@register(
    "q5_multi_join",
    """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q5_multi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: N-way join chain.  Join order: fact-fact
    (lineitem⋈orders) shuffles once; every dimension side is broadcast —
    at 100 TB only the lineitem⋈orders exchange scales with data."""
    t = tables(spark, sf_dir)
    region = t["region"].filter(F.col("r_name") == "ASIA")
    nation = t["nation"].join(region, on="n_regionkey", right_on="r_regionkey", broadcast_other=True)
    supplier = t["supplier"].join(nation, on="s_nationkey", right_on="n_nationkey", broadcast_other=True)
    return (
        t["lineitem"]
        .join(t["orders"], on="l_orderkey", right_on="o_orderkey")
        .join(supplier, on="l_suppkey", right_on="s_suppkey", broadcast_other=True)
        .join(t["customer"], on="o_custkey", right_on="c_custkey", broadcast_other=True)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .group_by("n_name")
        .fold(revenue=fold.Fold(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)))
        .df
    )


def prepare_bucketed_facts(spark: SparkSession, sf_dir: str, num_buckets: int = 32) -> tuple[str, str]:
    """Write-once bucketed fact tables for the exchange-free q5 variant:
    lineitem and orders bucketed (and sorted) by orderkey via
    ``store_bucketed`` — the 100 TB co-location strategy where the one
    scaling shuffle of q5 is paid once at ingest instead of per query.
    Pre-repartitioning on the bucket key gives one file per bucket, so the
    sorted-bucket metadata also elides the join sort.  Idempotent per
    session+SF (skips when both tables are already registered)."""
    import hashlib as _hashlib
    import re as _re

    # tag on basename + full-path digest: two datasets whose directories
    # share a basename (e.g. /data/a/sf1 and /data/b/sf1) must NOT reuse
    # each other's bucketed tables
    base = _re.sub(r"[^0-9a-zA-Z]+", "_", sf_dir.strip("/").rsplit("/", 1)[-1])
    digest = _hashlib.md5(sf_dir.rstrip("/").encode()).hexdigest()[:8]
    tag = f"{base}_{digest}"
    li_name, od_name = f"pp_lineitem_bkt_{tag}", f"pp_orders_bkt_{tag}"
    if not (spark.catalog.tableExists(li_name) and spark.catalog.tableExists(od_name)):
        # a fresh session's in-memory catalog doesn't know about managed-
        # table locations a previous process left in the warehouse dir —
        # clear both the (possibly unregistered) table and its location
        import os as _os
        import shutil as _shutil
        from urllib.parse import urlparse as _urlparse

        wh = _urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        for name in (li_name, od_name):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            _shutil.rmtree(_os.path.join(wh, name.lower()), ignore_errors=True)
        t = tables(spark, sf_dir)
        li = t["lineitem"]
        li._with(li.df.repartition(num_buckets, "l_orderkey")).store_bucketed(
            li_name, ["l_orderkey"], num_buckets, sort_by=["l_orderkey"]
        )
        od = t["orders"]
        od._with(od.df.repartition(num_buckets, "o_orderkey")).store_bucketed(
            od_name, ["o_orderkey"], num_buckets, sort_by=["o_orderkey"]
        )
    return li_name, od_name


@register(
    "q5_multi_join_bucketed",
    """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q5_multi_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q5 with its ONE scaling exchange removed: the fact tables are
    pre-bucketed by orderkey (:func:`prepare_bucketed_facts`), so the
    lineitem⋈orders join reads co-located buckets with NO shuffle — only
    the tiny post-partial-agg exchange remains.  Same oracle as q5;
    test_relation_extra pins the exchange-free plan."""
    li_name, od_name = prepare_bucketed_facts(spark, sf_dir)
    t = tables(spark, sf_dir)
    li = Relation(spark.table(li_name))
    od = Relation(spark.table(od_name))
    region = t["region"].filter(F.col("r_name") == "ASIA")
    nation = t["nation"].join(region, on="n_regionkey", right_on="r_regionkey", broadcast_other=True)
    supplier = t["supplier"].join(nation, on="s_nationkey", right_on="n_nationkey", broadcast_other=True)
    return (
        li.join(od, on="l_orderkey", right_on="o_orderkey")
        .join(supplier, on="l_suppkey", right_on="s_suppkey", broadcast_other=True)
        .join(t["customer"], on="o_custkey", right_on="c_custkey", broadcast_other=True)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .group_by("n_name")
        .fold(revenue=fold.Fold(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)))
        .df
    )


@register(
    "q_join_left",
    """
    SELECT c.c_custkey,
           count(o.o_orderkey) AS n_orders,
           round(coalesce(sum(o.o_totalprice), 0), 2) AS spend
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'F'
    GROUP BY c.c_custkey
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT outer = [:required :optional] input tags (script.clj:321-336);
    unmatched side padded with NULLs."""
    t = tables(spark, sf_dir)
    fo = t["orders"].filter(F.col("o_orderstatus") == "F")
    return (
        t["customer"]
        .join(fo, on="c_custkey", right_on="o_custkey", how="left")
        .group_by("c_custkey")
        .fold(
            n_orders=fold.count("o_orderkey"),
            spend=fold.sum_("o_totalprice").post(lambda c: F.round(F.coalesce(c, F.lit(0.0)), 2)),
        )
        .df
    )


@register(
    "q_join_nulls_std",
    """
    SELECT l.c_custkey, r.s_suppkey
    FROM (SELECT c_custkey, CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE c_custkey % 25 END AS k FROM customer) l
    JOIN (SELECT s_suppkey, CASE WHEN s_suppkey % 10 = 0 THEN NULL ELSE s_suppkey % 25 END AS k FROM supplier) r
      ON l.k = r.k
    """,
)
def q_join_nulls_std(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed (key-fn) join with NULL keys, default semantics: nil keys
    NEVER match (join.clj:31-45; FIXTURES kv_nullable)."""
    t = tables(spark, sf_dir)
    nullify = lambda c, m: F.when(F.col(c) % 10 == 0, F.lit(None)).otherwise(F.col(c) % m)  # noqa: E731
    left = t["customer"].map("c_custkey", k=nullify("c_custkey", 25))
    right = t["supplier"].map("s_suppkey", k=nullify("s_suppkey", 25))
    return (
        left.join(right, on="k", right_on="k", join_nils=False)
        .map("c_custkey", "s_suppkey")
        .df
    )


@register(
    "q_join_nils",
    """
    SELECT l.c_custkey, r.s_suppkey
    FROM (SELECT c_custkey, CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE c_custkey % 25 END AS k FROM customer) l
    JOIN (SELECT s_suppkey, CASE WHEN s_suppkey % 10 = 0 THEN NULL ELSE s_suppkey % 25 END AS k FROM supplier) r
      ON l.k IS NOT DISTINCT FROM r.k
    """,
)
def q_join_nils(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{:join-nils true} (join.clj:31-45) → null-safe equality `<=>`:
    NULL keys DO match each other."""
    t = tables(spark, sf_dir)
    nullify = lambda c, m: F.when(F.col(c) % 10 == 0, F.lit(None)).otherwise(F.col(c) % m)  # noqa: E731
    left = t["customer"].map("c_custkey", k=nullify("c_custkey", 25))
    right = t["supplier"].map("s_suppkey", k=nullify("s_suppkey", 25))
    return (
        left.join(right, on="k", right_on="k", join_nils=True)
        .map("c_custkey", "s_suppkey")
        .df
    )


@register(
    "q_full_outer",
    """
    SELECT l.k AS lk, r.k AS rk, l.c_custkey, r.s_suppkey
    FROM (SELECT c_custkey, c_custkey % 7 AS k FROM customer WHERE c_custkey < 50) l
    FULL OUTER JOIN (SELECT s_suppkey, s_suppkey % 13 AS k FROM supplier) r
      ON l.k = r.k
    """,
)
def q_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL outer = [:optional :optional] (script.clj:321-336)."""
    t = tables(spark, sf_dir)
    left = t["customer"].filter(F.col("c_custkey") < 50).map("c_custkey", lk=F.col("c_custkey") % 7)
    right = t["supplier"].map("s_suppkey", rk=F.col("s_suppkey") % 13)
    return (
        left.join(right, on="lk", right_on="rk", how="full")
        .map("lk", "rk", "c_custkey", "s_suppkey")
        .df
    )


@register(
    "q_semi_filter_by",
    """
    SELECT c.* FROM customer c
    JOIN (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'P') k
      ON c.c_custkey = k.o_custkey
    """,
)
def q_semi_filter_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filter-by with deduped keys == classic semi-join (join.clj:403-441)."""
    t = tables(spark, sf_dir)
    keys = t["orders"].filter(F.col("o_orderstatus") == "P").map("o_custkey").distinct()
    return t["customer"].filter_by("c_custkey", keys).df


@register(
    "q_filter_by_dups",
    """
    SELECT c.* FROM customer c
    JOIN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P' AND o_totalprice > 400000) k
      ON c.c_custkey = k.o_custkey
    """,
)
def q_filter_by_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filter-by KEEPS duplicate multiplicities from the keys relation —
    the reference's exact (and surprising) semantics
    (functional/join_test.clj:655-668): each duplicate key duplicates rows.
    This is why it's an inner join, not left_semi (SURVEY §7.3.5)."""
    t = tables(spark, sf_dir)
    keys = t["orders"].filter((F.col("o_orderstatus") == "P") & (F.col("o_totalprice") > 400000)).map("o_custkey")
    return t["customer"].filter_by("c_custkey", keys).df


@register(
    "q_anti_remove_by",
    """
    SELECT c.* FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P'
    )
    """,
)
def q_anti_remove_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """remove-by = anti-join (join.clj:443-483)."""
    t = tables(spark, sf_dir)
    keys = t["orders"].filter(F.col("o_orderstatus") == "P").map("o_custkey")
    return t["customer"].remove_by("c_custkey", keys).df


@register(
    "q_cogroup",
    """
    SELECT coalesce(c.k, o.k) AS key,
           coalesce(c.n, 0) AS n_cust,
           coalesce(o.n, 0) AS n_orders
    FROM (SELECT c_nationkey AS k, count(*) AS n FROM customer GROUP BY 1) c
    FULL OUTER JOIN (SELECT o_custkey % 40 AS k, count(*) AS n FROM orders GROUP BY 1) o
      ON c.k IS NOT DISTINCT FROM o.k
    """,
)
def q_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cogroup (join.clj:82-117): key → one bag per input, empty bag → NULL
    ([:optional :optional] here).  Emitted as bag sizes for the oracle."""
    t = tables(spark, sf_dir)
    cust = t["customer"]
    orders = t["orders"]
    cg = cust.cogroup(
        [(orders, F.col("o_custkey") % 40)],
        on=F.col("c_nationkey").cast("bigint"),
        required=[False, False],
    )
    return cg.map(
        key=F.col("key"),
        n_cust=F.coalesce(F.size("bag_0"), F.lit(0)).cast("long"),
        n_orders=F.coalesce(F.size("bag_1"), F.lit(0)).cast("long"),
    ).df


# ---------------------------------------------------------------------------
# set operations (SURVEY §2.6) — multiset semantics per set_test.clj:25-122
# ---------------------------------------------------------------------------

_MS1 = "SELECT (p_size % 12)::BIGINT AS x FROM part WHERE p_partkey % 3 = 0"
_MS2 = "SELECT (s_suppkey % 8)::BIGINT AS x FROM supplier"


def _ms_rels(spark: SparkSession, sf_dir: str) -> tuple[Relation, Relation]:
    t = tables(spark, sf_dir)
    ms1 = t["part"].filter(F.col("p_partkey") % 3 == 0).map(x=(F.col("p_size") % 12).cast("bigint"))
    ms2 = t["supplier"].map(x=(F.col("s_suppkey") % 8).cast("bigint"))
    return ms1, ms2


@register("q_concat", f"SELECT * FROM ({_MS1}) UNION ALL SELECT * FROM ({_MS2})")
def q_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat / union-multiset = UNION ALL (set.clj:155-197)."""
    ms1, ms2 = _ms_rels(spark, sf_dir)
    return ms1.concat(ms2).df


@register("q_union_distinct", f"SELECT * FROM ({_MS1}) UNION SELECT * FROM ({_MS2})")
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union = distinct union (set.clj:127-153)."""
    ms1, ms2 = _ms_rels(spark, sf_dir)
    return ms1.union(ms2).df


@register("q_distinct", "SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders")
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """distinct (set.clj:104-125)."""
    return tables(spark, sf_dir)["orders"].map("o_orderpriority", "o_orderstatus").distinct().df


@register("q_intersection", f"SELECT * FROM ({_MS1}) INTERSECT SELECT * FROM ({_MS2})")
def q_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersection — distinct ∩ (set.clj:199-221)."""
    ms1, ms2 = _ms_rels(spark, sf_dir)
    return ms1.intersection(ms2).df


@register("q_intersection_multiset", f"SELECT * FROM ({_MS1}) INTERSECT ALL SELECT * FROM ({_MS2})")
def q_intersection_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersection-multiset — min multiplicity (set.clj:223-245)."""
    ms1, ms2 = _ms_rels(spark, sf_dir)
    return ms1.intersection_multiset(ms2).df


@register("q_difference", f"SELECT * FROM ({_MS1}) EXCEPT SELECT * FROM ({_MS2})")
def q_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """difference — distinct − (set.clj:247-269)."""
    ms1, ms2 = _ms_rels(spark, sf_dir)
    return ms1.difference(ms2).df


@register("q_difference_multiset", f"SELECT * FROM ({_MS1}) EXCEPT ALL SELECT * FROM ({_MS2})")
def q_difference_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """difference-multiset — multiplicity-subtracting − (set.clj:271-293)."""
    ms1, ms2 = _ms_rels(spark, sf_dir)
    return ms1.difference_multiset(ms2).df


# ---------------------------------------------------------------------------
# windows / events (extension surface, SURVEY §2.5 note)
# ---------------------------------------------------------------------------


@register(
    "q_events_window",
    """
    SELECT epoch(date_trunc('hour', ts))::BIGINT AS hour_epoch,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS total
    FROM events GROUP BY 1, 2
    """,
)
def q_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h event-time window aggregation (batch form of the
    streaming window op)."""
    e = tables(spark, sf_dir)["events"]
    return (
        e.group_by(
            hour_epoch=F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).cast("long"),
            event_type=F.col("event_type"),
        )
        .fold(n=fold.count(), total=fold.sum_("value").post(lambda c: F.round(c, 2)))
        .df
    )


@register(
    "q_sessionize",
    """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                       OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    )
    SELECT user_id, sum(new_sess)::BIGINT AS n_sessions, count(*) AS n_events
    FROM flagged GROUP BY user_id
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) — lag/cumsum window formulation;
    one shuffle on user_id."""
    e = tables(spark, sf_dir)["events"]
    sess = sessionize(e.df, "user_id", "ts", gap_seconds=1800)
    return (
        sess.groupBy("user_id")
        .agg(
            F.count_distinct("session_id").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "q_top_per_group",
    """
    SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS price
    FROM (
      SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def q_top_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-n — the scale-path form of fold/top-by
    (fold.clj:397-409): window row_number, no bag materialization."""
    o = tables(spark, sf_dir)["orders"]
    out = top_n_per_group(o.df, ["o_orderpriority"], [F.col("o_totalprice").desc(), "o_orderkey"], 3)
    return out.select("o_orderpriority", "o_orderkey", F.round("o_totalprice", 2).alias("price"))


@register(
    "q_rollup",
    """
    SELECT r_name, n_name, count(*) AS n_cust
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup — extension beyond the reference (SURVEY §2.4:
    no grouping sets there); nation/region broadcast."""
    t = tables(spark, sf_dir)
    joined = (
        t["customer"]
        .join(t["nation"], on="c_nationkey", right_on="n_nationkey", broadcast_other=True)
        .join(t["region"], on="n_regionkey", right_on="r_regionkey", broadcast_other=True)
    )
    return joined.rollup("r_name", "n_name").fold(n_cust=fold.count()).df


@register(
    "q_cogroup_fold",
    """
    SELECT coalesce(c.k, o.k) AS key,
           c.n AS n_cust,
           round(o.total, 2) AS order_total
    FROM (SELECT c_nationkey::BIGINT AS k, count(*) AS n FROM customer GROUP BY 1) c
    FULL OUTER JOIN (SELECT o_custkey % 40 AS k, sum(o_totalprice) AS total FROM orders GROUP BY 1) o
      ON c.k IS NOT DISTINCT FROM o.k
    """,
)
def q_cogroup_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cogroup with per-input :fold aggregation (join.clj:82-117;
    fold-in-cogroup, join_test.clj:361-419): the fold replaces the bag and
    runs with map-side partials — never materializing per-key bags."""
    t = tables(spark, sf_dir)
    cg = t["customer"].cogroup(
        [(t["orders"], F.col("o_custkey") % 40)],
        on=F.col("c_nationkey").cast("bigint"),
        required=[False, False],
        folds={0: fold.count(), 1: fold.sum_("o_totalprice")},
    )
    return cg.map(
        key=F.col("key"),
        n_cust=F.col("bag_0"),
        order_total=F.round(F.col("bag_1"), 2),
    ).df


@register(
    "q_into",
    """
    SELECT string_agg(r_name, ',' ORDER BY r_name) AS value
    FROM region HAVING count(*) > 0
    """,
)
def q_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """into — whole-relation collect into one record (join.clj:225-244);
    emitted as a sorted joined string for the oracle."""
    r = tables(spark, sf_dir)["region"]
    return (
        r.map("r_name")
        .into(F.col("r_name"))
        .map(value=F.array_join(F.col("value"), ","))
        .df
    )


@register(
    "q_map_py",
    """
    SELECT l_orderkey, l_linenumber,
           l_quantity * 2 + 1 AS qty2,
           CASE WHEN l_discount > 0.05 THEN 'hi' ELSE 'lo' END AS disc_band
    FROM lineitem WHERE l_partkey % 50 = 0
    """,
)
def q_map_py(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OPAQUE python path (map->bind + filter->bind fused into one
    mapInPandas, runtime.clj:32-86 + oven.clj:189-248) — the python fns are
    deterministic arithmetic so the SQL oracle can replicate them."""
    li = tables(spark, sf_dir)["lineitem"]
    rel = Relation(li.df.select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_discount"))
    out = (
        rel.filter_py(lambda r: r["l_partkey"] % 50 == 0)
        .map_py(
            lambda r: {
                "l_orderkey": r["l_orderkey"],
                "l_linenumber": r["l_linenumber"],
                "qty2": r["l_quantity"] * 2 + 1,
                "disc_band": "hi" if r["l_discount"] > 0.05 else "lo",
            },
            schema="l_orderkey long, l_linenumber int, qty2 double, disc_band string",
        )
    )
    return out.df


@register(
    "q_cogroup3",
    """
    SELECT coalesce(c.k, o.k, s.k) AS key,
           coalesce(c.n, 0) AS n_cust, coalesce(o.n, 0) AS n_orders, coalesce(s.n, 0) AS n_supp
    FROM      (SELECT c_nationkey::BIGINT AS k, count(*) AS n FROM customer GROUP BY 1) c
    FULL JOIN (SELECT o_custkey % 30 AS k, count(*) AS n FROM orders GROUP BY 1) o ON c.k IS NOT DISTINCT FROM o.k
    FULL JOIN (SELECT s_nationkey::BIGINT AS k, count(*) AS n FROM supplier GROUP BY 1) s ON coalesce(c.k, o.k) IS NOT DISTINCT FROM s.k
    """,
)
def q_cogroup3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way N-ary cogroup (group$ is N-ary in the IR, raw.clj:489-524) —
    bag sizes per input, all-optional (full outer)."""
    t = tables(spark, sf_dir)
    cg = t["customer"].cogroup(
        [(t["orders"], F.col("o_custkey") % 30), (t["supplier"], F.col("s_nationkey").cast("bigint"))],
        on=F.col("c_nationkey").cast("bigint"),
        required=[False, False, False],
    )
    return cg.map(
        key=F.col("key"),
        n_cust=F.coalesce(F.size("bag_0"), F.lit(0)).cast("long"),
        n_orders=F.coalesce(F.size("bag_1"), F.lit(0)).cast("long"),
        n_supp=F.coalesce(F.size("bag_2"), F.lit(0)).cast("long"),
    ).df


@register(
    "q_join_multi",
    """
    SELECT n_name, count(*) AS n
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY n_name
    """,
)
def q_join_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-ary join in ONE call with per-input required tags (the reference's
    join signature, join.clj:360-401) — compiled to a left-deep chain."""
    t = tables(spark, sf_dir)
    nation = t["nation"].join(t["region"], on="n_regionkey", right_on="r_regionkey", broadcast_other=True)
    joined = t["supplier"].join_multi(
        [(nation, F.col("n_nationkey"))], on=F.col("s_nationkey"), required=[True, True]
    )
    return joined.group_by("n_name").fold(n=fold.count()).df


@register(
    "q_join_multi_full",
    """
    WITH a AS (SELECT nullif(c_nationkey, 5)::BIGINT AS k, count(*) AS n_cust
               FROM customer WHERE c_nationkey < 12 GROUP BY 1),
         b AS (SELECT nullif(s_nationkey, 9)::BIGINT AS k, count(*) AS n_supp
               FROM supplier WHERE s_nationkey BETWEEN 8 AND 18 GROUP BY 1),
         c AS (SELECT n_nationkey::BIGINT AS k, n_name FROM nation WHERE n_nationkey >= 15)
    SELECT coalesce(a.k, b.k, c.k) AS key, a.n_cust, b.n_supp, c.n_name
    FROM a FULL JOIN b ON a.k = b.k
           FULL JOIN c ON coalesce(a.k, b.k) = c.k
    """,
)
def q_join_multi_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-ary ALL-OPTIONAL join_multi — the N-way full-outer flatten
    (reference raw.clj:489-566, script.clj:321-336; was the last §2
    NotImplementedError, closed r10).  Three inputs with NULLABLE keys
    (nullif-injected) and staggered key ranges: only-in-a, a+b, only-b,
    b+c, only-c keys are all live, plus one NULL-key row per side
    exercising nil-keys-never-match."""
    t = tables(spark, sf_dir)
    a = (
        t["customer"].filter(F.col("c_nationkey") < 12)
        .group_by(k=F.nullif(F.col("c_nationkey").cast("bigint"), F.lit(5)))
        .fold(n_cust=fold.count())
    )
    b = (
        t["supplier"].filter(F.col("s_nationkey").between(8, 18))
        .group_by(k=F.nullif(F.col("s_nationkey").cast("bigint"), F.lit(9)))
        .fold(n_supp=fold.count())
    )
    c = (
        t["nation"].filter(F.col("n_nationkey") >= 15)
        .map(k=F.col("n_nationkey").cast("bigint"), n_name=F.col("n_name"))
    )
    out = a.join_multi([(b, "k"), (c, "k")], on="k", required=[False, False, False])
    return out.map(
        key=F.col("k"), n_cust=F.col("n_cust"), n_supp=F.col("n_supp"),
        n_name=F.col("n_name"),
    ).df


@register(
    "q_asof_join",
    """
    WITH r AS (
      SELECT user_id, date_trunc('second', ts) AS s,
             arg_max(event_id, event_id) AS pid,
             arg_max(value, event_id) AS pval
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ),
    l AS (
      SELECT event_id, user_id, date_trunc('second', ts) AS s
      FROM events WHERE event_type = 'click'
    )
    SELECT l.event_id, l.user_id, r.pid, r.pval
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.s >= r.s
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (extension — absent from the reference, SURVEY §2.3):
    for each click, the latest purchase by the same user at-or-before it.
    Union+window formulation — one shuffle on the key, no range blowup.
    Timestamps truncated to seconds on both sides (the events table is
    nanosecond-precision, which the two engines truncate differently)."""
    from pigpen_spark.operators.joins import as_of_join

    ev = tables(spark, sf_dir)["events"].df.withColumn("s", F.date_trunc("second", F.col("ts")))
    right = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "s")
        .agg(F.max_by("event_id", "event_id").alias("pid"), F.max_by("value", "event_id").alias("pval"))
    )
    left = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "s")
    out = as_of_join(left, right, on="user_id", left_ts="s", right_ts="s", payload=["pid", "pval"])
    return out.select("event_id", "user_id", "pid", "pval")


@register(
    "q_salted_join",
    """
    SELECT o.o_orderkey, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew-join (extension; the reference passes skew handling to
    Pig's 'skewed' strategy).  The oracle is the PLAIN join — salting must
    be row-identical to the unsalted join, just differently partitioned."""
    from pigpen_spark.operators.joins import salted_join

    t = tables(spark, sf_dir)
    out = salted_join(t["orders"].df, t["customer"].df, on="o_custkey", right_on="c_custkey", salt=8)
    return out.select("o_orderkey", "c_mktsegment")


@register(
    "q_range_join",
    """
    SELECT c.c_nationkey, count(*) AS n_matches,
           round(sum(s.s_acctbal), 2) AS sum_bal
    FROM customer c JOIN supplier s
      ON c.c_acctbal >= s.s_acctbal - 5 AND c.c_acctbal <= s.s_acctbal + 5
    GROUP BY c.c_nationkey
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned point-in-interval range join (extension; the reference has no
    theta/range joins — SURVEY §2.3 note).  Spark would execute the bare
    range predicate as a broadcast-nested-loop O(n·m); range_join rewrites
    it to an equi-join keyed by (bin), shuffle-parallel.  Oracle is the
    naive theta join — results must be row-identical."""
    from pigpen_spark.operators.joins import range_join

    t = tables(spark, sf_dir)
    bands = t["supplier"].df.select(
        "s_suppkey", "s_acctbal",
        (F.col("s_acctbal") - 5).alias("lo"), (F.col("s_acctbal") + 5).alias("hi"),
    )
    out = range_join(t["customer"].df, bands, "c_acctbal", "lo", "hi", bin_width=10.0)
    return (
        out.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_matches"),
             F.round(F.sum("s_acctbal"), 2).alias("sum_bal"))
    )


@register(
    "q_interval_overlap",
    """
    SELECT c.c_nationkey, count(*) AS n_matches
    FROM customer c JOIN supplier s
      ON c.c_acctbal - 3 <= s.s_acctbal + 3 AND s.s_acctbal - 3 <= c.c_acctbal + 3
    GROUP BY c.c_nationkey
    """,
)
def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join via double-sided binning (extension).  Each
    pair is emitted in exactly one bin (the leftmost bin of the
    intersection) — no dedup shuffle.  Oracle is the naive overlap theta
    join."""
    from pigpen_spark.operators.joins import interval_overlap_join

    t = tables(spark, sf_dir)
    c = t["customer"].df.select(
        "c_nationkey", (F.col("c_acctbal") - 3).alias("clo"), (F.col("c_acctbal") + 3).alias("chi"))
    sup = t["supplier"].df.select(
        (F.col("s_acctbal") - 3).alias("slo"), (F.col("s_acctbal") + 3).alias("shi"))
    out = interval_overlap_join(c, sup, "clo", "chi", "slo", "shi", bin_width=6.0)
    return out.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("n_matches"))


@register(
    "q_quantiles",
    """
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice::DOUBLE, 0.5), 2) AS p50,
           round(quantile_cont(o_totalprice::DOUBLE, 0.95), 2) AS p95
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles per group (extension; percentile ≡
    quantile_cont definition)."""
    o = tables(spark, sf_dir)["orders"]
    q = fold.quantiles("o_totalprice", [0.5, 0.95])
    return (
        o.group_by("o_orderpriority")
        .fold(
            p50=q.post(lambda c: F.round(F.element_at(c, 1), 2)),
            p95=fold.quantiles("o_totalprice", [0.5, 0.95]).post(lambda c: F.round(F.element_at(c, 2), 2)),
        )
        .df
    )


@register(
    "q_pivot",
    """
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (extension): status columns per priority.  Spark's pivot with
    explicit values avoids the extra distinct-values scan — always pass
    values at scale."""
    o = tables(spark, sf_dir)["orders"]
    out = (
        o.group_by("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .fold(fold.count())
        .df
    )
    return out.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
    )


@register(
    "q_window_analytics",
    """
    SELECT event_id, user_id,
           round(value - coalesce(lag(value) OVER w, value), 2) AS delta,
           round(avg(value) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window functions (extension — SURVEY §2.5: the reference
    has only rank): lag-delta and a 3-row moving average per user.  One
    shuffle on user_id serves both window frames."""
    from pyspark.sql import Window

    e = tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(-2, Window.currentRow)
    return e.df.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.coalesce(F.lag("value").over(w), F.col("value")), 2).alias("delta"),
        F.round(F.avg("value").over(wf), 4).alias("moving_avg"),
    )


@register(
    "q_json_extract",
    """
    SELECT TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           count(*) AS n,
           round(sum(value), 2) AS total
    FROM events GROUP BY 1
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON column access (the reference parses JSON only
    at load time, io.clj:122-138; we also expose per-row path extraction)
    — get_json_object stays JVM-side, no UDF.  try_cast: a malformed
    value must yield NULL, not an ANSI cast error."""
    e = tables(spark, sf_dir)["events"]
    k = F.get_json_object(F.col("props"), "$.k").try_cast("bigint") % 10
    return (
        e.group_by(k_bucket=k)
        .fold(n=fold.count(), total=fold.sum_("value").post(lambda c: F.round(c, 2)))
        .df
    )


@register(
    "q_cube",
    """
    SELECT r_name, n_name, count(*) AS n_supp
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY CUBE(r_name, n_name)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (extension; reference has none, SURVEY §2.4)."""
    t = tables(spark, sf_dir)
    joined = (
        t["supplier"]
        .join(t["nation"], on="s_nationkey", right_on="n_nationkey", broadcast_other=True)
        .join(t["region"], on="n_regionkey", right_on="r_regionkey", broadcast_other=True)
    )
    return joined.cube("r_name", "n_name").fold(n_supp=fold.count()).df


# ---------------------------------------------------------------------------
# sample (statistical check only — nondeterministic, no oracle)
# ---------------------------------------------------------------------------


@register(
    "q_sample",
    """
    SELECT count(*)::BIGINT AS n_total, 0.5::DOUBLE AS p, TRUE AS in_bounds
    FROM lineitem
    """,
)
def q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bernoulli sample (filter.clj:97-112) with a STATISTICAL oracle —
    the reference's own test only bounds the count (filter_test.clj:56-64
    asserts 400 < n < 600 for p=0.5 over 1000).  A sample can't hash-match
    row-for-row, so the check is folded into the output: the sampled count
    must land within ±6σ binomial bounds of p·n (a ~1e-9 false-failure
    rate), emitted as a boolean next to the DuckDB-verified total.  The
    sample itself stays fully distributed — one aggregate over the sampled
    scan, a second tiny count for the total."""
    li = tables(spark, sf_dir)["lineitem"]
    p = 0.5
    sampled_n = li.sample(p, seed=42).df.agg(F.count(F.lit(1)).alias("n")).withColumnRenamed("n", "n_sample")
    total = li.df.agg(F.count(F.lit(1)).alias("n_total"))
    sigma = F.sqrt(F.col("n_total") * F.lit(p * (1 - p)))
    in_bounds = (
        (F.col("n_sample") >= F.col("n_total") * F.lit(p) - 6 * sigma)
        & (F.col("n_sample") <= F.col("n_total") * F.lit(p) + 6 * sigma)
    )
    return (
        total.crossJoin(sampled_n)  # two 1-row aggregates — trivially safe
        .select("n_total", F.lit(p).alias("p"), in_bounds.alias("in_bounds"))
    )
