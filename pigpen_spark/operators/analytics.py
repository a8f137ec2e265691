"""Event-analytics operators: multi-step funnels and cohort retention.

Extension surface beyond the reference (which stops at group/cogroup —
SURVEY §2.3): the two queries every product-analytics workload runs over
an events table.  Both are built to the single-pass shapes that survive
100 TB:

- **funnel** — ONE shuffle on the user key.  Per-user, each step's
  timestamp is the min event-time of that step's type at-or-after the
  previous step's timestamp (``min over filtered collected bags``) —
  exactly the nested ``min(ts) WHERE ts >= prev`` semantics of the SQL
  formulation, but without its k−1 self-joins/shuffles.  Per-user state
  is the user's own event times only, and heavy users can be pre-capped
  upstream with ``filter_by``.
- **cohort_retention** — two aggregations co-partitioned on the user key
  (first-seen cohort week, then distinct activity weeks), joined
  user-to-user so AQE plans a co-located join; one final small
  aggregation on (cohort, offset).

Timestamps stay TimestampType end-to-end; outputs are epoch bigints +
counts, so the DuckDB oracle is exact (no float discipline needed).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pigpen_spark.relation import _to_col as _c


def funnel_users(events: DataFrame, steps: Sequence[str],
                 type_col: str = "event_type", user_col: str = "user_id",
                 ts_col: str = "ts") -> DataFrame:
    """Per-user funnel progression: one row per user with ``step_1 ..
    step_k`` timestamp columns (NULL once the user falls out of the
    funnel).  ``steps`` is the ordered list of event types.

    Single groupBy on ``user_col``: each step's candidate times are
    collected as a bag, and step i's timestamp is
    ``array_min(filter(bag_i, t >= step_{i-1}))`` — evaluated after the
    aggregation, so the whole funnel is one shuffle regardless of k.
    Ties (a step-i event at exactly step-{i-1}'s timestamp) count as
    conversions, matching the SQL ``ts >= prev`` convention.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    # collect_list drops the NULLs the when() produces for other types,
    # so each bag holds exactly that step's event times (unsorted —
    # array_min doesn't need order)
    bags = events.groupBy(user_col).agg(
        *[
            F.collect_list(
                F.when(F.col(type_col) == s, F.col(ts_col))
            ).alias(f"__bag_{i}")
            for i, s in enumerate(steps)
        ]
    )
    # NB: capture prev via a factory, NOT a `p=prev` default arg — a
    # second lambda parameter makes PySpark bind the (element, index)
    # two-arg filter form and `p` becomes the integer index
    def _at_or_after(p):
        return lambda x: x >= p

    prev = None
    out_cols = [F.col(user_col)]
    for i in range(len(steps)):
        bag = F.col(f"__bag_{i}")
        if prev is None:
            t = F.array_min(bag)
        else:
            t = F.array_min(F.filter(bag, _at_or_after(prev)))
        t_named = t.alias(f"step_{i + 1}")
        out_cols.append(t_named)
        prev = t
    return bags.select(*out_cols)


def funnel(events: DataFrame, steps: Sequence[str],
           type_col: str = "event_type", user_col: str = "user_id",
           ts_col: str = "ts") -> DataFrame:
    """Funnel summary: one row per step with the number of users who
    reached it — ``(step bigint 1-based, step_name, n_users)``."""
    users = funnel_users(events, steps, type_col, user_col, ts_col)
    counts = users.agg(
        *[
            F.count(f"step_{i + 1}").alias(f"__n_{i}")
            for i in range(len(steps))
        ]
    )
    # inline(array(struct…)) with F.lit step names — step names are
    # caller DATA; interpolating them into an expr/stack string would
    # break (or inject) on quotes
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).cast("bigint").alias("step"),
                F.lit(s).alias("step_name"),
                F.col(f"__n_{i}").alias("n_users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return counts.select(F.inline(rows))


def cohort_retention(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week; output
    ``(cohort_epoch bigint, week_offset bigint, n_users bigint)`` where
    ``n_users`` counts cohort members active in cohort-week + offset.

    Both aggregations key on ``user_col`` (co-partitioned join), and the
    final rollup keys on the tiny (cohort, offset) pair.
    """
    week = F.date_trunc("week", F.col(ts_col))
    cohorts = events.groupBy(user_col).agg(
        F.min(week).alias("__cohort")
    )
    activity = events.select(
        F.col(user_col), week.alias("__week")
    ).distinct()
    return (
        activity.join(cohorts, user_col)
        .groupBy(
            F.unix_timestamp("__cohort").cast("bigint").alias("cohort_epoch"),
            (F.datediff(F.col("__week"), F.col("__cohort")) / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


def funnel_sql(steps: Sequence[str], type_col: str = "event_type",
               user_col: str = "user_id", ts_col: str = "ts",
               table: str = "events") -> str:
    """DuckDB oracle for :func:`funnel`: the classic nested
    ``min(ts) .. WHERE ts >= prev`` CTE chain."""
    steps = [s.replace("'", "''") for s in steps]  # step names are data
    ctes = []
    for i, s in enumerate(steps):
        if i == 0:
            ctes.append(
                f"s0 AS (SELECT {user_col}, min({ts_col}) AS t FROM {table}"
                f" WHERE {type_col} = '{s}' GROUP BY {user_col})"
            )
        else:
            ctes.append(
                f"s{i} AS (SELECT e.{user_col}, min(e.{ts_col}) AS t"
                f" FROM {table} e JOIN s{i - 1} p USING ({user_col})"
                f" WHERE e.{type_col} = '{s}' AND e.{ts_col} >= p.t"
                f" GROUP BY e.{user_col})"
            )
    selects = [
        f"SELECT {i + 1}::BIGINT AS step, '{s}' AS step_name,"
        f" (SELECT count(*) FROM s{i})::BIGINT AS n_users"
        for i, s in enumerate(steps)
    ]
    return "WITH " + ", ".join(ctes) + " " + " UNION ALL ".join(selects)


def cohort_retention_sql(user_col: str = "user_id", ts_col: str = "ts",
                         table: str = "events") -> str:
    """DuckDB oracle for :func:`cohort_retention`."""
    return f"""
    WITH cohorts AS (
      SELECT {user_col}, min(date_trunc('week', {ts_col})) AS cohort
      FROM {table} GROUP BY {user_col}
    ),
    activity AS (
      SELECT DISTINCT {user_col}, date_trunc('week', {ts_col}) AS week
      FROM {table}
    )
    SELECT epoch(c.cohort)::BIGINT AS cohort_epoch,
           (date_diff('day', c.cohort, a.week) // 7)::BIGINT AS week_offset,
           count(*)::BIGINT AS n_users
    FROM activity a JOIN cohorts c USING ({user_col})
    GROUP BY 1, 2
    """


def snapshot_diff(old: DataFrame, new: DataFrame, keys: Sequence[str],
                  compare: Sequence[str] | None = None,
                  hash_compare: bool = False,
                  status_col: str = "status") -> DataFrame:
    """Change-data capture between two snapshots of a keyed table:
    every key is labeled ``added`` (new only), ``removed`` (old only),
    ``changed`` (both, ≥1 compared column differs, null-safe), or
    ``unchanged``.

    ONE co-partitioned full-outer sort-merge join on ``keys`` — the plan
    that diffs two 100 TB snapshots without ever materializing either.
    ``compare`` defaults to all common non-key columns; output carries
    them as ``old_<c>`` / ``new_<c>`` pairs next to the status.

    ``hash_compare=True`` is the wide-table variant: each side reduces its
    compared columns to one ``xxhash64`` BEFORE the join, so the shuffle
    carries keys + 8 bytes per side instead of the full row width (the
    right trade when the table has hundreds of columns and the caller only
    wants the change log, not the values)."""
    if compare is None:
        kset = set(keys)
        common = [c for c in old.columns if c in set(new.columns) and c not in kset]
        compare = common
    if not compare:
        raise ValueError("snapshot_diff: no columns to compare")
    if hash_compare:
        o = old.select(*keys, F.xxhash64(*[_c(c) for c in compare]).alias("old_hash"))
        n = new.select(*keys, F.xxhash64(*[_c(c) for c in compare]).alias("new_hash"))
        differs = ~F.col("old_hash").eqNullSafe(F.col("new_hash"))
        in_old, in_new = F.col("old_hash"), F.col("new_hash")
    else:
        o = old.select(*keys, F.lit(True).alias("__in_old"),
                       *[_c(c).alias(f"old_{c}") for c in compare])
        n = new.select(*keys, F.lit(True).alias("__in_new"),
                       *[_c(c).alias(f"new_{c}") for c in compare])
        differs = None
        for c in compare:
            d = ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
            differs = d if differs is None else (differs | d)
        in_old, in_new = F.col("__in_old"), F.col("__in_new")
    j = o.join(n, on=list(keys), how="full_outer")
    status = (
        F.when(in_old.isNull(), F.lit("added"))
        .when(in_new.isNull(), F.lit("removed"))
        .when(differs, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.withColumn(status_col, status).drop("__in_old", "__in_new")


def snapshot_diff_sql(old_sql: str, new_sql: str, keys: Sequence[str],
                      compare: Sequence[str],
                      status_col: str = "status") -> str:
    """DuckDB oracle for :func:`snapshot_diff` (value-compare form):
    ``old_sql``/``new_sql`` are subqueries producing keys + compared
    columns."""
    keycols = ", ".join(f"coalesce(o.{k}, n.{k}) AS {k}" for k in keys)
    on = " AND ".join(f"o.{k} = n.{k}" for k in keys)
    olds = ", ".join(f"o.{c} AS old_{c}" for c in compare)
    news = ", ".join(f"n.{c} AS new_{c}" for c in compare)
    differs = " OR ".join(f"o.{c} IS DISTINCT FROM n.{c}" for c in compare)
    first_old = f"o.{keys[0]}"
    first_new = f"n.{keys[0]}"
    return f"""
    SELECT {keycols}, {olds}, {news},
           CASE WHEN {first_old} IS NULL THEN 'added'
                WHEN {first_new} IS NULL THEN 'removed'
                WHEN {differs} THEN 'changed'
                ELSE 'unchanged' END AS {status_col}
    FROM ({old_sql}) o FULL OUTER JOIN ({new_sql}) n ON {on}
    """


#: re-aggregation functions that are ASSOCIATIVE over partial aggregates —
#: the only merges that make a rollup incrementally maintainable
_MERGE_FNS = {"sum": F.sum, "min": F.min, "max": F.max,
              "count": F.sum, "bit_or": F.bit_or}


def merge_rollups(parts: Sequence[DataFrame], keys: Sequence[str],
                  merges: Mapping[str, str]) -> DataFrame:
    """Incremental rollup maintenance: combine per-batch keyed aggregates
    into the aggregate of the union WITHOUT touching raw history.

    ``parts`` are partial rollups with identical schemas (keys + measure
    columns); ``merges`` maps each measure to its re-aggregation
    (``sum``/``min``/``max``/``count``→sum/``bit_or``).  Only measures with
    an associative merge belong in an incremental rollup — averages must be
    carried as (sum, count) pairs and divided at read time, and quantiles/
    distincts as mergeable sketches (``histogram_sketch``, ``hll``,
    :mod:`pigpen_spark.functions.sketch`), which is exactly why those
    sketches exist.

    The merge is ONE union + groupBy over rollup-sized inputs (days ×
    keys, not events × keys): a daily 100 TB drop re-aggregates only its
    own partition and the merged table updates from the partials — the
    lambda-architecture batch view without recomputing history.
    """
    if not parts:
        raise ValueError("merge_rollups: no parts")
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    aggs = []
    for col, how in merges.items():
        try:
            fn = _MERGE_FNS[how]
        except KeyError:
            raise ValueError(
                f"merge_rollups: non-associative merge {how!r} for {col!r}; "
                "carry avg as (sum,count), quantiles/distincts as sketches"
            ) from None
        aggs.append(fn(col).alias(col))
    return df.groupBy(*[_c(k) for k in keys]).agg(*aggs)


def apply_changes(target: DataFrame, changes: DataFrame, keys: Sequence[str],
                  op_col: str = "op") -> DataFrame:
    """Apply a CDC change set to a keyed snapshot — the MERGE INTO
    emulation that closes the loop :func:`snapshot_diff` opens: ``changes``
    rows carry the full new row plus ``op_col`` ∈ {insert, update,
    delete}; the result is the next snapshot (target rows whose key is
    untouched + insert/update rows; delete keys gone).

    Semantics are UPSERT semantics, stated plainly: ``insert`` and
    ``update`` act identically (the change row wins regardless of whether
    the key existed), because validating op-vs-target-state the way a
    strict MERGE does would cost an extra keyed pass over the TARGET —
    the 100 TB side.  What IS enforced plan-side, because both are cheap
    on the CHANGE side and silently corrupt the snapshot otherwise:
    unknown op values raise, and a change set carrying more than one row
    for the same key raises (raw CDC feeds must be compacted to
    last-op-per-key first — a multi-op batch applied as-is would emit
    duplicate keys).

    Plan: ONE left-anti join of the target against the (slim) change-key
    set plus a union of the non-delete change rows — the target never
    joins row-to-row against the changes, so a 100 TB snapshot takes one
    keyed shuffle (or zero with co-bucketed storage) regardless of change
    width.

    Self-certifying invariant (pinned by ext_apply_changes):
    ``apply_changes(old, changes_from(snapshot_diff(old, new))) == new``.
    """
    ops = F.col(op_col)
    dup = F.count(F.lit(1)).over(Window.partitionBy(*[_c(k) for k in keys]))
    # BOTH guards live inside op_col, which the non-delete filter below
    # evaluates for every change row — a guard in a dropped helper column
    # would be pruned by Catalyst and never fire
    guard = (
        F.when(dup > 1, F.raise_error(F.concat(
            F.lit("apply_changes: multiple change rows for key "),
            F.concat_ws(",", *[_c(k).cast("string") for k in keys]),
            F.lit(" — compact the feed to last-op-per-key first"))))
        .when(ops.isin("insert", "update", "delete"), ops)
        .otherwise(F.raise_error(
            F.concat(F.lit("apply_changes: unknown op "), ops)))
    )
    ch = changes.withColumn(op_col, guard)
    keyset = ch.select(*keys).distinct()
    untouched = target.join(keyset, on=list(keys), how="left_anti")
    upserts = ch.filter(F.col(op_col) != "delete").drop(op_col)
    return untouched.unionByName(upserts)


def changes_from_diff(diff: DataFrame, keys: Sequence[str],
                      compare: Sequence[str], status_col: str = "status",
                      op_col: str = "op") -> DataFrame:
    """Turn :func:`snapshot_diff` output into an :func:`apply_changes`
    change set: added→insert, changed→update, removed→delete (unchanged
    rows dropped); the new_<c> columns become the row payload (NULL for
    deletes, which apply_changes ignores)."""
    op = (
        F.when(F.col(status_col) == "added", F.lit("insert"))
        .when(F.col(status_col) == "changed", F.lit("update"))
        .when(F.col(status_col) == "removed", F.lit("delete"))
    )
    return (
        diff.filter(F.col(status_col) != "unchanged")
        .select(*keys, *[F.col(f"new_{c}").alias(c) for c in compare],
                op.alias(op_col))
    )


def scd2_apply(dim: DataFrame, changes: DataFrame, keys: Sequence[str],
               ts_col: str, attr_cols: Sequence[str],
               valid_from: str = "valid_from",
               valid_to: str = "valid_to") -> DataFrame:
    """Slowly-changing-dimension TYPE 2 maintenance — the versioned
    sibling of :func:`apply_changes` (which is SCD1/overwrite): each
    change batch row carries the attribute state of a key AT ``ts_col``;
    applying it closes the key's open version (``valid_to`` := change
    ts) and opens a new one, preserving full history for as-of joins.

    Semantics, stated plainly:

    - ``dim`` rows with ``valid_to IS NULL`` are the open versions;
      closed rows are history and pass through untouched.
    - Consecutive identical attribute states COLLAPSE (a change that
      repeats the current state creates no version) — null-safe struct
      comparison, so NULL attrs compare stably.
    - Several changes to one key in one batch chain correctly (each
      version's ``valid_to`` is the next kept version's ts).
    - LOUD failures, plan-side: duplicate (key, ts) change rows raise
      (apply order would be nondeterministic — compact the feed first),
      and a change at-or-before its key's open ``valid_from`` raises
      (out-of-order feeds corrupt history silently otherwise).

    Plan: history and untouched keys move through anti/semi joins on the
    slim change-key set only; the window chain (lag-collapse, then
    lead-close over kept rows) runs on open-rows-of-touched-keys ∪
    changes — O(batch) rows, never the 100 TB dimension.  Two window
    passes on that small set, one shuffle each, both keyed on ``keys``.
    """
    ks = list(keys)
    attrs = list(attr_cols)
    a_struct = F.struct(*[F.col(c) for c in attrs])
    ch_keys = changes.select(*ks).distinct()

    # duplicate (key, ts) guard — evaluated via the ts column itself so
    # Catalyst cannot prune it
    dup = F.count(F.lit(1)).over(
        Window.partitionBy(*[F.col(k) for k in ks], F.col(ts_col)))
    guarded_ts = F.when(dup > 1, F.raise_error(F.concat(
        F.lit("scd2_apply: duplicate change rows for key/ts "),
        F.concat_ws(",", *[F.col(k).cast("string") for k in ks],
                    F.col(ts_col).cast("string")),
        F.lit(" — compact the feed first")))).otherwise(F.col(ts_col))

    open_rows = dim.filter(F.col(valid_to).isNull())
    touched_open = open_rows.join(ch_keys, on=ks, how="left_semi")
    # corrupt-dimension guard: more than one OPEN version per key would
    # silently emit duplicate histories — fail loudly instead (evaluated
    # through the valid_from column so Catalyst cannot prune it)
    n_open = F.count(F.lit(1)).over(Window.partitionBy(*[F.col(k) for k in ks]))
    touched_open = touched_open.withColumn(
        valid_from,
        F.when(n_open > 1, F.raise_error(F.concat(
            F.lit("scd2_apply: multiple open versions for key "),
            F.concat_ws(",", *[F.col(k).cast("string") for k in ks]),
            F.lit(" — the dimension is corrupt"))))
        .otherwise(F.col(valid_from)))
    timeline = (
        touched_open.select(*ks, *attrs,
                            F.col(valid_from).alias("__ts"),
                            F.lit(0).alias("__src"))
        .unionByName(changes.select(*ks, *attrs,
                                    guarded_ts.alias("__ts"),
                                    F.lit(1).alias("__src")))
    )
    w = Window.partitionBy(*ks).orderBy("__ts", "__src")
    # out-of-order guard: every change must come strictly after its
    # key's open valid_from (whole-key comparison — a lag-based check
    # would miss a change that SORTS before the open row)
    open_from = F.max(F.when(F.col("__src") == 0, F.col("__ts"))).over(
        Window.partitionBy(*[F.col(k) for k in ks]))
    ordered = timeline.withColumn(
        "__ts",
        F.when(
            (F.col("__src") == 1) & open_from.isNotNull()
            & (F.col("__ts") <= open_from),
            F.raise_error(F.lit(
                "scd2_apply: change at-or-before the open version's "
                "valid_from — out-of-order feed")),
        ).otherwise(F.col("__ts")))
    prev_attrs = F.lag(a_struct).over(w)
    kept = (
        ordered.withColumn("__keep",
                           prev_attrs.isNull()
                           | ~prev_attrs.eqNullSafe(a_struct))
        .filter(F.col("__keep"))
    )
    w2 = Window.partitionBy(*ks).orderBy("__ts", "__src")
    versions = kept.select(
        *ks, *attrs,
        F.col("__ts").alias(valid_from),
        F.lead("__ts").over(w2).alias(valid_to),
    )
    untouched_open = open_rows.join(ch_keys, on=ks, how="left_anti")
    history = dim.filter(F.col(valid_to).isNotNull())
    cols = ks + attrs + [valid_from, valid_to]
    return (history.select(*cols)
            .unionByName(untouched_open.select(*cols))
            .unionByName(versions.select(*cols)))


def attribution(events: DataFrame, user_col: str, ts_col: str,
                channel_col: str, conversion, lookback_seconds: int,
                tiebreak_col: str | None = None) -> DataFrame:
    """Marketing/touchpoint attribution: for every conversion event,
    the FIRST and LAST non-conversion touch of the same user within
    ``[conv − lookback, conv)`` — boundary-inclusive at exactly
    lookback distance, strictly before the conversion instant (the two
    classic single-touch models; both emitted so their disagreement — a
    multi-touch journey — is visible).  Conversions with no touch in
    the window attribute NULL (organic).

    Plan: ONE shuffle on the user key; both touches come from min/max
    of (µs, tiebreak, channel) STRUCTS over a RANGE frame on integer
    microseconds — struct ordering makes first/last among
    same-microsecond touches deterministic WITHOUT perturbing the
    window boundary (an order-key tiebreak fraction would shift which
    events sit exactly at lookback distance — hypothesis-caught).
    No per-conversion self-join, so cost is O(events) at any
    conversion rate.

    Returns the conversion rows: (user, conv_ts_us, first_touch,
    last_touch)."""
    conv = conversion if isinstance(conversion, Column) else F.col(conversion)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    e = events.withColumn("__us", us).withColumn("__conv", conv)
    lb = lookback_seconds * 1_000_000
    w = (Window.partitionBy(F.col(user_col)).orderBy(F.col("__us"))
         .rangeBetween(-lb, -1))
    tb = (F.col(tiebreak_col) if tiebreak_col else F.lit(0)).alias("i")
    touch = F.when(~F.col("__conv"),
                   F.struct(F.col("__us").alias("t"), tb,
                            F.col(channel_col).alias("c")))
    first = F.min(touch).over(w)["c"]
    last = F.max(touch).over(w)["c"]
    return (
        e.withColumn("first_touch", first)
        .withColumn("last_touch", last)
        .filter(F.col("__conv"))
        .select(F.col(user_col), F.col("__us").alias("conv_ts_us"),
                "first_touch", "last_touch")
    )


def transition_matrix(events: DataFrame, user_col: str, ts_col: str,
                      state_col: str, tiebreak_col: str,
                      scale: int = 1_000_000) -> DataFrame:
    """First-order journey transition matrix — the Markov-chain readout
    of an event stream (what precedes churn/purchase; which paths
    dominate): per user, consecutive state pairs under a total
    (ts, tiebreak) order, then global pair counts and integer-ppm row
    probabilities p(to | from).

    ONE user-key shuffle for the lag window + one small groupBy on the
    (from, to) pairs (state-vocabulary sized).  Per-user journey length
    is bounded by that user's events — the same posture as sessionize.

    Returns (from_state, to_state, n, p_ppm)."""
    us = F.unix_micros(_c(ts_col).cast("timestamp"))
    w = Window.partitionBy(_c(user_col)).orderBy(us, _c(tiebreak_col))
    prev = F.lag(_c(state_col)).over(w)
    pairs = (
        events.withColumn("__from", prev)
        .filter(F.col("__from").isNotNull())
        .select(F.col("__from").alias("from_state"),
                _c(state_col).alias("to_state"))
    )
    counts = pairs.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n"))
    w2 = Window.partitionBy("from_state")
    return counts.select(
        "from_state", "to_state", "n",
        F.expr(f"n * {scale} DIV sum(n) OVER (PARTITION BY from_state)")
         .cast("bigint").alias("p_ppm"),
    )
