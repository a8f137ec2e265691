"""Iterator-based per-group processing for HUGE groups — the Spark twin
of Pig's Accumulator interface.

reference: pigpen-pig/src/main/clojure/pigpen/pig/runtime.clj:194-240 and
PigPenFn.java:66-81 — the reference streams reduce-side bags through the
user function in CHUNKS (Pig calls ``accumulate`` repeatedly with partial
bags, then ``getValue``), so a single billion-row key never materializes.
Our default group machinery (``collect_list`` bags, ``applyInPandas``)
materializes each group in one task — fine until one giant key OOMs it
(SURVEY §4.4 risk note; VERDICT r3 "What's missing" #2).  This module is
the scale path:

- hash-repartition on the key (plus optional ``num_partitions``),
- ``sortWithinPartitions`` on (key, order_by) so each partition holds its
  groups CONTIGUOUSLY in the caller's chosen traversal order,
- one ``mapInPandas`` pass whose generator walks the partition's Arrow
  batches, slices them at group boundaries, and drives the caller's
  accumulator trio — ``init(key) -> state``, ``accumulate(state,
  chunk_pdf) -> state``, ``finish(key, state) -> dict``.

Peak per-call footprint is ONE Arrow batch slice
(``spark.sql.execution.arrow.maxRecordsPerBatch`` rows, default 10k) no
matter how large the group is; state size is whatever the caller keeps
(a running sum / hash / heap — Accumulator semantics).  Contrast
``applyInPandas``, which hands the whole group to Python at once.

The shuffle profile is identical to a groupBy (one exchange on the key);
the sort is Spark's spillable external sort, so a giant key costs disk,
not heap.  Skewed keys still land on one partition — that is inherent to
per-key sequential semantics; if the fold is associative use
``fold_py``/native folds instead (map-side partials), this path is for
genuinely sequential per-group logic.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


#: Default per-key row bound for the AUTO fast/stream dispatch
#: (grouped_auto_apply / cogroup_auto_apply).  Above it, a whole-group
#: applyInPandas materialization is one Arrow table of >=250k rows per
#: task — the regime where a wide row or a skewed key starts OOMing
#: executors — so the dispatcher escalates to the chunked stream path.
#: Below it the fast path wins on per-group machinery overhead.
AUTO_STREAM_THRESHOLD_ROWS = 250_000


def max_group_rows(df: DataFrame, keys: Sequence) -> int:
    """The probe behind the auto dispatch: the largest per-key row count
    (one counting groupBy + a 1-row max — counts only ever shuffle, the
    payload never moves; same pattern as remove_frequent_spans(auto)'s
    df probe)."""
    row = (
        df.groupBy(*[_c(k) for k in keys])
        .agg(F.count(F.lit(1)).alias("__n"))
        .agg(F.max("__n"))
        .first()
    )
    return int(row[0]) if row and row[0] is not None else 0


def grouped_stream_apply(
    df: DataFrame,
    keys: Sequence,
    init: Callable,
    accumulate: Callable,
    finish: Callable,
    schema: str,
    key_names: Sequence[str] | None = None,
    order_by: Sequence = (),
    num_partitions: int | None = None,
) -> DataFrame:
    """Stream every group through ``init``/``accumulate``/``finish``
    without ever materializing it (module docstring).

    ``keys``: grouping columns/exprs; ``key_names`` their output names
    (default ``k0..kn``).  ``order_by``: additional within-group sort
    columns — rows reach ``accumulate`` in (key, order_by) order, which
    is what makes order-sensitive folds (running hashes, first/last
    semantics, sessionization) deterministic.  ``finish`` returns a dict
    of output-row values (it may include the key or not — the chunk
    driver adds nothing), and ``schema`` is the output DDL string.
    """
    knames = list(key_names or [f"k{i}" for i in range(len(keys))])
    kcols = [_c(k).alias(n) for k, n in zip(keys, knames)]
    ocols = [_c(o) for o in order_by]
    base = df.select(*kcols, "*") if set(knames) - set(df.columns) else df
    # hash-exchange on the key, then a spillable within-partition sort:
    # groups become contiguous runs, arbitrarily large ones spill to disk
    parts = [num_partitions] if num_partitions else []
    keyed = (
        base.repartition(*parts, *[F.col(n) for n in knames])
        .sortWithinPartitions(*[F.col(n) for n in knames], *ocols)
    )

    def gen(batches):
        import pandas as pd

        cur = None          # current key tuple (normalized)
        state = None
        out: list[dict] = []

        def norm(t):
            return tuple(None if pd.isna(v) else v for v in t)

        for pdf in batches:
            if len(pdf) == 0:
                continue
            kdf = pdf[knames]
            # group-boundary mask: row i starts a new group iff any key
            # column differs from row i-1 (vectorized — no Python loop
            # over rows)
            neq = (kdf != kdf.shift()) & ~(kdf.isna() & kdf.isna().shift(fill_value=False))
            starts = list(neq.any(axis=1).to_numpy().nonzero()[0])
            if not starts or starts[0] != 0:
                starts = [0] + starts
            bounds = starts + [len(pdf)]
            for s, e in zip(bounds, bounds[1:]):
                chunk = pdf.iloc[s:e]
                key = norm(tuple(kdf.iloc[s]))
                if key != cur:
                    if cur is not None:
                        out.append(finish(cur, state))
                    cur, state = key, init(key)
                state = accumulate(state, chunk)
                if len(out) >= 1000:
                    yield pd.DataFrame(out)
                    out = []
        if cur is not None:
            out.append(finish(cur, state))
        if out:
            yield pd.DataFrame(out)

    return keyed.mapInPandas(gen, schema=schema)


def _union_align(inputs: Sequence[tuple[DataFrame, Sequence]],
                 key_names: Sequence[str] | None, tag_col: str):
    """Tag every input and align their value columns into one union
    (missing columns → typed NULLs).  Shared by the streaming and the
    fast cogroup paths so both see identical chunk shapes.  Returns
    (key_names, union_df, [(col, type), ...])."""
    first_keys = inputs[0][1]
    knames = list(key_names or [f"k{i}" for i in range(len(first_keys))])
    all_cols: list[tuple[str, str]] = []
    seen = set()
    for df, _ in inputs:
        for f_ in df.schema.fields:
            if f_.name not in seen:
                seen.add(f_.name)
                all_cols.append((f_.name, f_.dataType.simpleString()))
    tagged = []
    for i, (df, ks) in enumerate(inputs):
        if len(ks) != len(knames):
            raise ValueError(
                f"cogroup: input {i} has {len(ks)} keys, expected {len(knames)}"
            )
        kcols = [_c(k).alias(n) for k, n in zip(ks, knames)]
        have = set(df.columns)
        vals = [
            (F.col(n) if n in have else F.lit(None).cast(t)).alias(f"__v_{n}")
            for n, t in all_cols
        ]
        tagged.append(df.select(*kcols, F.lit(i).alias(tag_col), *vals))
    union = tagged[0]
    for t in tagged[1:]:
        union = union.unionByName(t)
    return knames, union, all_cols


def cogroup_stream_apply(
    inputs: Sequence[tuple[DataFrame, Sequence]],
    init: Callable,
    accumulate: Callable,
    finish: Callable,
    schema: str,
    key_names: Sequence[str] | None = None,
    num_partitions: int | None = None,
    tag_col: str = "__pp_tag",
) -> DataFrame:
    """Streaming N-ary cogroup: like :func:`grouped_stream_apply`, but
    ``accumulate(state, input_index, chunk_pdf)`` sees which input each
    chunk came from.  Implementation: tag every input, align their value
    columns into one pickled-free union (missing columns → NULL), then
    ONE exchange + sort on (key, tag) — each key's bags arrive input-by-
    input, chunked, never materialized (the reference's multi-bag
    Accumulator shape, pig/runtime.clj:194-240).
    """
    knames, union, all_cols = _union_align(inputs, key_names, tag_col)
    parts = [num_partitions] if num_partitions else []
    keyed = (
        union.repartition(*parts, *[F.col(n) for n in knames])
        .sortWithinPartitions(*[F.col(n) for n in knames], F.col(tag_col))
    )
    vnames = [f"__v_{n}" for n, _ in all_cols]
    rename = dict(zip(vnames, [n for n, _ in all_cols]))

    def gen(batches):
        import pandas as pd

        cur = None
        state = None
        out: list[dict] = []

        def norm(t):
            return tuple(None if pd.isna(v) else v for v in t)

        for pdf in batches:
            if len(pdf) == 0:
                continue
            kdf = pdf[knames]
            tags = pdf[tag_col]
            marker = pd.concat([kdf, tags], axis=1)
            neq = (marker != marker.shift()) & ~(
                marker.isna() & marker.isna().shift(fill_value=False)
            )
            starts = list(neq.any(axis=1).to_numpy().nonzero()[0])
            if not starts or starts[0] != 0:
                starts = [0] + starts
            bounds = starts + [len(pdf)]
            for s, e in zip(bounds, bounds[1:]):
                key = norm(tuple(kdf.iloc[s]))
                tag = int(tags.iloc[s])
                chunk = pdf.iloc[s:e][vnames].rename(columns=rename)
                if key != cur:
                    if cur is not None:
                        out.append(finish(cur, state))
                    cur, state = key, init(key)
                state = accumulate(state, tag, chunk)
                if len(out) >= 1000:
                    yield pd.DataFrame(out)
                    out = []
        if cur is not None:
            out.append(finish(cur, state))
        if out:
            yield pd.DataFrame(out)

    return keyed.mapInPandas(gen, schema=schema)


def grouped_auto_apply(
    df: DataFrame,
    keys: Sequence,
    init: Callable,
    accumulate: Callable,
    finish: Callable,
    schema: str,
    key_names: Sequence[str] | None = None,
    order_by: Sequence = (),
    num_partitions: int | None = None,
    threshold_rows: int | None = None,
) -> DataFrame:
    """DATA-DRIVEN dispatch between the fast whole-group path and
    :func:`grouped_stream_apply` (VERDICT r4 next #6): one counting
    probe (:func:`max_group_rows`) decides — groups all under the
    threshold run through ``applyInPandas`` with each group delivered to
    ``accumulate`` as ONE chunk (lowest per-group overhead, no secondary
    sort machinery); any giant key escalates the WHOLE job to the
    chunked stream path, whose peak footprint is one Arrow batch.

    Both paths drive the SAME accumulator trio — a single whole-group
    chunk is a legal chunking, so the Accumulator contract (chunking-
    insensitive ``accumulate``) already guarantees identical results;
    tests pin fast == stream on the same input.  The probe costs one
    count-only shuffle (the payload never moves), which is what makes
    the threshold data-driven rather than caller-guessed."""
    thr = AUTO_STREAM_THRESHOLD_ROWS if threshold_rows is None else threshold_rows
    if max_group_rows(df, keys) > thr:
        return grouped_stream_apply(
            df, keys, init, accumulate, finish, schema,
            key_names=key_names, order_by=order_by,
            num_partitions=num_partitions,
        )
    knames = list(key_names or [f"k{i}" for i in range(len(keys))])
    kcols = [_c(k).alias(n) for k, n in zip(keys, knames)]
    base = df.select(*kcols, "*") if set(knames) - set(df.columns) else df
    onames = [f"__o_{i}" for i in range(len(order_by))]
    for n, o in zip(onames, order_by):
        base = base.withColumn(n, _c(o))
    if num_partitions:
        # honor the caller's width on BOTH paths (the stream path
        # repartitions inside grouped_stream_apply)
        base = base.repartition(num_partitions, *[F.col(n) for n in knames])

    def fn(key, pdf):
        import pandas as pd

        if onames:
            pdf = pdf.sort_values(onames, kind="stable").drop(columns=onames)
        k = tuple(None if pd.isna(v) else v for v in key)
        return pd.DataFrame([finish(k, accumulate(init(k), pdf))])

    return base.groupBy(*[F.col(n) for n in knames]).applyInPandas(fn, schema=schema)


def cogroup_auto_apply(
    inputs: Sequence[tuple[DataFrame, Sequence]],
    init: Callable,
    accumulate: Callable,
    finish: Callable,
    schema: str,
    key_names: Sequence[str] | None = None,
    num_partitions: int | None = None,
    threshold_rows: int | None = None,
    tag_col: str = "__pp_tag",
) -> DataFrame:
    """The cogroup twin of :func:`grouped_auto_apply`: probe the largest
    per-key row count over the tag-aligned UNION of all inputs (what the
    fast path actually materializes per group — probing each input
    separately would let a key with N near-threshold bags slip a
    N×threshold group past the dispatcher); under the threshold, ONE
    ``applyInPandas`` over the union splits each group by tag and drives
    ``accumulate(state, tag, chunk)`` input-by-input (whole bags, one
    chunk each); any giant combined bag escalates to
    :func:`cogroup_stream_apply`.  Identical chunk shapes on both paths
    (shared :func:`_union_align`), and the union probe is ONE counting
    job instead of one per input."""
    thr = AUTO_STREAM_THRESHOLD_ROWS if threshold_rows is None else threshold_rows
    knames, union, all_cols = _union_align(inputs, key_names, tag_col)
    if max_group_rows(union, knames) > thr:
        return cogroup_stream_apply(
            inputs, init, accumulate, finish, schema,
            key_names=key_names, num_partitions=num_partitions,
            tag_col=tag_col,
        )
    if num_partitions:
        union = union.repartition(num_partitions, *[F.col(n) for n in knames])
    vnames = [f"__v_{n}" for n, _ in all_cols]
    rename = dict(zip(vnames, [n for n, _ in all_cols]))

    def fn(key, pdf):
        import pandas as pd

        k = tuple(None if pd.isna(v) else v for v in key)
        st = init(k)
        for tag in sorted(pdf[tag_col].unique()):
            chunk = pdf[pdf[tag_col] == tag][vnames].rename(columns=rename)
            st = accumulate(st, int(tag), chunk)
        return pd.DataFrame([finish(k, st)])

    return union.groupBy(*[F.col(n) for n in knames]).applyInPandas(fn, schema=schema)
