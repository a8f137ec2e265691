"""The composable fold (aggregation) algebra.

reference: pigpen/fold.clj — a fold-fn is ``{pre, combinef, reducef, post}``
(join.clj:48-61, fold.clj:29-51), exactly Spark's Aggregator shape
(SURVEY §2.4).  Native folds compile to a single Catalyst aggregate Column
— which gives map-side partial aggregation (HashAggregate partial/final),
the same execution shape as the reference's Pig ``Algebraic``
(PigPenFnAlgebraic.java:40-151) and Cascading ``AggregateBy``
(PigPenAggregateBy.java:1-97).

Composition combinators mirror fold.clj:

- pre-stages  (map/mapcat/filter/remove/keep, fold.clj:107-137) → wrap the
  input expression before aggregation.
- post-stages (sort/take/first/last…, fold.clj:155-260) → wrap the
  aggregated value (array functions on a collected bag).
- ``juxt`` (fold.clj:262-296) → N folds over the same pass = N aggregate
  columns in one ``.agg()``.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    # deliberate local copy of relation._to_col: relation.py imports this
    # module (Fold), so importing back would be a circular import
    return x if isinstance(x, Column) else F.col(x)


class Fold:
    """A fold that compiles to a Catalyst aggregate Column.

    ``expr`` is the aggregate expression; ``name`` the default alias.
    Pre/post composition happens at Column level, so any chain of native
    stages stays one JVM-side aggregate.
    """

    def __init__(self, expr: Column, name: str | None = None):
        self.expr = expr
        self.name = name

    def alias(self, name: str) -> "Fold":
        return Fold(self.expr.alias(name), name)

    def post(self, fn) -> "Fold":
        """Apply a Column→Column post-stage (fold.clj comp-post, :75-88)."""
        return Fold(fn(self.expr), self.name)

    @staticmethod
    def to_column(f: "Fold | Column") -> Column:
        if isinstance(f, Fold):
            return f.expr.alias(f.name) if f.name else f.expr
        return f


# -- built-in folds (fold.clj ↔ Spark natives) ------------------------------


def count(col: Any = None) -> Fold:
    """fold/count (fold.clj:298-319)."""
    return Fold(F.count(_c(col)) if col is not None else F.count(F.lit(1)), "count")


def sum_(col: Any) -> Fold:
    """fold/sum (fold.clj:321-343)."""
    return Fold(F.sum(_c(col)), "sum")


def avg(col: Any) -> Fold:
    """fold/avg (fold.clj:345-375) — nil-safe: Spark avg is NULL on empty
    groups, matching the reference's nil-on-empty."""
    return Fold(F.avg(_c(col)), "avg")


def min_(col: Any) -> Fold:
    """fold/min (fold.clj:411-452)."""
    return Fold(F.min(_c(col)), "min")


def max_(col: Any) -> Fold:
    """fold/max (fold.clj:453-495)."""
    return Fold(F.max(_c(col)), "max")


def min_key(key: Any, val: Any) -> Fold:
    """fold/min-key (fold.clj:453-471) → min_by."""
    return Fold(F.min_by(_c(val), _c(key)), "min_key")


def max_key(key: Any, val: Any) -> Fold:
    """fold/max-key (fold.clj:497-515) → max_by."""
    return Fold(F.max_by(_c(val), _c(key)), "max_key")


def min_with(val: Any, *keys: Any) -> Fold:
    """fold/min with an ARBITRARY comparator (fold.clj:411-452 takes any
    2-arity compare fn).  The comparator is expressed as one or more
    ordering KEY expressions compared lexicographically — e.g. "closest to
    x" is ``min_with(col, F.abs(col - x))``, "shortest then alphabetical"
    is ``min_with(col, F.length(col), col)``.  Struct ordering keeps it
    ONE native aggregate with map-side partials; ties after all keys break
    on the value itself, so the result is deterministic (both engines
    compare structs field-by-field left to right)."""
    if not keys:
        return min_(val)
    pair = F.struct(
        *[_c(k).alias(f"k{i}") for i, k in enumerate(keys)], _c(val).alias("v")
    )
    # NULL-key rows must be ignored (min_key/min_by semantics) — struct
    # ordering sorts NULL fields FIRST, so a bare F.min would pick them
    cond = _c(keys[0]).isNotNull()
    for k in keys[1:]:
        cond = cond & _c(k).isNotNull()
    return Fold(F.min(F.when(cond, pair))["v"], "min_with")


def max_with(val: Any, *keys: Any) -> Fold:
    """fold/max with an arbitrary comparator (fold.clj:453-495) — see
    :func:`min_with`; largest key tuple wins, ties break on the value."""
    if not keys:
        return max_(val)
    pair = F.struct(
        *[_c(k).alias(f"k{i}") for i, k in enumerate(keys)], _c(val).alias("v")
    )
    # symmetric NULL-key guard (max is only safe by accident of NULLS
    # FIRST ordering; be explicit so both folds share the contract)
    cond = _c(keys[0]).isNotNull()
    for k in keys[1:]:
        cond = cond & _c(k).isNotNull()
    return Fold(F.max(F.when(cond, pair))["v"], "max_with")


def vec(col: Any, sort: bool = False) -> Fold:
    """fold/vec — collect bag (fold.clj:90-105)."""
    e = F.collect_list(_c(col))
    return Fold(F.sort_array(e) if sort else e, "vec")


def distinct(col: Any, sort: bool = True) -> Fold:
    """fold/distinct (fold.clj:139-153)."""
    e = F.collect_set(_c(col))
    return Fold(F.sort_array(e) if sort else e, "distinct")


def count_distinct(col: Any) -> Fold:
    return Fold(F.count_distinct(_c(col)), "count_distinct")


def top(col: Any, n: int) -> Fold:
    """fold/top — n largest (fold.clj:377-395): sorted-desc slice of the
    collected bag.  For large groups prefer a window row_number query."""
    e = F.slice(F.sort_array(F.collect_list(_c(col)), asc=False), 1, n)
    return Fold(e, "top")


def top_by(key: Any, val: Any, n: int) -> Fold:
    """fold/top-by (fold.clj:397-409): top-n vals ordered by key desc —
    struct-sort trick keeps it one native aggregate."""
    pair = F.struct(_c(key).alias("k"), _c(val).alias("v"))
    e = F.transform(F.slice(F.sort_array(F.collect_list(pair), asc=False), 1, n), lambda s: s["v"])
    return Fold(e, "top_by")


def first(col: Any) -> Fold:
    """fold/first (fold.clj:218-234) — first of the sorted bag for
    determinism (bag order is undefined in both engines)."""
    return Fold(F.min(_c(col)), "first")


def last(col: Any) -> Fold:
    return Fold(F.max(_c(col)), "last")


def approx_count_distinct(col: Any, rsd: float = 0.05) -> Fold:
    """Extension beyond the reference (SURVEY §2.4: no approximate
    aggregates there) — HLL sketch, mergeable map-side."""
    return Fold(F.approx_count_distinct(_c(col), rsd), "approx_count_distinct")


def quantiles(col: Any, probs: Sequence[float]) -> Fold:
    """Exact interpolated quantiles (extension; SURVEY §2.4 notes the
    reference has none).  Spark ``percentile`` and ANSI ``quantile_cont``
    share the (n−1)·p linear-interpolation definition, so results are
    engine-portable.  For 100 TB use approx_percentile instead (sketch,
    mergeable map-side) — exact percentile shuffles the full column."""
    return Fold(F.percentile(_c(col), F.array(*[F.lit(p) for p in probs])), "quantiles")


def approx_quantiles(col: Any, probs: Sequence[float], accuracy: int = 10000) -> Fold:
    """KLL/GK-sketch quantiles — the scale path (mergeable partials)."""
    return Fold(F.percentile_approx(_c(col), F.array(*[F.lit(p) for p in probs]), F.lit(accuracy)), "approx_quantiles")


def juxt(*folds: Fold) -> list[Fold]:
    """fold/juxt (fold.clj:262-296): N folds, one pass.  In Spark N
    aggregate columns in a single .agg() are already one pass; returned as a
    list to splat into fold()."""
    return list(folds)
