"""Opaque Python-object pipelines — the arbitrary-Clojure-value analog.

The reference's relations carry ANY Clojure value in a single ``value``
field, nippy-frozen between operators (SURVEY §1.2: the ``:frozen`` field
type; raw.clj:47).  The Spark-first translation (SURVEY §4.5.5): a single
``value: binary`` column of cloudpickled Python objects — sets, tuples,
custom classes, arbitrary nesting — with the same fuse-before-ship
discipline as the typed ``*_py`` path: consecutive object-ops compose into
ONE ``mapInPandas`` crossing (the optimize-binds rule, oven.clj:189-248).

Usage::

    obj = to_pyobj(rel, lambda row: {frozenset(row["k"]), (row["a"], row["b"])})
    out = (obj.map_obj(transform)
              .filter_obj(pred)
              .mapcat_obj(expand))          # ← all one Arrow round-trip
    typed = out.to_typed("x long, y string", lambda v: {"x": ..., "y": ...})

Scale notes: objects stay pickled between fused chains (one
serialize/deserialize per chain END, exactly the reference's
serialization-minimization rule, README.md:236-240); group_by_key uses the
pickled KEY bytes as the shuffle key — equal objects pickle identically
for the common value types (tuples/strings/numbers/None; avoid dicts/sets
as KEYS since their pickle bytes aren't canonical).
"""

from __future__ import annotations

import pickle
from collections.abc import Callable, Iterable
from typing import Any

from pyspark.sql import DataFrame

# the fused-chain machinery is payload-agnostic — share it with the typed
# *_py path rather than maintaining a second copy
from pigpen_spark.relation import Relation, _compile_chain, _PyOp

_OBJ_SCHEMA = "value binary"
_KV_SCHEMA = "key binary, value binary"


class PyObjRelation:
    """A bag of arbitrary pickled Python values (single binary column),
    with fused map/filter/mapcat chains."""

    def __init__(self, df: DataFrame, _pending: tuple[_PyOp, ...] = ()):
        self._df = df
        self._pending = _pending

    # -- fused ops ----------------------------------------------------------

    def map_obj(self, fn: Callable[[Any], Any]) -> "PyObjRelation":
        return PyObjRelation(self._df, self._pending + (_PyOp("map", fn),))

    def filter_obj(self, fn: Callable[[Any], bool]) -> "PyObjRelation":
        return PyObjRelation(self._df, self._pending + (_PyOp("filter", fn),))

    def mapcat_obj(self, fn: Callable[[Any], Iterable[Any]]) -> "PyObjRelation":
        return PyObjRelation(self._df, self._pending + (_PyOp("mapcat", fn),))

    # -- materialization ----------------------------------------------------

    @property
    def df(self) -> DataFrame:
        """Compile pending ops into ONE mapInPandas over pickled values."""
        if not self._pending:
            return self._df
        chain = _compile_chain(self._pending)

        def run(batches):
            import pandas as pd

            for pdf in batches:
                out = [
                    pickle.dumps(result)
                    for blob in pdf["value"]
                    for result in chain(pickle.loads(bytes(blob)))
                ]
                if out:
                    yield pd.DataFrame({"value": out})

        return self._df.mapInPandas(run, schema=_OBJ_SCHEMA)

    def collect(self) -> list:
        return [pickle.loads(bytes(r["value"])) for r in self.df.collect()]

    def count(self) -> int:
        return self.df.count()

    # -- grouping / dedup on object identity --------------------------------

    def group_by_key(
        self,
        key_fn: Callable[[Any], Any],
        reduce_fn: Callable[[Any, Any], Any],
    ) -> "PyObjRelation":
        """Shuffle-grouped reduce over arbitrary objects: key bytes are the
        shuffle key, values combine MAP-SIDE via reduceByKey (map-side
        combine before the shuffle — the reference's Algebraic
        partial+final shape) — emits (key, reduced) pairs as python
        tuples."""
        src = self.df

        def keyed(batches):
            import pandas as pd

            for pdf in batches:
                keys, vals = [], []
                for blob in pdf["value"]:
                    raw = bytes(blob)
                    keys.append(pickle.dumps(key_fn(pickle.loads(raw))))
                    vals.append(raw)  # value bytes pass through unchanged
                if keys:
                    yield pd.DataFrame({"key": keys, "value": vals})

        kv = src.mapInPandas(keyed, schema=_KV_SCHEMA)
        rdd = kv.rdd.map(lambda r: (bytes(r["key"]), pickle.loads(bytes(r["value"]))))
        agged = rdd.reduceByKey(reduce_fn)
        out = agged.map(lambda kv_: (pickle.dumps((pickle.loads(kv_[0]), kv_[1])),))
        return PyObjRelation(src.sparkSession.createDataFrame(out, schema=_OBJ_SCHEMA))

    def distinct_obj(self) -> "PyObjRelation":
        """Exact object dedup on pickled bytes (canonical for scalars,
        strings, tuples, None — NOT dicts/sets)."""
        return PyObjRelation(self.df.distinct())

    # -- back to the typed world --------------------------------------------

    def to_typed(self, schema: str, fn: Callable[[Any], dict]) -> Relation:
        """Convert objects back to typed columns (one final crossing)."""
        src = self.df

        def conv(batches):
            import pandas as pd

            for pdf in batches:
                rows = [fn(pickle.loads(bytes(b))) for b in pdf["value"]]
                if rows:
                    yield pd.DataFrame(rows)

        return Relation(src.mapInPandas(conv, schema=schema))


def to_pyobj(rel: Relation, fn: Callable[[dict], Any] | None = None) -> PyObjRelation:
    """Enter the opaque world: each row becomes one Python object
    (default: the row-dict itself)."""
    make = fn or (lambda row: row)
    src = rel.df

    def conv(batches):
        import pandas as pd

        for pdf in batches:
            out = [pickle.dumps(make(rec)) for rec in pdf.to_dict("records")]
            if out:
                yield pd.DataFrame({"value": out})

    return PyObjRelation(src.mapInPandas(conv, schema=_OBJ_SCHEMA))


def return_objects(spark, objects: Iterable[Any]) -> PyObjRelation:
    """Literal objects in-plan (the reference's ``return`` for arbitrary
    values, io.clj:265-300)."""
    rows = [(pickle.dumps(o),) for o in objects]
    return PyObjRelation(spark.createDataFrame(rows, schema=_OBJ_SCHEMA))
