"""Registry of DataFrames the engine has persisted on a user's behalf.

Several operators persist intermediates for correctness or to stop
Catalyst re-inlining an expensive subtree (two-phase rank's partition
ids must be identical across two passes; LSH/minhash candidate tables
self-join a derived hash column; the corpus pipeline fans one survivor
set out to three consumers).  Those caches are deliberately
session-lived — but a long-running embedder that loops over corpora
needs a way to release them that does NOT also evict the user's own
``df.cache()`` data the way ``spark.catalog.clearCache()`` would.

Every engine-side ``persist()`` is therefore routed through
:func:`hold`, and :func:`release` unpersists exactly the engine's
holdings (strong references on purpose: the JVM-side cache outlives the
Python object, so a weakref would orphan the very cache we need to
free).  ``pigpen_spark.tuning.clear_engine_caches`` delegates here.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_HELD: list[DataFrame] = []


def hold(df: DataFrame) -> DataFrame:
    """Register an engine-persisted DataFrame for later :func:`release`.

    Returns ``df`` so call sites can stay expression-shaped:
    ``cand = hold(sigs.join(...).persist())``.
    """
    with _LOCK:
        _HELD.append(df)
    return df


def persisted(df: DataFrame) -> DataFrame:
    """``persist()`` + :func:`hold` in one step, shaped for
    ``.transform(persisted)`` at the end of a DataFrame chain."""
    return hold(df.persist())


def held_count() -> int:
    with _LOCK:
        return len(_HELD)


def release() -> int:
    """Unpersist every registered DataFrame; returns how many were held.

    Blocking=False (Spark's default): eviction happens asynchronously on
    the JVM side, which is fine — correctness never depends on a cache
    being *absent*.
    """
    with _LOCK:
        held, _HELD[:] = _HELD[:], []
    for df in held:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
    return len(held)


def mark() -> int:
    """Position marker for :func:`release_since` — take it BEFORE a
    bounded piece of work whose engine persists should not outlive it."""
    with _LOCK:
        return len(_HELD)


def release_since(marker: int) -> int:
    """Unpersist exactly the engine holdings registered after ``marker``
    (scoped release for iterative operators: each prefix-doubling /
    peeling round's intermediates die with the round, without touching
    caches other operators still depend on the way :func:`release`
    would).  Returns how many were released."""
    with _LOCK:
        held, _HELD[marker:] = _HELD[marker:], []
    for df in held:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
    return len(held)
