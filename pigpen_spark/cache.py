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


# ---------------------------------------------------------------------------
# localCheckpoint block tracking.  DataFrame.unpersist() is a NO-OP for a
# checkpoint-backed frame: the blocks were persisted on the underlying RDD by
# Dataset.checkpoint, not registered with the CacheManager, so freeing them
# needs rdd.unpersist() on the LogicalRDD the checkpointed frame wraps.
# Iterative operators (suffix array, LCP descent) produce O(log n)
# corpus-sized checkpoints per call — without deterministic freeing they
# accumulate until GC/ContextCleaner gets around to them (the 100x OOM
# lesson, suffix.py).
# ---------------------------------------------------------------------------

_HELD_CKPT: list[DataFrame] = []


def free_ckpt(df: DataFrame) -> bool:
    """Immediately release the storage blocks behind a frame returned by
    ``localCheckpoint`` (the frame must BE the checkpoint result — its
    analyzed plan is the LogicalRDD — not a select over it).  After this
    the frame's data is gone permanently (local checkpoints are not
    recomputable); only call on tables provably dead."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
        return True
    except Exception:
        return False


def hold_ckpt(df: DataFrame) -> DataFrame:
    """Register a checkpoint-backed frame for a later scoped
    :func:`release_ckpt_since` — the checkpoint twin of :func:`hold`."""
    with _LOCK:
        _HELD_CKPT.append(df)
    return df


def mark_ckpt() -> int:
    with _LOCK:
        return len(_HELD_CKPT)


def release_ckpt_since(marker: int) -> int:
    """Free the storage blocks of every checkpoint registered after
    ``marker``.  The freed frames must not be referenced by any plan that
    still runs — local checkpoints cannot be recomputed."""
    with _LOCK:
        held, _HELD_CKPT[marker:] = _HELD_CKPT[marker:], []
    n = 0
    for df in held:
        if free_ckpt(df):
            n += 1
    return n


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
