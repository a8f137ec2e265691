"""Structured Streaming extension surface.

The reference has no distributed streaming (SURVEY §2.8 — pigpen-rx is a
local lazy evaluator only); this package is pure extension: the same
Relation operators over ``readStream`` with watermarks/windows/state.
"""

from pigpen_spark.streaming.core import (
    dedup_stream,
    foreach_batch_many,
    read_stream_json,
    read_stream_parquet,
    read_stream_rate,
    running_totals,
    sessionize_stream,
    stream_static_join,
    windowed_agg,
    write_stream_parquet,
)

__all__ = [
    "read_stream_parquet", "read_stream_json", "read_stream_rate",
    "windowed_agg", "sessionize_stream", "dedup_stream", "running_totals",
    "stream_static_join", "write_stream_parquet", "foreach_batch_many",
]
