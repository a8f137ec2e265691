"""Scalar/extension function library.

The reference has NO scalar function library (SURVEY §2.7) — users write
plain Clojure inside closures.  Our users get ``pyspark.sql.functions``
directly; this package adds the large-scale training-data-pipeline
operators the reference lacks: dedup, similarity search, text analysis,
multimodal column plumbing.
"""

from pigpen_spark.functions import dedup, multimodal, similarity, text

__all__ = ["dedup", "similarity", "text", "multimodal"]
