"""pigpen_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Netflix/PigPen.

The reference (Netflix/PigPen, /root/reference) is a Clojure Map-Reduce DSL
whose operators build a lazy logical dataflow graph compiled to Pig /
Cascading / local backends.  This package re-expresses the same operator
semantics Spark-first: a thin fluent :class:`Relation` layer over
``pyspark.sql.DataFrame`` so every operator that *can* be a Catalyst
expression *is* one, with Arrow-batched Python UDFs only where arbitrary
Python logic is genuinely required.

Layout (mirrors SURVEY.md §7):

- :mod:`pigpen_spark.session`    — SparkSession builder with scale-aware defaults
- :mod:`pigpen_spark.relation`   — the Relation API (PigPen operator surface)
- :mod:`pigpen_spark.fold`       — the composable fold (aggregation) algebra
- :mod:`pigpen_spark.operators`  — join / cogroup / set-op semantics helpers
- :mod:`pigpen_spark.sources`    — load_* / store_* I/O (text, csv, tsv, json, parquet, avro)
- :mod:`pigpen_spark.functions`  — dedup, similarity, text-analysis, multimodal ops
- :mod:`pigpen_spark.plans`      — plan introspection / viz (``show`` analog)
- :mod:`pigpen_spark.streaming`  — Structured Streaming variants (extension surface)
"""

from pigpen_spark.session import get_spark
from pigpen_spark.relation import Relation, load_parquet, return_
from pigpen_spark import fold

__version__ = "0.1.0"

__all__ = ["get_spark", "Relation", "load_parquet", "return_", "fold", "__version__"]
