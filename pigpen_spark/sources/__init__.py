from pigpen_spark.sources.io import (
    load_avro,
    load_binary,
    load_csv,
    load_json,
    load_lazy,
    load_parquet,
    load_string,
    load_tsv,
    store_many,
)

__all__ = [
    "load_string", "load_tsv", "load_csv", "load_json", "load_lazy",
    "load_parquet", "load_avro", "load_binary", "store_many",
]
