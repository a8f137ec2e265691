from pigpen_spark.sources.io import (
    load_avro,
    load_binary,
    load_csv,
    load_hadoop,
    load_json,
    load_lazy,
    load_orc,
    load_parquet,
    load_pickle,
    load_string,
    load_tsv,
    store_many,
    store_pickle,
)

__all__ = [
    "load_string", "load_tsv", "load_csv", "load_json", "load_lazy",
    "load_parquet", "load_orc", "load_avro", "load_binary", "load_pickle",
    "load_hadoop",
    "store_many", "store_pickle",
]
