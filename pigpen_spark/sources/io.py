"""Sources & sinks (reference: SURVEY §2.1, pigpen/io.clj).

Every loader returns a :class:`Relation`.  Gzip transparency, which the
reference implements by hand (local.clj:199-209 ``.gz`` sniffing), is native
in Spark's text/csv/json readers (Hadoop codec discovery) — nothing to do.

Storage-edge typing: the reference's explicit parquet/avro message schemas
(parquet.clj:71-77) map to optional ``schema=`` arguments; by default we use
Spark's footer/inference, which is strictly more capable.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from pigpen_spark.relation import Relation


def load_string(spark: SparkSession, path: str) -> Relation:
    """One string per line (reference: load-string, io.clj:59-70;
    gz-aware reader local.clj:230-242)."""
    return Relation(spark.read.text(path))


def load_tsv(spark: SparkSession, path: str, delimiter: str = "\t",
             schema=None) -> Relation:
    """Line split by delimiter (reference: load-tsv, io.clj:72-86).

    With a schema → typed csv read (predicate pushdown capable); without →
    a single ``value: array<string>`` column like the reference's
    vector-of-strings rows."""
    if schema is not None:
        return Relation(spark.read.option("sep", delimiter).schema(schema).csv(path))
    df = spark.read.text(path)
    return Relation(df.select(F.split(F.col("value"), delimiter).alias("value")))


def load_csv(spark: SparkSession, path: str, delimiter: str = ",", quote: str = '"',
             schema=None, header: bool = False) -> Relation:
    """RFC-4180 per line (reference: load-csv, io.clj:88-104).  Spark's csv
    reader additionally handles embedded newlines (multiLine) — the
    reference explicitly cannot (io.clj:97-99 'no newlines')."""
    # escape=quote → RFC-4180 doubled-quote escaping ("" inside quoted field)
    r = (
        spark.read.option("sep", delimiter).option("quote", quote)
        .option("escape", quote).option("header", header)
    )
    if schema is not None:
        r = r.schema(schema)
    return Relation(r.csv(path))


def load_json(spark: SparkSession, path: str, schema=None) -> Relation:
    """JSON per line (reference: load-json, io.clj:122-138)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return Relation(r.json(path))


def load_lazy(spark: SparkSession, path: str, delimiter: str = "\t") -> Relation:
    """reference: load-lazy (io.clj:140-149) — laziness is inherent in
    Spark's scan; identical to load_tsv here."""
    return load_tsv(spark, path, delimiter)


def load_parquet(spark: SparkSession, path: str, schema=None) -> Relation:
    """reference: load-parquet (pigpen-parquet/.../parquet.clj:105-124)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return Relation(r.parquet(path))


def load_orc(spark: SparkSession, path: str, schema=None) -> Relation:
    """ORC scan (format extension beyond the reference's parquet/avro pair
    — same columnar-lake role; Spark's native ``orc`` datasource, with full
    predicate pushdown / column pruning like parquet)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return Relation(r.orc(path))


def load_binary(spark: SparkSession, path: str) -> Relation:
    """reference: load-binary — PigPen's internal nippy rows (io.clj:30-35).
    Our internal format IS parquet."""
    return load_parquet(spark, path)


def load_avro(spark: SparkSession, path: str, schema=None) -> Relation:
    """reference: load-avro (pigpen-avro/.../avro.clj:46-86, incl. nested
    records and [null, T] unions).

    Preferred path: the JVM ``avro`` datasource (columnar, the production
    classpath ships org.apache.spark:spark-avro).  When the jar is absent
    this falls back to a DISTRIBUTED pure-Python decode: binaryFile scan →
    Arrow-batched mapInPandas running :mod:`pigpen_spark.sources.avro_py`
    (public Avro container spec) on each executor — one task per file, the
    right parallelism for many-file Avro lakes; nothing decodes on the
    driver except one schema probe of the first file."""
    try:
        r = spark.read.format("avro")
        if schema is not None:
            r = r.schema(schema)
        df = r.load(path)
        df.schema  # force analysis so a missing datasource surfaces here
        return Relation(df)
    except Exception as e:
        msg = str(e)
        if not ("Failed to find" in msg or "ClassNotFound" in msg or "DATA_SOURCE_NOT_FOUND" in msg):
            raise  # real errors (bad path, corrupt file) surface unchanged
        return _load_avro_python(spark, path, schema)


def _load_avro_python(spark: SparkSession, path: str, schema=None) -> Relation:
    """Fallback Avro reader on the pure-Python container codec.

    Files are recognized by the container MAGIC (``Obj\\x01``), not by
    extension — extensionless part files (common from other writers) are
    read, and sidecars like ``_SUCCESS`` are skipped.  Each file decodes
    per its OWN embedded writer schema; records align to the target
    schema by field NAME (evolved/reordered writers coerce correctly,
    fields the writer lacks become NULL)."""
    from pigpen_spark.sources import avro_py

    magic = F.lit(avro_py.MAGIC)
    files = (
        spark.read.format("binaryFile")
        .load(path)
        .filter(F.substring("content", 1, len(avro_py.MAGIC)) == magic)
    )
    if schema is None:
        # one driver-side schema probe of the smallest file; data decode
        # stays on the executors
        probe = files.select("content").orderBy(F.col("length")).first()
        if probe is None:
            raise FileNotFoundError(f"no Avro container files under {path}")
        writer_schema, _ = avro_py.read_container(bytes(probe["content"]))
        # full struct DDL (pyspark accepts "struct<a: bigint, …>" directly)
        schema = avro_py.to_spark_type(writer_schema)

    from pyspark.sql.types import StructType

    fields = (
        StructType.fromDDL(schema) if isinstance(schema, str) else schema
    ).fieldNames()

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                _, records = avro_py.read_container(bytes(blob))
                rows.extend(records)
            if rows:
                # align by name to the target schema: dict keys follow
                # each file's writer schema, which may be a reordered or
                # evolved superset/subset of the probe file's
                yield pd.DataFrame(rows).reindex(columns=fields)

    return Relation(files.select("content").mapInPandas(decode, schema=schema))


def load_pickle(spark: SparkSession, path: str, schema=None) -> Relation:
    """Pickled-row binary files — the Python-idiomatic analog of the
    reference's nippy BinStorage (load-binary, io.clj:30-35): arbitrary
    Python values serialized per record.  Reads SequenceFiles written by
    :func:`store_pickle`."""
    rdd = spark.sparkContext.pickleFile(path)
    if schema is not None:
        return Relation(spark.createDataFrame(rdd, schema=schema))
    return Relation(spark.createDataFrame(rdd))


def store_pickle(rel: Relation, path: str) -> None:
    """Write rows as pickled Python dicts (nippy-rows analog).  Use for
    debug/interchange only — parquet is the real internal format."""
    rel.df.rdd.map(lambda r: r.asDict(recursive=True)).saveAsPickleFile(path)


def load_hadoop(
    spark: SparkSession,
    path: str,
    input_format: str = "org.apache.hadoop.mapreduce.lib.input.TextInputFormat",
    key_class: str = "org.apache.hadoop.io.LongWritable",
    value_class: str = "org.apache.hadoop.io.Text",
) -> Relation:
    """Arbitrary Hadoop InputFormat bridge (reference: InputFormatLoader,
    pigpen-hadoop/src/main/clojure/pigpen/hadoop.clj:62-90) via
    ``newAPIHadoopFile``.  Returns (key string, value string) rows."""
    rdd = spark.sparkContext.newAPIHadoopFile(path, input_format, key_class, value_class)
    return Relation(
        spark.createDataFrame(
            rdd.map(lambda kv: (str(kv[0]), str(kv[1]))), schema="key string, value string"
        )
    )


def store_many(rel: Relation, *writers: Callable[[Relation], None]) -> None:
    """Module-level alias of :meth:`Relation.store_many`."""
    rel.store_many(*writers)


def load_tap(spark: SparkSession, reader) -> Relation:
    """Wrap ANY platform source as a relation (reference: load-tap,
    pigpen-cascading/src/main/clojure/pigpen/cascading.clj:50-70 — the
    reference wraps an arbitrary Cascading Tap; the Spark analog wraps an
    arbitrary DataFrame producer).  ``reader`` is either a DataFrame (an
    existing scan/view/JDBC read) or a callable ``SparkSession ->
    DataFrame`` for deferred construction — so any ``spark.read.format``
    plug-in, temp view, or hand-built frame joins the Relation algebra
    with every downstream operator available."""
    from pyspark.sql import DataFrame as _DF

    df = reader if isinstance(reader, _DF) else reader(spark)
    if not isinstance(df, _DF):
        raise TypeError(
            f"load_tap: reader must be or produce a DataFrame, got {type(df).__name__}"
        )
    return Relation(df)


def store_tap(rel: Relation, writer) -> None:
    """Store through ANY platform sink (reference: store-tap,
    cascading.clj:72-88): ``writer`` receives the materialized DataFrame
    (pending fused Python ops compiled first) and drives any
    ``df.write.format`` plug-in or side-effecting sink."""
    writer(rel.df)


def store_tar_shards(df, path: str, payload_col: str = "payload",
                     name_col: str = "id", suffix: str = ".bin",
                     meta_cols: Sequence[str] = (),
                     shards: int | None = None) -> None:
    """WebDataset-style tar-shard sink for multimodal corpora: pack each
    partition's (name, payload[, meta]) rows into one POSIX tar
    ``shard-NNNNN.tar`` under ``path`` — the packaging convention
    sequential trainers stream (member ``<name><suffix>`` carries the
    payload bytes; ``<name>.json`` carries the metadata columns).  Pure
    stdlib ``tarfile`` inside ``foreachPartition``: payload bytes never
    visit the driver, each task writes exactly one shard, and ``shards``
    (default: current partitioning) sets the fan-out — size shards to
    ~100-1000 samples like any WebDataset pipeline.  Local-FS path here;
    on a cluster point at a shared mount (object stores want the
    staging-committer equivalent, documented contract)."""
    import json
    import os

    os.makedirs(path, exist_ok=True)
    src = df.repartition(shards) if shards else df
    cols = [name_col, payload_col, *meta_cols]
    metas = list(meta_cols)

    def write_partition(rows):
        import io as _io
        import tarfile

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        buf = _io.BytesIO()
        n = 0
        with tarfile.open(fileobj=buf, mode="w") as tar:
            for row in rows:
                name = str(row[name_col])
                payload = bytes(row[payload_col])
                info = tarfile.TarInfo(name=f"{name}{suffix}")
                info.size = len(payload)
                tar.addfile(info, _io.BytesIO(payload))
                if metas:
                    mj = json.dumps({m: row[m] for m in metas},
                                    sort_keys=True).encode()
                    mi = tarfile.TarInfo(name=f"{name}.json")
                    mi.size = len(mj)
                    tar.addfile(mi, _io.BytesIO(mj))
                n += 1
        if n:                      # empty partitions write no shard
            with open(os.path.join(path, f"shard-{pid:05d}.tar"), "wb") as f:
                f.write(buf.getvalue())

    src.select(*cols).foreachPartition(write_partition)


def load_tar_shards(spark: SparkSession, path: str,
                    suffix: str = ".bin") -> Relation:
    """Read tar shards back as (shard, name, payload, meta_json) rows:
    ``binaryFile`` scan of ``shard-*.tar`` + a per-shard stdlib untar in
    mapInPandas — shards stay executor-local, parallelism = shard count
    (the same contract WebDataset loaders use).  ``meta_json`` is NULL
    when a member has no ``.json`` sidecar."""
    src = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "shard-*.tar")
        .load(path)
        .select(F.col("path").alias("shard"), F.col("content"))
    )

    def untar(batches):
        import io as _io
        import tarfile

        import pandas as pd

        for pdf in batches:
            rows = []
            for shard, content in zip(pdf["shard"], pdf["content"]):
                with tarfile.open(fileobj=_io.BytesIO(bytes(content))) as tar:
                    payloads: dict[str, bytes] = {}
                    metas: dict[str, str] = {}
                    for m in tar.getmembers():
                        data = tar.extractfile(m).read()
                        if m.name.endswith(".json"):
                            metas[m.name[:-5]] = data.decode()
                        elif m.name.endswith(suffix):
                            payloads[m.name[:-len(suffix)]] = data
                    for name, payload in payloads.items():
                        rows.append({
                            "shard": shard.rsplit("/", 1)[-1], "name": name,
                            "payload": payload,
                            "meta_json": metas.get(name),
                        })
            yield pd.DataFrame(rows)

    return Relation(src.mapInPandas(
        untar, schema="shard string, name string, payload binary, meta_json string"))


def store_arrow_ipc(df, path: str, shards: int | None = None,
                    compression: str | None = None) -> None:
    """Arrow IPC (Feather v2) shard sink — the zero-parse interchange
    format ML dataloaders mmap directly: each partition writes one
    ``part-NNNNN.arrow`` IPC FILE under ``path`` through ``mapInArrow``,
    so record batches go executor→disk without ever becoming Python
    rows (the same no-driver-bytes contract as store_tar_shards).
    ``shards`` resizes the fan-out; ``compression`` is pyarrow's IPC
    codec (None / "lz4" / "zstd" as available).  Local-FS path here; on
    a cluster point at a shared mount (object stores want the
    staging-committer equivalent, documented contract)."""
    import os

    os.makedirs(path, exist_ok=True)
    src = df.repartition(shards) if shards else df

    def write(batches):
        import pyarrow as pa
        import pyarrow.ipc as ipc

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        writer = None
        n = 0
        try:
            for batch in batches:
                if writer is None:
                    opts = (ipc.IpcWriteOptions(compression=compression)
                            if compression else None)
                    writer = ipc.new_file(
                        os.path.join(path, f"part-{pid:05d}.arrow"),
                        batch.schema, options=opts)
                writer.write_batch(batch)
                n += batch.num_rows
        finally:
            if writer is not None:
                writer.close()
        yield pa.RecordBatch.from_pydict({"n": pa.array([n], pa.int64())})

    # the summary collect is the ACTION that drives the writes; empty
    # partitions write no file and report 0
    src.mapInArrow(write, schema="n long").agg({"n": "sum"}).collect()


def load_arrow_ipc(spark: SparkSession, path: str, schema=None) -> Relation:
    """Arrow IPC (Feather v2) shard source: ``binaryFile`` scan of
    ``part-*.arrow`` + a per-file pyarrow IPC read in mapInPandas —
    files stay executor-local, parallelism = shard count.  ``schema``
    defaults to the first file's embedded Arrow schema (one driver-side
    footer probe, converted via from_arrow_schema — the avro-fallback
    pattern)."""
    import glob as _glob
    import os

    if schema is None:
        import pyarrow.ipc as ipc

        from pyspark.sql.pandas.types import from_arrow_schema

        first = sorted(_glob.glob(os.path.join(path, "part-*.arrow")))
        if not first:
            raise ValueError(f"load_arrow_ipc: no part-*.arrow under {path}")
        with ipc.open_file(first[0]) as r:
            schema = from_arrow_schema(r.schema)

    src = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "part-*.arrow")
        .load(path)
        .select("content")
    )

    def read(batches):
        import io as _io

        import pyarrow.ipc as ipc

        for pdf in batches:
            for content in pdf["content"]:
                with ipc.open_file(_io.BytesIO(bytes(content))) as r:
                    yield r.read_pandas()

    return Relation(src.mapInPandas(read, schema=schema))
