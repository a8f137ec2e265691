"""Pure-Python Avro object-container codec (decode + encode subset).

Why this exists: the reference ships a first-class Avro loader
(pigpen-avro/src/main/clojure/pigpen/avro/core.clj:52-87, incl. nested
records and [null, T] unions), but this container has neither the
``spark-avro`` datasource jar nor a Python avro package, and no network to
fetch them.  Rather than leave ``load_avro`` forever import-guarded and
untested, this module implements the public Avro 1.x object-container
spec (https://avro.apache.org/docs/current/specification/) directly —
enough of it to read and write real Avro files: null/boolean/int/long/
float/double/string/bytes/enum/fixed primitives, records, arrays, maps,
unions, and the ``null``/``deflate`` codecs.

At scale this is the FALLBACK path: :func:`pigpen_spark.sources.io.
load_avro` first tries the JVM ``avro`` datasource (preferred — columnar,
predicate-capable, the production deployment ships the jar) and only then
falls back to a distributed binaryFile + mapInPandas decode built on this
module (one task per file — the right parallelism for the many-file Avro
lakes the reference targets).

Decoding is driver-independent and stateless, so executors import this
module and decode their own files; nothing round-trips through the
driver.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from typing import Any

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# primitive wire format
# ---------------------------------------------------------------------------


def _read_varint(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        acc |= (b[0] & 0x7F) << shift
        if not b[0] & 0x80:
            return acc
        shift += 7


def read_long(buf: io.BytesIO) -> int:
    n = _read_varint(buf)
    return (n >> 1) ^ -(n & 1)  # zigzag


def write_long(out: io.BytesIO, v: int) -> None:
    n = (v << 1) ^ (v >> 63) if v < 0 else v << 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def read_bytes(buf: io.BytesIO) -> bytes:
    n = read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("truncated bytes")
    return data


def write_bytes(out: io.BytesIO, v: bytes) -> None:
    write_long(out, len(v))
    out.write(v)


# ---------------------------------------------------------------------------
# schema-driven datum decode/encode
# ---------------------------------------------------------------------------


def decode_datum(schema: Any, buf: io.BytesIO, names: dict | None = None) -> Any:
    """Decode one datum per the writer ``schema`` (parsed JSON form)."""
    names = names if names is not None else {}
    if isinstance(schema, str) and schema in names:
        schema = names[schema]
    if isinstance(schema, str):
        t = schema
    elif isinstance(schema, list):  # union: branch index then value
        idx = read_long(buf)
        return decode_datum(schema[idx], buf, names)
    else:
        t = schema["type"]
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return read_bytes(buf)
    if t == "string":
        return read_bytes(buf).decode("utf-8")
    if t == "record":
        names[schema["name"]] = schema
        return {f["name"]: decode_datum(f["type"], buf, names) for f in schema["fields"]}
    if t == "enum":
        names[schema["name"]] = schema
        return schema["symbols"][read_long(buf)]
    if t == "fixed":
        names[schema["name"]] = schema
        return buf.read(schema["size"])
    if t == "array":
        out = []
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix
                read_long(buf)
                n = -n
            out.extend(decode_datum(schema["items"], buf, names) for _ in range(n))
    if t == "map":
        out = {}
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:
                read_long(buf)
                n = -n
            for _ in range(n):
                k = read_bytes(buf).decode("utf-8")
                out[k] = decode_datum(schema["values"], buf, names)
    raise ValueError(f"unsupported avro type: {t!r}")


def encode_datum(schema: Any, v: Any, out: io.BytesIO, names: dict | None = None) -> None:
    names = names if names is not None else {}
    if isinstance(schema, str) and schema in names:
        schema = names[schema]
    if isinstance(schema, str):
        t = schema
    elif isinstance(schema, list):
        # union: first matching branch ([null, T] style — None → null branch)
        for i, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch.get("type")
            if (v is None) == (bt == "null"):
                write_long(out, i)
                encode_datum(branch, v, out, names)
                return
        raise ValueError(f"no union branch for {v!r} in {schema!r}")
    else:
        t = schema["type"]
    if t == "null":
        return
    if t == "boolean":
        out.write(b"\x01" if v else b"\x00")
    elif t in ("int", "long"):
        write_long(out, int(v))
    elif t == "float":
        out.write(struct.pack("<f", float(v)))
    elif t == "double":
        out.write(struct.pack("<d", float(v)))
    elif t == "bytes":
        write_bytes(out, bytes(v))
    elif t == "string":
        write_bytes(out, str(v).encode("utf-8"))
    elif t == "record":
        names[schema["name"]] = schema
        for f in schema["fields"]:
            encode_datum(f["type"], v[f["name"]], out, names)
    elif t == "enum":
        write_long(out, schema["symbols"].index(v))
    elif t == "fixed":
        out.write(bytes(v))
    elif t == "array":
        if v:
            write_long(out, len(v))
            for item in v:
                encode_datum(schema["items"], item, out, names)
        write_long(out, 0)
    elif t == "map":
        if v:
            write_long(out, len(v))
            for k, item in v.items():
                write_bytes(out, str(k).encode("utf-8"))
                encode_datum(schema["values"], item, out, names)
        write_long(out, 0)
    else:
        raise ValueError(f"unsupported avro type: {t!r}")


# ---------------------------------------------------------------------------
# object container files
# ---------------------------------------------------------------------------


def read_container(data: bytes) -> tuple[dict | str | list, list[Any]]:
    """Decode a whole object-container file → (writer schema, records)."""
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError("not an avro object container file (bad magic)")
    meta = decode_datum({"type": "map", "values": "bytes"}, buf)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = buf.read(16)
    records: list[Any] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        count = read_long(buf)
        size = read_long(buf)
        block = buf.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec: {codec!r}")
        bbuf = io.BytesIO(block)
        names: dict = {}
        records.extend(decode_datum(schema, bbuf, names) for _ in range(count))
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
    return schema, records


def write_container(schema: dict | str | list, records: list[Any],
                    codec: str = "null") -> bytes:
    """Encode records into a single-block object-container file."""
    body = io.BytesIO()
    names: dict = {}
    for r in records:
        encode_datum(schema, r, body, names)
    block = body.getvalue()
    if codec == "deflate":
        co = zlib.compressobj(wbits=-15)
        block = co.compress(block) + co.flush()
    elif codec != "null":
        raise ValueError(f"unsupported avro codec: {codec!r}")
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode("utf-8"),
            "avro.codec": codec.encode("utf-8")}
    encode_datum({"type": "map", "values": "bytes"}, meta, out)
    sync = b"\x13\x37" * 8  # any 16 bytes; constant keeps files deterministic
    out.write(sync)
    write_long(out, len(records))
    write_long(out, len(block))
    out.write(block)
    out.write(sync)
    return out.getvalue()


# ---------------------------------------------------------------------------
# avro schema → Spark SQL type mapping
# ---------------------------------------------------------------------------


def to_spark_type(schema: Any, names: dict | None = None) -> str:
    """Map an Avro schema to a Spark SQL type string (DDL form).

    [null, T] unions → nullable T (Spark columns are nullable by default);
    other unions are rejected — same restriction the reference documents
    for its schema bridge (avro/core.clj:52-66)."""
    names = names if names is not None else {}
    if isinstance(schema, str) and schema in names:
        return names[schema]
    if isinstance(schema, list):
        branches = [b for b in schema if b != "null"]
        if len(branches) != 1:
            raise ValueError(f"unsupported non-[null,T] union: {schema!r}")
        return to_spark_type(branches[0], names)
    if isinstance(schema, str):
        return {
            "null": "void", "boolean": "boolean", "int": "int", "long": "bigint",
            "float": "float", "double": "double", "bytes": "binary",
            "string": "string",
        }[schema]
    t = schema["type"]
    if t == "record":
        inner = ", ".join(
            f"{f['name']}: {to_spark_type(f['type'], names)}" for f in schema["fields"]
        )
        ddl = f"struct<{inner}>"
        names[schema["name"]] = ddl
        return ddl
    if t == "enum":
        names[schema["name"]] = "string"
        return "string"
    if t == "fixed":
        names[schema["name"]] = "binary"
        return "binary"
    if t == "array":
        return f"array<{to_spark_type(schema['items'], names)}>"
    if t == "map":
        return f"map<string, {to_spark_type(schema['values'], names)}>"
    return to_spark_type(t, names)
