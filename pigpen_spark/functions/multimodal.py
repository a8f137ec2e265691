"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side machinery here is REAL and tested — schemas, Arrow-batched
``mapInPandas`` decode pipelines, partition sizing — while the actual
codec calls are stubbed behind import-guards (PIL/librosa/av are not in
this container; see ``decode_image_meta``'s deterministic fallback).

At 100 TB: binary payloads ride in parquet binary columns (or are loaded
via ``spark.read.format("binaryFile")`` for raw object stores); decode
runs inside ``mapInPandas`` so each Arrow batch is decoded in-process with
zero driver involvement, and ``spark.sql.files.maxPartitionBytes`` bounds
per-task memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the image-metadata decode step.
IMAGE_META_SCHEMA = (
    "id long, n_bytes long, digest string, width int, height int, format string"
)


def attach_binary_payload(df: DataFrame, src_col: str, out_col: str = "payload") -> DataFrame:
    """Materialize an opaque binary column (here: utf-8 bytes of a source
    column — stands in for image/audio bytes with identical plumbing)."""
    return df.withColumn(out_col, F.encode(F.col(src_col), "utf-8"))


def _fake_decode(data: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for an image decoder: derives (width,
    height, format) from the payload digest.  STUB — replace the body
    with PIL/libvips in a real deployment; the pipeline shape (Arrow
    batches through mapInPandas) is the real, tested part."""
    d = hashlib.md5(data).digest()
    width = 64 + d[0] % 192
    height = 64 + d[1] % 192
    fmt = ["png", "jpeg", "webp"][d[2] % 3]
    return width, height, fmt


def decode_image_meta(df: DataFrame, id_col: str, payload_col: str = "payload") -> DataFrame:
    """Decode image metadata from a binary column via mapInPandas.

    Real decoder wiring (guarded):

    >>> try:
    ...     from PIL import Image          # not present in this container
    ... except ImportError:
    ...     Image = None                   # falls back to _fake_decode

    Each Arrow batch is processed as one pandas DataFrame — per-batch
    python cost is amortized over thousands of rows.
    """
    try:  # pragma: no cover - container has no PIL
        from PIL import Image  # noqa: F401
        real = True
    except ImportError:
        real = False

    src = df.select(F.col(id_col).alias("id"), F.col(payload_col).alias("payload"))

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                data = bytes(payload)
                if real:  # pragma: no cover
                    raise NotImplementedError("PIL decode path: wire Image.open(BytesIO(data))")
                w, h, fmt = _fake_decode(data)
                rows.append({
                    "id": int(rid),
                    "n_bytes": len(data),
                    "digest": hashlib.md5(data).hexdigest(),
                    "width": w, "height": h, "format": fmt,
                })
            yield pd.DataFrame(rows)

    return src.mapInPandas(decode, schema=IMAGE_META_SCHEMA)


def frame_sample(df: DataFrame, id_col: str, payload_col: str = "payload",
                 every_n: int = 10) -> DataFrame:
    """Video frame sampling — STUB: emits (id, frame_index) rows for the
    frames a decoder would keep.  Deterministic fake: frame count derived
    from payload length; real impl would use `av`/ffmpeg in the same
    mapInPandas shape."""
    n_frames = (F.octet_length(F.col(payload_col)) % 100 + 1).alias("n_frames")
    src = df.select(F.col(id_col).alias("id"), n_frames)
    return src.select(
        "id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))).alias("frame_index"),
    )


def audio_features(df: DataFrame, id_col: str, payload_col: str = "payload") -> DataFrame:
    """Audio feature extraction — STUB behind import-guard (librosa absent);
    deterministic fake duration/sample-rate from payload bytes, same
    mapInPandas plumbing as decode_image_meta."""
    try:  # pragma: no cover
        import librosa  # noqa: F401
        raise NotImplementedError("librosa path: wire librosa.load on BytesIO")
    except ImportError:
        pass
    return df.select(
        F.col(id_col).alias("id"),
        (F.octet_length(F.col(payload_col)).cast("double") / 16000.0).alias("duration_sec"),
        F.lit(16000).alias("sample_rate"),
    )
