"""Multimodal columns: image/audio/video as binary columns with REAL
decode paths for PNG and PCM-WAV.

The Spark-side machinery — schemas, Arrow-batched ``mapInPandas`` decode
pipelines, partition sizing — is real and tested, and so are the PNG and
WAV/GIF/baseline-JPEG codecs (:mod:`pigpen_spark.functions.codecs`,
pure zlib/struct/numpy implementations of the public specs):
``image_stats`` / ``image_thumbnail`` / ``audio_features_wav`` /
``frame_sample_gif`` decode actual bytes to actual numbers,
oracle-checked end to end — JPEG via the lossless block-constant
subspace (see codecs.jpeg_encode).  Only non-GIF video (mp4/webm) and
exotic image formats remain import-guarded stubs; ``decode_image_meta``
falls back to a deterministic fake for unrecognized payloads.

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

        from pigpen_spark.functions import codecs as C

        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                data = bytes(payload)
                try:
                    if data[:8] == b"\x89PNG\r\n\x1a\n":
                        # REAL path: pure-stdlib IHDR parse (codecs.png_meta)
                        w, h, _depth, _color = C.png_meta(data)
                        fmt = "png"
                    elif data[:2] == b"\xFF\xD8":
                        # REAL path: SOFn header parse — works for
                        # progressive streams the full decoder refuses
                        w, h, _nc = C.jpeg_meta(data)
                        fmt = "jpeg"
                    elif real:  # pragma: no cover
                        raise NotImplementedError(
                            "PIL decode path: wire Image.open(BytesIO(data))")
                    else:
                        w, h, fmt = _fake_decode(data)
                except ValueError:
                    # corrupt/truncated payload: metadata profiling must
                    # quarantine the row, not kill the Arrow batch
                    w, h, fmt = -1, -1, "corrupt"
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
    """Video frame sampling — STUB for containers that need external
    codecs (mp4/webm via `av`/ffmpeg): emits (id, frame_index) rows for
    the frames a decoder would keep, frame count faked from payload
    length.  For GIF payloads use :func:`frame_sample_gif`, which REALLY
    decodes (pure-stdlib LZW) in the same mapInPandas shape."""
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


# ---------------------------------------------------------------------------
# REAL decode paths (pure-stdlib codecs — pigpen_spark.functions.codecs)
# ---------------------------------------------------------------------------
#
# The container has no PIL/librosa/av, but PNG, baseline JPEG, GIF and
# PCM-WAV are decodable from spec with zlib/struct/numpy (codecs.py), so
# the operators below are REAL end-to-end: bytes in, decoded numbers
# out, Arrow-batched through mapInPandas.  mp4/webm remain stubs — those
# containers genuinely need external codecs.

IMAGE_STATS_SCHEMA = (
    "id long, width int, height int, channels int, px_sum long, px_min int, px_max int"
)
THUMB_SCHEMA = "id long, t_width int, t_height int, t_px_sum long, thumb binary"
AUDIO_SCHEMA = (
    "id long, sample_rate int, n_channels int, n_samples long, "
    "duration_ms long, sample_sum long, peak int"
)


def synth_png(df: DataFrame, id_col: str, out_col: str = "payload") -> DataFrame:
    """Deterministic synthetic PNG payloads (the corpus ships no binary
    columns): image i is (8 + i%16) × (8 + (i÷3)%16) RGB with pixel
    (x, y, c) = i%200 + x + y + c — values stay < 256 by construction, so
    downstream pixel sums have CLOSED FORMS an SQL oracle can compute
    without decoding.  Alternating scanline filter (None/Up by parity)
    exercises both encoder paths."""
    src = df.select(F.col(id_col).alias("id"))

    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from pigpen_spark.functions import codecs as C

        for pdf in batches:
            rows = []
            for rid in pdf["id"]:
                i = int(rid)
                w, h, a = 8 + i % 16, 8 + (i // 3) % 16, i % 200
                x = np.arange(w)[None, :, None]
                y = np.arange(h)[:, None, None]
                c = np.arange(3)[None, None, :]
                arr = (a + x + y + c).astype(np.uint8)
                rows.append({"id": i, out_col: C.png_encode(arr, filter_type=2 * (i % 2))})
            yield pd.DataFrame(rows)

    return src.mapInPandas(gen, schema=f"id long, {out_col} binary")


def image_stats(df: DataFrame, id_col: str, payload_col: str = "payload") -> DataFrame:
    """REAL PNG decode → per-image pixel statistics: (width, height,
    channels, px_sum, px_min, px_max).  Integer outputs, so results are
    engine-portable and oracle-checkable; mean = px_sum / (w·h·ch) is one
    division away for callers.  Arrow batches through mapInPandas — one
    Python crossing per ~10k rows, numpy per image."""
    src = df.select(F.col(id_col).alias("id"), F.col(payload_col).alias("payload"))

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        from pigpen_spark.functions import codecs as C

        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                data = bytes(payload)
                # format sniff: PNG signature vs JPEG SOI — both REAL
                # pure-stdlib decoders (codecs.py)
                if data[:2] == b"\xFF\xD8":
                    arr = C.jpeg_decode(data)
                else:
                    arr = C.png_decode(data)
                rows.append({
                    "id": int(rid),
                    "width": arr.shape[1], "height": arr.shape[0],
                    "channels": arr.shape[2],
                    "px_sum": int(arr.sum(dtype="int64")),
                    "px_min": int(arr.min()), "px_max": int(arr.max()),
                })
            yield pd.DataFrame(rows)

    return src.mapInPandas(decode, schema=IMAGE_STATS_SCHEMA)


def image_thumbnail(df: DataFrame, id_col: str, payload_col: str = "payload",
                    factor: int = 2) -> DataFrame:
    """REAL resize pipeline: PNG decode → nearest-neighbor ÷``factor``
    subsample → PNG re-encode, plus the thumbnail's integer pixel sum so
    a no-decode oracle can verify the whole decode→resize→encode→decode
    loop.  The canonical multimodal preprocessing shape: per-row numpy
    inside Arrow batches, payloads never leave the executor."""
    if factor < 1:
        raise ValueError(f"image_thumbnail: factor must be >= 1, got {factor}")
    src = df.select(F.col(id_col).alias("id"), F.col(payload_col).alias("payload"))

    def work(batches: Iterator) -> Iterator:
        import pandas as pd

        from pigpen_spark.functions import codecs as C

        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                arr = C.png_decode(bytes(payload))[::factor, ::factor]
                rows.append({
                    "id": int(rid),
                    "t_width": arr.shape[1], "t_height": arr.shape[0],
                    "t_px_sum": int(arr.sum(dtype="int64")),
                    "thumb": C.png_encode(arr),
                })
            yield pd.DataFrame(rows)

    return src.mapInPandas(work, schema=THUMB_SCHEMA)


def synth_wav(df: DataFrame, id_col: str, out_col: str = "payload",
              constant: bool = False) -> DataFrame:
    """Deterministic synthetic PCM16 WAV payloads: clip i has
    100 + i%50 mono samples at 8 kHz, sample j = (i%100)·10 + j%50 —
    bounded far below int16, so sums have closed forms for the oracle.
    ``constant=True`` drops the j%50 ramp (every sample = (i%100)·10) —
    the signal class the anti-aliased resampler passes EXACTLY, which is
    what its oracle query needs."""
    src = df.select(F.col(id_col).alias("id"))

    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from pigpen_spark.functions import codecs as C

        for pdf in batches:
            rows = []
            for rid in pdf["id"]:
                i = int(rid)
                n = 100 + i % 50
                base = (i % 100) * 10
                ramp = 0 if constant else (np.arange(n) % 50)
                s = (base + ramp + np.zeros(n, dtype=np.int64)).astype(np.int16)
                rows.append({"id": i, out_col: C.wav_encode(s, 8000)})
            yield pd.DataFrame(rows)

    return src.mapInPandas(gen, schema=f"id long, {out_col} binary")


def audio_features_wav(df: DataFrame, id_col: str,
                       payload_col: str = "payload") -> DataFrame:
    """REAL WAV decode → (sample_rate, n_channels, n_samples,
    duration_ms, sample_sum, peak).  duration_ms is exact integer
    division (n·1000 div rate); sample_sum/peak are int64/int32 — all
    engine-portable.  Supersedes the stub :func:`audio_features` for PCM
    WAV payloads (the stub remains for unknown formats)."""
    src = df.select(F.col(id_col).alias("id"), F.col(payload_col).alias("payload"))

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        from pigpen_spark.functions import codecs as C

        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                rate, samples = C.wav_decode(bytes(payload))
                n = samples.shape[0]
                rows.append({
                    "id": int(rid),
                    "sample_rate": rate, "n_channels": samples.shape[1],
                    "n_samples": n,
                    "duration_ms": n * 1000 // rate,
                    "sample_sum": int(samples.sum(dtype="int64")),
                    "peak": int(abs(samples).max()) if n else 0,
                })
            yield pd.DataFrame(rows)

    return src.mapInPandas(decode, schema=AUDIO_SCHEMA)


FRAME_STATS_SCHEMA = "id long, frame_index int, f_px_sum long"


def synth_gif(df: DataFrame, id_col: str, out_col: str = "payload") -> DataFrame:
    """Deterministic synthetic multi-frame GIFs: clip i has 1 + i%5
    frames on a (6 + i%8) × (6 + (i÷2)%8) canvas, frame f pixel (x, y) =
    i%200 + f + x + y (grayscale palette; bounded < 256, so per-frame
    pixel sums have closed forms)."""
    src = df.select(F.col(id_col).alias("id"))

    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from pigpen_spark.functions import codecs as C

        for pdf in batches:
            rows = []
            for rid in pdf["id"]:
                i = int(rid)
                w, h, a = 6 + i % 8, 6 + (i // 2) % 8, i % 200
                n = 1 + i % 5
                x = np.arange(w)[None, :]
                y = np.arange(h)[:, None]
                frames = [(a + f + x + y).astype(np.uint8) for f in range(n)]
                rows.append({"id": i, out_col: C.gif_encode(frames)})
            yield pd.DataFrame(rows)

    return src.mapInPandas(gen, schema=f"id long, {out_col} binary")


def frame_sample_gif(df: DataFrame, id_col: str, payload_col: str = "payload",
                     every_n: int = 2) -> DataFrame:
    """REAL video-style frame sampling: decode a multi-frame GIF with the
    pure-stdlib LZW codec (:mod:`pigpen_spark.functions.codecs`) and emit
    every ``every_n``-th frame's index and integer pixel sum — the frame-
    subsampling stage of a video curation pipeline, on a container format
    that actually decodes in this environment.  Supersedes the
    :func:`frame_sample` stub for GIF payloads; other containers
    (mp4/webm) still need external codecs and keep the stub."""
    if every_n < 1:
        raise ValueError(f"frame_sample_gif: every_n must be >= 1, got {every_n}")
    src = df.select(F.col(id_col).alias("id"), F.col(payload_col).alias("payload"))

    def work(batches: Iterator) -> Iterator:
        import pandas as pd

        from pigpen_spark.functions import codecs as C

        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                _w, _h, frames = C.gif_decode(bytes(payload))
                for f in range(0, len(frames), every_n):
                    rows.append({
                        "id": int(rid), "frame_index": f,
                        "f_px_sum": int(frames[f].sum(dtype="int64")),
                    })
            yield pd.DataFrame(rows)

    return src.mapInPandas(work, schema=FRAME_STATS_SCHEMA)


def synth_jpeg(df: DataFrame, id_col: str, out_col: str = "payload") -> DataFrame:
    """Deterministic synthetic baseline JPEGs in the codec's LOSSLESS
    subspace: image i is (1 + i%3) × (1 + (i÷2)%3) BLOCKS of 8x8, block
    (bx, by) constant at i%200 + bx + by — all-zero AC + integer DC at
    quant 1, so the lossy format round-trips bit-exactly and pixel sums
    have closed forms."""
    src = df.select(F.col(id_col).alias("id"))

    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from pigpen_spark.functions import codecs as C

        for pdf in batches:
            rows = []
            for rid in pdf["id"]:
                i = int(rid)
                bw, bh, a = 1 + i % 3, 1 + (i // 2) % 3, i % 200
                blocks = a + np.arange(bw)[None, :] + np.arange(bh)[:, None]
                img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1).astype(np.uint8)
                rows.append({"id": i, out_col: C.jpeg_encode(img)})
            yield pd.DataFrame(rows)

    return src.mapInPandas(gen, schema=f"id long, {out_col} binary")


DOWNSAMPLE_SCHEMA = ("id long, rate_out int, n_out long, sample_sum_out long, "
                     "wav binary")


def audio_downsample(df: DataFrame, id_col: str, payload_col: str = "payload",
                     factor: int = 2, antialias: bool = False) -> DataFrame:
    """REAL audio preprocessing pipeline — the WAV twin of
    :func:`image_thumbnail`: decode PCM16, decimate by ``factor`` (every
    factor-th frame; channels mixed to mono first with FLOOR-division
    mean — ``sum // n_channels`` rounds toward -inf, so a frame whose
    channel sum is negative mixes one LSB below truncation-based
    conventions; floor is deterministic and engine-portable, which is
    what the oracle needs), re-encode at rate/factor, and decode AGAIN
    for the output stats — so the returned integers verify the full
    decode→resample→encode→decode loop.

    ``antialias=False`` (default): nearest-frame decimation — integer-
    exact, engine-portable, adequate for feature-extraction-grade
    downsampling.  ``antialias=True``: Hamming-windowed-sinc FIR low-
    pass before decimation (:func:`pigpen_spark.functions.codecs.
    fir_decimate`) — content above the new Nyquist is attenuated instead
    of aliased; constant signals still pass exactly (unit-DC-gain taps +
    edge-replicate padding), which is what the oracle query checks."""
    if factor < 1:
        raise ValueError(f"audio_downsample: factor must be >= 1, got {factor}")
    src = df.select(F.col(id_col).alias("id"), F.col(payload_col).alias("payload"))

    def work(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from pigpen_spark.functions import codecs as C

        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                rate, samples = C.wav_decode(bytes(payload))
                mono = samples.astype(np.int64).sum(axis=1) // samples.shape[1]
                if antialias:
                    dec = C.fir_decimate(mono, factor)
                else:
                    dec = mono[::factor].astype(np.int16)
                wav = C.wav_encode(dec, rate // factor)
                rate2, rt = C.wav_decode(wav)
                rows.append({
                    "id": int(rid), "rate_out": rate2,
                    "n_out": int(rt.shape[0]),
                    "sample_sum_out": int(rt.sum(dtype="int64")),
                    "wav": wav,
                })
            yield pd.DataFrame(rows)

    return src.mapInPandas(work, schema=DOWNSAMPLE_SCHEMA)


VIDEO_META_SCHEMA = ("id long, duration_ms long, n_tracks int, width int, "
                     "height int, codec string, n_frames long")


def synth_mp4(df: DataFrame, id_col: str, out_col: str = "payload") -> DataFrame:
    """Deterministic synthetic mp4 moov skeletons: clip i runs
    10000 + (i·37)%50000 ms at 24 fps with a (320+16·(i%20)) ×
    (240+16·(i%10)) avc1/hev1 video track (codec by parity) and an mp4a
    audio track — every field a closed-form function of i, so the
    profiling oracle never parses anything."""
    src = df.select(F.col(id_col).alias("id"))

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        from pigpen_spark.functions import codecs as C

        for pdf in batches:
            rows = []
            for rid in pdf["id"]:
                i = int(rid)
                dur = 10_000 + (i * 37) % 50_000
                payload = C.mp4_encode_skeleton(dur, [
                    {"handler": "vide", "codec": "avc1" if i % 2 == 0 else "hev1",
                     "width": 320 + 16 * (i % 20), "height": 240 + 16 * (i % 10),
                     "n_samples": 24 * dur // 1000, "track_duration_ms": dur},
                    {"handler": "soun", "codec": "mp4a",
                     "n_samples": 43 * dur // 1000, "track_duration_ms": dur},
                ])
                rows.append({"id": i, out_col: payload})
            yield pd.DataFrame(rows)

    return src.mapInPandas(gen, schema=f"id long, {out_col} binary")


def video_meta(df: DataFrame, id_col: str, payload_col: str = "payload") -> DataFrame:
    """REAL mp4 container profiling: ISO-BMFF box walk (codecs.mp4_meta)
    over binary payloads — duration, track count, first video track's
    geometry/codec/sample count.  This is the corpus-profiling HALF of
    the video story done for real (header-speed, no entropy decode);
    frame DECODE stays with :func:`frame_sample`'s stub for mp4 and the
    real :func:`frame_sample_gif` for GIF.  Corrupt payloads quarantine
    as (-1, …, "corrupt") rows — the batch survives."""
    src = df.select(F.col(id_col).alias("id"), F.col(payload_col).alias("payload"))

    def work(batches: Iterator) -> Iterator:
        import pandas as pd

        from pigpen_spark.functions import codecs as C

        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                try:
                    m = C.mp4_meta(bytes(payload))
                    vid = next((t for t in m["tracks"] if t["handler"] == "vide"),
                               None)
                    rows.append({
                        "id": int(rid), "duration_ms": m["duration_ms"],
                        "n_tracks": m["n_tracks"],
                        "width": vid["width"] if vid else 0,
                        "height": vid["height"] if vid else 0,
                        "codec": vid["codec"] if vid else "",
                        "n_frames": vid["n_samples"] if vid else 0,
                    })
                except ValueError:
                    rows.append({"id": int(rid), "duration_ms": -1,
                                 "n_tracks": -1, "width": -1, "height": -1,
                                 "codec": "corrupt", "n_frames": -1})
            yield pd.DataFrame(rows)

    return src.mapInPandas(work, schema=VIDEO_META_SCHEMA)
