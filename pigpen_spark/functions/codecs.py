"""Pure-stdlib binary codecs: PNG and WAV, implemented from their public
specs (PNG: RFC 2083 / W3C PNG spec; WAV: RIFF/WAVE PCM).

Why hand-rolled: this engine's container ships no PIL/librosa/av, but the
two workhorse formats of multimodal training data pipelines are simple
enough to decode with ``zlib`` + ``struct`` — so the multimodal operators
in :mod:`pigpen_spark.functions.multimodal` get REAL decode paths for
PNG images and PCM WAV audio, with only JPEG/video remaining behind
import-guarded stubs.  Everything here is plain bytes→numpy, no Spark —
the distribution story (Arrow batches through mapInPandas) lives in the
multimodal module.

Scope (deliberate): PNG color types 0 (gray), 2 (RGB), 6 (RGBA) at bit
depth 8, no interlace — the overwhelming majority of real-world PNGs and
everything our encoder writes; WAV PCM 16-bit.  Unsupported inputs raise
``ValueError`` with the offending field, never a silent wrong answer.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: channels per PNG color type we support
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunks(data: bytes):
    """Yield (type, payload) for each PNG chunk; validates the signature."""
    if data[:8] != _PNG_SIG:
        raise ValueError("png: bad signature")
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        yield ctype, payload
        pos += 12 + length  # length + type + payload + crc
        if ctype == b"IEND":
            break


def png_meta(data: bytes) -> tuple[int, int, int, int]:
    """(width, height, bit_depth, color_type) from IHDR — a pure header
    parse, no inflate: the cheap path for corpus-scale image profiling."""
    for ctype, payload in _chunks(data):
        if ctype == b"IHDR":
            w, h, depth, color = struct.unpack(">IIBB", payload[:10])
            return w, h, depth, color
    raise ValueError("png: no IHDR chunk")


def png_decode(data: bytes) -> np.ndarray:
    """Decode to a (height, width, channels) uint8 array: concatenate
    IDAT, inflate, undo per-scanline filters 0-4 (None/Sub/Up/Average/
    Paeth) exactly as specified."""
    w = h = None
    idat = b""
    for ctype, payload in _chunks(data):
        if ctype == b"IHDR":
            w, h, depth, color = struct.unpack(">IIBB", payload[:10])
            interlace = payload[12]
            if depth != 8:
                raise ValueError(f"png: unsupported bit depth {depth}")
            if color not in _PNG_CHANNELS:
                raise ValueError(f"png: unsupported color type {color}")
            if interlace != 0:
                raise ValueError("png: interlaced images unsupported")
            ch = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat += payload
    if w is None:
        raise ValueError("png: no IHDR chunk")
    raw = zlib.decompress(idat)
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("png: wrong decompressed size")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw[pos + 1:pos + 1 + stride], dtype=np.uint8).copy()
        pos += 1 + stride
        if ftype == 0:          # None
            cur = line
        elif ftype == 2:        # Up
            cur = (line + prev).astype(np.uint8)
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need left-to-right
            cur = line
            for i in range(stride):
                a = int(cur[i - ch]) if i >= ch else 0          # left
                b = int(prev[i])                                 # up
                if ftype == 1:
                    rec = cur[i] + a
                elif ftype == 3:
                    rec = cur[i] + ((a + b) >> 1)
                else:
                    c = int(prev[i - ch]) if i >= ch else 0      # up-left
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rec = cur[i] + pred
                cur[i] = rec & 0xFF
        else:
            raise ValueError(f"png: unknown filter {ftype}")
        out[y] = cur
        prev = cur
    return out.reshape(h, w, ch)


def png_encode(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal PNG writer for uint8 (h, w) gray or (h, w, {1,3,4})
    arrays; ``filter_type`` 0 (None) or 2 (Up) — 2 exists so tests can
    exercise the decoder's unfiltering, not for compression quality."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color = {1: 0, 3: 2, 4: 6}.get(ch)
    if color is None:
        raise ValueError(f"png: cannot encode {ch} channels")
    if filter_type not in (0, 2):
        raise ValueError(f"png: encoder supports filters 0/2, got {filter_type}")
    arr = arr.astype(np.uint8)
    lines = []
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        cur = arr[y].reshape(-1)
        if filter_type == 0:
            lines.append(b"\x00" + cur.tobytes())
        else:
            lines.append(b"\x02" + ((cur - prev) & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    raw = zlib.compress(b"".join(lines))

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        body = ctype + payload
        return struct.pack(">I", len(payload)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", raw)
            + chunk(b"IEND", b""))


# -- WAV (RIFF/WAVE, PCM) ---------------------------------------------------


def wav_meta(data: bytes) -> tuple[int, int, int, int]:
    """(sample_rate, channels, bits_per_sample, n_samples) from the RIFF
    fmt/data chunks (n_samples = per-channel frame count)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("wav: bad RIFF/WAVE header")
    pos = 12
    rate = chans = bits = None
    n_bytes = None
    while pos + 8 <= len(data):
        ctype = data[pos:pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4:pos + 8])
        if ctype == b"fmt ":
            fmt, chans, rate = struct.unpack("<HHI", data[pos + 8:pos + 16])
            (bits,) = struct.unpack("<H", data[pos + 22:pos + 24])
            if fmt != 1:
                raise ValueError(f"wav: unsupported format code {fmt} (PCM only)")
        elif ctype == b"data":
            n_bytes = length
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if rate is None or n_bytes is None:
        raise ValueError("wav: missing fmt or data chunk")
    n_samples = n_bytes // (chans * bits // 8)
    return rate, chans, bits, n_samples


def wav_decode(data: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, samples) — samples shaped (frames, channels) int16."""
    rate, chans, bits, n = wav_meta(data)
    if bits != 16:
        raise ValueError(f"wav: unsupported bit depth {bits} (16-bit PCM only)")
    pos = 12
    while pos + 8 <= len(data):
        ctype = data[pos:pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4:pos + 8])
        if ctype == b"data":
            body = data[pos + 8:pos + 8 + length]
            samples = np.frombuffer(body, dtype="<i2").reshape(-1, chans)
            return rate, samples
        pos += 8 + length + (length & 1)
    raise ValueError("wav: missing data chunk")


def wav_encode(samples: np.ndarray, rate: int) -> bytes:
    """Minimal PCM16 WAV writer; ``samples`` (frames,) or
    (frames, channels) int16."""
    if samples.ndim == 1:
        samples = samples[:, None]
    frames, chans = samples.shape
    body = samples.astype("<i2").tobytes()
    byte_rate = rate * chans * 2
    fmt = struct.pack("<HHIIHH", 1, chans, rate, byte_rate, chans * 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(body)) + body)


# -- GIF (87a/89a, LZW) -----------------------------------------------------
#
# Enough of the GIF spec to make video-style FRAME SAMPLING real: header +
# logical screen descriptor, global/local color tables, full LZW decode
# with dictionary growth, multi-frame streams.  Deliberately out of scope
# (ValueError, never silent): interlaced frames; ignored (documented):
# transparency and frame disposal — frames decode independently against
# their own palette, which is exact for the full-frame GIFs our encoder
# writes and the common screencast case.


def _gif_color_table(data: bytes, pos: int, flags: int):
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        table = np.frombuffer(
            data[pos:pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        return table, pos + 3 * n
    return None, pos


def _lzw_decode(min_code: int, data: bytes, n_pixels: int) -> np.ndarray:
    """GIF LZW: variable-width codes LSB-first, dictionary grows to 4096,
    CLEAR resets, END terminates."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    base = [bytes([i]) for i in range(1 << min_code)] + [b"", b""]
    table = list(base)
    width = min_code + 1
    out = bytearray()
    prev = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = list(base)
                width = min_code + 1
                prev = None
                continue
            if code == end:
                return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError(f"gif: corrupt LZW code {code}")
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= n_pixels:
                return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)
    raise ValueError("gif: LZW stream ended without END code")


def gif_decode(data: bytes):
    """Decode every frame: (width, height, [frame (h, w, 3) uint8 …])."""
    if data[:4] != b"GIF8" or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("gif: bad signature")
    w, h = struct.unpack("<HH", data[6:10])
    flags = data[10]
    pos = 13
    gct, pos = _gif_color_table(data, pos, flags)
    frames = []
    while pos < len(data):
        block = data[pos]
        if block == 0x3B:        # trailer
            break
        if block == 0x21:        # extension: label + sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:      # image descriptor
            fx, fy, fw, fh = struct.unpack("<HHHH", data[pos + 1:pos + 9])
            iflags = data[pos + 9]
            pos += 10
            if iflags & 0x40:
                raise ValueError("gif: interlaced frames unsupported")
            lct, pos = _gif_color_table(data, pos, iflags)
            palette = lct if lct is not None else gct
            if palette is None:
                raise ValueError("gif: frame has no color table")
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos] != 0:
                size = data[pos]
                lzw += data[pos + 1:pos + 1 + size]
                pos += 1 + size
            pos += 1
            idx = _lzw_decode(min_code, bytes(lzw), fw * fh)
            if len(idx) != fw * fh:
                raise ValueError("gif: short pixel stream")
            frames.append(palette[idx].reshape(fh, fw, 3))
        else:
            raise ValueError(f"gif: unknown block 0x{block:02x}")
    return w, h, frames


def gif_meta(data: bytes) -> tuple[int, int, int]:
    """(width, height, n_frames) — walks block structure, skips pixel
    inflate entirely (the cheap corpus-profiling path)."""
    if data[:4] != b"GIF8" or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("gif: bad signature")
    w, h = struct.unpack("<HH", data[6:10])
    flags = data[10]
    pos = 13
    _, pos = _gif_color_table(data, pos, flags)
    n = 0
    while pos < len(data):
        block = data[pos]
        if block == 0x3B:
            break
        if block == 0x21:
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:
            iflags = data[pos + 9]
            pos += 10
            _, pos = _gif_color_table(data, pos, iflags)
            pos += 1                      # LZW min code size
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            n += 1
        else:
            raise ValueError(f"gif: unknown block 0x{block:02x}")
    return w, h, n


def _lzw_encode(pixels, min_code: int = 8) -> bytes:
    """Standard GIF LZW compression: greedy longest-match dictionary
    build, variable code width (grows with the table, capped at 12 bits,
    CLEAR emitted on table overflow), LSB-first packing — the inverse
    width schedule of :func:`_lzw_decode`."""
    clear, end = 1 << min_code, (1 << min_code) + 1

    def fresh():
        return {bytes([i]): i for i in range(1 << min_code)}

    table = fresh()
    next_code = end + 1
    width = min_code + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code, w):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear, width)
    w = b""
    for px in pixels:
        wk = w + bytes([px])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        table[wk] = next_code
        next_code += 1
        # width grows when the NEXT code wouldn't fit (decoder mirrors this)
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code == 1 << 12:
            emit(clear, width)
            table = fresh()
            next_code = end + 1
            width = min_code + 1
        w = bytes([px])
    if w:
        emit(table[w], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def gif_encode(frames, palette: np.ndarray | None = None,
               compress: bool = True) -> bytes:
    """Minimal multi-frame GIF writer for uint8 (h, w) INDEX arrays into
    a 256-entry palette (default: grayscale ramp).  ``compress=True``
    uses real dictionary-building LZW (:func:`_lzw_encode`);
    ``compress=False`` emits a CLEAR before every pixel code — the
    classic "uncompressed GIF" trick, kept so tests can exercise the
    decoder's CLEAR handling densely."""
    if palette is None:
        palette = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
    if palette.shape != (256, 3):
        raise ValueError("gif: palette must be (256, 3)")
    frames = [f if f.ndim == 2 else f[:, :, 0] for f in frames]
    h, w = frames[0].shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | 0x07, 0, 0])     # GCT present, 256 entries
    out += palette.astype(np.uint8).tobytes()
    min_code = 8
    clear, end = 256, 257
    for f in frames:
        if f.shape != (h, w):
            raise ValueError("gif: all frames must share the canvas size")
        out += b"\x2C" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out += bytes([min_code])
        pixels = f.reshape(-1).tolist()
        if compress:
            stream = bytearray(_lzw_encode(pixels, min_code))
        else:
            # 9-bit codes, LSB-first: CLEAR, pixel, ..., END — width never grows
            acc = nbits = 0
            stream = bytearray()
            codes = []
            for px in pixels:
                codes += [clear, px]
            codes.append(end)
            for code in codes:
                acc |= code << nbits
                nbits += 9
                while nbits >= 8:
                    stream.append(acc & 0xFF)
                    acc >>= 8
                    nbits -= 8
            if nbits:
                stream.append(acc & 0xFF)
        for i in range(0, len(stream), 255):
            chunk = stream[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)
