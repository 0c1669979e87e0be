"""Pure-Python media codecs for the multimodal decode path.

The container ships no PIL/librosa/ffmpeg, but two formats are simple
enough to decode from spec with numpy alone — which turns the
multimodal ``decode``/``resize`` slots from gated stubs into REAL
byte-level paths exercised in-sandbox:

* BMP — uncompressed 24-bit BI_RGB (Windows BITMAPINFOHEADER), both
  bottom-up and top-down row orders, 4-byte row padding.
* WAV — RIFF PCM (format tag 1), 16-bit samples, any channel count.

Encoders exist so tests and the registry query can synthesize real
payload bytes deterministically; ``NotImplementedError`` remains only
for genuinely exotic codecs (JPEG/MP4/...), raised by the callers in
``multimodal.py``.

Everything here runs inside Arrow-batched ``mapInPandas`` workers —
per-asset CPU, no driver involvement, no shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- BMP
# plain format strings, not struct.Struct instances: this module is
# shipped BY VALUE into executor pickles and Struct objects can't pickle

_BMP_FILE_FMT = "<2sIHHI"      # magic, file size, res, res, data offset
_BMP_FILE_LEN = struct.calcsize(_BMP_FILE_FMT)
_BMP_INFO_FMT = "<IiiHHIIiiII"  # 40-byte BITMAPINFOHEADER


def encode_bmp(pixels: np.ndarray) -> bytes:
    """24-bit bottom-up BI_RGB BMP from an (h, w, 3) uint8 RGB array."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB array")
    h, w, _ = pixels.shape
    row_len = (w * 3 + 3) & ~3
    data = bytearray()
    pad = b"\x00" * (row_len - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up
        row = pixels[y][:, ::-1]    # RGB -> BGR on disk
        data += row.tobytes() + pad
    info = struct.pack(_BMP_INFO_FMT, 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    offset = _BMP_FILE_LEN + len(info)
    hdr = struct.pack(_BMP_FILE_FMT, b"BM", offset + len(data), 0, 0, offset)
    return hdr + info + bytes(data)


def decode_bmp(data: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB array from an uncompressed 24-bit BMP."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    _, _, _, _, offset = struct.unpack_from(_BMP_FILE_FMT, data, 0)
    (hdr_size, w, h, planes, bpp, compression, *_rest) = struct.unpack_from(
        _BMP_INFO_FMT, data, _BMP_FILE_LEN
    )
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs not supported")
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only uncompressed 24-bit BMP (got bpp={bpp})")
    top_down = h < 0
    h = abs(h)
    row_len = (w * 3 + 3) & ~3
    rows = np.frombuffer(data, dtype=np.uint8, count=h * row_len, offset=offset)
    rows = rows.reshape(h, row_len)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize of an (h, w, c) array — the classic
    integer-exact resampler (deterministic, no float rounding drift)."""
    h, w = pixels.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return pixels[ys][:, xs]


# ---------------------------------------------------------------- PNG
# Pure-stdlib PNG (round 7): zlib is in-sandbox, and the IDAT walk +
# filters 0-4 are simple enough to implement from the spec (RFC 2083)
# the same way BMP was — which extends the REAL in-sandbox decode claim
# to the dominant web image format. Supported: 8-bit truecolor
# (color type 2) and truecolor+alpha (6), non-interlaced; palette/
# 16-bit/interlaced stay behind NotImplementedError by design.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import zlib

    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))


def encode_png(pixels: np.ndarray) -> bytes:
    """8-bit non-interlaced PNG from an (h, w, 3) RGB or (h, w, 4)
    RGBA uint8 array. Row ``r`` is written with filter ``r % 5``, so a
    multi-row image exercises EVERY filter type (None/Sub/Up/Average/
    Paeth) and any unfilter bug in :func:`decode_png` shifts decoded
    values — the encoder is the test harness for the decoder, as with
    BMP."""
    import zlib

    if pixels.ndim != 3 or pixels.shape[2] not in (3, 4):
        raise ValueError("expected (h, w, 3|4) uint8 array")
    h, w, c = pixels.shape
    bpp = c
    color_type = 2 if c == 3 else 6
    raw = pixels.astype(np.int64)
    out = bytearray()
    prev = np.zeros((w, c), dtype=np.int64)
    for r in range(h):
        row = raw[r]
        f = r % 5
        left = np.vstack([np.zeros((1, c), dtype=np.int64), row[:-1]])
        ul = np.vstack([np.zeros((1, c), dtype=np.int64), prev[:-1]])
        if f == 0:
            filt = row
        elif f == 1:
            filt = row - left
        elif f == 2:
            filt = row - prev
        elif f == 3:
            filt = row - (left + prev) // 2
        else:
            pred = np.empty_like(row)
            for x in range(w):
                for ch in range(c):
                    pred[x, ch] = _paeth(
                        int(left[x, ch]), int(prev[x, ch]), int(ul[x, ch]))
            filt = row - pred
        out.append(f)
        out += (filt % 256).astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
            + _png_chunk(b"IEND", b""))


def decode_png(data: bytes) -> np.ndarray:
    """(h, w, 3|4) uint8 array from an 8-bit truecolor(+alpha)
    non-interlaced PNG: chunk walk with CRC verification, multi-IDAT
    concatenation, zlib inflate, and per-spec unfiltering of filters
    0-4. Palette/16-bit/interlaced raise NotImplementedError."""
    import zlib

    if data[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    w = h = color_type = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (clen,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + clen]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + clen)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8 or color_type not in (2, 6):
                raise NotImplementedError(
                    f"only 8-bit truecolor(+alpha) PNG "
                    f"(depth={depth}, color={color_type})")
            if interlace != 0:
                raise NotImplementedError("interlaced PNG not supported")
            if comp != 0 or filt != 0:
                raise ValueError("invalid compression/filter method")
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + clen
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    c = 3 if color_type == 2 else 4
    stream = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = 1 + w * c
    if len(stream) != h * stride:
        raise ValueError("IDAT length does not match dimensions")
    rows = stream.reshape(h, stride)
    out = np.zeros((h, w, c), dtype=np.int64)
    prev = np.zeros((w, c), dtype=np.int64)
    for r in range(h):
        f = int(rows[r, 0])
        cur = rows[r, 1:].reshape(w, c).astype(np.int64)
        if f == 0:
            row = cur
        elif f == 2:
            row = (cur + prev) % 256
        elif f in (1, 3, 4):
            row = np.zeros((w, c), dtype=np.int64)
            for x in range(w):
                for ch in range(c):
                    a = int(row[x - 1, ch]) if x else 0
                    if f == 1:
                        pred = a
                    elif f == 3:
                        pred = (a + int(prev[x, ch])) // 2
                    else:
                        b = int(prev[x, ch])
                        cc = int(prev[x - 1, ch]) if x else 0
                        pred = _paeth(a, b, cc)
                    row[x, ch] = (int(cur[x, ch]) + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        out[r] = row
        prev = row
    return out.astype(np.uint8)


# ---------------------------------------------------------------- WAV

def encode_wav(samples: np.ndarray, sample_rate: int = 8000,
               n_channels: int = 1) -> bytes:
    """RIFF PCM 16-bit WAV from an int16 sample array (interleaved)."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    block_align = 2 * n_channels
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate,
                      sample_rate * block_align, block_align, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """(sample_rate, n_channels, int16 samples) from a RIFF PCM WAV.

    Walks the chunk list per spec (chunks are padded to even length),
    so extra chunks (LIST/INFO...) before ``data`` are handled.
    """
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, 8 + struct.unpack_from("<I", data, 4)[0]
    sample_rate = n_channels = bits = None
    pcm = None
    while pos + 8 <= min(end, len(data)):
        cid = data[pos:pos + 4]
        clen = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            tag, n_channels, sample_rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if tag != 1:
                raise NotImplementedError(f"only PCM WAV (format tag {tag})")
            if bits != 16:
                raise NotImplementedError(f"only 16-bit PCM (got {bits})")
        elif cid == b"data":
            pcm = body
        pos += 8 + clen + (clen & 1)  # chunks are even-padded
    if sample_rate is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    return sample_rate, n_channels, np.frombuffer(pcm, dtype="<i2")
