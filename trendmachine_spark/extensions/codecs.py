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
