"""Pure-Python BMP/WAV codecs (extensions/codecs.py) — the real decode
path's byte-level core, testable without Spark."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from trendmachine_spark.extensions.codecs import (
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
    resize_nearest,
)


def test_bmp_round_trip_odd_width():
    """Width 5 => 15-byte rows padded to 16: the padding must not leak
    into decoded pixels."""
    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, size=(4, 5, 3)).astype(np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


def test_bmp_round_trip_various_shapes():
    rng = np.random.RandomState(9)
    for h, w in [(1, 1), (2, 7), (13, 4), (8, 8)]:
        px = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(px)), px), (h, w)


def test_bmp_top_down_negative_height():
    """Spec: negative biHeight = top-down row order."""
    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    data = bytearray(encode_bmp(px))
    # encode_bmp wrote bottom-up rows; flip the sign AND the row order
    # to express the same image top-down
    h = struct.unpack_from("<i", data, 14 + 8)[0]
    struct.pack_into("<i", data, 14 + 8, -h)
    row_len = (3 * 3 + 3) & ~3
    offset = struct.unpack_from("<I", data, 10)[0]
    rows = [bytes(data[offset + i * row_len:offset + (i + 1) * row_len]) for i in range(2)]
    data[offset:offset + 2 * row_len] = rows[1] + rows[0]
    assert np.array_equal(decode_bmp(bytes(data)), px)


def test_bmp_rejects_non_bmp_and_unsupported():
    with pytest.raises(ValueError):
        decode_bmp(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    data = bytearray(encode_bmp(px))
    struct.pack_into("<H", data, 14 + 14, 8)  # claim 8-bit
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(data))


def test_wav_round_trip():
    s = (np.arange(300) * 31 % 65536 - 32768).astype("<i2")
    rate, nch, got = decode_wav(encode_wav(s, sample_rate=16000))
    assert rate == 16000 and nch == 1
    assert np.array_equal(got, s)


def test_wav_skips_extra_chunks():
    """Chunk walk must handle LIST/INFO chunks before data, including
    odd-length chunk padding."""
    s = np.array([1, -2, 3], dtype="<i2")
    base = encode_wav(s, sample_rate=8000)
    # splice an odd-length junk chunk between fmt and data
    fmt_end = 12 + 8 + 16
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # even-padded
    patched = base[:fmt_end] + junk + base[fmt_end:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    rate, _, got = decode_wav(patched)
    assert rate == 8000
    assert np.array_equal(got, s)


def test_wav_rejects_non_pcm():
    s = np.array([0, 1], dtype="<i2")
    data = bytearray(encode_wav(s))
    struct.pack_into("<H", data, 12 + 8, 3)  # IEEE float tag
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(data))
    with pytest.raises(ValueError):
        decode_wav(b"OggS" + b"\x00" * 40)


def test_resize_nearest_matches_manual():
    px = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(6, 4, 3)
    out = resize_nearest(px, 8, 3)
    assert out.shape == (3, 8, 3)
    for y in range(3):
        for x in range(8):
            assert np.array_equal(out[y, x], px[(y * 6) // 3, (x * 4) // 8])


def test_resize_identity():
    px = np.arange(5 * 5 * 3, dtype=np.uint8).reshape(5, 5, 3)
    assert np.array_equal(resize_nearest(px, 5, 5), px)


# --------------------------------------------------------- property tests

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=12),
    w=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_bmp_round_trip_property(h, w, seed):
    px = np.random.RandomState(seed).randint(0, 256, size=(h, w, 3)).astype(np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=500),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_wav_round_trip_property(n, rate, seed):
    s = np.random.RandomState(seed).randint(-32768, 32768, size=n).astype("<i2")
    got_rate, nch, got = decode_wav(encode_wav(s, sample_rate=rate))
    assert got_rate == rate and nch == 1
    assert np.array_equal(got, s)


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=10),
    w=st.integers(min_value=1, max_value=10),
    oh=st.integers(min_value=1, max_value=10),
    ow=st.integers(min_value=1, max_value=10),
)
def test_resize_nearest_property(h, w, oh, ow):
    px = np.arange(h * w * 3, dtype=np.uint8).reshape(h, w, 3)
    out = resize_nearest(px, ow, oh)
    assert out.shape == (oh, ow, 3)
    # every output pixel equals its nearest source pixel
    for y in range(oh):
        for x in range(ow):
            assert np.array_equal(out[y, x], px[(y * h) // oh, (x * w) // ow])


# ---------------------------------------------------------------- PNG

PNG_FIXTURE_CHECKSUM = 1384407

def _png_codecs():
    from trendmachine_spark.extensions.codecs import decode_png, encode_png
    return encode_png, decode_png


def test_png_round_trip_all_filters():
    """>=5 rows means the cycling encoder writes every filter type
    (None/Sub/Up/Average/Paeth) — a decode bug in any unfilter branch
    breaks equality."""
    encode_png, decode_png = _png_codecs()
    rng = np.random.RandomState(11)
    for shape in [(7, 5, 3), (6, 14, 4), (1, 1, 3), (11, 2, 4), (5, 1, 3)]:
        px = rng.randint(0, 256, size=shape).astype(np.uint8)
        assert np.array_equal(decode_png(encode_png(px)), px), shape


def test_png_decodes_external_tool_file():
    """Spec conformance against a PNG this repo did NOT encode: a
    system icon produced by an external encoder (fixture copied from
    /usr/share/doc/python3/_static/file.png). Shape and a weighted
    checksum are pinned so a silent filter/CRC regression fails loudly."""
    import pathlib

    _, decode_png = _png_codecs()
    data = (pathlib.Path(__file__).parent / "data" / "external_ref.png").read_bytes()
    px = decode_png(data).astype(np.int64)
    assert px.shape == (16, 16, 4)
    wgt = 1 + (np.arange(16)[None, :] + 2 * np.arange(16)[:, None]) % 5
    mixed = px[:, :, 0] + 2 * px[:, :, 1] + 3 * px[:, :, 2] + 4 * px[:, :, 3]
    # pinned constant = decoder regression gate for external bytes
    assert int((wgt * mixed).sum()) == PNG_FIXTURE_CHECKSUM


def test_png_crc_and_gates():
    encode_png, decode_png = _png_codecs()
    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, size=(4, 4, 3)).astype(np.uint8)
    data = bytearray(encode_png(px))
    data[-5] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"BM123456")
    # unsupported shapes gate, not silently misdecode
    with pytest.raises(ValueError):
        encode_png(px[:, :, :2])
    # palette PNG (color type 3) must raise NotImplementedError
    good = bytes(encode_png(px))
    import struct as _s
    import zlib as _z
    ihdr = bytearray(good[8:8 + 25])
    ihdr[8 + 9] = 3  # color type byte inside IHDR body
    body = bytes(ihdr[8:8 + 13])
    chunk = _s.pack(">I", 13) + b"IHDR" + body + _s.pack(
        ">I", _z.crc32(b"IHDR" + body) & 0xFFFFFFFF)
    with pytest.raises(NotImplementedError):
        decode_png(good[:8] + chunk + good[8 + 25:])


def test_png_resize_path():
    encode_png, decode_png = _png_codecs()
    rng = np.random.RandomState(6)
    px = rng.randint(0, 256, size=(9, 7, 4)).astype(np.uint8)
    rs = resize_nearest(decode_png(encode_png(px)), 4, 3)
    assert rs.shape == (3, 4, 4)
    assert np.array_equal(rs, resize_nearest(px, 4, 3))


# --------------------------------------------------------------- JPEG

def _jpeg_codecs():
    from trendmachine_spark.extensions.codecs import decode_jpeg, encode_jpeg
    return encode_jpeg, decode_jpeg


def test_jpeg_exact_block_round_trip():
    """Constant EVEN-valued 8x8 blocks have a DC-only spectrum whose
    level-shifted DC is divisible by the Annex-K luma quantizer, so
    the LOSSY codec reconstructs them BIT-EXACTLY — the property the
    multimodal_decode_jpeg oracle rests on."""
    encode_jpeg, decode_jpeg = _jpeg_codecs()
    rng = np.random.RandomState(7)
    for _ in range(5):
        bw, bh = rng.randint(1, 5), rng.randint(1, 4)
        blocks = (rng.randint(0, 128, size=(bh, bw)) * 2).astype(np.uint8)
        img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
        dec = decode_jpeg(encode_jpeg(img))
        assert dec.shape == (bh * 8, bw * 8, 1)
        assert np.array_equal(dec[:, :, 0], img)


def test_jpeg_oracle_block_formula_round_trip():
    # the EXACT generator synthetic_jpeg_assets uses, at a few ids
    encode_jpeg, decode_jpeg = _jpeg_codecs()
    for d in (0, 1, 7, 38, 123):
        bw, bh = 1 + d % 4, 1 + d % 3
        bx = np.arange(bw)[None, :]
        by = np.arange(bh)[:, None]
        blocks = (2 * ((bx * 5 + by * 11 + d) % 128)).astype(np.uint8)
        img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
        dec = decode_jpeg(encode_jpeg(img))
        assert np.array_equal(dec[:, :, 0], img), d


def test_jpeg_lossy_tolerance_smooth_ramp():
    # arbitrary content is LOSSY by design: a smooth ramp must survive
    # quality-50 tables within a few code values (no wrap/edges)
    encode_jpeg, decode_jpeg = _jpeg_codecs()
    x = np.arange(40)[None, :]
    y = np.arange(24)[:, None]
    img = (20 + x * 2 + y * 3).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img))[:, :, 0]
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 8 and err.mean() <= 2.5
    img3 = np.stack([img, 255 - img, np.full_like(img, 99)], axis=2)
    dec3 = decode_jpeg(encode_jpeg(img3, "444"))
    err3 = np.abs(dec3.astype(int) - img3.astype(int))
    assert err3.max() <= 12 and err3.mean() <= 3.0


def test_jpeg_420_odd_dimensions():
    # 2x2-subsampled chroma + odd dims exercises the multi-block MCU
    # walk, edge padding, and replication upsampling
    encode_jpeg, decode_jpeg = _jpeg_codecs()
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(19, 27, 3)).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, "420"))
    assert dec.shape == (19, 27, 3)
    # noise is the worst case for 4:2:0 — bound the MEAN drift, not max
    assert abs(float(dec.mean()) - float(img.mean())) < 16


def test_jpeg_decodes_external_tool_file():
    """tests/data/external_ref.jpg is a libjpeg-era BASELINE file with
    DRI/RSTn restart markers — decoding it proves the Huffman tables,
    byte un-stuffing, restart handling, and MCU walk read real-world
    streams, not just this encoder's output."""
    import pathlib

    _, decode_jpeg = _jpeg_codecs()
    data = (pathlib.Path(__file__).parent / "data" / "external_ref.jpg").read_bytes()
    px = decode_jpeg(data)
    assert px.shape == (161, 161, 3)
    # the flower-of-life drawing is dark lines on a white page: high
    # mean, full-range contrast — a garbled entropy stream shows up as
    # mid-gray noise and fails both bounds
    assert px.mean() > 190
    assert px.min() < 64 and px.max() > 240


def test_jpeg_gates_and_errors():
    encode_jpeg, decode_jpeg = _jpeg_codecs()
    import struct as _s
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x89PNG1234")
    good = encode_jpeg(np.full((8, 8), 100, np.uint8))
    # flip SOF0 -> SOF2 (progressive) in place: marker byte after SOI
    idx = good.find(b"\xff\xc0")
    assert idx > 0
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(good[:idx + 1] + b"\xc2" + good[idx + 2:])
    with pytest.raises(NotImplementedError, match="coding process"):
        decode_jpeg(good[:idx + 1] + b"\xc9" + good[idx + 2:])
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(np.zeros((8, 8, 3), np.uint8), "422")


def test_jpeg_fill_bytes_before_markers():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
    code. Pad every inter-segment boundary of a known-good stream and
    require a byte-identical decode (r10: the walk used to read the
    second 0xFF as marker code 0xFF and die in the length read)."""
    encode_jpeg, decode_jpeg = _jpeg_codecs()
    img = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3)
    good = encode_jpeg(img)
    base = decode_jpeg(good)
    for seg in (b"\xff\xdb", b"\xff\xc4", b"\xff\xc0", b"\xff\xda"):
        idx = good.find(seg)
        assert idx > 0
        padded = good[:idx] + b"\xff\xff\xff" + good[idx:]
        assert np.array_equal(decode_jpeg(padded), base)
    # all boundaries at once, deeper padding
    multi = good
    for seg in (b"\xff\xdb", b"\xff\xc0", b"\xff\xda"):
        i = multi.find(seg)
        multi = multi[:i] + b"\xff" * 7 + multi[i:]
    assert np.array_equal(decode_jpeg(multi), base)
    # a stream ENDING in fill bytes fails loudly, not with an index error
    with pytest.raises(ValueError, match="truncated|no SOS"):
        decode_jpeg(good[: good.find(b"\xff\xda")] + b"\xff\xff\xff\xff")


def test_jpeg_decompression_bomb_guard():
    """A sub-KB payload declaring a huge frame must be rejected BEFORE
    plane allocation (mirrors the PNG IDAT-length guard, r9 advice):
    every coded block costs >=2 entropy bits, so declared geometry
    whose block count can't fit the remaining bytes is a lie."""
    import struct as _s

    encode_jpeg, decode_jpeg = _jpeg_codecs()
    good = encode_jpeg(np.full((8, 8), 100, np.uint8))
    idx = good.find(b"\xff\xc0")
    # SOF0 body: len(2) prec(1) h(2) w(2) nc(1) [cid hv tq]
    bomb = (good[:idx + 5]
            + _s.pack(">HH", 65535, 65535)
            + good[idx + 9:])
    with pytest.raises(ValueError, match="entropy segment too short"):
        decode_jpeg(bomb)
    # crafted sampling factors outside the spec's 1..4 die at SOF parse
    hv_off = idx + 11  # cid at +10, hv at +11 for the single component
    assert good[hv_off] == 0x11
    crafted = good[:hv_off] + b"\x66" + good[hv_off + 1:]
    with pytest.raises(ValueError, match="sampling factors"):
        decode_jpeg(crafted)
    # zero dimensions are rejected too
    zero = (good[:idx + 5] + _s.pack(">HH", 0, 8) + good[idx + 9:])
    with pytest.raises(ValueError, match="zero dimension"):
        decode_jpeg(zero)


def test_jpeg_restart_markers_round_trip():
    """Inject a DRI segment + per-interval RSTn markers by re-encoding
    through the writer path at MCU granularity is encoder surgery; the
    external fixture covers real restarts. Here: the decoder must
    IGNORE padding bits at segment end and handle multi-MCU grayscale
    exactly (DC diff chain across 12 blocks)."""
    encode_jpeg, decode_jpeg = _jpeg_codecs()
    blocks = (np.arange(12, dtype=np.uint8).reshape(3, 4) * 20)
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    dec = decode_jpeg(encode_jpeg(img))
    assert np.array_equal(dec[:, :, 0], img)


def test_jpeg_resize_path():
    # JPEG payloads ride the same nearest-neighbor resize slot as
    # BMP/PNG; exact-roundtrip blocks make the resized values exact too
    encode_jpeg, decode_jpeg = _jpeg_codecs()
    from trendmachine_spark.extensions.codecs import resize_nearest

    blocks = (np.arange(6, dtype=np.uint8).reshape(2, 3) * 40)
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    rs = resize_nearest(decode_jpeg(encode_jpeg(img)), 6, 4)
    assert rs.shape == (4, 6, 1)
    assert np.array_equal(rs, resize_nearest(img[:, :, None], 6, 4))


def test_mjpeg_container_roundtrip_property():
    """Property (hypothesis): for ANY list of SOI-prefixed payloads —
    arbitrary sizes, including empty lists and 0-byte bodies — the
    container walk returns the exact byte sequence in order. The
    container is pure framing; this pins it independently of what the
    per-frame codec can decode."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from trendmachine_spark.extensions.codecs import (
        decode_mjpeg_frames,
        encode_mjpeg,
    )

    payloads = st.lists(
        st.binary(min_size=0, max_size=300).map(lambda b: b"\xff\xd8" + b),
        min_size=0, max_size=12,
    )

    @settings(max_examples=200, deadline=None)
    @given(payloads)
    def roundtrip(frames):
        assert decode_mjpeg_frames(encode_mjpeg(frames)) == frames

    roundtrip()


def test_constant_table_memos_are_value_neutral():
    """r11 memoization: the DCT basis and Huffman tables are cached
    per process — repeated calls return the SAME objects (no rebuild),
    the basis is frozen against caller mutation, and an encode/decode
    round trip after a memo hit is still bit-exact."""
    import numpy as np

    from trendmachine_spark.extensions import codecs as C

    b1 = C._jpeg_dct_basis()
    b2 = C._jpeg_dct_basis()
    assert b1 is b2
    assert not b1.flags.writeable
    e1 = C._huff_encode_table(*C._JPEG_DC_LUMA)
    assert C._huff_encode_table(*C._JPEG_DC_LUMA) is e1
    blocks = (2 * ((np.arange(2)[:, None] * 11 + np.arange(3)[None, :] * 5
                    + 7) % 128)).astype(np.uint8)
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)[:, :, None]
    data = C.encode_jpeg(img)
    out = C.decode_jpeg(data)
    assert np.array_equal(out[:, :, 0], img[:, :, 0])
