"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Driver-mandated extension (SURVEY.md §2.6). The *decode* step runs for
REAL on the formats decodable from spec without PIL/librosa/ffmpeg —
uncompressed 24-bit BMP, RIFF PCM WAV, 8-bit truecolor PNG (round 7),
baseline sequential JPEG (round 9), and MJPEG video clips (round 11:
length-prefixed baseline-JPEG frame concat, the sandbox-honest analog
of an ffmpeg container walk) — all in ``extensions/codecs.py``, with
``NotImplementedError`` reserved for the genuinely gated variants
(progressive/arithmetic JPEG, palette/16-bit/interlaced PNG, MP4/...).
The historical deterministic-fake path remains for oracled metadata
flows over text-derived assets.
Spark-side plumbing is identical either way: binary columns, typed
metadata structs, Arrow-batched ``mapInPandas`` with an explicit output
schema, and partition-count-preserving flow.

At 100 TB the payload column dominates I/O: keep it in its own parquet
column (columnar pruning skips it unless selected), decode with
mapInPandas so bytes never round-trip through Python row objects, and
size ``spark.sql.files.maxPartitionBytes`` so one task's batch of
payloads fits executor memory.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id bigint, n_bytes bigint, content_md5 string, "
    "fake_width int, fake_height int, fake_channels int"
)


def to_binary_assets(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Derive an assets table (id, payload binary, media_type, n_bytes)
    from documents — a stand-in for real image/audio bytes with the same
    schema shape the real pipeline would use."""
    payload = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        F.col(id_col),
        payload.alias("payload"),
        (F.when(F.col(id_col) % 3 == 0, "image/png")
         .when(F.col(id_col) % 3 == 1, "audio/wav")
         .otherwise("video/mp4")).alias("media_type"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


def decode_assets(assets: DataFrame, real_decode: bool = False) -> DataFrame:
    """Arrow-batched decode/feature-extract over binary payloads.

    With ``real_decode=True`` this delegates to the REAL in-sandbox
    decoder (:func:`decode_assets_real` — BMP/WAV from spec; exotic
    codecs raise inside it). The default path emits deterministic fake
    features derived from the payload bytes so the batch shape, schema,
    and partitioning are exercised end-to-end on text-derived assets.
    """
    if real_decode:
        return decode_assets_real(assets)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf["payload"]
            md5s = payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest())
            n = payloads.map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n.astype("int64"),
                    "content_md5": md5s,
                    # deterministic fake "decoded" dimensions from the bytes
                    "fake_width": (n % 1920).astype("int32"),
                    "fake_height": (n % 1080).astype("int32"),
                    "fake_channels": pd.Series([3] * len(pdf), index=pdf.index, dtype="int32"),
                }
            )

    return assets.select("doc_id", "payload").mapInPandas(run, schema=DECODED_SCHEMA)


def media_metadata(docs: DataFrame) -> DataFrame:
    """End-to-end: documents -> binary assets -> decoded metadata.
    Oracle-checkable because the fake features are deterministic
    functions of the payload bytes."""
    return decode_assets(to_binary_assets(docs))


RESIZED_SCHEMA = (
    "doc_id bigint, out_width int, out_height int, "
    "n_chars_in bigint, n_chars_out bigint, resized_md5 string"
)


def resize_assets(assets: DataFrame, out_width: int = 64, out_height: int = 64,
                  real_resize: bool = False) -> DataFrame:
    """Arrow-batched resize over binary payloads (PIL slot stubbed).

    With ``real_resize=True`` this delegates to the REAL in-sandbox
    resizer (:func:`resize_assets_real` — BMP decode + nearest-neighbor
    resample). The default path emits a
    deterministic fake: the "resized" asset is the first
    ``out_width*out_height`` characters of the utf-8 payload, md5'd.
    Character (not byte) truncation keeps the fake engine-portable:
    Spark ``substring`` and DuckDB ``substr`` are both character-based,
    and both engines' md5 hashes the utf-8 bytes of the slice.

    Scale: same story as :func:`decode_assets` — one Arrow batch per
    task, payload column pruned unless selected, partitioning preserved.
    """
    if real_resize:
        return resize_assets_real(assets, out_width, out_height)
    budget = out_width * out_height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            texts = pdf["payload"].map(lambda b: bytes(b).decode("utf-8"))
            clipped = texts.map(lambda t: t[:budget])
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_width": pd.Series([out_width] * n, index=pdf.index, dtype="int32"),
                    "out_height": pd.Series([out_height] * n, index=pdf.index, dtype="int32"),
                    "n_chars_in": texts.map(len).astype("int64"),
                    "n_chars_out": clipped.map(len).astype("int64"),
                    "resized_md5": clipped.map(
                        lambda t: hashlib.md5(t.encode("utf-8")).hexdigest()
                    ),
                }
            )

    return assets.select("doc_id", "payload").mapInPandas(run, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, sample_ord int, frame_md5 string"


def frame_sample(assets: DataFrame, frame_len: int = 32, every_n: int = 4,
                 max_frames: int = 8, real_decode: bool = False) -> DataFrame:
    """Arrow-batched frame sampling over binary payloads (char-frame
    fake — the REAL frame path is :func:`video_frame_signature` over
    MJPEG clips since round 11; this historical form stays for the
    oracled ``multimodal_frame_sample`` metadata-flow query).

    Models video frame extraction: the payload is treated as a sequence
    of non-overlapping ``frame_len``-character frames; every
    ``every_n``-th frame is sampled, up to ``max_frames`` samples per
    asset, and each sampled frame is fingerprinted (md5). With
    ``real_decode=True`` this is where ffmpeg/pyav frame extraction
    would run — unavailable here, so it raises (the in-sandbox real
    path is the MJPEG one).

    Output is one row per sampled frame (the row-explosion shape a real
    frame sampler has): ``frame_idx`` is the frame's position in the
    asset, ``sample_ord`` the sample's ordinal (0, 1, ...). A document
    shorter than one frame yields no rows.

    Scale: mapInPandas explodes rows inside the task — no shuffle; the
    per-asset output is bounded by ``max_frames`` regardless of payload
    size, so one giant video cannot blow up a partition.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "video codecs are not available in this environment; "
                    "plug ffmpeg/pyav frame extraction here on a real cluster"
                )
            ids, idxs, ords, md5s = [], [], [], []
            for did, b in zip(pdf["doc_id"], pdf["payload"]):
                t = bytes(b).decode("utf-8")
                n_frames = len(t) // frame_len
                cap = min(n_frames, every_n * max_frames)
                for ord_, i in enumerate(range(0, cap, every_n)):
                    fr = t[i * frame_len:(i + 1) * frame_len]
                    ids.append(did)
                    idxs.append(i)
                    ords.append(ord_)
                    md5s.append(hashlib.md5(fr.encode("utf-8")).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "sample_ord": pd.Series(ords, dtype="int32"),
                    "frame_md5": pd.Series(md5s, dtype="object"),
                }
            )

    return assets.select("doc_id", "payload").mapInPandas(run, schema=FRAME_SCHEMA)


# =====================================================================
# REAL byte-level decode path (round-4 mandate): BMP + WAV from spec,
# pure numpy, inside Arrow-batched mapInPandas. Payload generation is a
# deterministic function of doc_id, so a DuckDB oracle can compute the
# expected dimensions and position/channel-weighted checksums in closed
# form while Spark actually round-trips real bytes — any padding, row-
# order (bottom-up), channel-order (BGR), or chunk-walk bug changes the
# weighted sum and fails the value-hash.
# =====================================================================

REAL_ASSET_SCHEMA = "doc_id bigint, payload binary, media_type string"
REAL_DECODED_SCHEMA = (
    "doc_id bigint, media string, width int, height int, channels int, "
    "sample_rate int, n_samples bigint, value_sum bigint"
)
REAL_RESIZED_SCHEMA = (
    "doc_id bigint, out_width int, out_height int, value_sum bigint, "
    "resized_md5 string"
)


def _codecs_by_value():
    """Ship the codecs module BY VALUE inside the closure pickle: the
    driver harness does not guarantee the package is importable on
    executor python workers (see verify SKILL gotchas)."""
    from pyspark import cloudpickle

    from trendmachine_spark.extensions import codecs

    try:
        cloudpickle.register_pickle_by_value(codecs)
    except Exception:
        pass  # older cloudpickle: package must be on the workers' path
    return codecs


def _media_synth_one():
    """Per-id synthesizer closure (picklable BY VALUE — factory-nested,
    codecs module registered by value): even ids -> 24-bit BMP (width
    4+id%13, height 3+id%7, per-channel pixel formulas), odd ids ->
    16-bit PCM WAV (50+id%100 samples at 8000+(id%4)*4000 Hz). Shared
    by the two-step and fused paths so the generator formulas live in
    exactly one place."""
    codecs = _codecs_by_value()
    import numpy as np

    def synth_one(d: int) -> tuple[bytes, str]:
        if d % 2 == 0:
            w, h = 4 + d % 13, 3 + d % 7
            x = np.arange(w)[None, :, None]
            y = np.arange(h)[:, None, None]
            chan = np.concatenate(
                [
                    (x * 7 + y * 13 + d) % 256,
                    (x * 11 + y * 3 + d) % 256,
                    (x * 5 + y * 17 + d) % 256,
                ],
                axis=2,
            ).astype(np.uint8)
            return codecs.encode_bmp(chan), "image/bmp"
        n = 50 + d % 100
        rate = 8000 + (d % 4) * 4000
        s = ((np.arange(n) * 31 + d) % 65536 - 32768).astype("<i2")
        return codecs.encode_wav(s, sample_rate=rate), "audio/wav"

    return synth_one


def synthetic_media_assets(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL media payloads per doc id (see
    :func:`_media_synth_one`). Encoded with the real encoders — the
    bytes on the wire are valid files any external tool could open.

    The id projection is rebalanced with ``min_bytes=0``: codec
    synthesis fans an 8-byte id out into KILOBYTES of per-asset CPU
    (~1000x — far past the ~10x the default 1 MiB size gate was
    calibrated for), so scan-split parallelism, not input size, is the
    binding constraint. Measured at x20: decode_real 2.67 -> 1.14 s
    (the residual "harness constant" in the first DECODE_REAL_DECOMP
    was in fact a 4-of-32-core scan floor). At real multi-split scale
    the partition-count gate makes it a structural no-op."""
    from trendmachine_spark.extensions.dedup import rebalance_for_fanout

    docs = rebalance_for_fanout(docs.select(id_col), min_bytes=0)
    synth_one = _media_synth_one()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, types = [], [], []
            for d in pdf[id_col]:
                d = int(d)
                payload, mtype = synth_one(d)
                ids.append(d)
                payloads.append(payload)
                types.append(mtype)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                    "media_type": pd.Series(types, dtype="object"),
                }
            )

    return docs.select(id_col).mapInPandas(run, schema=REAL_ASSET_SCHEMA)


def synthetic_png_assets(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL PNG payloads per doc id (round 7): width
    4+id%11, height 3+id%5; even ids 8-bit RGB (color type 2), odd ids
    RGBA (color type 6); pixel formulas R=(7x+13y+id)%256,
    G=(11x+3y+id)%256, B=(5x+17y+id)%256, A=(3x+7y+id)%256. The
    encoder writes row r with filter r%5, so decoding this corpus
    exercises every PNG filter type; the bytes are spec-valid files
    (the decoder also reads system PNGs encoded by external tools —
    see tests/data/external_ref.png)."""
    codecs = _codecs_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, payloads, types = [], [], []
            for d in pdf[id_col]:
                d = int(d)
                w, h = 4 + d % 11, 3 + d % 5
                x = np.arange(w)[None, :, None]
                y = np.arange(h)[:, None, None]
                planes = [
                    (x * 7 + y * 13 + d) % 256,
                    (x * 11 + y * 3 + d) % 256,
                    (x * 5 + y * 17 + d) % 256,
                ]
                if d % 2 == 1:
                    planes.append((x * 3 + y * 7 + d) % 256)
                px = np.concatenate(planes, axis=2).astype(np.uint8)
                ids.append(d)
                payloads.append(codecs.encode_png(px))
                types.append("image/png")
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                    "media_type": pd.Series(types, dtype="object"),
                }
            )

    return docs.select(id_col).mapInPandas(run, schema=REAL_ASSET_SCHEMA)


def synthetic_jpeg_assets(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL baseline-JPEG payloads per doc id (round 9):
    grayscale, width 8*(1+id%4), height 8*(1+id%3), each 8x8 block
    constant at the EVEN value v(bx,by) = 2*((bx*5 + by*11 + id) % 128).
    Constant blocks have a DC-only spectrum and even values make the
    level-shifted DC divisible by the Annex-K luma quantizer (q00=16),
    so the lossy codec reconstructs these payloads BIT-EXACTLY — which
    is what lets a closed-form SQL oracle check the full Huffman/IDCT
    round trip (the same trick as the PNG generator formulas; arbitrary
    content stays tolerance-tested in units, where lossiness belongs).
    The bytes are spec-valid files: the decoder also reads external
    libjpeg-encoded baselines with restart markers and 4:2:0 sampling
    (tests/data/external_ref.jpg)."""
    codecs = _codecs_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, payloads, types = [], [], []
            for d in pdf[id_col]:
                d = int(d)
                bw, bh = 1 + d % 4, 1 + d % 3
                bx = np.arange(bw)[None, :]
                by = np.arange(bh)[:, None]
                blocks = (2 * ((bx * 5 + by * 11 + d) % 128)).astype(np.uint8)
                img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
                ids.append(d)
                payloads.append(codecs.encode_jpeg(img))
                types.append("image/jpeg")
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                    "media_type": pd.Series(types, dtype="object"),
                }
            )

    return docs.select(id_col).mapInPandas(run, schema=REAL_ASSET_SCHEMA)


def decode_assets_real(assets: DataFrame) -> DataFrame:
    """REAL decode: sniff the payload magic, parse BMP/WAV from spec,
    and emit typed metadata plus a position/channel-weighted integer
    checksum of the decoded values (bmp: sum over pixels of
    (1+(x+2y)%5)*(R+2G+3B); wav: sum over samples of (1+i%7)*s_i).
    Weighting makes the checksum sensitive to exactly the mistakes a
    decoder can make — row flips, BGR/RGB swaps, padding leaks, sample
    offsets. Exotic codecs raise NotImplementedError (by design).

    Fields that do not apply to a media kind are 0, not NULL — nullable
    int columns round-trip through pandas as floats/ext-dtypes
    differently per engine and would flake the driver's value hash."""
    decode_one = _media_decode_one()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals_rows = [decode_one(did, b)
                         for did, b in zip(pdf["doc_id"], pdf["payload"])]
            yield _decoded_frame(vals_rows)

    return assets.select("doc_id", "payload").mapInPandas(run, schema=REAL_DECODED_SCHEMA)


def _media_decode_one():
    """Per-payload decoder closure (picklable by value): sniff the
    magic, decode with the pure-Python codecs, return the 8-field
    metadata+checksum row shared by the two-step and fused paths."""
    codecs = _codecs_by_value()
    import numpy as np

    def decode_one(did, b) -> tuple:
        b = bytes(b)
        if b[:2] == b"BM":
            px = codecs.decode_bmp(b).astype(np.int64)
            h, w = px.shape[:2]
            wgt = 1 + (np.arange(w)[None, :] + 2 * np.arange(h)[:, None]) % 5
            mixed = px[:, :, 0] + 2 * px[:, :, 1] + 3 * px[:, :, 2]
            return (did, "bmp", w, h, 3, 0, 0, int((wgt * mixed).sum()))
        if b[:8] == b"\x89PNG\r\n\x1a\n":
            px = codecs.decode_png(b).astype(np.int64)
            h, w, c = px.shape
            wgt = 1 + (np.arange(w)[None, :] + 2 * np.arange(h)[:, None]) % 5
            mixed = px[:, :, 0] + 2 * px[:, :, 1] + 3 * px[:, :, 2]
            if c == 4:
                mixed = mixed + 4 * px[:, :, 3]
            return (did, "png", w, h, c, 0, 0, int((wgt * mixed).sum()))
        if b[:2] == b"\xff\xd8":
            px = codecs.decode_jpeg(b).astype(np.int64)
            h, w, c = px.shape
            wgt = 1 + (np.arange(w)[None, :] + 2 * np.arange(h)[:, None]) % 5
            if c == 1:  # grayscale: the weighted Y sum
                mixed = px[:, :, 0]
            else:
                mixed = px[:, :, 0] + 2 * px[:, :, 1] + 3 * px[:, :, 2]
            return (did, "jpeg", w, h, c, 0, 0, int((wgt * mixed).sum()))
        if b[:4] == b"RIFF":
            rate, _nch, samples = codecs.decode_wav(b)
            s = samples.astype(np.int64)
            return (did, "wav", 0, 0, 0, rate, len(s),
                    int(((1 + np.arange(len(s)) % 7) * s).sum()))
        raise NotImplementedError(
            f"no in-sandbox codec for payload magic {b[:4]!r}; "
            "plug PIL/ffmpeg here on a real cluster"
        )

    return decode_one


def _decoded_frame(vals_rows: list) -> pd.DataFrame:
    """8-field decoded-metadata rows -> the REAL_DECODED_SCHEMA frame."""
    cols = list(zip(*vals_rows)) if vals_rows else [[]] * 8
    return pd.DataFrame(
        {
            "doc_id": pd.Series(cols[0], dtype="int64"),
            "media": pd.Series(cols[1], dtype="object"),
            "width": pd.Series(cols[2], dtype="int32"),
            "height": pd.Series(cols[3], dtype="int32"),
            "channels": pd.Series(cols[4], dtype="int32"),
            "sample_rate": pd.Series(cols[5], dtype="int32"),
            "n_samples": pd.Series(cols[6], dtype="int64"),
            "value_sum": pd.Series(cols[7], dtype="int64"),
        }
    )


def synth_decode_media_fused(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fused synthesize->decode in ONE mapInPandas pass: identical
    values to ``decode_assets_real(synthetic_media_assets(docs))`` (the
    same :func:`_media_synth_one`/:func:`_media_decode_one` closures do
    the work), with the payload bytes never crossing the Arrow boundary.

    MEASURED REJECTION (DECODE_REAL_DECOMP.json, x20): the fused pass
    is SLOWER than the two-step shape (4.03 s vs 2.75 s) despite
    skipping an Arrow hop — chained mapInPandas stages execute as two
    pipelined Python workers per task, so encode and decode overlap,
    while the fused worker runs them sequentially; pipeline overlap
    beats the saved serialization on this CPU-bound pair. Kept as the
    measured alternative and for single-worker environments; the
    registered query stays two-step. Rebalanced like
    :func:`synthetic_media_assets` (same ~1000x codec fan-out)."""
    from trendmachine_spark.extensions.dedup import rebalance_for_fanout

    docs = rebalance_for_fanout(docs.select(id_col), min_bytes=0)
    synth_one = _media_synth_one()
    decode_one = _media_decode_one()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals_rows = []
            for d in pdf[id_col]:
                d = int(d)
                payload, _ = synth_one(d)
                vals_rows.append(decode_one(d, payload))
            yield _decoded_frame(vals_rows)

    return docs.select(id_col).mapInPandas(run, schema=REAL_DECODED_SCHEMA)


def resize_assets_real(assets: DataFrame, out_width: int = 8,
                       out_height: int = 6) -> DataFrame:
    """REAL resize: decode the BMP/PNG payload (sniffed by magic),
    nearest-neighbor resample to (out_width, out_height), and emit the
    weighted checksum of the RESIZED pixels plus an md5 of the raw
    resized bytes (RGB, or RGBA for alpha PNGs — the alpha plane adds
    4*A to the mix). Feed it image assets only (filter media_type
    first) — non-image payloads raise, same contract as
    :func:`decode_assets_real`."""
    codecs = _codecs_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        wgt = 1 + (np.arange(out_width)[None, :] + 2 * np.arange(out_height)[:, None]) % 5
        for pdf in batches:
            ids, sums, md5s = [], [], []
            for did, b in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(b)
                if b[:8] == b"\x89PNG\r\n\x1a\n":
                    px = codecs.decode_png(b)
                elif b[:2] == b"\xff\xd8":
                    px = codecs.decode_jpeg(b)
                elif b[:2] == b"BM":
                    px = codecs.decode_bmp(b)
                else:
                    # loud gate, mirroring _media_decode_one: a stray
                    # WAV/corrupt payload must not fail deep inside the
                    # BMP parser with a misleading struct error
                    raise NotImplementedError(
                        "no image codec for magic %r (doc_id=%s)"
                        % (b[:8], did)
                    )
                rs = codecs.resize_nearest(px, out_width, out_height).astype(np.int64)
                if rs.shape[2] == 1:  # grayscale JPEG: the Y plane IS the mix
                    mixed = rs[:, :, 0]
                else:
                    mixed = rs[:, :, 0] + 2 * rs[:, :, 1] + 3 * rs[:, :, 2]
                if rs.shape[2] == 4:
                    mixed = mixed + 4 * rs[:, :, 3]
                ids.append(did)
                sums.append(int((wgt * mixed).sum()))
                md5s.append(hashlib.md5(rs.astype(np.uint8).tobytes()).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "out_width": pd.Series([out_width] * len(ids), dtype="int32"),
                    "out_height": pd.Series([out_height] * len(ids), dtype="int32"),
                    "value_sum": pd.Series(sums, dtype="int64"),
                    "resized_md5": pd.Series(md5s, dtype="object"),
                }
            )

    return assets.select("doc_id", "payload").mapInPandas(run, schema=REAL_RESIZED_SCHEMA)


# ------------------------------------------------- perceptual hashing
# Round 10: image dedup over the REAL decode path. aHash/dHash are the
# classic perceptual fingerprints (resize to a tiny grid, threshold
# against the mean / the horizontal neighbor); both are integer-exact
# here — nearest-neighbor resample + integer luma — so a closed-form
# SQL oracle can verify the full decode->gray->resample->threshold->
# bit-pack chain per image. Hashes ship as two 32-bit halves in BIGINT
# (never touching the int64 sign bit) so hamming distance is
# bit_count(xor(hi))+bit_count(xor(lo)) in BOTH engines.

PHASH_SCHEMA = (
    "doc_id bigint, width int, height int, "
    "ahash_hi bigint, ahash_lo bigint, dhash_hi bigint, dhash_lo bigint"
)

AUDIO_FEATURES_SCHEMA = (
    "doc_id bigint, sample_rate int, n_samples bigint, duration_ms bigint, "
    "peak_abs bigint, zero_crossings bigint, energy bigint, dc_sum bigint"
)


def _pack_bits64(bits) -> tuple[int, int]:
    """Row-major 64-bit vector -> (hi, lo) 32-bit halves as python ints
    (bit p of the flat vector is bit p%32 of half p//32)."""
    lo = hi = 0
    for p, b in enumerate(bits):
        if b:
            if p < 32:
                lo |= 1 << p
            else:
                hi |= 1 << (p - 32)
    return hi, lo


def image_perceptual_hash(assets: DataFrame) -> DataFrame:
    """Per-image aHash + dHash over REAL decoded pixels.

    Decode (magic-sniffed BMP/PNG/JPEG), integer luma
    ``(299R + 587G + 114B) // 1000`` (grayscale JPEG: the Y plane),
    then: aHash = 8x8 nearest-resample, bit = gray > floor(mean);
    dHash = 9x8 nearest-resample, bit = gray[x] < gray[x+1] (row-major
    bit order, 64 bits each, packed into two 32-bit halves).

    Scale: pure per-asset Arrow-batched CPU, zero exchanges — the hash
    table is ~30 bytes/image, the thing dedup joins touch instead of
    pixels. Alpha planes are ignored by design (perceptual hashes rate
    luminance structure)."""
    codecs = _codecs_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for did, b in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(b)
                if b[:8] == b"\x89PNG\r\n\x1a\n":
                    px = codecs.decode_png(b)
                elif b[:2] == b"\xff\xd8":
                    px = codecs.decode_jpeg(b)
                elif b[:2] == b"BM":
                    px = codecs.decode_bmp(b)
                else:
                    # loud gate, mirroring _media_decode_one: a stray
                    # WAV/corrupt payload must not fail deep inside the
                    # BMP parser with a misleading struct error
                    raise NotImplementedError(
                        "no image codec for magic %r (doc_id=%s)"
                        % (b[:8], did)
                    )
                px = px.astype(np.int64)
                if px.shape[2] == 1:
                    gray = px[:, :, 0]
                else:
                    gray = (299 * px[:, :, 0] + 587 * px[:, :, 1]
                            + 114 * px[:, :, 2]) // 1000
                h, w = gray.shape
                a = codecs.resize_nearest(gray, 8, 8)
                abits = (a > (int(a.sum()) // 64)).ravel()
                dg = codecs.resize_nearest(gray, 9, 8)
                dbits = (dg[:, :8] < dg[:, 1:]).ravel()
                ahi, alo = _pack_bits64(abits)
                dhi, dlo = _pack_bits64(dbits)
                rows.append((int(did), w, h, ahi, alo, dhi, dlo))
            cols = list(zip(*rows)) if rows else [[]] * 7
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(cols[0], dtype="int64"),
                    "width": pd.Series(cols[1], dtype="int32"),
                    "height": pd.Series(cols[2], dtype="int32"),
                    "ahash_hi": pd.Series(cols[3], dtype="int64"),
                    "ahash_lo": pd.Series(cols[4], dtype="int64"),
                    "dhash_hi": pd.Series(cols[5], dtype="int64"),
                    "dhash_lo": pd.Series(cols[6], dtype="int64"),
                }
            )

    return assets.select("doc_id", "payload").mapInPandas(run, schema=PHASH_SCHEMA)


def phash_families(hashes: DataFrame) -> DataFrame:
    """Exact perceptual-dup families: images sharing an aHash collapse
    to one family with a min-id keeper — the standard pHash dedup move
    (the hash IS the equivalence key; lossiness is the point).

    Scale: one hash exchange on (ahash_hi, ahash_lo) over the ~30-byte
    hash table; linear output (one row per image, never pairs)."""
    w = Window.partitionBy("ahash_hi", "ahash_lo")
    return hashes.select(
        "doc_id",
        F.min("doc_id").over(w).alias("family_key"),
        F.count(F.lit(1)).over(w).alias("family_size"),
        (F.col("doc_id") == F.min("doc_id").over(w)).cast("long").alias("is_keeper"),
    )


def phash_near_pairs(hashes: DataFrame, max_hamming: int = 2) -> DataFrame:
    """Near-duplicate image pairs: aHash hamming distance <= max_hamming.

    Banded exactly like SimHash (Manku et al.): the 64-bit aHash splits
    into four 16-bit bands; by pigeonhole, any pair within hamming
    ``max_hamming < 4`` agrees on at least one band VERBATIM, so band
    equality is a lossless candidate filter — candidates are verified
    with ``bit_count(xor())`` (JVM codegen in Spark, the same builtin
    pair in DuckDB). No all-pairs path at any scale.

    Shape: the band join runs on DISTINCT (hi, lo) fingerprints, not
    images — the r9 simhash_near_dup collapse applied up front. Replica
    corpora concentrate MASSIVELY on few hashes (the ×10 corpus: 25k
    images -> 2,033 distinct aHashes, largest identical family 1,294),
    and a doc-level band join would square the hot families inside the
    join (the 453M-candidate pathology). Two docs are within hamming k
    iff their HASHES are, so the output factors exactly into (a)
    hamming-0 pairs within an identical-hash family (one member
    self-join on the hash, each pair emitted once) and (b) cross pairs
    expanded from qualifying DISTINCT-hash pairs via two member joins
    (broadcast — banding + the hamming filter prune hard). The residual
    quadratic term is the OUTPUT itself (~18M pairs at ×10), which any
    engine emitting the pair form pays; keeper pipelines should consume
    :func:`phash_families` instead.
    """
    if not 0 <= max_hamming < 4:
        raise ValueError("4-band pigeonhole is exact only for max_hamming < 4")
    from trendmachine_spark.extensions.dedup import _materialize

    # the hash table feeds the distinct, both member-expansion joins,
    # and both within-family sides: without materialization the decode
    # subtree instantiates per consumer (plans are trees — SCALE.md r5)
    fp = _materialize(hashes.select("doc_id", "ahash_hi", "ahash_lo"))
    groups = fp.select("ahash_hi", "ahash_lo").distinct()
    bands = F.array(
        F.col("ahash_lo").bitwiseAND(F.lit(0xFFFF)),
        F.shiftright("ahash_lo", 16).bitwiseAND(F.lit(0xFFFF)),
        F.col("ahash_hi").bitwiseAND(F.lit(0xFFFF)),
        F.shiftright("ahash_hi", 16).bitwiseAND(F.lit(0xFFFF)),
    )
    buckets = groups.select(
        "ahash_hi", "ahash_lo", F.posexplode(bands).alias("band", "bv")
    )
    fa = buckets.select(
        F.col("ahash_hi").alias("_fa_hi"), F.col("ahash_lo").alias("_fa_lo"),
        "band", "bv",
    )
    fb = buckets.select(
        F.col("ahash_hi").alias("_fb_hi"), F.col("ahash_lo").alias("_fb_lo"),
        "band", "bv",
    )
    ham = (
        F.bit_count(F.col("_fa_hi").bitwiseXOR(F.col("_fb_hi")))
        + F.bit_count(F.col("_fa_lo").bitwiseXOR(F.col("_fb_lo")))
    ).cast("long")
    fpairs = (
        fa.join(fb, ["band", "bv"])
        .filter(  # lexicographic (hi, lo) order: each hash pair once
            (F.col("_fa_hi") < F.col("_fb_hi"))
            | ((F.col("_fa_hi") == F.col("_fb_hi"))
               & (F.col("_fa_lo") < F.col("_fb_lo")))
        )
        .select("_fa_hi", "_fa_lo", "_fb_hi", "_fb_lo")
        .distinct()
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
    )
    ma = fp.select(
        F.col("doc_id").alias("_ia"),
        F.col("ahash_hi").alias("_fa_hi"), F.col("ahash_lo").alias("_fa_lo"),
    )
    mb = fp.select(
        F.col("doc_id").alias("_ib"),
        F.col("ahash_hi").alias("_fb_hi"), F.col("ahash_lo").alias("_fb_lo"),
    )
    cross = (
        ma.join(F.broadcast(fpairs), ["_fa_hi", "_fa_lo"])
        .join(mb, ["_fb_hi", "_fb_lo"])
        .select(
            F.least("_ia", "_ib").alias("id_a"),
            F.greatest("_ia", "_ib").alias("id_b"),
            "hamming",
        )
    )
    wa = fp.select(F.col("doc_id").alias("id_a"), "ahash_hi", "ahash_lo")
    wb = fp.select(F.col("doc_id").alias("id_b"), "ahash_hi", "ahash_lo")
    within = (
        wa.join(wb, ["ahash_hi", "ahash_lo"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.lit(0).cast("long").alias("hamming"))
    )
    return cross.unionByName(within)


def audio_features(assets: DataFrame) -> DataFrame:
    """Acoustic summary features over REAL decoded PCM samples: peak
    amplitude, zero-crossing count (sign transitions, zero counted as
    positive), total energy (sum of squares), DC sum, and integer
    duration in ms — the stats an audio-corpus quality filter keys on
    (clipped/silent/DC-biased clip detection), all integer-exact so the
    closed-form oracle verifies the full RIFF parse + sample decode.

    Scale: per-asset Arrow-batched CPU, zero exchanges; 16-bit samples
    never leave the worker — ~50 bytes of features per clip do."""
    codecs = _codecs_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for did, b in zip(pdf["doc_id"], pdf["payload"]):
                rate, _nch, samples = codecs.decode_wav(bytes(b))
                s = samples.astype(np.int64)
                n = len(s)
                rows.append((
                    int(did), int(rate), n, n * 1000 // rate,
                    int(np.abs(s).max()) if n else 0,
                    int(((s[:-1] < 0) != (s[1:] < 0)).sum()) if n > 1 else 0,
                    int((s * s).sum()), int(s.sum()),
                ))
            cols = list(zip(*rows)) if rows else [[]] * 8
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(cols[0], dtype="int64"),
                    "sample_rate": pd.Series(cols[1], dtype="int32"),
                    "n_samples": pd.Series(cols[2], dtype="int64"),
                    "duration_ms": pd.Series(cols[3], dtype="int64"),
                    "peak_abs": pd.Series(cols[4], dtype="int64"),
                    "zero_crossings": pd.Series(cols[5], dtype="int64"),
                    "energy": pd.Series(cols[6], dtype="int64"),
                    "dc_sum": pd.Series(cols[7], dtype="int64"),
                }
            )

    return assets.select("doc_id", "payload").mapInPandas(
        run, schema=AUDIO_FEATURES_SCHEMA
    )


def audio_fingerprint(assets: DataFrame, n_frames: int = 16) -> DataFrame:
    """Acoustic fingerprint over REAL decoded PCM: the clip splits into
    ``n_frames`` balanced frames (sample i -> frame ``i*n_frames // n``,
    the integer rule both engines can state), per-frame energy is the
    exact integer sum of squares, and bit k of the fingerprint says
    ``energy[k] > energy[k+1]`` — the energy-DELTA-SIGN construction
    (the shape underlying Shazam-style landmark hashing, minus the FFT
    this sandbox cannot justify): amplitude-scale-sensitive but
    alignment-robust, and integer-exact so the closed-form oracle
    verifies decode + framing + the bit pack in one value.

    Scale: per-asset Arrow-batched CPU, zero exchanges; one BIGINT per
    clip comes out. Family grouping over it is the audio analog of
    dedup_image_phash."""
    codecs = _codecs_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, fps = [], []
            for did, b in zip(pdf["doc_id"], pdf["payload"]):
                _rate, _nch, samples = codecs.decode_wav(bytes(b))
                s = samples.astype(np.int64)
                n = len(s)
                e = np.zeros(n_frames, dtype=np.int64)
                if n:
                    k = (np.arange(n) * n_frames) // n
                    np.add.at(e, k, s * s)
                fp = 0
                for i in range(n_frames - 1):
                    if e[i] > e[i + 1]:
                        fp |= 1 << i
                ids.append(int(did))
                fps.append(fp)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "fingerprint": pd.Series(fps, dtype="int64"),
                }
            )

    return assets.select("doc_id", "payload").mapInPandas(
        run, schema="doc_id bigint, fingerprint bigint"
    )


def family_report(df: DataFrame, *key_cols: str) -> DataFrame:
    """Shared exact-signature family window (image aHash, audio
    fingerprint, video frame signature): min-id keeper + family size
    over the signature key — ONE hash exchange over the signature
    table, linear output, never pairs."""
    w = Window.partitionBy(*key_cols)
    return df.select(
        "*",
        F.min("doc_id").over(w).alias("family_key"),
        F.count(F.lit(1)).over(w).alias("family_size"),
        (F.col("doc_id") == F.min("doc_id").over(w)).cast("long").alias("is_keeper"),
    )


# ---------------------------------------------------------------------
# REAL video path (round 11): MJPEG-container clips whose frames are
# the exact-roundtrip JPEG corpus construction, so the container walk,
# per-frame Huffman/IDCT decode, and frame-order semantics are all
# verified by closed-form SQL oracles — the same trick as the r9 JPEG
# corpus (multimodal.py synthetic_jpeg_assets), lifted one level to
# multi-frame clips. Replaces the r10 char-frame stub as the signature
# source for dedup_video_frames (the stub remains for the historical
# oracled frame_sample query).
# ---------------------------------------------------------------------

VIDEO_DECODED_SCHEMA = (
    "doc_id bigint, n_frames int, total_pixels bigint, wsum bigint"
)
VIDEO_FRAME_SCHEMA = (
    "doc_id bigint, frame_idx int, sample_ord int, frame_md5 string"
)

#: content-key modulus: clips whose doc_ids are congruent mod 251 carry
#: byte-identical frame sequences — the replica structure video dedup
#: families collapse (251 is prime and coprime to the id%3 media split,
#: so every residue occurs; ~6-7 members per family at sf0.01)
VIDEO_CONTENT_MOD = 251


def _video_frame_params(c: int, f: int) -> tuple[int, int, int]:
    """(blocks_wide, blocks_high, k) for frame ``f`` of content key
    ``c`` — the per-frame instance of the exact-roundtrip JPEG
    generator (constant 8x8 blocks at even values, DC divisible by the
    Annex-K luma q00, bit-exact reconstruction)."""
    return 1 + (c + f) % 4, 1 + (c + f) % 3, c + 17 * f


def _video_synth_one():
    """Per-id MJPEG clip synthesizer (picklable by value): content key
    c = id % VIDEO_CONTENT_MOD, 3 + c%6 frames, frame f an exact-
    roundtrip grayscale JPEG with blocks
    v(bx, by) = 2*((5*bx + 11*by + c + 17*f) % 128).

    Everything the closure touches is a LOCAL binding (the module
    constant is copied into a closure cell, the param helper inlined):
    a nested function's references to multimodal-module globals would
    pickle as imports of this package, which the driver harness does
    not provide on executor workers (verify SKILL gotchas)."""
    codecs = _codecs_by_value()
    import numpy as np

    content_mod = VIDEO_CONTENT_MOD

    def synth_one(d: int) -> bytes:
        c = d % content_mod
        frames = []
        for f in range(3 + c % 6):
            bw, bh, k = 1 + (c + f) % 4, 1 + (c + f) % 3, c + 17 * f
            bx = np.arange(bw)[None, :]
            by = np.arange(bh)[:, None]
            blocks = (2 * ((bx * 5 + by * 11 + k) % 128)).astype(np.uint8)
            img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
            frames.append(codecs.encode_jpeg(img))
        return codecs.encode_mjpeg(frames)

    return synth_one


def synthetic_video_assets(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL MJPEG clips for the video ids (doc_id%3==2,
    the media_type split to_binary_assets uses). Same min_bytes=0
    rebalance rationale as synthetic_media_assets: codec synthesis
    fans an 8-byte id into ~100x per-clip CPU, so scan-split
    parallelism is the binding constraint, not input size."""
    from trendmachine_spark.extensions.dedup import rebalance_for_fanout

    vids = docs.select(id_col).filter(F.col(id_col) % 3 == 2)
    vids = rebalance_for_fanout(vids, min_bytes=0)
    synth_one = _video_synth_one()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, types = [], [], []
            for d in pdf[id_col]:
                d = int(d)
                ids.append(d)
                payloads.append(synth_one(d))
                types.append("video/mjpeg")
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                    "media_type": pd.Series(types, dtype="object"),
                }
            )

    return vids.mapInPandas(run, schema=REAL_ASSET_SCHEMA)


def video_decode_real(assets: DataFrame) -> DataFrame:
    """REAL clip decode: container walk + per-frame JPEG decode, per
    clip emitting frame count, total decoded pixels, and the frame-
    order-weighted checksum ``sum_f (1 + f%7) * sum(gray_f)`` — integer
    throughout, sensitive to exactly the mistakes a container walk can
    make (skipped/duplicated/reordered frames, mis-framed lengths)
    on top of the per-frame decode exactness the JPEG queries pin.

    Scale: zero exchanges — pure per-clip Arrow-batched CPU; only
    ~30 bytes of metadata leave the worker per clip."""
    codecs = _codecs_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for did, b in zip(pdf["doc_id"], pdf["payload"]):
                frames = codecs.decode_mjpeg(bytes(b))
                tot = 0
                wsum = 0
                for f, px in enumerate(frames):
                    gray = px[:, :, 0].astype(np.int64)
                    tot += gray.size
                    wsum += (1 + f % 7) * int(gray.sum())
                rows.append((int(did), len(frames), tot, wsum))
            cols = list(zip(*rows)) if rows else [[]] * 4
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(cols[0], dtype="int64"),
                    "n_frames": pd.Series(cols[1], dtype="int32"),
                    "total_pixels": pd.Series(cols[2], dtype="int64"),
                    "wsum": pd.Series(cols[3], dtype="int64"),
                }
            )

    return assets.select("doc_id", "payload").mapInPandas(
        run, schema=VIDEO_DECODED_SCHEMA
    )


def video_frame_signature(assets: DataFrame, every_n: int = 2,
                          max_frames: int = 8) -> DataFrame:
    """Sampled-frame fingerprints over DECODED pixels (round 11 — the
    r10 char-frame stub retired from the dedup path): walk the MJPEG
    container, decode every ``every_n``-th frame up to ``max_frames``
    samples, fingerprint each as md5 of the comma-joined raveled
    grayscale values (a canonical serialization of the decoded matrix
    that a SQL oracle can reconstruct in closed form — any decode or
    frame-walk bug changes the values and therefore the hash).

    Scale: the container walk is length-prefix arithmetic — UNSAMPLED
    frames are never entropy-decoded (the point of frame sampling: a
    2-hour clip costs max_frames decodes); output is bounded per clip;
    zero exchanges."""
    codecs = _codecs_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ords, md5s = [], [], [], []
            for did, b in zip(pdf["doc_id"], pdf["payload"]):
                raw = codecs.decode_mjpeg_frames(bytes(b))
                cap = min(len(raw), every_n * max_frames)
                for ord_, f in enumerate(range(0, cap, every_n)):
                    gray = codecs.decode_jpeg(raw[f])[:, :, 0]
                    ids.append(int(did))
                    idxs.append(f)
                    ords.append(ord_)
                    md5s.append(_frame_md5(gray))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "sample_ord": pd.Series(ords, dtype="int32"),
                    "frame_md5": pd.Series(md5s, dtype="object"),
                }
            )

    return assets.select("doc_id", "payload").mapInPandas(
        run, schema=VIDEO_FRAME_SCHEMA
    )


#: pre-encoded decimal byte strings for every uint8 pixel value — the
#: video frame fingerprint serializes every sampled pixel, and the
#: per-pixel ``str(int(v))`` generator measured 5.4x slower than this
#: table lookup + bytes join (r14 optimization round, guide §4.2:
#: vectorize/batch the per-row Python work inside the UDF); the md5
#: input is byte-identical, so fingerprints and oracles are unchanged.
_PIXEL_BYTES = [str(i).encode() for i in range(256)]


def _frame_md5(gray) -> str:
    """md5 hexdigest of the comma-joined raveled grayscale values —
    byte-identical to ``md5(",".join(str(int(v)) for v in
    gray.ravel()).encode())`` for uint8 input (pinned by
    tests/test_phash_audio.py::
    test_frame_md5_serialization_matches_reference_form)."""
    import hashlib

    return hashlib.md5(
        b",".join([_PIXEL_BYTES[v] for v in gray.ravel().tolist()])
    ).hexdigest()


#: default per-fingerprint clip-frequency cap for video_near_pairs —
#: the same skew stance as dedup.MAX_SHINGLE_FREQ: a frame fingerprint
#: present in more clips than this is non-discriminative boilerplate
#: (solid-color intro/outro, test pattern, station ident) and is
#: dropped from CANDIDATE GENERATION, capping the self-join's per-key
#: fan-out at max_frame_freq^2 rows instead of (corpus share)^2.
MAX_FRAME_FREQ = 50


def _guarded_frame_postings(frames: DataFrame,
                            max_frame_freq: int | None) -> DataFrame:
    """(doc_id, frame_md5) postings with fingerprints appearing in more
    than ``max_frame_freq`` DISTINCT clips removed — the candidate side
    of :func:`video_near_pairs`' inverted-index self-join, factored out
    so the skew test can assert the row budget directly.

    The hot set comes from a map-combined groupBy over the ~32-byte
    fingerprint (partial aggregation bounds the shuffle at distinct
    fingerprints per partition) and is true boilerplate frames only, so
    AQE broadcasts the anti-join. A count-window over frame_md5 would
    single-task a ubiquitous frame's full posting list — the skew shape
    AQE cannot split (the ngram_jaccard lesson, dedup.py round 5)."""
    fp = frames.select("doc_id", "frame_md5")
    if max_frame_freq is None:
        return fp
    hot = (
        fp.groupBy("frame_md5")
        .agg(F.countDistinct("doc_id").alias("_ff"))
        .filter(F.col("_ff") > max_frame_freq)
        .select("frame_md5")
    )
    return fp.join(hot, "frame_md5", "left_anti")


def video_near_pairs(frames: DataFrame, min_shared: int = 2,
                     max_frame_freq: int | None = MAX_FRAME_FREQ) -> DataFrame:
    """Near-duplicate clip pairs by shared sampled-frame fingerprints
    (round 11): two clips that have ``min_shared`` or more identical
    decoded-frame fingerprints among their samples are near-dups — the
    frame-containment construction video pipelines use to catch
    re-encodes/trims that exact chain signatures miss (chain equality
    is shared == all frames on both sides; this relaxes it).

    Input is :func:`video_frame_signature` output. Output one row per
    unordered pair: id_a < id_b, n_shared, n_a, n_b.

    ``max_frame_freq`` (ON by default — round 12, closing the r11
    verdict's one scale-killer): fingerprints appearing in more than
    that many DISTINCT clips are dropped from candidate generation AND
    from ``n_shared`` — a ubiquitous frame (solid-color intro/outro,
    test pattern) would otherwise emit F^2 self-join rows for a
    fingerprint shared by F clips before the ``min_shared`` filter
    discards them, exactly the skewed-key blow-up every sibling
    near-dup path already guards (``ngram_jaccard.max_shingle_freq``,
    simhash/phash DISTINCT-signature banding). ``n_a``/``n_b`` stay
    the FULL per-clip sample counts, so reported containment ratios
    are over the clips' true sample sets; only pairs whose overlap is
    *solely* boilerplate frames are missed — by construction the pairs
    a containment dedup must NOT emit. Mirrored verbatim in the DuckDB
    oracle CTE (registry ``dedup_video_near``).

    Scale: inverted-index join on the fingerprint (the ngram_jaccard
    shape with BOTH bounds: max_frames postings per clip, and now
    max_frame_freq clips per fingerprint, so the join's row budget is
    <= distinct_fingerprints * max_frame_freq^2 regardless of skew);
    one fingerprint exchange + one pair agg exchange; the pair output
    is inherently quadratic IN FAMILY SIZE (any engine emitting the
    pair form pays it) — keeper pipelines should consume the linear
    ``dedup_video_frames`` families instead.

    TWO materialization points (plans are trees — SCALE.md r5): the
    raw fingerprint table first (it feeds the count agg, the hot-set
    agg, and the guard's anti-join — without it the CPU-heavy
    container-walk + frame-decode chain re-runs per consumer), then
    the GUARDED posting table (it feeds both self-join sides — without
    it the hot-set agg's two-phase countDistinct instantiates per
    side, measured +3 exchanges in the executed plan)."""
    from trendmachine_spark.extensions.dedup import _materialize

    frames = _materialize(frames.select("doc_id", "frame_md5"))
    counts = frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_frames_sampled"))
    fp = _guarded_frame_postings(frames, max_frame_freq)
    if max_frame_freq is not None:
        fp = _materialize(fp)
    a = fp.select(F.col("doc_id").alias("id_a"), "frame_md5")
    b = fp.select(F.col("doc_id").alias("id_b"), "frame_md5")
    pairs = (
        a.join(b, "frame_md5")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    na = counts.select(F.col("doc_id").alias("id_a"),
                       F.col("n_frames_sampled").alias("n_a"))
    nb = counts.select(F.col("doc_id").alias("id_b"),
                       F.col("n_frames_sampled").alias("n_b"))
    return pairs.join(na, "id_a").join(nb, "id_b").select(
        "id_a", "id_b", "n_shared", "n_a", "n_b")


VIDEO_SIG_SCHEMA = "doc_id bigint, video_sig string, n_sampled bigint"


def video_clip_signature(assets: DataFrame, every_n: int = 2,
                         max_frames: int = 8) -> DataFrame:
    """Per-clip sampled-frame chain signature computed IN-WORKER
    (round 11): same sampling and fingerprints as
    :func:`video_frame_signature`, but a clip's frames all live in its
    own payload, so the ord-ordered chain md5 needs no grouped
    aggregation — frames never materialize as rows and the doc_id agg
    exchange disappears (2 -> 1 exchanges on the dedup path; the
    remaining one is the family window). Byte-identical signatures to
    the batch agg form (same '|'-joined chain string), verified
    CI-exact at both SFs.

    Also the STREAMING form: stateless mapInPandas appends cleanly, so
    `dropDuplicatesWithinWatermark(video_sig)` downstream is streaming
    video dedup with bounded state."""
    codecs = _codecs_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, sigs, ns = [], [], []
            for did, b in zip(pdf["doc_id"], pdf["payload"]):
                raw = codecs.decode_mjpeg_frames(bytes(b))
                cap = min(len(raw), every_n * max_frames)
                md5s = []
                for f in range(0, cap, every_n):
                    gray = codecs.decode_jpeg(raw[f])[:, :, 0]
                    md5s.append(_frame_md5(gray))
                ids.append(int(did))
                sigs.append(hashlib.md5("|".join(md5s).encode()).hexdigest())
                ns.append(len(md5s))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "video_sig": pd.Series(sigs, dtype="object"),
                    "n_sampled": pd.Series(ns, dtype="int64"),
                }
            )

    return assets.select("doc_id", "payload").mapInPandas(
        run, schema=VIDEO_SIG_SCHEMA
    )
