"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Driver-mandated extension (SURVEY.md §2.6). The container has no image/
audio codecs, so the *decode* step is stubbed (NotImplementedError or a
deterministic fake), but the Spark-side plumbing is real and tested:
binary columns, typed metadata structs, Arrow-batched ``mapInPandas``
with an explicit output schema, and partition-count-preserving flow.

At 100 TB the payload column dominates I/O: keep it in its own parquet
column (columnar pruning skips it unless selected), decode with
mapInPandas so bytes never round-trip through Python row objects, and
size ``spark.sql.files.maxPartitionBytes`` so one task's batch of
payloads fits executor memory.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
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

    With ``real_decode=True`` this is where PIL/librosa would run —
    unavailable in this container, so it raises. The default path emits
    deterministic fake features derived from the payload bytes so the
    batch shape, schema, and partitioning are exercised end-to-end.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "media codecs are not available in this environment; "
                    "plug PIL/librosa/ffmpeg here on a real cluster"
                )
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

    With ``real_resize=True`` this is where ``PIL.Image.resize`` would
    run — unavailable here, so it raises. The default path emits a
    deterministic fake: the "resized" asset is the first
    ``out_width*out_height`` characters of the utf-8 payload, md5'd.
    Character (not byte) truncation keeps the fake engine-portable:
    Spark ``substring`` and DuckDB ``substr`` are both character-based,
    and both engines' md5 hashes the utf-8 bytes of the slice.

    Scale: same story as :func:`decode_assets` — one Arrow batch per
    task, payload column pruned unless selected, partitioning preserved.
    """
    budget = out_width * out_height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if real_resize:
                raise NotImplementedError(
                    "image codecs are not available in this environment; "
                    "plug PIL.Image.open(...).resize(...) here on a real cluster"
                )
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
    """Arrow-batched frame sampling over binary payloads (ffmpeg slot stubbed).

    Models video frame extraction: the payload is treated as a sequence
    of non-overlapping ``frame_len``-character frames; every
    ``every_n``-th frame is sampled, up to ``max_frames`` samples per
    asset, and each sampled frame is fingerprinted (md5). With
    ``real_decode=True`` this is where ffmpeg/pyav frame extraction
    would run — unavailable here, so it raises.

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
