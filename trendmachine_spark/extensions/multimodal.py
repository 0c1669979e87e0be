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
