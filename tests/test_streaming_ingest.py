"""Streaming near-dup ingest (streaming/ingest_stream.py): per-batch
flags match the batch incremental_dedup against the corpus-so-far, the
corpus grows by accepted docs, and replay is idempotent."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from trendmachine_spark.extensions.dedup import incremental_dedup
from trendmachine_spark.streaming.ingest_stream import (
    incremental_dedup_sink,
    init_corpus,
    read_corpus,
    read_flags,
)

W = [f"w{i}" for i in range(12)]


def _text(tag: str) -> str:
    # 12 distinct words -> 10 3-gram shingles
    return " ".join(f"{tag}{w}" for w in W)


def _near(tag: str) -> str:
    # change the LAST word: 9 of 10 shingles shared, jaccard 9/11 = 0.818
    return " ".join([f"{tag}{w}" for w in W[:-1]] + ["CHANGED"])


BASE = [(i, _text(f"base{i}")) for i in range(4)]
BATCH1 = [
    (100, _text("fresh100")),        # new
    (101, _text("base0")),           # exact dup of base doc 0
    (102, _near("base1")),           # near dup of base doc 1
    (103, _text("fresh103")),        # new
    (104, _text("fresh103")),        # exact dup WITHIN the batch (of 103)
]
BATCH2 = [
    (200, _text("fresh100")),        # exact dup of batch-1 arrival 100
    (201, _text("fresh201")),        # new
    (202, _near("fresh100")),        # near dup of batch-1 arrival 100
]


def _flags_dict(df):
    return {
        r["doc_id"]: (r["exact_dup_base"], r["exact_dup_delta"],
                      r["near_dup_base"], r["is_new"])
        for r in df.collect()
    }


def test_streaming_ingest_matches_batch_per_corpus_state(spark, tmp_path):
    corpus_dir = str(tmp_path / "corpus")
    flags_dir = str(tmp_path / "flags")
    src = tmp_path / "src"
    src.mkdir()
    base = spark.createDataFrame(BASE, "doc_id long, text string")
    init_corpus(base, corpus_dir)

    for i, rows in enumerate((BATCH1, BATCH2)):
        p = src / f"batch{i}.json"
        p.write_text("\n".join(
            json.dumps({"doc_id": d, "text": t}) for d, t in rows))
        os.utime(p, (1_700_000_000 + i * 1000, 1_700_000_000 + i * 1000))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    sink = incremental_dedup_sink(spark, corpus_dir, flags_dir)
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    flags = read_flags(spark, flags_dir)
    got1 = _flags_dict(flags.filter(F.col("ingest_batch") == 0))
    got2 = _flags_dict(flags.filter(F.col("ingest_batch") == 1))

    # batch 1: flag-for-flag identical to the batch operator vs the seed
    b1 = spark.createDataFrame(BATCH1, "doc_id long, text string")
    want1 = _flags_dict(incremental_dedup(base, b1))
    assert got1 == want1
    assert got1[100] == (0, 0, 0, 1)
    assert got1[101][0] == 1 and got1[101][3] == 0  # exact (and near) dup of base
    assert got1[102][2] == 1 and got1[102][3] == 0
    assert got1[103] == (0, 0, 0, 1)
    assert got1[104][1] == 1 and got1[104][3] == 0

    # batch 2: identical to the batch operator vs the GROWN corpus
    accepted1 = b1.join(
        spark.createDataFrame([(100,), (103,)], "doc_id long"), "doc_id")
    b2 = spark.createDataFrame(BATCH2, "doc_id long, text string")
    want2 = _flags_dict(incremental_dedup(base.unionByName(accepted1), b2))
    assert got2 == want2
    # cross-batch dups attribute to the corpus (documented difference
    # from a one-shot run over the concatenated delta)
    assert got2[200][0] == 1 and got2[200][3] == 0   # exact dup of grown corpus
    assert got2[201] == (0, 0, 0, 1)
    assert got2[202][2] == 1 and got2[202][3] == 0

    # corpus = seed + accepted
    assert sorted(r["doc_id"] for r in read_corpus(spark, corpus_dir).collect()) \
        == [0, 1, 2, 3, 100, 103, 201]

    # replayed micro-batch (same batch_id) rewrites its own partitions:
    # stores byte-for-byte equivalent in content
    before_flags = sorted(map(tuple, flags.collect()))
    before_corpus = sorted(map(tuple, read_corpus(spark, corpus_dir).collect()))
    sink(b1, 0)
    assert sorted(map(tuple, read_flags(spark, flags_dir).collect())) == before_flags
    assert sorted(map(tuple, read_corpus(spark, corpus_dir).collect())) == before_corpus
