"""Streaming near-dup ingest — the unbounded twin of incremental_dedup.

``dedup_stream`` covers streaming EXACT dedup (dropDuplicatesWithinWatermark);
this module completes the ingest-pipeline symmetry for NEAR-dup: each
arriving micro-batch is vetted against the corpus-so-far with the same
operator the daily batch pipeline uses (``extensions.dedup.incremental_dedup``
— broadcast delta probes, the corpus side never shuffles), and accepted
docs GROW the corpus for the next batch.

Spark-first mapping: ``foreachBatch`` over a parquet-backed corpus store
— the standard Structured Streaming pattern for stateful sinks whose
state must outlive executors and be queryable (here: the corpus itself
is the state; LSH signatures are recomputed narrowly per batch, which
at 100 TB is the zero-shuffle ``minhash_signatures_narrow`` scan). Both
writes are keyed by the micro-batch id via partition overwrite, so a
REPLAYED batch (failure recovery re-runs the same batch_id) rewrites
its own partitions instead of double-appending — exactly-once output
from at-least-once execution, the same idempotence discipline as
``sinks.refresh_store``.

Flag semantics per batch are ``incremental_dedup``'s, with one
documented difference on CROSS-batch duplicates: a doc whose duplicate
arrived in an EARLIER micro-batch is flagged ``exact_dup_base`` /
``near_dup_base`` (the earlier keeper is corpus now), where the
one-shot batch run over the concatenated delta would say
``exact_dup_delta``. The accept/reject DECISION (``is_new``) is
identical either way — pinned by tests/test_streaming_ingest.py, which
also pins flag-for-flag equality on batches without cross-batch dups
and replay idempotence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: partition column carrying the micro-batch id in both stores
BATCH_COL = "ingest_batch"


def init_corpus(base_docs: DataFrame, corpus_dir: str) -> None:
    """Seed the corpus store with the existing (already-clean) corpus.

    Stored partitioned by ``ingest_batch`` (-1 = the seed) so each
    streamed batch owns exactly one partition — the unit of idempotent
    replay — and directory counts stay bounded by batch count.
    """
    base_docs.withColumn(BATCH_COL, F.lit(-1)).write.mode("overwrite").partitionBy(
        BATCH_COL
    ).parquet(corpus_dir)


def read_corpus(spark: SparkSession, corpus_dir: str) -> DataFrame:
    """The corpus-so-far (seed + every accepted streamed doc)."""
    return spark.read.parquet(corpus_dir).drop(BATCH_COL)


def incremental_dedup_sink(spark: SparkSession, corpus_dir: str, flags_dir: str,
                           text_col: str = "text", id_col: str = "doc_id",
                           min_jaccard: float = 0.8):
    """foreachBatch function: vet each micro-batch against the corpus
    store, persist its flags, and append its ``is_new`` docs.

    Wire it as ``stream.writeStream.foreachBatch(sink).start()``; read
    results with :func:`read_flags` / :func:`read_corpus`.
    """
    from trendmachine_spark.extensions.dedup import incremental_dedup

    def process(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.select(id_col, text_col)
        if not batch_df.take(1):
            return
        # exclude THIS batch's own corpus partition: a replay after the
        # corpus write landed (crash before checkpoint commit) must not
        # match the batch's docs against themselves — that would flag
        # every accepted doc as a duplicate and overwrite the partition
        # empty. Partition pruning makes the exclusion a directory skip.
        base = (
            spark.read.parquet(corpus_dir)
            .filter(F.col(BATCH_COL) != batch_id)
            .drop(BATCH_COL)
        )
        flags = incremental_dedup(base, batch_df, text_col, id_col, min_jaccard)
        # write STRAIGHT INTO the batch's partition directory — replay
        # overwrites exactly its own partition, and no overwrite-mode
        # conf is involved (foreachBatch runs under a CLONED session,
        # so session-conf-dependent dynamic overwrite is a trap: the
        # conf set on the driver session does not reach the clone, and
        # a static overwrite would wipe every earlier batch).
        # Flags first, corpus second: a crash in between replays the
        # batch against the unchanged corpus and rewrites identically.
        flags.write.mode("overwrite").parquet(
            f"{flags_dir}/{BATCH_COL}={batch_id}"
        )
        accepted = batch_df.join(
            flags.filter(F.col("is_new") == 1).select(id_col), id_col
        )
        accepted.write.mode("overwrite").parquet(
            f"{corpus_dir}/{BATCH_COL}={batch_id}"
        )

    return process


def read_flags(spark: SparkSession, flags_dir: str) -> DataFrame:
    """All per-doc flag rows across batches:
    (doc_id, exact_dup_base, exact_dup_delta, near_dup_base, is_new,
    ingest_batch)."""
    return spark.read.parquet(flags_dir)


def run_ingest_stream(spark: SparkSession, source_dir: str, schema: str,
                      corpus_dir: str, flags_dir: str,
                      checkpoint_dir: str, **sink_kwargs):
    """Convenience wiring: file-source stream (one file per trigger ->
    one micro-batch per drop, the daily-ingest cadence) through the
    dedup sink. Returns the StreamingQuery; caller awaits/stops it."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(source_dir)
    )
    return (
        stream.writeStream
        .foreachBatch(incremental_dedup_sink(spark, corpus_dir, flags_dir, **sink_kwargs))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
