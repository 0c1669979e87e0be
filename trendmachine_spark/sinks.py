"""Report sinks (O5 generalized): the engine returns DataFrames; these
helpers persist them in layouts that stay queryable at 100 TB."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_daily_report(report: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Persist the scored daily report partitioned by month.

    Month-level partitioning keeps directory counts sane (urls can be
    millions — never partition by url) while giving date-range queries
    partition pruning; url-level locality comes from sorting within
    files, not directories.
    """
    (
        report.withColumn("month", F.substring("Day", 1, 7))
        .repartition("month")
        .sortWithinPartitions("url", "Day")
        .write.mode(mode)
        .partitionBy("month")
        .parquet(path)
    )


def read_daily_report(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_packed_corpus(docs: DataFrame, assignments: DataFrame, path: str,
                        mode: str = "overwrite", id_col: str = "doc_id") -> None:
    """Materialize a packed training corpus: join the packing assignment
    table (``extensions.packing.pack_sequences`` output) back to the
    documents and write shards a trainer can stream sequentially.

    Layout: partitioned by ``_bucket`` (the packing hash bucket — same
    bounded cardinality as the packing parallelism, so directory counts
    stay sane at 100 TB), rows sorted by (pack_id, offset) within each
    file so one sequential read yields every pack's documents in
    concatenation order. The join broadcasts NOTHING: both sides hash-
    partition on doc_id, and document text moves exactly once — the
    packing itself only ever shuffled (id, n_tokens) pairs.
    """
    packed = (
        docs.join(assignments, id_col)
        .withColumn("_bucket", F.split(F.col("pack_id"), "p").getItem(0))
    )
    (
        packed.repartition("_bucket")
        .sortWithinPartitions("pack_id", "offset")
        .write.mode(mode)
        .partitionBy("_bucket")
        .parquet(path)
    )
