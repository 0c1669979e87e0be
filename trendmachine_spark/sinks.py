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


#: default bucket count for the materialized rollup store
ROLLUP_BUCKETS = 32


def _url_bucket(n_buckets: int):
    # murmur3 with Spark's fixed seed — stable across sessions, so a
    # url always lands in the same bucket partition
    return F.pmod(F.hash("url"), F.lit(n_buckets))


def init_rollup_store(captures: DataFrame, store_dir: str,
                      n_buckets: int = ROLLUP_BUCKETS) -> None:
    """Materialize the daily rollup as an incrementally-refreshable
    store: raw captures AND their rollup, both partitioned by a stable
    url hash bucket.

    Bucket partitioning (never by url — millions of directories) is
    what makes :func:`refresh_rollup_store` cheap: a daily ingest
    touches few urls, so only their buckets' captures are re-read and
    only those rollup partitions are rewritten. The rollup's running
    windows (chaos, content-change, specimen carry) need FULL per-url
    history, so the refresh grain is the bucket, not the (url, day) —
    recomputing a bucket from its complete capture history is the
    correctness-preserving unit.
    """
    from trendmachine_spark.operators.normalize import normalize_captures
    from trendmachine_spark.operators.rollup import daily_rollup

    b = _url_bucket(n_buckets)
    captures.withColumn("url_bucket", b).write.mode("overwrite").partitionBy(
        "url_bucket"
    ).parquet(store_dir + "/captures")
    roll = daily_rollup(normalize_captures(captures))
    roll.withColumn("url_bucket", b).write.mode("overwrite").partitionBy(
        "url_bucket"
    ).parquet(store_dir + "/rollup")


def refresh_rollup_store(spark: SparkSession, store_dir: str,
                         delta_captures: DataFrame,
                         n_buckets: int = ROLLUP_BUCKETS) -> list[int]:
    """Incremental refresh: append the ingest batch to the captures
    store, then recompute and dynamic-partition-overwrite ONLY the
    rollup buckets containing touched urls. Returns the refreshed
    bucket ids.

    The touched-bucket list is collected to the driver — at most
    ``n_buckets`` ints, by construction — and drives BOTH the pruned
    captures read (`url_bucket IN (...)` prunes at the directory level)
    and the dynamic overwrite (untouched bucket partitions are left
    byte-identical on disk). Equivalence with a full rebuild is pinned
    by tests/test_rollup_store.py.

    Ordering contract: ``seq`` tie-breaks equal-timestamp captures, so
    the ingest must assign store-wide seq values (an arrival counter);
    slices that never interleave timestamps (the daily-batch case) are
    safe with per-batch seq.
    """
    from trendmachine_spark.operators.normalize import normalize_captures
    from trendmachine_spark.operators.rollup import daily_rollup

    b = _url_bucket(n_buckets)
    delta = delta_captures.withColumn("url_bucket", b)
    delta.write.mode("append").partitionBy("url_bucket").parquet(
        store_dir + "/captures"
    )
    buckets = sorted(
        r[0] for r in delta.select("url_bucket").distinct().collect()
    )
    caps = (
        spark.read.parquet(store_dir + "/captures")
        .filter(F.col("url_bucket").isin(buckets))
        .drop("url_bucket")
    )
    roll = daily_rollup(normalize_captures(caps)).withColumn("url_bucket", b)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        roll.write.mode("overwrite").partitionBy("url_bucket").parquet(
            store_dir + "/rollup"
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return buckets


def read_rollup_store(spark: SparkSession, store_dir: str) -> DataFrame:
    return spark.read.parquet(store_dir + "/rollup").drop("url_bucket")


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
