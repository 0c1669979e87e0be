"""Bucketed capture storage — the zero-shuffle layout for 100 TB.

The capture pipeline's only exchanges are hash-partitionings on
``(url, digest)`` and ``(url)``. Writing the capture log bucketed by
``url`` (and sorted by ``url, ts`` within buckets) makes the scan
itself report ``HashPartitioning(url)``, which satisfies every
downstream clustering requirement (url ⊆ every key set), so repeated
analyses — re-scoring under new sigmoid parameters, new dashboards,
backfills — run with NO shuffle at all: scan -> sort-within-partition
-> windows/aggs.

Pick ``buckets`` so one bucket's captures fit an executor's memory at
the target scale (e.g. 100 TB / 8192 buckets ≈ 12 GB per bucket before
column pruning; captures prune to ~4 narrow columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_captures(
    captures: DataFrame,
    table: str,
    buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Persist captures bucketed by url, sorted by (url, ts, seq)."""
    (
        captures.write.mode(mode)
        .bucketBy(buckets, "url")
        .sortBy("url", "ts", "seq")
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed_captures(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed captures table; downstream url-keyed operators
    will see HashPartitioning(url) and skip their exchanges."""
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    return spark.table(table)
