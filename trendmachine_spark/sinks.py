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
