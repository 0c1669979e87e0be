"""Capture normalization: day/class projection + revisit resolution.

Covers SURVEY.md §2 operators O7 (day truncation), O8 (status-class
normalization), O9 (revisit resolution), O10 (digest truncation).

The reference (main.py:143-152) resolves Wayback "revisit" records
(status ``-``) by consulting a last-writer-wins dict keyed by the *full*
digest. Spark-first equivalent: a running ``last(..., ignorenulls)``
window over (url, digest) ordered by capture time — no driver state, no
UDF, scales to any number of urls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from trendmachine_spark.functions.scalars import day_date, day_string, digest8, status_class


def normalize_captures(captures: DataFrame) -> DataFrame:
    """captures(url, seq, ts, status, digest) -> normalized capture rows.

    Output columns: url, seq, ts, day (date), day_str, cls (resolved
    status class), digest (8-char). Capture order within a url is
    (ts, seq) — sortedness of the source is never assumed.
    """
    c = (
        captures
        .withColumn("day", day_date(F.col("ts")))
        .withColumn("day_str", day_string(F.col("ts")))
        .withColumn("cls_raw", status_class(F.col("status")))
    )
    # Revisit resolution (O9): '-' rows inherit the most recent class
    # previously recorded for the same (url, full-digest); default '~'.
    # Non-'-' rows contribute their own class to the running state.
    w = (
        Window.partitionBy("url", "digest")
        .orderBy("ts", "seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    resolved = F.when(
        F.col("cls_raw") == "-",
        F.coalesce(
            F.last(F.when(F.col("cls_raw") != "-", F.col("cls_raw")), ignorenulls=True).over(w),
            F.lit("~"),
        ),
    ).otherwise(F.col("cls_raw"))
    return (
        c.withColumn("cls", resolved)
        .withColumn("digest", digest8(F.col("digest")))
        .select("url", "seq", "ts", "day", "day_str", "cls", "digest")
    )
