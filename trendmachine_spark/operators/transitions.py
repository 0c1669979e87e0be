"""Status transition matrix over consecutive valid-specimen days.

Covers SURVEY.md §2 operators O12 (valid-specimen filter) + O28
(reference main.py:232-246).

The reference iterates the dense daily list, skipping days whose
specimen is outside {2xx,3xx,4xx,5xx} *without advancing the lag value*
— i.e. filter first, then pair consecutive survivors. Output is the
dense long form (Source, Target, Count) with all 16 cells present.

Known divergence (one edge case): in main.py:238-245 ``pr`` only
advances on a *successful* count, so if the FIRST day of the series has
an out-of-domain specimen ('~' or a raw token), the reference's first
valid day pairs against that stale initial '~' and the whole series
counts zero transitions; filter-then-lag instead counts every
consecutive-survivor pair. The reference behavior is arguably a bug
(one bad leading day silences the matrix), so the Spark semantics are
kept — same stance as the unknown-specimen divergence in SURVEY §2.5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from trendmachine_spark.params import TRANSITION_CLASSES


def transition_matrix(dense_daily: DataFrame, dense_cells: bool = True) -> DataFrame:
    """dense daily series -> (url, Source, Target, Count).

    ``dense_daily`` needs url, day, specimen; filled days participate
    (their specimen is set), missing '~' days are skipped.
    """
    w = Window.partitionBy("url").orderBy("day")
    pairs = (
        dense_daily.filter(F.col("specimen").isin(*TRANSITION_CLASSES))
        .select("url", "day", "specimen")
        .withColumn("prev", F.lag("specimen").over(w))
        .filter(F.col("prev").isNotNull())
    )
    counts = pairs.groupBy(
        "url",
        F.col("prev").alias("Source"),
        F.col("specimen").alias("Target"),
    ).agg(F.count(F.lit(1)).alias("Count"))
    if not dense_cells:
        return counts

    spark = dense_daily.sparkSession
    cells = spark.createDataFrame(
        [(s, t) for s in TRANSITION_CLASSES for t in TRANSITION_CLASSES],
        "Source string, Target string",
    )
    urls = dense_daily.select("url").distinct()
    # 16 cells per url — the dense frame is tiny relative to the data, and
    # the cells side is a broadcast cross join (no shuffle of the big side).
    dense = urls.crossJoin(F.broadcast(cells))
    return (
        dense.join(counts, ["url", "Source", "Target"], "left")
        .withColumn("Count", F.coalesce("Count", F.lit(0)))
    )
