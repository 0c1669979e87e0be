"""Gap filler — four policies over consecutive observed-day pairs.

Covers SURVEY.md §2 operator O32 (reference main.py:54-102).

For each consecutive pair of *observed* days of a url with
``gap = days_between - 1 >= 1`` and (``fill == -1`` or ``gap <= fill``),
synthesize the interior days' specimen:

* ``identical`` — only if both endpoint specimens are equal;
* ``closest``  — interior day at 0-based offset i gets the left value
  when ``i < gap/2`` else the right value (gap=2 -> 1+1, gap=3 -> 2+1,
  matching main.py:62-66 exactly);
* ``forward``  — left value; ``backward`` — right value.

Spark-first: lead() + explode(sequence()) — one window, one generator,
no driver loop; scales per url.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from trendmachine_spark.params import FILL_POLICIES


def gap_fill(daily: DataFrame, fill: int, policy: str) -> DataFrame:
    """daily (observed rollup) -> synthesized rows (url, day, specimen).

    ``fill``: 0 = no filling (returns empty), -1 = any gap size, n>0 =
    fill gaps of at most n days.
    """
    if policy not in FILL_POLICIES:
        raise ValueError(f"unknown fill policy {policy!r}; expected one of {FILL_POLICIES}")
    empty = daily.sparkSession.createDataFrame([], "url string, day date, specimen string")
    if fill == 0:
        return empty

    w = Window.partitionBy("url").orderBy("day")
    pairs = (
        daily.select("url", "day", "specimen")
        .withColumn("next_day", F.lead("day").over(w))
        .withColumn("next_specimen", F.lead("specimen").over(w))
        .withColumn("gap", F.datediff("next_day", "day") - 1)
        .filter(F.col("gap") >= 1)
    )
    if fill != -1:
        pairs = pairs.filter(F.col("gap") <= fill)
    if policy == "identical":
        pairs = pairs.filter(F.col("specimen") == F.col("next_specimen"))

    interior = pairs.select(
        "url",
        "specimen",
        "next_specimen",
        "gap",
        "day",
        F.explode(
            F.sequence(
                F.date_add("day", 1),
                F.date_sub("next_day", 1),
                F.expr("interval 1 day"),
            )
        ).alias("fill_day"),
    ).withColumn("i", F.datediff("fill_day", "day") - 1)

    if policy in ("identical", "forward"):
        spec = F.col("specimen")
    elif policy == "backward":
        spec = F.col("next_specimen")
    else:  # closest
        spec = F.when(F.col("i") < F.col("gap") / 2, F.col("specimen")).otherwise(
            F.col("next_specimen")
        )
    return interior.select("url", F.col("fill_day").alias("day"), spec.alias("specimen"))
