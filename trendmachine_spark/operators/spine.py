"""Date-spine densification + chaos forward-fill.

Covers SURVEY.md §2 operators O31 (date spine), O33 (chaos ffill), O40
(union of observed + filled days).

The reference builds the spine as ``pd.date_range(first_day, today)``
with dict point-lookups (main.py:199-207). Spark-first: per-url
``sequence()`` + ``explode`` left-joined onto the daily table. ``today``
becomes an explicit ``as_of`` date so results are deterministic.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resolve_as_of(daily: DataFrame, as_of: _dt.date | str | None) -> _dt.date:
    """Default as_of = the newest observed day across all urls."""
    if as_of is None:
        row = daily.agg(F.max("day").alias("mx")).collect()[0]
        return row["mx"]
    if isinstance(as_of, str):
        return _dt.date.fromisoformat(as_of)
    return as_of


def densify(daily: DataFrame, filled: DataFrame | None, as_of: _dt.date) -> DataFrame:
    """Observed daily rows (∪ filled rows) -> gap-free per-url series.

    ``filled`` carries (url, day, specimen) synthesized by the gap
    filler; its rows only ever land on days absent from ``daily``
    (interior gap days), so a left join against the union is safe.
    Missing days default to the DailyRecord defaults (archive.py:4-20):
    specimen '~', digest '~', datetime '~', content 'Unknown', counts 0.
    Chaos values forward-fill from the previous observed day
    (main.py:202-207); before any observed day they are 0.0.
    """
    observed = daily
    if filled is not None:
        filled_full = filled.select(
            "url",
            "day",
            F.date_format("day", "yyyy-MM-dd").alias("day_str"),
            F.lit(0).cast("long").alias("_2xx"),
            F.lit(0).cast("long").alias("_3xx"),
            F.lit(0).cast("long").alias("_4xx"),
            F.lit(0).cast("long").alias("_5xx"),
            F.lit(0).cast("long").alias("all"),
            F.col("specimen"),
            F.lit("~").alias("datetime"),
            F.lit("~").alias("digest"),
            F.lit("Unknown").alias("content"),
            F.lit(None).cast("double").alias("chaos"),
            F.lit(None).cast("double").alias("chaosn"),
        )
        observed = observed.unionByName(filled_full)

    spine = (
        daily.groupBy("url")
        .agg(F.min("day").alias("_first"))
        .select(
            "url",
            F.explode(
                F.sequence(F.col("_first"), F.lit(as_of), F.expr("interval 1 day"))
            ).alias("day"),
        )
    )
    dense = (
        spine.join(observed, ["url", "day"], "left")
        .withColumn("day_str", F.coalesce("day_str", F.date_format("day", "yyyy-MM-dd")))
        .withColumn("specimen", F.coalesce("specimen", F.lit("~")))
        .withColumn("datetime", F.coalesce("datetime", F.lit("~")))
        .withColumn("digest", F.coalesce("digest", F.lit("~")))
        .withColumn("content", F.coalesce("content", F.lit("Unknown")))
    )
    for c in ("_2xx", "_3xx", "_4xx", "_5xx", "all"):
        dense = dense.withColumn(c, F.coalesce(c, F.lit(0)))

    # O33 — chaos forward-fill: a null-based running last() reproduces
    # the reference's falsy check. NB equivalence does NOT require
    # observed chaos > 0: an all-revisit url can close a day at 0.0, but
    # then the reference's falsy forward-fill also propagates 0.0, so
    # carrying the explicit 0.0 forward yields the same series.
    wff = (
        Window.partitionBy("url")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dense = (
        dense.withColumn("chaos", F.coalesce(F.last("chaos", ignorenulls=True).over(wff), F.lit(0.0)))
        .withColumn("chaosn", F.coalesce(F.last("chaosn", ignorenulls=True).over(wff), F.lit(0.0)))
        .withColumn("filled", (F.col("specimen") != "~") & (F.col("all") == 0))
    )
    return dense
