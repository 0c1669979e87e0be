"""Ordered-funnel and cohort-retention analytics over the events table.

Two classic event-analytics operators the reference's dashboard family
implies but never ships (its analytics stop at per-url trend series;
these are the user-axis equivalents — same groupBy/window machinery,
reference main.py:238-320 for the per-key window idiom):

* :func:`event_funnel` — ordered multi-step conversion (each step must
  occur strictly AFTER the previous step's first completion).
* :func:`event_retention` — first-activity cohorts x day-offset
  retention counts.

Both are single-key-partitioned declarative plans: the funnel is three
stacked conditional window-minima over ONE user exchange; retention is
a user-window pass plus one (cohort, offset) aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["event_attribution", "event_funnel", "event_retention"]


def event_funnel(events: DataFrame, steps: tuple[str, ...] = ("view", "click", "purchase"),
                 user_col: str = "user_id", type_col: str = "event_type",
                 ts_col: str = "ts") -> DataFrame:
    """Ordered funnel: for each user, the first completion time of each
    step, where step i+1 only counts events strictly AFTER the user's
    first completion of step i (the standard product-analytics funnel —
    a purchase before any click does not convert the click step).

    Output: (user_id, t_<step> ... epoch-microsecond bigints, NULL when
    the step was never reached in order, steps_reached).

    Scale: ONE hash exchange on the user key; each step adds a
    conditional ``min`` window over that same partitioning (no
    re-shuffle — subset clustering is satisfied), and the final
    groupBy reuses it too. Strictly-after uses microsecond precision;
    same-microsecond step events do not chain (documented tie rule,
    mirrored exactly in the oracle).
    """
    # events ts loads as TIMESTAMP_NTZ; the session TZ is pinned UTC,
    # so the cast reads the naive value as UTC — exactly DuckDB's
    # epoch_us on the same naive timestamp
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    e = events.select(F.col(user_col), F.col(type_col).alias("_t"), us.alias("_us"))
    w = Window.partitionBy(user_col)
    prev = None
    t_cols = []
    for step in steps:
        cond = F.col("_t") == step
        if prev is not None:
            cond = cond & F.col(prev).isNotNull() & (F.col("_us") > F.col(prev))
        name = f"t_{step}"
        e = e.withColumn(name, F.min(F.when(cond, F.col("_us"))).over(w))
        t_cols.append(name)
        prev = name
    return (
        e.groupBy(user_col)
        .agg(*[F.min(name).alias(name) for name in t_cols])
        .withColumn(
            "steps_reached",
            sum(
                (F.when(F.col(n).isNotNull(), 1).otherwise(0) for n in t_cols),
                F.lit(0),
            ).cast("long"),
        )
    )


def event_retention(events: DataFrame, user_col: str = "user_id",
                    ts_col: str = "ts") -> DataFrame:
    """Cohort retention: users cohorted by their first active day;
    each (cohort_day, day_offset) cell counts the distinct cohort
    members active ``day_offset`` days after their first day.

    Output: (cohort_day date, day_offset bigint, n_users) — offset 0 is
    the cohort size by construction.

    Scale: the first-day window and the distinct (user, day) pass share
    ONE user exchange; the only other exchange is the (cohort, offset)
    count-distinct aggregation, whose partial distinct combines
    map-side. Cohort skew (a launch-day cohort) lands on the agg key
    (cohort_day, day_offset) — spread across offsets, so no single hot
    partition.
    """
    day = F.to_date(ts_col)
    # repartition(user) BEFORE the dedup: the user partitioning is a
    # subset of the (user, day) dedup key, so dropDuplicates runs
    # in-partition AND the first-day window + everything downstream
    # reuse the same exchange (the ngram_jaccard idiom)
    e = (
        events.select(F.col(user_col), day.alias("_day"))
        .repartition(user_col)
        .dropDuplicates([user_col, "_day"])
    )
    w = Window.partitionBy(user_col)
    cohorted = e.withColumn("cohort_day", F.min("_day").over(w))
    return (
        cohorted.select(
            user_col,
            "cohort_day",
            F.datediff(F.col("_day"), F.col("cohort_day")).cast("long").alias("day_offset"),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct(user_col).alias("n_users"))
    )


def event_attribution(events: DataFrame, conv_type: str = "purchase",
                      user_col: str = "user_id", type_col: str = "event_type",
                      ts_col: str = "ts", id_col: str = "event_id",
                      value_col: str = "value") -> DataFrame:
    """Last-touch attribution: each conversion credits the nearest
    strictly-earlier event of the same user that is not itself a
    conversion; conversions with no prior touch credit ``'direct'``.

    Output: (touch_type, n_conversions, value_cents) — conversion
    values are quantized to integer cents BEFORE summing (float sums
    across partitions are partition-order-dependent; integer sums are
    exact — the engine's float-determinism rule).

    Scale: ONE hash exchange on the user key; the running
    last-non-conversion is a rows-frame window ending at 1 PRECEDING
    over that partitioning (ties broken by event_id so the credited
    touch is deterministic across engines and partitionings), and the
    3-5-row final aggregate is map-combined.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = (
        Window.partitionBy(user_col)
        .orderBy(us, id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col(type_col) != conv_type, F.col(type_col)),
        ignorenulls=True,
    ).over(w)
    return (
        events.withColumn("_touch", touch)
        .filter(F.col(type_col) == conv_type)
        .select(
            F.coalesce(F.col("_touch"), F.lit("direct")).alias("touch_type"),
            F.round(F.col(value_col) * 100).cast("long").alias("_cents"),
        )
        .groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.sum("_cents").alias("value_cents"),
        )
    )
