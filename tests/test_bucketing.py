"""Bucketed storage kills every exchange in the capture pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from trendmachine_spark.operators.normalize import normalize_captures
from trendmachine_spark.operators.rollup import daily_rollup
from trendmachine_spark.sources.bucketing import (
    read_bucketed_captures,
    write_bucketed_captures,
)
from trendmachine_spark.sources.captures import events_as_captures


def _n_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")


def test_bucketed_rollup_has_no_exchange(spark):
    caps = events_as_captures(spark, "/root/testdata/sf0.001")
    write_bucketed_captures(caps, "captures_bucketed", buckets=4)
    try:
        bucketed = read_bucketed_captures(spark, "captures_bucketed")
        rollup_b = daily_rollup(normalize_captures(bucketed))
        rollup_plain = daily_rollup(normalize_captures(caps))

        assert _n_exchanges(rollup_plain) >= 2   # (url,digest) + (url)
        assert _n_exchanges(rollup_b) == 0       # bucketing satisfies both

        # and results are identical
        a = sorted(map(tuple, rollup_b.collect()))
        b = sorted(map(tuple, rollup_plain.collect()))
        assert a == b
    finally:
        spark.sql("DROP TABLE IF EXISTS captures_bucketed")
