"""run_suite/suite_frame — batched one-action execution must be a pure
repackaging: every query's rows exactly equal its standalone result,
just produced under a single job-submission floor (round-7 mandate:
ship the FLOOR_BATCH recovery as a real API)."""

from __future__ import annotations

import pytest

from trendmachine_spark import run_suite, suite_frame

SF = "/root/testdata/sf0.001"


def _canon(rows):
    """Order-insensitive canonical form of a list of row dicts."""
    return sorted(
        tuple(sorted((k, str(v)) for k, v in r.items())) for r in rows
    )


def test_run_suite_matches_standalone_results(spark):
    from trendmachine_spark.registry import QUERIES

    names = ["pricing_summary", "event_sessionization", "dedup_exact",
             "similarity_topk", "daily_rollup"]
    batched = run_suite(spark, SF, names)
    assert sorted(batched) == sorted(names)
    for n in names:
        solo = [r.asDict() for r in QUERIES[n].builder(spark, SF).collect()]
        assert _canon(batched[n]) == _canon(solo), n
        assert len(batched[n]) == len(solo)


def test_suite_frame_is_one_plan_with_tagged_branches(spark):
    df = suite_frame(spark, SF, ["pricing_summary", "dedup_exact"])
    assert df.columns == ["query", "row"]
    tags = {r["query"] for r in df.select("query").distinct().collect()}
    assert tags == {"pricing_summary", "dedup_exact"}


def test_run_suite_preserves_null_columns(spark):
    # to_json drops null fields by default (ignoreNullFields=true),
    # which would silently strip NULL-valued columns from the batched
    # row dicts — advisor finding, round 8
    from trendmachine_spark import registry

    def _null_query(spark, sf_dir):
        return spark.createDataFrame(
            [(1, None, "x"), (2, 5, None)],
            "k int, a int, b string",
        )

    registry.QUERIES["_test_nulls"] = registry.QueryDef(_null_query, None)
    try:
        rows = run_suite(spark, SF, ["_test_nulls"])["_test_nulls"]
        assert _canon(rows) == _canon([
            {"k": 1, "a": None, "b": "x"},
            {"k": 2, "a": 5, "b": None},
        ])
        assert all(set(r) == {"k", "a", "b"} for r in rows)
    finally:
        del registry.QUERIES["_test_nulls"]


def test_suite_frame_rejects_bad_input(spark):
    with pytest.raises(ValueError, match="unknown queries"):
        suite_frame(spark, SF, ["pricing_summary", "nope"])
    with pytest.raises(ValueError, match="at least one"):
        suite_frame(spark, SF, [])
