"""Unit semantics for operators/asof.py (the registry oracle covers the
backward-inclusive case end-to-end; these pin the other modes)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from trendmachine_spark.operators.asof import asof_join, range_count_join


def _frames(spark):
    left = spark.createDataFrame(
        [Row(k="a", ep=10, lid=1), Row(k="a", ep=20, lid=2), Row(k="b", ep=5, lid=3)]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", ep=8, rid=100),
            Row(k="a", ep=10, rid=101),
            Row(k="a", ep=10, rid=102),
            Row(k="a", ep=25, rid=103),
            Row(k="c", ep=1, rid=104),
        ]
    )
    return left, right


def _by_lid(df):
    return {r["lid"]: r.asDict() for r in df.collect()}

def test_backward_inclusive_tie_takes_max_order(spark):
    left, right = _frames(spark)
    out = _by_lid(asof_join(left, right, on="k", ts="ep", right_order="rid"))
    # ep=10 tie: inclusive match, max rid among ties
    assert out[1]["r_rid"] == 102 and out[1]["r_ep"] == 10
    assert out[2]["r_rid"] == 102  # latest at-or-before 20 is still ep=10
    assert out[3]["r_rid"] is None  # key 'b' has no right rows
    assert len(out) == 3  # left-outer: every left row survives


def test_backward_strict_excludes_simultaneous(spark):
    left, right = _frames(spark)
    out = _by_lid(
        asof_join(left, right, on="k", ts="ep", right_order="rid", strict=True)
    )
    assert out[1]["r_rid"] == 100  # ep=10 rows excluded, falls back to ep=8


def test_forward_takes_min_order_on_tie(spark):
    left, right = _frames(spark)
    out = _by_lid(
        asof_join(left, right, on="k", ts="ep", right_order="rid", direction="forward")
    )
    assert out[1]["r_rid"] == 101  # at-or-after 10: tie -> min rid
    assert out[2]["r_rid"] == 103  # next after 20 is 25


def test_tolerance_nulls_far_matches(spark):
    left, right = _frames(spark)
    out = _by_lid(
        asof_join(left, right, on="k", ts="ep", right_order="rid", tolerance=5)
    )
    assert out[1]["r_rid"] == 102  # gap 0 <= 5
    assert out[2]["r_rid"] is None  # gap 10 > 5


def test_bad_direction_raises(spark):
    left, right = _frames(spark)
    with pytest.raises(ValueError):
        asof_join(left, right, on="k", ts="ep", direction="sideways")


def test_range_count_bin_boundaries(spark):
    # width-60 bins; windows straddling a bin edge must still count
    left = spark.createDataFrame(
        [Row(lid=1, ep=65), Row(lid=2, ep=120), Row(lid=3, ep=10)]
    )
    right = spark.createDataFrame(
        [Row(ep=5), Row(ep=59), Row(ep=64), Row(ep=65), Row(ep=119)]
    )
    out = {r["lid"]: r["n_in_range"] for r in
           range_count_join(left, right, ts="ep", lo=60, hi=0).collect()}
    # lid=1 window [5, 65): 5, 59, 64 (65 excluded: r.ep < l.ep)
    assert out[1] == 3
    # lid=2 window [60, 120): 64, 65, 119
    assert out[2] == 3
    # lid=3 window [-50, 10): 5
    assert out[3] == 1


def test_range_count_invalid_bounds(spark):
    left, right = _frames(spark)
    with pytest.raises(ValueError):
        range_count_join(left, right, ts="ep", lo=0, hi=0)
