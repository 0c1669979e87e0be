"""Golden tests for the gap filler (FIXTURES.md §3.3, main.py:54-102)."""

from __future__ import annotations

from trendmachine_spark.operators.fill import gap_fill
from trendmachine_spark.operators.normalize import normalize_captures
from trendmachine_spark.operators.rollup import daily_rollup
from trendmachine_spark.sources.captures import captures_from_fixture


def filled_map(spark, lines, fill, policy):
    daily = daily_rollup(normalize_captures(captures_from_fixture(spark, lines)))
    return {
        str(r["day"]): r["specimen"]
        for r in gap_fill(daily, fill, policy).collect()
    }


GAP1 = [  # endpoints 2xx@01-02 ... 5xx@01-04 (gap=1)
    "20200102010000 200 AAAA0000X",
    "20200104010000 503 BBBB0000X",
]
GAP2 = [  # gap=2
    "20200101010000 200 AAAA0000X",
    "20200104010000 503 BBBB0000X",
]
GAP3 = [  # gap=3
    "20200101010000 200 AAAA0000X",
    "20200105010000 503 BBBB0000X",
]
GAP_SAME = [  # gap=1, both ends 2xx
    "20200102010000 200 AAAA0000X",
    "20200104010000 200 BBBB0000X",
]


def test_policies_gap1(spark):
    assert filled_map(spark, GAP1, -1, "identical") == {}
    assert filled_map(spark, GAP1, -1, "closest") == {"2020-01-03": "2xx"}
    assert filled_map(spark, GAP1, -1, "forward") == {"2020-01-03": "2xx"}
    assert filled_map(spark, GAP1, -1, "backward") == {"2020-01-03": "5xx"}
    assert filled_map(spark, GAP_SAME, -1, "identical") == {"2020-01-03": "2xx"}


def test_closest_midpoint(spark):
    # gap=2 -> 1 left + 1 right; gap=3 -> 2 left + 1 right (i < gap/2).
    assert filled_map(spark, GAP2, -1, "closest") == {
        "2020-01-02": "2xx",
        "2020-01-03": "5xx",
    }
    assert filled_map(spark, GAP3, -1, "closest") == {
        "2020-01-02": "2xx",
        "2020-01-03": "2xx",
        "2020-01-04": "5xx",
    }


def test_fill_threshold(spark):
    # gap=2 with fill=1 -> nothing; fill in {2,3,-1} -> 2 days (main.py:99).
    assert filled_map(spark, GAP2, 1, "forward") == {}
    for f in (2, 3, -1):
        assert len(filled_map(spark, GAP2, f, "forward")) == 2
    assert filled_map(spark, GAP2, 0, "forward") == {}
