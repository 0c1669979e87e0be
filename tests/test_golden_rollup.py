"""Golden tests for the daily rollup against FIXTURES.md §3.1/§3.4."""

from __future__ import annotations

import pytest

from tests.conftest import FIXTURE_LINES_A, FIXTURE_LINES_B
from trendmachine_spark.operators.normalize import normalize_captures
from trendmachine_spark.operators.rollup import daily_rollup
from trendmachine_spark.operators.samples import periodic_samples
from trendmachine_spark.sources.captures import captures_from_fixture


def rollup_rows(spark, lines):
    captures = captures_from_fixture(spark, lines)
    rows = daily_rollup(normalize_captures(captures)).orderBy("day").collect()
    return {r["day_str"]: r for r in rows}


def test_daily_rollup_variant_b(spark):
    # FIXTURES.md §3.1 golden table.
    d = rollup_rows(spark, FIXTURE_LINES_B)
    assert list(d) == ["2020-01-01", "2020-01-02", "2020-01-04", "2020-01-05"]

    r = d["2020-01-01"]
    assert (r["specimen"], r["datetime"], r["digest"], r["content"]) == (
        "2xx", "20200101020000", "BBBB2222", "Changed",
    )
    assert (r["_2xx"], r["_3xx"], r["_4xx"], r["_5xx"], r["all"]) == (2, 1, 0, 0, 3)
    assert r["chaos"] == pytest.approx(0.666667, abs=1e-6)
    assert r["chaosn"] == pytest.approx(0.666667, abs=1e-6)

    r = d["2020-01-02"]
    # Revisit '-' row inherits 2xx via digest BBBB2222 and wins priority.
    assert (r["specimen"], r["datetime"], r["digest"], r["content"]) == (
        "2xx", "20200102020000", "BBBB2222", "Unchanged",
    )
    assert (r["_2xx"], r["_4xx"], r["all"]) == (1, 1, 2)
    assert r["chaos"] == pytest.approx(0.8, abs=1e-6)

    r = d["2020-01-04"]
    assert (r["specimen"], r["digest"], r["content"]) == ("5xx", "DDDD4444", "Changed")
    assert r["chaos"] == pytest.approx(0.833333, abs=1e-6)

    r = d["2020-01-05"]
    # Raw out-of-range token stays the specimen with zero class counts.
    assert (r["specimen"], r["all"], r["content"]) == ("0", 0, "Changed")
    assert r["chaos"] == pytest.approx(0.857143, abs=1e-6)
    assert r["chaosn"] == pytest.approx(0.857143, abs=1e-6)


def test_periodic_samples_variant_b(spark):
    captures = captures_from_fixture(spark, FIXTURE_LINES_B)
    out = {
        r["Period"]: r["Samples"]
        for r in periodic_samples(captures, per_url=False).collect()
    }
    assert out == {"Second": 7, "Minute": 7, "Hour": 7, "Day": 4, "Month": 1, "Year": 1}


def test_priority_tie_earliest_wins(spark):
    lines = [
        "20200101010000 404 AAAA0000X",
        "20200101020000 200 BBBB0000X",
        "20200101030000 200 CCCC0000X",  # same priority as 02:00 -> earliest wins
    ]
    d = rollup_rows(spark, lines)
    r = d["2020-01-01"]
    assert (r["specimen"], r["datetime"], r["digest"]) == ("2xx", "20200101020000", "BBBB0000")


def test_revisit_last_writer_wins(spark):
    lines = [
        "20200101010000 200 AAAA0000X",
        "20200102010000 503 AAAA0000X",  # same digest re-seen with a new class
        "20200103010000 -   AAAA0000X",  # inherits the *latest* class (5xx)
        "20200104010000 -   ZZZZ9999X",  # unseen digest -> '~'
    ]
    d = rollup_rows(spark, lines)
    assert d["2020-01-03"]["specimen"] == "5xx"
    assert d["2020-01-04"]["specimen"] == "~"


def test_lexicographic_status_classing(spark):
    lines = [
        "20200101010000 3abc AAAA0000X",  # lexicographically in range -> 3xx
        "20200102010000 1999 BBBB0000X",  # below '200' -> passthrough
    ]
    d = rollup_rows(spark, lines)
    assert d["2020-01-01"]["specimen"] == "3xx"
    assert d["2020-01-01"]["_3xx"] == 1
    assert d["2020-01-02"]["specimen"] == "1999"
    assert d["2020-01-02"]["all"] == 0
