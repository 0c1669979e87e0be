"""Chaos sliding-window semantics beyond SWS=1000 captures.

The micro-fixture goldens never fill the 1000-slot window, so this test
drives a 2500-capture url through the rollup and checks every day's
closing (chaos, chaosn) against an independent simulation of the
documented algorithm (SURVEY.md O21 / D5: run-change counter, circular
buffer of the last 1000 statuses, eviction decrements when the evicted
element differs from its in-window successor, normalize by
min(SWS, rows)). The simulation is written from the spec, not the
reference source.
"""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from trendmachine_spark.operators.normalize import normalize_captures
from trendmachine_spark.operators.rollup import daily_rollup
from trendmachine_spark.params import SWS
from trendmachine_spark.sources.captures import CAPTURES_SCHEMA


def simulate_daily_close(entries):
    """entries: [(day_str, resolved_class)] in capture order ->
    {day: (chaos, chaosn)} at each day's close."""
    ring = ["~"] * SWS
    prev = "~"
    rs = us = uw = 0
    out = {}
    for day, cls in entries:
        wp = rs % SWS
        rs += 1
        if cls != prev:
            prev = cls
            us += 1
            uw += 1
        if ring[wp] != ring[wp - SWS + 1]:
            uw -= 1
        ring[wp] = cls
        out[day] = (us / rs, uw / min(SWS, rs))
    return out


@pytest.mark.parametrize("seed", [3, 17])
def test_chaosn_matches_simulation_beyond_window(spark, seed):
    rng = random.Random(seed)
    classes = ["200", "301", "404", "503"]
    rows, entries = [], []
    t = dt.datetime(2019, 1, 1)
    for i in range(2500):
        t += dt.timedelta(seconds=rng.randint(30, 4000))
        status = rng.choice(classes)
        ts = t.strftime("%Y%m%d%H%M%S")
        rows.append(("u", i, ts, status, f"D{i % 7}XXXXXX"))
        entries.append((t.strftime("%Y-%m-%d"), status[0] + "xx"))
    assert len({d for d, _ in entries}) > 3  # multi-day stream
    want = simulate_daily_close(entries)

    caps = spark.createDataFrame(rows, CAPTURES_SCHEMA)
    daily = daily_rollup(normalize_captures(caps))
    got = {
        r["day_str"]: (r["chaos"], r["chaosn"]) for r in daily.collect()
    }
    # compare only day-close values (simulation keeps the last write per day)
    for day, (chaos, chaosn) in want.items():
        assert got[day][0] == pytest.approx(chaos, abs=1e-12), day
        assert got[day][1] == pytest.approx(chaosn, abs=1e-12), day
    assert len(got) == len(want)
