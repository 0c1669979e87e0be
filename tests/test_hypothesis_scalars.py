"""Hypothesis property tests for scalar semantics (driver-side twins).

These pin the Python twins (`ymd_py`, closest-fill midpoint rule)
against independently-stated properties; the Spark/SQL versions are
pinned to the twins by goldens + oracle parity elsewhere.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from trendmachine_spark.functions.scalars import ymd_py


@given(st.integers(min_value=0, max_value=100_000))
@settings(max_examples=300, deadline=None)
def test_ymd_shape_and_magnitude(d):
    s = ymd_py(d)
    # only y/m/d unit chars, in order, each at most once
    import re
    m = re.fullmatch(r"(?:(\d+)y)?(?:(\d+)m)?(?:(\d+)d)?", s)
    assert m, s
    y, mo, dd = (int(g) if g else 0 for g in m.groups())
    assert 0 <= mo <= 11
    assert 0 <= dd <= 30
    # reconstruction stays within the reference's rounding slack:
    # month round-up adds up to 14 days and a 12-month carry trades
    # 360 month-days for a 365-day year (+5) => max overshoot 19;
    # dropping a <=15-day remainder => max undershoot 15.
    approx = y * 365 + mo * 30 + dd
    assert approx <= d + 19
    assert approx >= d - 15


@given(st.integers(min_value=0, max_value=5000))
@settings(max_examples=200, deadline=None)
def test_ymd_monotone_yearish(d):
    # adding a full 365-day year adds exactly one year at day granularity 0
    a, b = ymd_py(d), ymd_py(d + 365)
    assert a != b or d < 0  # strings always change across a year


def _closest_split(gap: int) -> tuple[int, int]:
    """Reference midpoint rule (main.py:62-66): i < gap/2 -> left."""
    left = sum(1 for i in range(gap) if i < gap / 2)
    return left, gap - left


@given(st.integers(min_value=1, max_value=1000))
@settings(max_examples=200, deadline=None)
def test_closest_midpoint_rule(gap):
    left, right = _closest_split(gap)
    assert left + right == gap
    # even gap splits evenly; odd gap gives the extra day to the LEFT
    if gap % 2 == 0:
        assert left == right
    else:
        assert left == right + 1
