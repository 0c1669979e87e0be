"""Unit tests for the ordered-funnel and cohort-retention operators."""

from __future__ import annotations

import datetime as dt

from trendmachine_spark.operators.funnel import event_funnel, event_retention


def _events(spark, rows):
    return spark.createDataFrame(
        [(uid, t, dt.datetime(2024, 1, d, h, m)) for uid, t, d, h, m in rows],
        "user_id long, event_type string, ts timestamp_ntz",
    )


def test_funnel_requires_step_order(spark):
    rows = [
        # user 1 converts fully in order
        (1, "view", 1, 9, 0), (1, "click", 1, 9, 5), (1, "purchase", 1, 9, 10),
        # user 2 purchases BEFORE clicking: purchase step must not count
        (2, "view", 1, 9, 0), (2, "purchase", 1, 9, 2), (2, "click", 1, 9, 5),
        # user 3 clicks before ever viewing: only later view counts, no click after
        (3, "click", 1, 8, 0), (3, "view", 1, 9, 0),
        # user 4 never views
        (4, "purchase", 1, 9, 0),
    ]
    out = {r["user_id"]: r for r in event_funnel(_events(spark, rows)).collect()}
    assert out[1]["steps_reached"] == 3
    assert out[1]["t_view"] < out[1]["t_click"] < out[1]["t_purchase"]
    assert out[2]["steps_reached"] == 2 and out[2]["t_purchase"] is None
    assert out[3]["steps_reached"] == 1 and out[3]["t_click"] is None
    assert out[4]["steps_reached"] == 0 and out[4]["t_view"] is None


def test_funnel_uses_first_completion_for_chaining(spark):
    # the SECOND view is followed by a click, but chaining is anchored
    # at the FIRST view — the earlier click (after first view) counts
    rows = [
        (1, "view", 1, 9, 0), (1, "click", 1, 9, 30),
        (1, "view", 2, 9, 0), (1, "click", 2, 9, 5),
    ]
    out = event_funnel(_events(spark, rows)).collect()[0]

    def us(*args):
        return int(dt.datetime(*args, tzinfo=dt.timezone.utc).timestamp() * 1e6)

    assert out["t_view"] == us(2024, 1, 1, 9, 0)
    assert out["t_click"] == us(2024, 1, 1, 9, 30)


def test_retention_hand_counts(spark):
    rows = [
        # cohort Jan 1: users 1, 2.  user 1 returns day 1 and day 3;
        # user 2 only day 0 (two events same day collapse)
        (1, "view", 1, 9, 0), (1, "view", 2, 9, 0), (1, "view", 4, 9, 0),
        (2, "view", 1, 9, 0), (2, "click", 1, 10, 0),
        # cohort Jan 2: user 3, returns day 2
        (3, "view", 2, 9, 0), (3, "view", 4, 9, 0),
    ]
    out = {
        (str(r["cohort_day"]), r["day_offset"]): r["n_users"]
        for r in event_retention(_events(spark, rows)).collect()
    }
    assert out == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 3): 1,
        ("2024-01-02", 0): 1,
        ("2024-01-02", 2): 1,
    }


def test_attribution_hand_counts(spark):
    """Last-touch attribution (r10): nearest strictly-earlier
    non-conversion credits the conversion; no prior touch -> 'direct';
    equal timestamps break by event_id; values sum as exact cents."""
    from trendmachine_spark.operators.funnel import event_attribution

    rows = [
        # (event_id, user, type, minute, value)
        (0, 1, "view", 0, 0.0),
        (1, 1, "click", 5, 0.0),
        (2, 1, "purchase", 10, 9.64),     # credited to click
        (3, 1, "purchase", 11, 1.01),     # still click (prior purchase skipped)
        (4, 2, "purchase", 0, 2.50),      # no prior touch -> direct
        # user 3: view and click share a timestamp; click has the
        # larger event_id so it is the LAST preceding row
        (5, 3, "view", 0, 0.0),
        (6, 3, "click", 0, 0.0),
        (7, 3, "purchase", 1, 0.10),      # credited to click by tie-break
    ]
    df = spark.createDataFrame(
        [(eid, uid, t, dt.datetime(2024, 1, 1, 9, m), v)
         for eid, uid, t, m, v in rows],
        "event_id long, user_id long, event_type string, "
        "ts timestamp_ntz, value double",
    )
    out = {r["touch_type"]: (r["n_conversions"], r["value_cents"])
           for r in event_attribution(df).collect()}
    assert out == {"click": (3, 964 + 101 + 10), "direct": (1, 250)}
