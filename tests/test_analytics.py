"""Unit tests for funnel and cohort-retention operators."""

from __future__ import annotations

import datetime as dt

from ralf_spark.operators.analytics import cohort_retention, funnel_stages

_BASE = dt.datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, _BASE + dt.timedelta(hours=h)) for u, t, h in rows],
        "user_id long, event_type string, ts timestamp",
    )


def test_funnel_strict_ordering_and_stage_reached(spark):
    ev = _ev(
        spark,
        [
            # user 1 completes the funnel in order
            (1, "view", 0), (1, "click", 1), (1, "purchase", 2),
            # user 2: purchase BEFORE the post-view click -> must not count
            (2, "view", 0), (2, "purchase", 1), (2, "click", 2),
            # user 3 views only
            (3, "view", 0),
            # user 4 clicks without ever viewing -> not in the funnel
            (4, "click", 0),
        ],
    )
    out = {
        r.user_id: r
        for r in funnel_stages(ev, ["view", "click", "purchase"]).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1].stage_reached == 3
    assert out[2].stage_reached == 2 and out[2].t3_us is None
    assert out[3].stage_reached == 1 and out[3].t2_us is None


def test_funnel_takes_first_qualifying_times(spark):
    ev = _ev(
        spark,
        [
            (1, "view", 5),        # first view at h5
            (1, "click", 1),       # pre-view click ignored
            (1, "click", 7),       # first post-view click
            (1, "click", 9),
        ],
    )
    row = funnel_stages(ev, ["view", "click"]).collect()[0]
    t1 = int((_BASE + dt.timedelta(hours=5)).timestamp() * 1_000_000)
    t2 = int((_BASE + dt.timedelta(hours=7)).timestamp() * 1_000_000)
    assert (row.t1_us, row.t2_us) == (t1, t2)


def test_cohort_retention_grid(spark):
    ev = _ev(
        spark,
        [
            # user 1 signs up day 0, active weeks 0 and 1
            (1, "signup", 0), (1, "click", 24 * 3), (1, "view", 24 * 8),
            # user 2 signs up day 0, active week 0 only
            (2, "signup", 1),
            # user 3 signs up day 7 (different cohort), active week 0
            (3, "signup", 24 * 7), (3, "click", 24 * 8),
            # user 4 never signs up -> excluded entirely
            (4, "click", 0),
        ],
    )
    cells = {
        (r.cohort_day, r.week_offset): r.n_users
        for r in cohort_retention(ev).collect()
    }
    d0 = (_BASE - dt.datetime(1970, 1, 1)).days
    assert cells[(d0, 0)] == 2
    assert cells[(d0, 1)] == 1
    assert cells[(d0 + 7, 0)] == 1
    assert len(cells) == 3


def test_cohort_ignores_pre_signup_activity(spark):
    ev = _ev(
        spark,
        [(1, "click", 0), (1, "signup", 24 * 2), (1, "view", 24 * 3)],
    )
    rows = cohort_retention(ev).collect()
    assert len(rows) == 1 and rows[0].week_offset == 0 and rows[0].n_users == 1
