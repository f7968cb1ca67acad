"""Unit tests for funnel and cohort-retention operators."""

from __future__ import annotations

import pytest

import datetime as dt

from ralf_spark.operators.analytics import cohort_retention, funnel_stages

_BASE = dt.datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, _BASE + dt.timedelta(hours=h)) for u, t, h in rows],
        "user_id long, event_type string, ts timestamp",
    )


@pytest.mark.slow
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


# ------------------------- round-4 additions: plan + semantics contracts


def test_profile_columns_single_scan(spark):
    """All per-column statistics must come from ONE pass over the table —
    a UNION-ALL-per-column plan (the oracle's toy spelling) scans once per
    column, which is the difference between 1× and N× cost at 100 TB."""
    from ralf_spark.plans.explain import explain_str
    from ralf_spark.queries import QUERIES

    df = QUERIES["profile_columns"].fn(spark, "/root/testdata/sf0.001")
    plan = explain_str(df, "simple")
    assert plan.count("FileScan parquet") == 1, plan
    rows = {r.col_name: r for r in df.collect()}
    assert set(rows) == {"event_id", "user_id", "value", "event_type"}
    assert rows["event_type"].min_num is None  # non-numeric: no range
    assert rows["event_id"].n_null == 0


def test_latest_payload_pruning_reaches_scan(spark):
    """latest(payload_cols=...) must prune unreferenced fat columns out of
    the SCAN (props is the widest events column; carrying it through the
    max_by partial buffers is pure shuffle waste)."""
    from ralf_spark.plans.explain import scan_read_schema
    from ralf_spark.queries import QUERIES

    df = QUERIES["latest_per_key"].fn(spark, "/root/testdata/sf0.001")
    schemas = scan_read_schema(df)
    assert schemas
    assert all("props" not in sc for sc in schemas), schemas
    assert any("ts" in sc for sc in schemas)  # ordering column still read


def test_set_ops_plan_uses_hash_joins(spark):
    """EXCEPT/INTERSECT must plan as anti/semi hash joins over distinct
    aggregates, never a sort-based set operator."""
    from ralf_spark.plans.explain import explain_str
    from ralf_spark.queries import QUERIES

    df = QUERIES["set_ops_user_cohorts"].fn(spark, "/root/testdata/sf0.001")
    plan = explain_str(df)
    assert "LeftAnti" in plan, plan
    assert "LeftSemi" in plan, plan


def test_attribution_matches_manual_asof(spark):
    """Last-touch attribution: purchase credits the latest earlier
    view/click of the same user; same-instant marketing events with a
    lower-or-equal sequence number count (as-of tie rule)."""
    import datetime as dt

    from ralf_spark.operators.joins import asof_join
    from ralf_spark.table import FeatureTable

    base = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            (1, base, 1, "view"),
            (1, base + dt.timedelta(minutes=5), 2, "click"),
            (1, base + dt.timedelta(minutes=9), 3, "purchase"),
            # user 2 purchases with no prior marketing event
            (2, base, 4, "purchase"),
            (2, base + dt.timedelta(minutes=1), 5, "view"),
        ],
        "user_id long, ts timestamp, event_id long, event_type string",
    )
    purchases = FeatureTable(
        ev.where("event_type = 'purchase'").select("user_id", "ts", "event_id"),
        key="user_id", ts="ts", seq="event_id",
    )
    marketing = FeatureTable(
        ev.where("event_type in ('view','click')").select(
            "user_id", "ts", "event_id",
            ev.event_id.alias("attributed_event_id"),
            ev.event_type.alias("attributed_type"),
        ),
        key="user_id", ts="ts", seq="event_id",
    )
    out = {
        r.event_id: r
        for r in asof_join(
            purchases, marketing,
            right_payload=["attributed_event_id", "attributed_type"],
        ).df.collect()
    }
    assert out[3].attributed_event_id == 2  # click beats earlier view
    assert out[3].attributed_type == "click"
    assert out[4].attributed_event_id is None  # nothing earlier
