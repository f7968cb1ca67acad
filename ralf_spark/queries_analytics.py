"""Registry entries: behavioral analytics (funnels, cohort retention).

The downstream analyses the reference's per-user feature tables exist to
feed, expressed as relational plans with integer-epoch time math so the
DuckDB oracles replay exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ralf_spark.operators.analytics import (
    US_PER_DAY,
    cohort_retention,
    funnel_stages,
)
from ralf_spark.queries import _t, query

#: the fixture's natural conversion funnel
_FUNNEL = ["view", "click", "purchase"]


@query(
    "funnel_view_click_purchase",
    """
    WITH t1 AS (
      SELECT user_id, min(epoch_ns(ts) // 1000) AS t1_us
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    t2 AS (
      SELECT e.user_id, min(epoch_ns(e.ts) // 1000) AS t2_us
      FROM events e JOIN t1 USING (user_id)
      WHERE e.event_type = 'click' AND epoch_ns(e.ts) // 1000 > t1.t1_us
      GROUP BY e.user_id
    ),
    t3 AS (
      SELECT e.user_id, min(epoch_ns(e.ts) // 1000) AS t3_us
      FROM events e JOIN t2 USING (user_id)
      WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) // 1000 > t2.t2_us
      GROUP BY e.user_id
    )
    SELECT t1.user_id, t1_us, t2_us, t3_us,
           CASE WHEN t3_us IS NOT NULL THEN 3
                WHEN t2_us IS NOT NULL THEN 2
                ELSE 1 END AS stage_reached
    FROM t1 LEFT JOIN t2 USING (user_id) LEFT JOIN t3 USING (user_id)
    ORDER BY user_id
    """,
)
def funnel_view_click_purchase_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view→click→purchase funnel with strict min-time chaining
    (a purchase before the first post-view click does not convert)."""
    ev = _t(spark, sf_dir, "events")
    out = funnel_stages(ev.df, _FUNNEL)
    return out.select(
        "user_id", "t1_us", "t2_us", "t3_us", "stage_reached"
    ).orderBy("user_id")


@query(
    "cohort_weekly_retention",
    f"""
    WITH ev AS (
      SELECT user_id, event_type,
             epoch_ns(ts) // 1000 // {US_PER_DAY} AS d
      FROM events
    ),
    cohorts AS (
      SELECT user_id, min(d) AS cohort_day
      FROM ev WHERE event_type = 'signup' GROUP BY user_id
    ),
    active AS (
      SELECT DISTINCT e.user_id, c.cohort_day,
             (e.d - c.cohort_day) // 7 AS week_offset
      FROM ev e JOIN cohorts c USING (user_id)
      WHERE e.d >= c.cohort_day
    )
    SELECT cohort_day, week_offset,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM active GROUP BY cohort_day, week_offset
    ORDER BY cohort_day, week_offset
    """,
)
def cohort_weekly_retention_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly signup-cohort retention grid — integer epoch-day cohorts,
    week offsets from first signup; (cohort, week) cells of active
    distinct users."""
    ev = _t(spark, sf_dir, "events")
    return (
        cohort_retention(ev.df, cohort_type="signup")
        .orderBy("cohort_day", "week_offset")
    )
