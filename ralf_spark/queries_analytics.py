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


@query(
    "cube_type_day_totals",
    f"""
    WITH ev AS (
      SELECT event_type, epoch_ns(ts) // 1000 // {US_PER_DAY} AS d, value
      FROM events
    )
    SELECT coalesce(event_type, '(all)') AS event_type,
           coalesce(d, -1) AS day_idx,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 4) AS total_value
    FROM ev GROUP BY CUBE(event_type, d)
    ORDER BY event_type, day_idx
    """,
)
def cube_type_day_totals_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLAP CUBE over (event_type, day): every rollup combination in one
    pass — Spark expands grouping sets map-side, so the shuffle carries
    one partial row per (set, key), not one pass per set."""
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    d = ((us - us % US_PER_DAY) / US_PER_DAY).cast("long")
    return (
        ev.df.withColumn("d", d)
        .cube("event_type", "d")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.coalesce(F.col("event_type"), F.lit("(all)")).alias("event_type"),
            F.coalesce(F.col("d"), F.lit(-1)).alias("day_idx"),
            "n_events",
            "total_value",
        )
        .orderBy("event_type", "day_idx")
    )


@query(
    "value_percentiles_per_type",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.9), 4) AS p90,
           round(quantile_cont(value, 0.99), 4) AS p99
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def value_percentiles_per_type_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated p50/p90/p99 per event type (Spark `percentile`
    == DuckDB `quantile_cont`, same linear interpolation). At extreme
    group cardinality the drop-in scale path is `approx_percentile`
    (t-digest-style mergeable sketch) with the same output shape."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.df.groupBy("event_type")
        .agg(
            F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90"),
            F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
        )
        .orderBy("event_type")
    )
