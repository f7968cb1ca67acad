"""Behavioral analytics operators: funnels and cohort retention.

The reference's feature tables feed exactly these consumer-side analyses
(its README motivates per-user engagement features); here they are
first-class relational operators instead of per-key actor code. Both are
pure DataFrame compositions — no UDFs, no windows over low-cardinality
keys — and all time math is integer epoch arithmetic so the DuckDB
oracles replay bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ralf_spark.functions.timeutil import epoch_us

#: microseconds per day (all day/week math is integer division on epochs)
US_PER_DAY = 86_400_000_000


def funnel_stages(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel: for each user, the FIRST time they completed each
    stage strictly after the previous stage (classic min-time chaining —
    a later-stage event before the earlier stage does not count).

    Returns one row per user who entered the funnel:
    (user, t1_us..tN_us epoch-micro columns, stage_reached).

    Plan: one filtered min-aggregate per stage, each joined back on the
    user key — N small hash-aggs + N-1 equi-joins, all shuffling on the
    same user key so the exchanges reuse one partitioning. Never a
    window over the whole event stream, never a self-join on time.
    """
    us = epoch_us(events, ts_col)
    prev: DataFrame | None = None
    for i, stage in enumerate(stages, start=1):
        col = f"t{i}_us"
        filt = events.where(F.col(type_col) == stage)
        if prev is None:
            cur = filt.groupBy(user_col).agg(F.min(us).alias(col))
        else:
            cur = (
                filt.join(prev, user_col)
                .where(us > F.col(f"t{i - 1}_us"))
                .groupBy(user_col)
                .agg(F.min(us).alias(col))
            )
        prev = prev.join(cur, user_col, "left") if prev is not None else cur
    # build the CASE chain ascending so the HIGHEST completed stage is the
    # outermost WHEN (t3 wins over t2 wins over t1)
    reached = F.lit(0)
    for i in range(1, len(stages) + 1):
        reached = F.when(
            F.col(f"t{i}_us").isNotNull(), F.lit(i)
        ).otherwise(reached)
    return prev.withColumn("stage_reached", reached)


def cohort_retention(
    events: DataFrame,
    cohort_type: str = "signup",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention grid: users are cohorted by the day index
    of their first ``cohort_type`` event; every subsequent active week
    (any event) increments that (cohort_day, week_offset) cell.

    Returns (cohort_day, week_offset, n_users). Day/week indexes are
    integer epoch arithmetic (epoch_us // day, offset // 7) — timezone-
    free and engine-portable.

    Plan: one per-user min-aggregate (cohort assignment, broadcastable —
    one row per user), one equi-join back onto the scan, a distinct on
    (user, cohort, week) and the final cell count — shuffles keyed on
    user then on the grid key. The grid itself is tiny (cohorts × weeks).
    """
    us = epoch_us(events, ts_col)
    # exact integer floor-division: subtract the remainder first so the
    # double division is of an exact multiple (no boundary rounding)
    d = ((us - us % US_PER_DAY) / US_PER_DAY).cast("long")
    cohorts = (
        events.where(F.col(type_col) == cohort_type)
        .groupBy(user_col)
        .agg(F.min(d).alias("cohort_day"))
    )
    active = (
        events.select(F.col(user_col), d.alias("_d"))
        .join(cohorts, user_col)
        .where(F.col("_d") >= F.col("cohort_day"))
        .select(
            user_col,
            "cohort_day",
            ((F.col("_d") - F.col("cohort_day")) / 7).cast("long").alias(
                "week_offset"
            ),
        )
        .distinct()
    )
    return active.groupBy("cohort_day", "week_offset").agg(
        F.count_distinct(user_col).alias("n_users")
    )
