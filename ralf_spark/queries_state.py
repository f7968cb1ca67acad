"""Registry entries for state-maintenance operators (CDC / MERGE)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ralf_spark.connectors import apply_changelog
from ralf_spark.queries import _t, query
from ralf_spark.table import FeatureTable

#: snapshot/changelog split point inside the events fixture's time range
_CUTOFF = "2024-01-16 00:00:00"


@query(
    "apply_changelog_state",
    f"""
    WITH snap AS (
      SELECT user_id, value, event_id FROM (
        SELECT user_id, value, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rk
        FROM events WHERE ts < TIMESTAMP '{_CUTOFF}') WHERE rk = 1
    ), last AS (
      SELECT user_id, value, event_id, op FROM (
        SELECT user_id, value, event_id,
               CASE WHEN event_type = 'error' THEN 'delete'
                    ELSE 'upsert' END AS op,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rk
        FROM events WHERE ts >= TIMESTAMP '{_CUTOFF}') WHERE rk = 1
    )
    SELECT user_id, round(value, 4) AS value, event_id
    FROM last WHERE op <> 'delete'
    UNION ALL
    SELECT s.user_id, round(s.value, 4) AS value, s.event_id FROM snap s
    WHERE NOT EXISTS (SELECT 1 FROM last l WHERE l.user_id = s.user_id)
    ORDER BY user_id
    """,
)
def apply_changelog_state_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply: first-half events are the state snapshot (latest per
    user), second-half events replay as a changelog where an 'error'
    event means DELETE and anything else means UPSERT. The result is the
    merged end state — upsert_into's missing delete half, and the batch
    twin of a MERGE INTO. One latest aggregation + one anti-join; the
    snapshot is never re-aggregated."""
    ev = _t(spark, sf_dir, "events")
    cutoff = F.lit(_CUTOFF).cast("timestamp")
    cols = ["user_id", "value", "event_id"]
    snap = (
        FeatureTable(
            ev.df.where(F.col("ts") < cutoff),
            key="user_id", ts="ts", seq="event_id",
        )
        .latest()
        .df.select(*cols)
    )
    chg = FeatureTable(
        ev.df.where(F.col("ts") >= cutoff)
        .withColumn(
            "op",
            F.when(F.col("event_type") == "error", "delete").otherwise(
                "upsert"
            ),
        )
        .select(*cols, "ts", "op"),
        key="user_id", ts="ts", seq="event_id",
    )
    merged = apply_changelog(snap, chg)
    return merged.select(
        "user_id", F.round("value", 4).alias("value"), "event_id"
    ).orderBy("user_id")


@query(
    "point_in_time_training_join",
    """
    WITH spine AS (
      SELECT user_id, ts, event_id FROM events
      WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, ts, event_id, value FROM events
      WHERE event_type = 'click'
    ), vws AS (
      SELECT user_id, ts, event_id, value FROM events
      WHERE event_type = 'view'
    )
    SELECT s.event_id, s.user_id,
           round(c.v, 4) AS click_value,
           round(v.v, 4) AS view_value
    FROM spine s
    LEFT JOIN LATERAL (
      SELECT value AS v FROM clicks c
      WHERE c.user_id = s.user_id
        AND (c.ts < s.ts OR (c.ts = s.ts AND c.event_id <= s.event_id))
      ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) c ON true
    LEFT JOIN LATERAL (
      SELECT value AS v FROM vws w
      WHERE w.user_id = s.user_id
        AND (w.ts < s.ts OR (w.ts = s.ts AND w.event_id <= s.event_id))
      ORDER BY w.ts DESC, w.event_id DESC LIMIT 1) v ON true
    ORDER BY s.event_id
    """,
)
def point_in_time_training_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct training-set assembly — THE feature-store
    query: a label spine (purchases) picks up the latest value from
    MULTIPLE feature tables (clicks, views) as of each label's event
    time, with no future leakage, by chaining as-of joins. Each as-of is
    the union+single-window plan (one shuffle per feature table, no
    range-join explosion) — at 100 TB each feature table joins
    independently, so tables can be added without re-shuffling the
    others. The oracle spells the same visibility rule
    ((r.ts, r.seq) <= (l.ts, l.seq)) as two LATERALs."""
    from ralf_spark.operators.joins import asof_join

    ev = _t(spark, sf_dir, "events")
    base = ["user_id", "ts", "event_id"]

    def _ft(df):
        return FeatureTable(df, key="user_id", ts="ts", seq="event_id")

    spine = _ft(ev.df.where(F.col("event_type") == "purchase").select(*base))
    clicks = _ft(
        ev.df.where(F.col("event_type") == "click").select(
            *base, F.col("value").alias("click_value")
        )
    )
    vws = _ft(
        ev.df.where(F.col("event_type") == "view").select(
            *base, F.col("value").alias("view_value")
        )
    )
    step1 = asof_join(spine, clicks, right_payload=["click_value"])
    step2 = asof_join(step1, vws, right_payload=["view_value"])
    return step2.df.select(
        "event_id",
        "user_id",
        F.round("click_value", 4).alias("click_value"),
        F.round("view_value", 4).alias("view_value"),
    ).orderBy("event_id")


@query(
    "scd2_user_value_history",
    """
    SELECT event_id, user_id, round(value, 4) AS value,
           epoch_ns(ts) // 1000 AS valid_from_us,
           epoch_ns(lead(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id)) // 1000
             AS valid_to_us,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             IS NULL AS is_current
    FROM events ORDER BY event_id
    """,
)
def scd2_user_value_history_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 version intervals per user from the event stream — each
    event valid until the user's next one; the materialized form of
    point-in-time lookups (BETWEEN valid_from AND valid_to replaces the
    as-of join downstream)."""
    from ralf_spark.operators.joins import scd2_history

    ev = _t(spark, sf_dir, "events")
    out = scd2_history(ev.df, "user_id", "ts", tiebreak_col="event_id")
    return out.select(
        "event_id",
        "user_id",
        F.round("value", 4).alias("value"),
        "valid_from_us",
        "valid_to_us",
        "is_current",
    ).orderBy("event_id")


@query(
    "snapshot_diff_states",
    f"""
    WITH snap_old AS (
      SELECT user_id, value FROM (
        SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rk
        FROM events WHERE ts < TIMESTAMP '{_CUTOFF}') WHERE rk = 1
    ),
    snap_new AS (
      SELECT user_id, value FROM (
        SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rk
        FROM events) WHERE rk = 1
    )
    SELECT coalesce(o.user_id, n.user_id) AS user_id,
           round(o.value, 4) AS old_value,
           round(n.value, 4) AS new_value,
           CASE WHEN o.user_id IS NULL THEN 'added'
                WHEN n.user_id IS NULL THEN 'removed'
                WHEN o.value = n.value THEN 'unchanged'
                ELSE 'changed' END AS status
    FROM snap_old o FULL OUTER JOIN snap_new n ON o.user_id = n.user_id
    ORDER BY user_id
    """,
)
def snapshot_diff_states_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backfill reconciliation: diff the latest-per-user state at the
    changelog cutoff against the full-history recompute — added / removed
    / changed / unchanged per key via one full-outer co-partitioned join."""
    from ralf_spark.connectors import snapshot_diff

    ev = _t(spark, sf_dir, "events")

    def _latest(df):
        w_df = (
            df.groupBy("user_id")
            .agg(
                F.max_by(
                    F.struct("value"),
                    F.struct(F.col("ts"), F.col("event_id")),
                ).alias("_s")
            )
            .select("user_id", F.col("_s.value").alias("value"))
        )
        return w_df

    old = _latest(ev.df.where(F.col("ts") < F.lit(_CUTOFF).cast("timestamp")))
    new = _latest(ev.df)
    out = snapshot_diff(old, new, "user_id", ["value"])
    return out.select(
        "user_id",
        F.round("old_value", 4).alias("old_value"),
        F.round("new_value", 4).alias("new_value"),
        "status",
    ).orderBy("user_id")


@query(
    "asof_join_forward",
    """
    SELECT l.event_id, l.user_id, st.next_value, st.next_event_id
    FROM events l
    LEFT JOIN LATERAL (
      SELECT round(r.value, 4) AS next_value, r.event_id AS next_event_id
      FROM events r
      WHERE r.user_id = l.user_id AND r.event_type = 'view'
        AND (r.ts > l.ts OR (r.ts = l.ts AND r.event_id >= l.event_id))
      ORDER BY r.ts ASC, r.event_id ASC LIMIT 1
    ) st ON true
    ORDER BY event_id
    """,
)
def asof_join_forward_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1b forward direction: each event sees the EARLIEST 'view' at or
    after its own time — label joins and next-reading imputation (the
    lookup shape merge_asof(direction='forward') provides; property-tested
    against it). Identical single-shuffle union+window plan as backward,
    with the scan order reversed."""
    from ralf_spark.operators.joins import asof_join

    ev = _t(spark, sf_dir, "events")
    right = FeatureTable(
        ev.df.where(F.col("event_type") == "view").select(
            "user_id", "ts", "event_id",
            F.round("value", 4).alias("next_value"),
            F.col("event_id").alias("next_event_id"),
        ),
        key="user_id", ts="ts", seq="event_id",
    )
    out = asof_join(
        ev, right,
        right_payload=["next_value", "next_event_id"],
        direction="forward",
    )
    return out.df.select(
        "event_id", "user_id", "next_value", "next_event_id"
    ).orderBy("event_id")
