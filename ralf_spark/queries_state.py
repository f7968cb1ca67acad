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
