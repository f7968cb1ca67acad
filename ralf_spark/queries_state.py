"""Registry entries for state-maintenance operators (CDC / MERGE)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ralf_spark.connectors import apply_changelog
from ralf_spark.queries import _scratch, _t, query
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


def _feature_pipeline_oracle_sql(
    shed_rate_bp: int = 8000,
    change_threshold: float = 5.0,
    train_bp: int = 8000,
    val_bp: int = 9000,
) -> str:
    """Composed DuckDB replay of the feature-store pipeline gate."""
    from ralf_spark.functions.hashing import stable_hash64_sql

    return f"""
    WITH shed AS (
      SELECT * FROM events
      WHERE {stable_hash64_sql('event_id')} % 10000 < {shed_rate_bp}
    ),
    chg AS (
      SELECT event_id, user_id, ts, value FROM (
        SELECT *, lag(value) OVER (
          PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM shed)
      WHERE prev IS NULL OR abs(value - prev) >= {change_threshold}
    ),
    feat AS (
      SELECT user_id, ts, event_id,
             CAST(count(*) OVER w AS BIGINT) AS feat_cnt,
             sum(value) OVER w / count(*) OVER w AS feat_avg
      FROM chg
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING)
    ),
    lab AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    ),
    ex AS (
      SELECT l.event_id, l.user_id, l.value, st.feat_cnt, st.feat_avg
      FROM lab l
      LEFT JOIN LATERAL (
        SELECT f.feat_cnt, f.feat_avg FROM feat f
        WHERE f.user_id = l.user_id
          AND (f.ts < l.ts OR (f.ts = l.ts AND f.event_id <= l.event_id))
        ORDER BY f.ts DESC, f.event_id DESC LIMIT 1
      ) st ON true
    ),
    sp AS (
      SELECT *,
             CASE WHEN {stable_hash64_sql('user_id')} % 10000 < {train_bp}
                    THEN 'train'
                  WHEN {stable_hash64_sql('user_id')} % 10000 < {val_bp}
                    THEN 'val'
                  ELSE 'test' END AS split
      FROM ex
    )
    SELECT split, CAST(count(*) AS BIGINT) AS n_examples,
           CAST(count(feat_cnt) AS BIGINT) AS n_with_features,
           round(sum(COALESCE(feat_avg, 0)), 4) AS sum_feat_avg,
           round(sum(value), 4) AS sum_label
    FROM sp GROUP BY split ORDER BY split
    """


def feature_pipeline(
    spark: SparkSession,
    sf_dir: str,
    shed_rate: float = 0.8,
    change_threshold: float = 5.0,
) -> DataFrame:
    """The parameterized feature-store build behind the composition gate;
    knobs are shared with ``_feature_pipeline_oracle_sql`` and the
    non-default-parameter parity test replays both at alternate settings
    (the ADVICE-r4 ignored-parameter bug class)."""
    from pyspark.sql import Window

    from ralf_spark.operators.joins import asof_join
    from ralf_spark.operators.policies import (
        change_detection_filter,
        dataset_split,
        sampling_shed,
    )

    ev = _t(spark, sf_dir, "events")
    shed = sampling_shed(ev, rate=shed_rate, on=F.col("event_id"))
    chg = change_detection_filter(
        shed, "value", threshold=change_threshold, semantics="previous_row"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    feat = FeatureTable(
        chg.df.select(
            "user_id", "ts", "event_id",
            F.count(F.lit(1)).over(w).cast("bigint").alias("feat_cnt"),
            (F.sum("value").over(w) / F.count(F.lit(1)).over(w)).alias(
                "feat_avg"
            ),
        ),
        key="user_id", ts="ts", seq="event_id",
    )
    lab = FeatureTable(
        ev.df.where(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts", "value"
        ),
        key="user_id", ts="ts", seq="event_id",
    )
    ex = asof_join(lab, feat, right_payload=["feat_cnt", "feat_avg"])
    sp = dataset_split(
        ex, {"train": 0.8, "val": 0.1, "test": 0.1}, on="user_id"
    )
    return (
        sp.df.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_examples"),
            F.count("feat_cnt").cast("bigint").alias("n_with_features"),
            F.round(F.sum(F.coalesce("feat_avg", F.lit(0.0))), 4).alias(
                "sum_feat_avg"
            ),
            F.round(F.sum("value"), 4).alias("sum_label"),
        )
        .orderBy("split")
    )


@query("feature_pipeline_end2end", _feature_pipeline_oracle_sql())
def feature_pipeline_end2end_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP feature-store composition gate — the reference's core use
    case chained through the real operators: deterministic load shed (P3)
    -> change-detection filter (P5, previous-row) -> cumulative per-key
    features (running count/avg in arrival order) -> time-correct as-of
    enrichment of purchase labels with their pre-purchase feature state
    (J1b: each label sees features computed ONLY from events at or before
    its own event time - the leakage-free training join) -> deterministic
    train/val/test split (:func:`feature_pipeline`). Checked end to end
    against one composed DuckDB replay; per-split example counts,
    feature-coverage counts and sums are the gated output. Stage-boundary
    semantics (does the shed apply before feature accumulation? does the
    as-of see the label row's own tick?) are exactly what isolated
    oracles cannot pin."""
    return feature_pipeline(spark, sf_dir)


# (registry finalization moved to the bottom of this module — it must run
# after EVERY driver-prefix registration in this file, and the streaming
# composition gate below is prefix-checked)


@query(
    "streaming_change_detection",
    """
    WITH RECURSIVE seq AS (
      SELECT event_id, user_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events
    ),
    walk AS (
      SELECT event_id, user_id, value, rn, value AS last_emitted,
             true AS emitted
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.event_id, s.user_id, s.value, s.rn,
             CASE WHEN abs(s.value - w.last_emitted) >= 10.0
                  THEN s.value ELSE w.last_emitted END,
             abs(s.value - w.last_emitted) >= 10.0
      FROM seq s JOIN walk w ON s.user_id = w.user_id AND s.rn = w.rn + 1
    )
    SELECT event_id, user_id, round(value, 4) AS value
    FROM walk WHERE emitted ORDER BY event_id
    """,
)
def streaming_change_detection_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 as a STREAM: the reference's last-emitted change-detection
    policy enforced by a stateful streaming operator (one double of
    GroupState per key), bounded availableNow replay — gated against the
    same recursive-CTE oracle as the batch ``change_detection_last_
    emitted``. A single-batch replay applies rows in event_id order,
    which equals (ts, event_id) order on this data (the established
    streaming-fixture invariant); the cross-batch state contract is
    pinned by the multi-trigger parity test in tests/test_streaming.py."""
    import hashlib as _hl
    import tempfile as _tf

    from ralf_spark.streaming import (
        file_events,
        run_bounded,
        streaming_change_detection_filter,
        write_memory,
    )

    stream = file_events(
        spark,
        f"{sf_dir}/events.parquet",
        schema="event_id long, user_id long, value double",
    )
    out = streaming_change_detection_filter(
        stream, threshold=10.0, order_cols=("event_id",)
    )
    name = "stream_p5_" + _hl.md5(sf_dir.encode()).hexdigest()[:8]
    run_bounded(
        write_memory(out, name),
        checkpoint=_scratch("ck_p5_"),
        shuffle_partitions=8,
    )
    return (
        spark.table(name)
        .select("event_id", "user_id", F.round("value", 4).alias("value"))
        .orderBy("event_id")
    )


@query(
    "streaming_ewma_state",
    """
    WITH seq AS (
      SELECT user_id,
             list(value ORDER BY ts, event_id) AS xs
      FROM events GROUP BY user_id
    )
    SELECT user_id, CAST(len(xs) AS BIGINT) AS n_events,
           round(list_reduce(xs,
                 (acc, x) -> 0.2::DOUBLE * x + 0.8::DOUBLE * acc), 4)
             AS ewma
    FROM seq ORDER BY user_id
    """,
)
def streaming_ewma_state_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental decayed features as a STREAM: bounded replay of the
    events table through the seeded per-batch EWMA fold
    (``foreach_batch_ewma_upsert`` — each micro-batch folds onto the
    stored smoothed value, history never reprocessed), final state gated
    against the same fold oracle as the batch ``ewma_per_user``. The
    multi-batch seeding contract is pinned by the 3-trigger parity test
    in tests/test_streaming.py."""
    import hashlib as _hl
    import tempfile as _tf

    from ralf_spark.sources.fixtures import load_fixture
    from ralf_spark.streaming import (
        file_events,
        foreach_batch_ewma_upsert,
        run_bounded,
    )

    # replay with the REAL event-time column: write a normalized copy
    # (load_fixture canonicalizes ts) and stream that
    tag = _hl.md5(sf_dir.encode()).hexdigest()[:8]
    src = _scratch(f"ewma_src_{tag}_")
    ev = load_fixture(spark, "events", sf_dir).df.select(
        "event_id", "ts", "user_id", "value"
    )
    ev.write.mode("overwrite").parquet(src)
    state = _scratch(f"ewma_state_{tag}_") + "/state"
    stream = file_events(
        spark, src,
        schema="event_id long, ts timestamp_ntz, user_id long, value double",
    )
    run_bounded(
        foreach_batch_ewma_upsert(
            stream, state, key="user_id", ts_col="ts", value_col="value",
            alpha=0.2, tiebreak_col="event_id",
        ),
        checkpoint=_scratch(f"ck_ewma_{tag}_"),
    )
    return (
        spark.read.parquet(state)
        .select("user_id", "n_events", F.round("ewma", 4).alias("ewma"))
        .orderBy("user_id")
    )


@query(
    "streaming_decayed_sum_state",
    """
    WITH seq AS (
      SELECT user_id,
             list(struct_pack(t := epoch_ns(ts) // 1000,
                              x := CAST(value AS DOUBLE))
                  ORDER BY ts, event_id) AS es
      FROM events GROUP BY user_id
    )
    SELECT user_id, CAST(len(es) AS BIGINT) AS n_events,
           round(list_reduce(es, (acc, e) -> struct_pack(
                 t := e.t,
                 x := e.x + pow(0.5, (e.t - acc.t) / 86400000000.0) * acc.x
           )).x, 4) AS decayed_sum,
           es[len(es)].t AS last_ts_us
    FROM seq ORDER BY user_id
    """,
)
def streaming_decayed_sum_state_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-time decayed sum as a STREAM: bounded replay through the
    seeded per-batch fold (``foreach_batch_decayed_upsert`` — each batch's
    first event decays the STORED mass by its gap to the stored timestamp,
    history never reprocessed), final state gated against the same
    ``list_reduce`` (t, s)-recurrence oracle as the batch
    ``time_decayed_sum_per_user``. Cross-batch seeding is pinned by the
    3-split parity test in tests/test_streaming.py."""
    import hashlib as _hl
    import tempfile as _tf

    from ralf_spark.sources.fixtures import load_fixture
    from ralf_spark.streaming import (
        file_events,
        foreach_batch_decayed_upsert,
        run_bounded,
    )

    tag = _hl.md5(sf_dir.encode()).hexdigest()[:8]
    src = _scratch(f"tds_src_{tag}_")
    ev = load_fixture(spark, "events", sf_dir).df.select(
        "event_id", "ts", "user_id", "value"
    )
    ev.write.mode("overwrite").parquet(src)
    state = _scratch(f"tds_state_{tag}_") + "/state"
    stream = file_events(
        spark, src,
        schema="event_id long, ts timestamp_ntz, user_id long, value double",
    )
    run_bounded(
        foreach_batch_decayed_upsert(
            stream, state, key="user_id", ts_col="ts", value_col="value",
            half_life_s=86_400.0, tiebreak_col="event_id",
        ),
        checkpoint=_scratch(f"ck_tds_{tag}_"),
    )
    return (
        spark.read.parquet(state)
        .select(
            "user_id",
            "n_events",
            F.round("decayed_sum", 4).alias("decayed_sum"),
            "last_ts_us",
        )
        .orderBy("user_id")
    )


@query(
    "streaming_pipeline_end2end",
    """
    WITH RECURSIVE ranked AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
               AS rn
      FROM events
    ),
    wins AS (
      SELECT user_id, CAST(floor(rn / 5) AS BIGINT) AS window_id,
             sum(value) AS w_sum
      FROM ranked
      GROUP BY user_id, CAST(floor(rn / 5) AS BIGINT)
      HAVING count(*) = 5
    ),
    walk AS (
      SELECT user_id, window_id, w_sum, w_sum AS last_emitted, true AS emitted
      FROM wins WHERE window_id = 0
      UNION ALL
      SELECT w.user_id, w.window_id, w.w_sum,
             CASE WHEN abs(w.w_sum - p.last_emitted) >= 120.0
                  THEN w.w_sum ELSE p.last_emitted END,
             abs(w.w_sum - p.last_emitted) >= 120.0
      FROM wins w
      JOIN walk p ON w.user_id = p.user_id AND w.window_id = p.window_id + 1
    ),
    seq AS (
      SELECT user_id, list(w_sum ORDER BY window_id) AS xs
      FROM walk WHERE emitted GROUP BY user_id
    )
    SELECT user_id, CAST(len(xs) AS BIGINT) AS n_windows,
           round(list_reduce(xs,
                 (acc, x) -> 0.2::DOUBLE * x + 0.8::DOUBLE * acc), 4) AS ewma
    FROM seq ORDER BY user_id
    """,
)
def streaming_pipeline_end2end_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING END-TO-END COMPOSITION GATE (VERDICT r5 #1): the
    reference's core story — a *pipeline* of streaming operators over one
    source with queryable state at the end (``ralf/v2/api.py:100-135``:
    source → transform chain → queryable table) — as one replayed chain:

        file source → stateful tumbling count window (GroupState buffer)
                    → last-emitted change-detection policy (GroupState)
                    → seeded per-batch EWMA upsert sink (persisted state)

    gated against ONE composed DuckDB oracle (ranked window → recursive
    last-emitted walk over window sums at threshold 120 → list_reduce
    EWMA fold). ~48% of windows shed at sf0.01, so the policy stage is
    load-bearing, not a pass-through.

    Spark disallows two ``applyInPandasWithState`` operators in one
    streaming query ("Multiple applyInPandasWithStates are not
    supported"), so the chain crosses a DURABLE intermediate: stage 1
    appends completed windows to a parquet feature topic, stage 2 streams
    that topic through the policy into the EWMA state table — exactly how
    chained stateful Python operators deploy on a real cluster (each
    stage scales and checkpoints independently; the topic is Kafka/Delta
    there, a parquet dir here). Batching-invariance across stage
    boundaries (>=3 different micro-batch splits == batch pipeline) is
    pinned in tests/test_streaming.py.
    """
    import hashlib as _hl
    import tempfile as _tf

    from ralf_spark.streaming import (
        file_events,
        foreach_batch_ewma_upsert,
        run_bounded,
        streaming_change_detection_filter,
        streaming_tumbling_count_window,
        write_parquet,
    )

    tag = _hl.md5(sf_dir.encode()).hexdigest()[:8]
    stream = file_events(
        spark,
        f"{sf_dir}/events.parquet",
        schema="event_id long, user_id long, value double",
    )
    win = streaming_tumbling_count_window(
        stream, key_col="user_id", value_col="value",
        order_col="event_id", size=5,
    )
    mid = _scratch(f"pipe_mid_{tag}_") + "/windows"
    run_bounded(
        write_parquet(win, mid, _scratch(f"ck_pipe_w_{tag}_")),
        shuffle_partitions=8,
    )
    topic = spark.readStream.schema(
        "user_id long, window_id long, w_sum double, w_avg double"
    ).parquet(mid)
    emitted = streaming_change_detection_filter(
        topic, value_col="w_sum", key_col="user_id",
        order_cols=("window_id",), threshold=120.0,
    )
    state = _scratch(f"pipe_state_{tag}_") + "/state"
    run_bounded(
        foreach_batch_ewma_upsert(
            emitted, state, key="user_id", ts_col="window_id",
            value_col="w_sum", alpha=0.2,
        ),
        checkpoint=_scratch(f"ck_pipe_p_{tag}_"),
        shuffle_partitions=8,
    )
    return (
        spark.read.parquet(state)
        .select(
            "user_id",
            F.col("n_events").alias("n_windows"),
            F.round("ewma", 4).alias("ewma"),
        )
        .orderBy("user_id")
    )


@query(
    "datasource_fake_events",
    """
    SELECT CAST(s % 16 AS VARCHAR) AS key,
           count(*) AS n_rows,
           CAST(sum(s) AS BIGINT) AS sum_seq,
           CAST(max(s // 16) AS BIGINT) AS last_step
    FROM generate_series(0, 3199) t(s)
    GROUP BY CAST(s % 16 AS VARCHAR)
    ORDER BY key
    """,
)
def datasource_fake_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 as a REAL CONNECTOR (driver-gated per VERDICT r5 #8): the
    reference's FakeReader (``ralf/operators/source.py:90-135``) exposed
    through Spark's Python DataSource API — a named, partitioned source
    read via ``spark.read.format("fake_events")``, not a helper building
    a DataFrame. Generation is deterministic (seq, key=seq%k, value=1,
    timestep=seq//k), so the oracle re-derives the same rows from
    ``generate_series`` — the connector's partition planning, read loop
    and option plumbing are all on the gated path (EqualTo-pushdown is
    plan-asserted in tests/test_datasource.py).

    SIDE EFFECT (ADVICE r6): in a session where
    ``spark.sql.python.filterPushdown.enabled`` is not already ``true``,
    this query enables it SESSION-WIDE and leaves it on (a warning is
    emitted). A set-and-restore is not an option — the reader's
    pushdown-support check runs lazily at first execution, after this
    function returns — and the engine session (``session.py``) already
    runs with the conf on as its documented default regime; only vanilla
    driver sessions see the change."""
    import warnings

    from ralf_spark.sources.datasource import FakeEventsDataSource

    spark.dataSource.register(FakeEventsDataSource)
    if (
        str(spark.conf.get("spark.sql.python.filterPushdown.enabled",
                           "false")).lower()
        != "true"
    ):
        warnings.warn(
            "datasource_fake_events: enabling "
            "spark.sql.python.filterPushdown.enabled session-wide (the "
            "engine session default; required lazily at first execution "
            "of a pushFilters() reader, so it cannot be restored after "
            "plan build). Later Python-DataSource reads in this session "
            "plan with pushdown on.",
            stacklevel=2,
        )
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    df = (
        spark.read.format("fake_events")
        .option("num_keys", 16)
        .option("timesteps", 200)
        .option("num_partitions", 4)
        .load()
    )
    return (
        df.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("seq").cast("long").alias("sum_seq"),
            F.max("timestep").cast("long").alias("last_step"),
        )
        .orderBy("key")
    )


@query(
    "csv_stream_replay",
    """
    SELECT user_id, count(*) AS n_events, round(sum(value), 4) AS total
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def csv_stream_replay_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 CSV replay driver gate (VERDICT r5 #8): the reference's
    FileReader (``ralf/operators/source.py:138-198``) replays a recorded
    CSV through the pipeline. Here the events fixture round-trips through
    a CSV encode → bounded ``readStream`` replay → memory sink, and the
    drained rows must aggregate to exactly the parquet table's per-user
    totals — gating the CSV writer/parser round-trip (header handling,
    double formatting) and the file-stream replay machinery end to end."""
    import hashlib as _hl
    import tempfile as _tf

    from ralf_spark.sources.fixtures import load_fixture
    from ralf_spark.streaming import file_events, run_bounded, write_memory

    tag = _hl.md5(sf_dir.encode()).hexdigest()[:8]
    src = _scratch(f"csv_replay_{tag}_") + "/events_csv"
    load_fixture(spark, "events", sf_dir).df.select(
        "event_id", "user_id", "value"
    ).write.option("header", True).csv(src)
    stream = file_events(
        spark, src,
        schema="event_id long, user_id long, value double",
        fmt="csv",
    )
    name = "csv_replay_" + tag
    run_bounded(
        write_memory(stream, name),
        checkpoint=_scratch(f"ck_csv_{tag}_"),
    )
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total"),
        )
        .orderBy("user_id")
    )


@query(
    "streaming_enrichment_join",
    """
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY o.o_orderkey
    """,
)
def streaming_enrichment_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1a as a STREAM (r7): the reference's core deployment — a live
    fact stream enriched against dimension/state tables per record
    (``ralf/operators/join.py:41-50``) — using the SAME
    ``operators.joins.enrichment_join`` code as the batch gate: the
    operator is engine-polymorphic, a streaming left side makes the plan
    a stream-static join. The static side is re-resolved when the query
    (re)starts, giving the dim-refresh semantics the reference gets from
    mutable actor state at deployment granularity (pinned in
    tests/test_streaming.py: a dim rewritten between two bounded runs of
    the same checkpoint enriches the second run's records with the NEW
    values; within-run refresh additionally needs
    ``spark.catalog.refreshByPath`` on the dim, since the file listing is
    cached on the DataFrame). The broadcast hint on the dimension keeps
    every micro-batch shuffle-free on the stream side."""
    import hashlib as _hl
    import tempfile as _tf

    from ralf_spark.operators.joins import enrichment_join
    from ralf_spark.streaming import file_events, run_bounded, write_memory

    stream = file_events(
        spark,
        f"{sf_dir}/orders.parquet",
        schema="o_orderkey long, o_custkey long, o_totalprice double",
    )
    dim = FeatureTable(
        spark.read.parquet(f"{sf_dir}/customer.parquet").select(
            "c_custkey", "c_name", "c_mktsegment"
        ),
        key="c_custkey",
    )
    left = FeatureTable(stream, key="o_custkey")
    joined = enrichment_join(
        left, dim, on=[stream.o_custkey == dim.df.c_custkey],
        broadcast_right=True,
    )
    name = "stream_enrich_" + _hl.md5(sf_dir.encode()).hexdigest()[:8]
    run_bounded(
        write_memory(joined.df, name),
        checkpoint=_scratch("ck_enrich_"),
        shuffle_partitions=8,
    )
    return (
        spark.table(name)
        .select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")
        .orderBy("o_orderkey")
    )


@query(
    "streaming_interval_join",
    """
    SELECT l.event_id, count(*) AS n_prior_clicks,
           round(sum(r.value), 4) AS sum_click_value
    FROM events l JOIN events r
      ON r.user_id = l.user_id
     AND r.ts >= l.ts - INTERVAL 1 HOUR AND r.ts <= l.ts
    WHERE l.event_type = 'purchase' AND r.event_type = 'click'
    GROUP BY l.event_id
    ORDER BY l.event_id
    """,
)
def streaming_interval_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The interval join as a STREAM-STREAM join (r7): purchases x
    prior-hour clicks through the SAME ``operators.joins.interval_join``
    code as the batch gate — its equi-key + two-sided time-bound
    condition is precisely the form Spark's watermarked stream-stream
    join supports natively, so the operator runs unchanged; the
    watermarks on both sides are what bound the join state at scale
    (right rows age out once the watermark passes ts + lookback — the
    reference, one record at a time, cannot express this join at all).
    The attribution aggregate runs in batch over the drained matches
    (chaining a global agg after a stream-stream join is not an
    append-mode shape); batching-invariance across time-ordered splits
    is pinned in tests/test_streaming.py."""
    import hashlib as _hl
    import tempfile as _tf

    from ralf_spark.functions.timeutil import epoch_us
    from ralf_spark.operators.joins import interval_join
    from ralf_spark.streaming import file_events, run_bounded, write_memory

    schema = (
        "event_id long, ts timestamp_ntz, user_id long, value double, "
        "event_type string"
    )

    raw = file_events(spark, f"{sf_dir}/events.parquet", schema=schema)
    # Watermarks demand TIMESTAMP (LTZ). Convert the canonical NTZ
    # event time to an instant TZ-FREE — timestamp_micros over the
    # integer epoch (naive-as-UTC, DuckDB's epoch semantics) — never
    # an NTZ->LTZ cast, which would shift under a non-UTC session tz.
    # ONE watermark on the shared upstream, both sides branched by
    # filter: independently watermarked sources can pin the min-across-
    # operators global watermark at 0 for a whole bounded run (observed
    # — see streaming_asof_enrich), stalling state cleanup.
    raw = raw.withColumn("ts", F.timestamp_micros(epoch_us(raw, "ts")))
    raw = raw.withWatermark("ts", "2 hours")

    def side(event_type: str) -> FeatureTable:
        return FeatureTable(
            raw.where(F.col("event_type") == event_type),
            key="user_id", ts="ts",
        )

    joined = interval_join(side("purchase"), side("click"), lookback="1 hour")
    name = "stream_ivj_" + _hl.md5(sf_dir.encode()).hexdigest()[:8]
    run_bounded(
        write_memory(joined.df.select("event_id", "value_r"), name),
        checkpoint=_scratch("ck_ivj_"),
        shuffle_partitions=8,
    )
    return (
        spark.table(name)
        .groupBy("event_id")
        .agg(
            F.count("*").alias("n_prior_clicks"),
            F.round(F.sum("value_r"), 4).alias("sum_click_value"),
        )
        .orderBy("event_id")
    )


@query(
    "streaming_asof_enrich",
    """
    WITH l AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
    ), r AS (
      SELECT user_id, ts, event_id, value FROM events
      WHERE event_type = 'click'
    )
    SELECT l.event_id, l.user_id, epoch_ns(l.ts) // 1000 AS ts_us,
           round(c.v, 4) AS right_value
    FROM l
    LEFT JOIN LATERAL (
      SELECT value AS v FROM r
      WHERE r.user_id = l.user_id
        AND (r.ts < l.ts OR (r.ts = l.ts AND r.event_id <= l.event_id))
      ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) c ON true
    ORDER BY event_id
    """,
)
def streaming_asof_enrich_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's PER-RECORD state join as a stateful streaming
    operator (r7): right updates (clicks) fold into one latest-(ts, seq,
    value) GroupState triple per user; left events (purchases) emit
    enriched with the state as of their event-order position — exactly
    ``ralf/operators/join.py:41-50``'s actor-state join, with
    fault-tolerant state. The bounded replay is gated against the batch
    as-of oracle (LEFT LATERAL backward, the same visibility rule as
    ``point_in_time_training_join``); batching invariance across
    event-order splits is pinned in tests/test_streaming.py."""
    import hashlib as _hl

    from ralf_spark.streaming import (
        file_events,
        run_bounded,
        streaming_asof_enrich,
        write_memory,
    )

    schema = (
        "event_id long, ts timestamp_ntz, user_id long, value double, "
        "event_type string"
    )

    def side(event_type: str) -> DataFrame:
        return file_events(
            spark, f"{sf_dir}/events.parquet", schema=schema
        ).where(F.col("event_type") == event_type)

    out = streaming_asof_enrich(side("purchase"), side("click"))
    name = "stream_asof_" + _hl.md5(sf_dir.encode()).hexdigest()[:8]
    run_bounded(
        write_memory(out, name),
        checkpoint=_scratch("ck_asof_"),
        shuffle_partitions=8,
    )
    return (
        spark.table(name)
        .select(
            "event_id", "user_id", "ts_us",
            F.round("right_value", 4).alias("right_value"),
        )
        .orderBy("event_id")
    )


@query(
    "point_query_latest_state",
    """
    SELECT event_id, user_id, event_type, round(value, 4) AS value
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC
      ) AS rn
      FROM events
    ) WHERE rn = 1 AND user_id = 7
    """,
)
def point_query_latest_state_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 point query as a driver gate (VERDICT r6 #2): the serving-read
    half of the reference's table contract (``ralf/table.py:179-191``,
    ``ralf/client.py:8-11``) phrased as an oracle-checked registry query —
    ``FeatureTable.point_query_df`` over the events state, key 7 (present
    at every fixture SF). The key predicate is applied below the
    ``max_by`` state aggregate, so it reaches the parquet scan's
    ``PushedFilters`` (plan-asserted in tests/test_core_surface.py):
    a point read scans one key's rows, never the full state."""
    ev = _t(spark, sf_dir, "events")
    return ev.point_query_df(7).select(
        "event_id", "user_id", "event_type",
        F.round("value", 4).alias("value"),
    )


@query(
    "state_bulk_export_roundtrip",
    """
    SELECT user_id, event_id, event_type, round(value, 4) AS value
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC
      ) AS rn
      FROM events
    ) WHERE rn = 1
    ORDER BY user_id
    """,
)
def state_bulk_export_roundtrip_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9/S7 bulk export (r13, VERDICT r12 #6): ``bulk_query`` collects
    the full state to the driver (reference parity — fine at serving
    size, wrong at 100 TB); ``bulk_export`` is its distributed twin — a
    key-bucketed parquet write (``bucket=pmod(xxhash64(key), n)``) no
    row of which visits the driver. The gate runs the whole lifecycle:
    save the latest-per-user events state through a
    ``ParquetStateConnector``, ``bulk_export`` it, reload the EXPORT
    through a fresh connector handle, and pin the reloaded rows against
    the plain latest-per-key oracle — proving the export is lossless
    and itself point-query-prunable."""
    import hashlib as _hl

    from ralf_spark.connectors import ParquetStateConnector

    ev = _t(spark, sf_dir, "events")
    tag = _hl.md5(sf_dir.encode()).hexdigest()[:8]
    state = ParquetStateConnector(
        _scratch(f"bulkexp_state_{tag}_"), key="user_id", num_buckets=16
    )
    state.save(
        FeatureTable(ev.df, key="user_id", ts="ts", seq="event_id")
    )
    export = _scratch(f"bulkexp_out_{tag}_")
    state.bulk_export(spark, export, num_buckets=16)
    back = ParquetStateConnector(export, key="user_id", num_buckets=16)
    return (
        back.load(spark)
        .df.select(
            "user_id", "event_id", "event_type",
            F.round("value", 4).alias("value"),
        )
        .orderBy("user_id")
    )


# Registry finalization: re-applies the driver-prefix ordering when THIS
# module was the import entry point (circular-entry tolerance; no-op when
# ralf_spark.queries was imported first and has already finalized). Must
# stay at the BOTTOM of the module: streaming_pipeline_end2end above is
# part of the driver-checked prefix.
from ralf_spark.queries import finalize_registry as _finalize  # noqa: E402

_finalize()
