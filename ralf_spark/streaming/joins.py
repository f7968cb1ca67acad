"""Stateful streaming joins.

The reference's ``Join`` operator enriches each arriving left record with
the right table's CURRENT per-key state at that moment
(``ralf/operators/join.py:41-50``). One deliberate divergence: the
reference BUFFERS an unmatched left record and emits it later once the
right side arrives (then deletes the buffered copy) — it never emits a
NULL-enriched row; this operator instead emits the left record
immediately with a NULL value, per the as-of contract (so output order
follows left arrival order and unmatched lefts are never held in state
indefinitely). The engine's other streaming join spellings cover
the two declarative regimes (stream-static broadcast enrichment;
watermarked stream-stream interval join); this module is the per-record
regime itself: both streams union into one keyed stateful operator, right
updates fold into ``GroupState`` (latest by (ts, seq)), left events emit
enriched with the state as of their position in event order — a streaming
AS-OF join whose bounded replay equals the batch
``operators.joins.asof_join`` (oracle-gated; batching-invariant when
micro-batch boundaries respect per-key event order, the engine's
documented FIFO contract shared by every stateful operator here).

State is one (ts_us, seq, value) triple per key — O(keys), the same
footprint as the reference's actor state; ``idle_ttl_minutes`` bounds it
by ACTIVE keys on unbounded key domains with the same event-clock
eviction machinery as ``streaming/policies.py`` (an evicted key's next
left event enriches NULL until a fresh right update arrives — the same
approximation the reference's LRU state bound makes,
``ralf/operator.py:243-254``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ralf_spark.streaming.policies import arm_event_timer

#: per-key state: the latest right record (event-time micros, seq, value);
#: the seq type is substituted from the input schema at build time
ASOF_STATE_SCHEMA = "ts_us long, seq {seq_type}, val double"


def streaming_asof_enrich(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    value_col: str = "value",
    out_value: str = "right_value",
    idle_ttl_minutes: float | None = None,
    ttl_clock: str = "processing",
) -> DataFrame:
    """Enrich each left event with the latest right value for its key
    at-or-before its (ts, seq) — the reference's per-record state join,
    streaming. Left events NEVER update state; right updates never emit.

    Inputs are two streams sharing (key, ts, seq); ``right`` carries
    ``value_col``. Output: the left rows' (key, ts, seq) plus
    ``out_value`` (NULL when no right record precedes — the as-of
    contract). Within a micro-batch rows apply in (ts, seq) order
    across BOTH sides, so a left event in the same batch as an earlier
    right update sees it — the bounded single-batch replay therefore
    equals the batch ``asof_join`` exactly (oracle-gated).

    ``idle_ttl_minutes``/``ttl_clock`` bound state by ACTIVE keys, with
    the contract of ``streaming_change_detection_filter``: processing
    clock = wall idleness (continuous triggers only; ``run_bounded``
    refuses); event clock = eviction when the watermark passes the key's
    last activity + TTL (deterministic; the timer is clamped to
    watermark+1 for late batches). For the event clock, put ONE
    ``withWatermark`` on the shared upstream and branch ``left``/
    ``right`` from it with filters: with two independently watermarked
    sources, the min-across-operators global watermark was observed
    pinned at 0 for a whole bounded replay (no timer ever fires), while
    the single-source branching advances it normally (pinned in tests).
    """
    from ralf_spark.functions.timeutil import epoch_us
    from ralf_spark.streaming.policies import check_ttl_args, timeout_conf

    ttl_ms = check_ttl_args(idle_ttl_minutes, ttl_clock)

    # the event-clock TTL needs the WATERMARKED timestamp column itself
    # to survive the projection (an epoch long does not carry a
    # watermark); the epoch is still what orders and what's emitted
    extra = [F.col(ts_col).alias("_ts")] if (
        ttl_ms is not None and ttl_clock == "event"
    ) else []
    l_tag = (
        left.select(
            F.col(key_col).alias("_k"),
            epoch_us(left, ts_col).alias("_us"),
            F.col(seq_col).alias("_seq"),
            F.lit(None).cast("double").alias("_val"),
            F.lit(0).alias("_side"),  # left sorts AFTER right on ties:
            # a right update at the same (ts, seq)... cannot exist (seq is
            # unique across the event stream), so the flag only fixes a
            # deterministic order for truly simultaneous custom inputs
            *extra,
        )
    )
    r_tag = right.select(
        F.col(key_col).alias("_k"),
        epoch_us(right, ts_col).alias("_us"),
        F.col(seq_col).alias("_seq"),
        F.col(value_col).cast("double").alias("_val"),
        F.lit(-1).alias("_side"),
        *extra,
    )
    unioned = r_tag.unionByName(l_tag)
    # derive the key/seq output types from the left schema — hardcoding
    # `long` would break string-keyed streams at the Arrow boundary
    _ltypes = {f.name: f.dataType.simpleString() for f in left.schema.fields}
    out_schema = (
        f"{key_col} {_ltypes[key_col]}, ts_us long, "
        f"{seq_col} {_ltypes[seq_col]}, {out_value} double"
    )
    state_schema = ASOF_STATE_SCHEMA.format(seq_type=_ltypes[seq_col])
    seq_is_int = _ltypes[seq_col] in ("tinyint", "smallint", "int", "bigint")

    def fn(key, pdfs, state):
        import pandas as pd

        if state.hasTimedOut:
            # idle-key eviction: the latest-right triple drops; the
            # key's next left event enriches NULL until a fresh right
            state.remove()
            return
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values(["_us", "_seq", "_side"], kind="mergesort")
        if state.exists:
            ts_us, seq, val = state.get
        else:
            ts_us = seq = val = None
        out = {"k": [], "us": [], "seq": [], "v": []}
        changed = False
        for _us, _seq, _val, _side in zip(
            rows["_us"], rows["_seq"], rows["_val"], rows["_side"]
        ):
            if _side == -1:  # right update: fold if newer
                if ts_us is None or (_us, _seq) > (ts_us, seq):
                    ts_us = int(_us)
                    # a NULL-valued right update stores/emits NULL, as
                    # the batch as-of oracle would — float() would turn
                    # it into NaN, a silent divergence (ADVICE r7)
                    val = None if pd.isna(_val) else float(_val)
                    seq = int(_seq) if seq_is_int else _seq
                    changed = True
            else:  # left event: emit with current state
                out["k"].append(key[0])
                out["us"].append(int(_us))
                out["seq"].append(int(_seq) if seq_is_int else _seq)
                out["v"].append(val)
        if changed:
            state.update((ts_us, seq, val))
        if ttl_ms is not None and (changed or state.exists):
            # any activity on the key re-arms its idle timer
            if ttl_clock == "event":
                arm_event_timer(
                    state, int(rows["_us"].max()) // 1000, ttl_ms
                )
            else:
                state.setTimeoutDuration(ttl_ms)
        if out["k"]:
            yield pd.DataFrame(
                {
                    key_col: out["k"],
                    "ts_us": out["us"],
                    seq_col: out["seq"],
                    out_value: out["v"],
                }
            )

    return (
        unioned.groupBy("_k")
        .applyInPandasWithState(
            fn,
            out_schema,
            state_schema,
            "append",
            timeout_conf(ttl_ms, ttl_clock),
        )
    )
