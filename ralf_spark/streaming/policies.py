"""Stateful streaming execution policies.

The reference enforces its load-shedding policies at enqueue time against
the key's CURRENT state (``ralf/operator.py:199-208``): a shed record never
updates state, so each candidate compares against the last value actually
emitted (``make_mean_policy``, ``ralf/policies/load_shedding_policy.py:
41-49``). That is inherently per-key sequential-with-state — in batch the
engine spells it as an ``applyInPandas`` scan
(``operators.policies.change_detection_filter(semantics="last_emitted")``);
here the SAME semantics run as a true streaming operator: the last-emitted
value lives in fault-tolerant ``GroupState`` instead of actor memory, so
the policy holds across micro-batches and restarts.

State is one double per key — far below state-store pressure at any key
cardinality; use the RocksDB state store at scale, and ``idle_ttl``
to bound state by ACTIVE keys when the key domain itself is unbounded
(session ids, request ids). Within a micro-batch, rows are applied in
``order_cols`` order; across batches, in arrival order — the same per-key
FIFO contract as the reference and the other stateful operators
(``streaming/windows.py``). A replay whose batch boundaries respect event
order is therefore batching-invariant with the batch operator (asserted
in tests).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

#: per-key state: the last EMITTED value
CHANGE_STATE_SCHEMA = "last double"


def check_ttl_args(idle_ttl_minutes, ttl_clock) -> int | None:
    """Validate the shared idle-TTL knobs; return the TTL in ms (None =
    disabled). Shared by every TTL-capable stateful operator (change
    detection, count windows, as-of join)."""
    if idle_ttl_minutes is not None and idle_ttl_minutes <= 0:
        raise ValueError("idle_ttl_minutes must be positive")
    if ttl_clock not in ("processing", "event"):
        raise ValueError(f"unknown ttl_clock {ttl_clock!r}")
    return (
        int(idle_ttl_minutes * 60_000)
        if idle_ttl_minutes is not None
        else None
    )


def timeout_conf(ttl_ms, ttl_clock):
    """GroupStateTimeout for the shared TTL knobs."""
    if ttl_ms is None:
        return GroupStateTimeout.NoTimeout
    if ttl_clock == "event":
        return GroupStateTimeout.EventTimeTimeout
    return GroupStateTimeout.ProcessingTimeTimeout


def arm_event_timer(state, last_ev_ms: int, idle_ttl_ms: int) -> None:
    """Arm an event-time idle timer at ``last_ev_ms + idle_ttl_ms``,
    clamped to just past the current watermark.

    The clamp matters for late-but-valid data: an event older than
    ``watermark - TTL`` (still inside the allowed watermark delay — Spark
    does NOT drop late rows for apply-with-state; handling them is the
    function's job) would put the timer below the watermark, and
    ``GroupState.setTimeoutTimestamp`` raises on that, killing the whole
    query. The key WAS just touched, so the earliest legal eviction point
    (watermark + 1 ms) is the correct rearm."""
    wm_ms = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(max(last_ev_ms + idle_ttl_ms, wm_ms + 1))


def make_change_detection_fn(
    value_col: str,
    threshold: float,
    order_cols: Sequence[str],
    metric: str,
    out_fields: Sequence[str],
    idle_ttl_ms: int | None = None,
    ttl_clock: str = "processing",
):
    """The ``applyInPandasWithState`` callback behind
    :func:`streaming_change_detection_filter`, exposed module-level so the
    timeout branch is deterministically unit-testable (a real
    processing-time timeout needs wall-clock across triggers).

    ``ttl_clock="event"`` arms an EVENT-time timer instead: the timeout
    timestamp is the key's max event time in the batch plus the TTL, so
    eviction fires when the WATERMARK passes it — fully deterministic
    given the data (and the mode that works in bounded replays)."""
    order_cols = list(order_cols)
    out_fields = list(out_fields)

    def fn(key, pdfs, state):
        import pandas as pd

        from ralf_spark.operators.policies import last_emitted_mask

        if state.hasTimedOut:
            # idle-key eviction: drop the baseline; the key's NEXT update
            # re-enters as a first update (emits). Nothing to output.
            state.remove()
            return
        last = float(state.get[0]) if state.exists else None
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values(order_cols, kind="mergesort")
        # numpy-stepped scan shared with the batch operator — identical
        # recurrence, the stored baseline seeds it across micro-batches
        keep, last = last_emitted_mask(
            rows[value_col].to_numpy(dtype="float64"),
            threshold, metric, last,
        )
        if last is not None:
            state.update((last,))
            if idle_ttl_ms is not None:
                # rearmed on every batch that touches the key, so only
                # keys idle for a full TTL get evicted
                if ttl_clock == "event":
                    last_ev_ms = int(
                        pd.Timestamp(rows[order_cols[0]].max()).value
                        // 1_000_000
                    )
                    arm_event_timer(state, last_ev_ms, idle_ttl_ms)
                else:
                    state.setTimeoutDuration(idle_ttl_ms)
        emitted = rows[keep]
        if len(emitted):
            yield emitted[out_fields]

    return fn


def streaming_change_detection_filter(
    stream: DataFrame,
    value_col: str = "value",
    threshold: float = 10.0,
    key_col: str = "user_id",
    order_cols: Sequence[str] = ("ts", "event_id"),
    metric: str = "abs",
    idle_ttl_minutes: float | None = None,
    ttl_clock: str = "processing",
) -> DataFrame:
    """Emit a key's update only when it moved >= ``threshold`` vs the last
    value EMITTED for that key (first update always emits) — the faithful
    reference semantics, streaming. Shed records never touch state.

    ``metric``: ``"abs"`` → ``|v - last|``; ``"rel"`` → ``|v - last| /
    |last|`` (the reference mean-policy ratio). A zero last-emitted
    baseline emits on ANY change (and sheds an exact repeat of zero) —
    the engine-wide zero-baseline convention, matching the batch
    ``change_detection_filter``; the reference divides unguarded and
    crashes (``ralf/policies/load_shedding_policy.py:46``). Output:
    (key, *order_cols, value) of emitted rows, append mode.

    ``idle_ttl_minutes`` bounds state by ACTIVE keys — the unbounded-
    key-domain deployment (session/request ids): a key untouched for a
    full TTL has its baseline evicted via state timeout, and its next
    update re-enters as a first update (emits). This trades a bounded
    state store for one extra emission per key per idle gap — the same
    approximation every TTL'd cache makes; leave None for bounded key
    domains (the default keeps exact reference semantics forever).
    ``ttl_clock`` picks the eviction clock:

    - ``"processing"`` (default): wall-clock idleness, re-armed per
      touching batch. CONTINUOUS-TRIGGER ONLY — with
      ``trigger(availableNow=True)`` a registered processing-time timer
      keeps the run scheduling timer-check micro-batches instead of
      terminating (observed on Spark 4.1; ``run_bounded`` refuses the
      combination), and eviction is meaningless in a drain-and-stop run
      anyway.
    - ``"event"``: EVENT-time idleness — eviction fires when the stream's
      WATERMARK passes the key's last event time + TTL. Fully
      deterministic given the data, and valid in bounded replays. The
      input stream must carry ``withWatermark`` on the first order
      column (Spark rejects event-time timers on unwatermarked streams).
    """
    if metric not in ("abs", "rel"):
        raise ValueError(f"unknown metric {metric!r}")
    if idle_ttl_minutes is not None and idle_ttl_minutes <= 0:
        raise ValueError("idle_ttl_minutes must be positive")
    if ttl_clock not in ("processing", "event"):
        raise ValueError(f"unknown ttl_clock {ttl_clock!r}")
    order_cols = list(order_cols)
    out_fields = [key_col, *order_cols, value_col]
    in_schema = {f.name: f.dataType.simpleString() for f in stream.schema}
    out_schema = ", ".join(f"{c} {in_schema[c]}" for c in out_fields)
    ttl_ms = (
        int(idle_ttl_minutes * 60_000)
        if idle_ttl_minutes is not None
        else None
    )
    fn = make_change_detection_fn(
        value_col, threshold, order_cols, metric, out_fields, ttl_ms,
        ttl_clock,
    )
    if ttl_ms is None:
        timeout = GroupStateTimeout.NoTimeout
    elif ttl_clock == "event":
        timeout = GroupStateTimeout.EventTimeTimeout
    else:
        timeout = GroupStateTimeout.ProcessingTimeTimeout
    out = (
        stream.select(*out_fields)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            out_schema,
            CHANGE_STATE_SCHEMA,
            "append",
            timeout,
        )
    )
    if ttl_ms is not None and ttl_clock == "processing":
        # best-effort marker so run_bounded can REFUSE the combination
        # (availableNow + a processing-time timer = permanent hang, see
        # the docstring) instead of blocking forever in awaitTermination
        out._ralf_processing_time_timeout = True  # type: ignore[attr-defined]
    return out
