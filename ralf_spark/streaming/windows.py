"""Stateful streaming count-based windows.

Spark has no native count-based window (its streaming windows are
event-time); the reference's core operator is a per-key row-count window
(``ralf/operators/window.py:14-51``). Streaming spelling: an
``applyInPandasWithState`` function holding the per-key row buffer in
``GroupState`` — exactly the reference's in-actor buffer, with
fault-tolerant state instead of actor memory.

(Spark 4's ``transformWithStateInPandas`` is the forward-path API for this
operator; its Python driver worker requires google.protobuf, which this
environment does not ship, so the engine uses the Arrow-only
``applyInPandasWithState`` channel — same semantics, same state contract.)

Within a micro-batch, rows are applied in ``order_col`` order; across
batches, in arrival order — the same contract as the reference (per-key
FIFO). A bounded single-batch replay therefore equals the batch
``tumbling_count_window`` on the same data (asserted in tests).

State size: buffer < window size values per key — far below state-store
pressure even at 10^8 keys; use the RocksDB state store at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

#: output schema of the streaming tumbling count window (agg form — a
#: payload form would carry an array column instead, same plumbing)
TUMBLING_OUTPUT_SCHEMA = (
    "user_id long, window_id long, w_sum double, w_avg double"
)

#: per-key state: next window id + the current partial window's values
TUMBLING_STATE_SCHEMA = "wid long, buf array<double>"


def streaming_tumbling_count_window(
    stream: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    order_col: str = "event_id",
    size: int = 5,
) -> DataFrame:
    """Per-key streaming tumbling count window (agg form): one output row
    per COMPLETED window of ``size`` values with (w_sum, w_avg); partial
    windows wait in state for more rows — the reference's emit-at-size +
    reset (``ralf/operators/window.py:44-51``). Streaming twin of
    ``operators.windows.tumbling_count_window``.
    """

    def fn(key, pdfs, state):
        import pandas as pd

        if state.exists:
            wid, buf = state.get[0], list(state.get[1])
        else:
            wid, buf = 0, []
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values(order_col, kind="mergesort")

        out = {"user_id": [], "window_id": [], "w_sum": [], "w_avg": []}
        for v in rows[value_col]:
            buf.append(float(v))
            if len(buf) == size:
                s = float(sum(buf))
                out["user_id"].append(key[0])
                out["window_id"].append(wid)
                out["w_sum"].append(s)
                out["w_avg"].append(s / size)
                wid += 1
                buf = []
        state.update((wid, buf))
        if out["user_id"]:
            yield pd.DataFrame(out)

    return (
        stream.select(key_col, value_col, order_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            TUMBLING_OUTPUT_SCHEMA,
            TUMBLING_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )

#: output schema of the streaming sliding count window (agg form)
SLIDING_OUTPUT_SCHEMA = "user_id long, pos long, w_sum double, w_avg double"

#: per-key state: rows seen + the rolling last-`size` values
SLIDING_STATE_SCHEMA = "n long, buf array<double>"


def streaming_sliding_count_window(
    stream: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    order_col: str = "event_id",
    size: int = 5,
    slide: int = 2,
) -> DataFrame:
    """Per-key streaming sliding count window (agg form): once the first
    full window exists, emit (w_sum, w_avg) over the last ``size`` values
    at every ``slide``-th row — the reference's emit-then-trim sequence
    (``ralf/operators/window.py:107-120``), including its slide clamp
    (``buf = buf[slide:]`` can only drop what is buffered, so the
    effective slide never exceeds the window — same contract as the batch
    ``sliding_count_window(clamp_slide=True)``, whose emit positions
    ``pos`` this operator reproduces exactly; asserted in tests).

    State is O(size) per key regardless of stream length."""
    slide_eff = min(slide, size)

    def fn(key, pdfs, state):
        import pandas as pd

        if state.exists:
            n, buf = state.get[0], list(state.get[1])
        else:
            n, buf = 0, []
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values(order_col, kind="mergesort")

        out = {"user_id": [], "pos": [], "w_sum": [], "w_avg": []}
        for v in rows[value_col]:
            n += 1
            buf.append(float(v))
            if len(buf) > size:
                buf.pop(0)
            if n >= size and (n - size) % slide_eff == 0:
                s = float(sum(buf))
                out["user_id"].append(key[0])
                out["pos"].append(n)
                out["w_sum"].append(s)
                out["w_avg"].append(s / size)
        state.update((n, buf))
        if out["user_id"]:
            yield pd.DataFrame(out)

    return (
        stream.select(key_col, value_col, order_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            SLIDING_OUTPUT_SCHEMA,
            SLIDING_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
