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
