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
cardinality; use the RocksDB state store at scale. Within a micro-batch,
rows are applied in ``order_cols`` order; across batches, in arrival
order — the same per-key FIFO contract as the reference and the other
stateful operators (``streaming/windows.py``). A replay whose batch
boundaries respect event order is therefore batching-invariant with the
batch operator (asserted in tests).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

#: per-key state: the last EMITTED value
CHANGE_STATE_SCHEMA = "last double"


def streaming_change_detection_filter(
    stream: DataFrame,
    value_col: str = "value",
    threshold: float = 10.0,
    key_col: str = "user_id",
    order_cols: Sequence[str] = ("ts", "event_id"),
    metric: str = "abs",
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
    """
    if metric not in ("abs", "rel"):
        raise ValueError(f"unknown metric {metric!r}")
    order_cols = list(order_cols)
    out_fields = [key_col, *order_cols, value_col]
    in_schema = {f.name: f.dataType.simpleString() for f in stream.schema}
    out_schema = ", ".join(f"{c} {in_schema[c]}" for c in out_fields)

    def fn(key, pdfs, state):
        import pandas as pd

        from ralf_spark.operators.policies import last_emitted_mask

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
        emitted = rows[keep]
        if len(emitted):
            yield emitted[out_fields]

    return (
        stream.select(*out_fields)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            out_schema,
            CHANGE_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
