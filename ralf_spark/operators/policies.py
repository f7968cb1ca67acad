"""Load-shedding / maintenance policies, recast as deterministic queries.

The reference drops or defers updates at enqueue time by comparing a
candidate record against the key's current state
(``ralf/operator.py:199-208``, ``ralf/policies/load_shedding_policy.py``).
Timing-dependent semantics don't transfer to batch; per SURVEY.md §2.2
P3-P5 each policy becomes a deterministic query:

- sampling shed  (``make_sampling_policy``, ``load_shedding_policy.py:53-57``)
- keep-latest    (``newer_processing_time`` / ``later_complete_time``,
                  ``load_shedding_policy.py:6-11,60-61``)
- change detection (``make_mean_policy`` / ``make_cosine_policy``,
                  ``load_shedding_policy.py:14-50``)
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from ralf_spark.functions.hashing import stable_hash64
from ralf_spark.table import FeatureTable


def sampling_shed(
    table: FeatureTable, rate: float, on: str | Column | None = None
) -> FeatureTable:
    """Drop records with probability ``1 - rate``
    (``load_shedding_policy.py:53-57`` uses ``random.random() < rate``).

    Deterministic re-spec: content-hash sampling — keep a row iff
    ``stable_hash64(on) % 10_000 < rate * 10_000``. Same sample on every
    run and on every engine (the hash is md5-based, reproducible in SQL),
    unlike seeded ``rand()`` whose stream is partitioning-dependent.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    col = on if on is not None else (table.seq or table.key)
    if col is None:
        raise ValueError("sampling_shed needs a column to hash")
    if isinstance(col, str):
        col = F.col(col)
    bucket = stable_hash64(col.cast("string")) % 10_000
    return table.filter(bucket < int(rate * 10_000))


def keep_latest(table: FeatureTable) -> FeatureTable:
    """Process-only-newer policy in batch = keep the latest record per key
    (``newer_processing_time``, ``load_shedding_policy.py:6-7``; enforcement
    vs current state ``ralf/operator.py:199-208``)."""
    return table.latest()


def change_detection_filter(
    table: FeatureTable,
    value: Column | str,
    threshold: float,
    metric: str = "abs",
) -> FeatureTable:
    """Approximate-maintenance filter: emit a key's update only when the
    feature moved more than ``threshold`` since the last *emitted* value —
    the batch spelling of ``make_mean_policy`` (emit iff
    ``|new_mean - old_mean| >= thresh``, ``load_shedding_policy.py:14-22``).

    Exact sequential semantics ("last emitted", not "previous row") need a
    per-key scan: rows of one key are processed together via a rows-frame
    comparison against the previous row's value — the reference's policies
    also compare candidate vs most-recent state, which IS the previous
    update in arrival order (``ralf/operator.py:199-208``), so previous-row
    is the faithful batch equivalent. One shuffle on the key.
    """
    if table.key is None:
        raise ValueError("change_detection_filter requires a keyed table")
    v = F.col(value) if isinstance(value, str) else value
    w = Window.partitionBy(table.key).orderBy(*table.order_cols())
    prev = F.lag(v).over(w)
    if metric == "abs":
        delta = F.abs(v - prev)
    elif metric == "rel":
        delta = F.abs(v - prev) / F.abs(prev)
    else:
        raise ValueError(f"unknown metric {metric!r}")
    keep = prev.isNull() | (delta >= threshold)
    return table._with(
        table.df.withColumn("_keep", keep).where("_keep").drop("_keep")
    )
