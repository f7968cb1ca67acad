"""Metrics export — the X10 analog of the reference's metric merge.

The reference's v2 engine writes per-operator event metrics into sqlite
files and ships a merge script that dumps them all into one parquet with
the ``labels_json`` blob flattened into real columns
(``ralf/v2/utils.py:36-69``). The Spark engine's counters ride along with
jobs as ``Observation`` aggregates (``FeatureTable.observed`` — no second
scan); this module lands them in the same queryable long-format parquet
table: one row per (observation, metric) with label columns alongside.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import SparkSession
from pyspark.sql.observation import Observation


def metrics_rows(
    observations: Mapping[str, Observation],
    labels: Mapping[str, str] | None = None,
) -> list[tuple]:
    """Flatten finished observations to (observation, metric, value,
    *label_values) rows. ``Observation.get`` blocks until the observed
    action ran, so call this after the job. Non-numeric metric values are
    rejected — the metric table is a numeric counter store, like the
    reference's."""
    rows = []
    label_vals = tuple((labels or {}).values())
    for name, obs in observations.items():
        for metric, value in obs.get.items():
            if value is not None and not isinstance(value, (int, float)):
                raise TypeError(
                    f"metric {name}.{metric} is {type(value).__name__}; "
                    "only numeric observation metrics are exportable"
                )
            rows.append(
                (name, metric, None if value is None else float(value))
                + label_vals
            )
    return rows


def metrics_to_parquet(
    spark: SparkSession,
    observations: Mapping[str, Observation],
    path: str,
    labels: Mapping[str, str] | None = None,
) -> None:
    """Append finished observation metrics to the parquet metrics table at
    ``path`` — the reference's sqlite→parquet merge collapsed to one call
    (labels become real columns, as its ``labels_json`` flatten does).
    Append mode so successive runs/operators accumulate into one dataset,
    which is exactly what the reference's ``for path in *.db`` merge loop
    reconstructs after the fact."""
    schema = "observation string, metric string, value double"
    for label in labels or {}:
        schema += f", {label} string"
    rows = metrics_rows(observations, labels)
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "append"
    ).parquet(path)
