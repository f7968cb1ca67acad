"""Physical-plan inspection helpers.

Used by tests to assert scale properties — filters pushed to the parquet
scan, dimension joins broadcast, scans column-pruned — instead of hoping.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def pushed_filters(df: DataFrame) -> list[str]:
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_str(df)):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names in each scan's ReadSchema (column-pruning check)."""
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", explain_str(df)):
        cols.extend(p.split(":")[0].strip() for p in m.group(1).split(",") if p)
    return cols


def has_runtime_bloom_filter(df: DataFrame) -> bool:
    """True if Catalyst injected a runtime bloom filter (a
    ``might_contain(...)`` pre-shuffle prune of the fact side from the
    filtered build side — ``spark.sql.optimizer.runtime.bloomFilter.*``).
    At 100 TB this is the difference between shuffling every fact row and
    shuffling only rows that can possibly join: the app-side scan
    threshold (default 10 GB) engages it automatically at scale; tests
    lower the threshold to prove the plan shape locally."""
    return "might_contain" in explain_str(df)
