"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real registry lives in ``ralf_spark/queries.py``; this module is a
thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ralf_spark.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    return QUERIES["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/query from SURVEY.md §2.

    Asserts the driver-checked prefix ordering actually applied —
    ``finalize_registry`` skips silently on a partially-imported
    registry (circular-entry tolerance), so a typo'd prefix name would
    otherwise reorder the driver's 50-query gate without any error on
    THIS path (VERDICT r6 wrong #4: the protection now lives where the
    driver reads, not only in the test suite)."""
    from ralf_spark.queries import DRIVER_CHECKED_FIRST

    names = list(QUERIES)
    if names[: len(DRIVER_CHECKED_FIRST)] != DRIVER_CHECKED_FIRST:
        missing = [n for n in DRIVER_CHECKED_FIRST if n not in QUERIES]
        raise RuntimeError(
            "driver-checked prefix not applied to the registry "
            f"(names missing from QUERIES: {missing})"
        )
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (omitted for
    non-SQL-expressible ops → driver records a rows-only check)."""
    return {
        name: q.oracle for name, q in QUERIES.items() if q.oracle is not None
    }
