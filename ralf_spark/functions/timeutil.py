"""Timestamp-type-polymorphic epoch helpers.

The driver's fixture parquet stores event time as
``TIMESTAMP(MICROS, isAdjustedToUTC=false)``, which Spark reads as
``TIMESTAMP_NTZ`` — a type ``unix_micros`` and friends reject
(``DATATYPE_MISMATCH.UNEXPECTED_INPUT_TYPE``, the round-3 driver failure
on ``trailing_10min_count``). Older fixture generations stored
``TIMESTAMP(NANOS)`` which (under ``nanosAsLong``) reads as epoch-ns
bigint instead. Every operator that needs integer event-time arithmetic
goes through these helpers so the same plan works on NTZ, LTZ, or raw
epoch columns.

Epoch math on NTZ uses ``timestamp_diff``/``timestamp_add`` against the
epoch literal — pure integer arithmetic, no session timezone involved
(an LTZ↔NTZ *cast* would go through the session zone and shift under a
non-UTC harness). Treating the naive value as UTC wall clock is exactly
DuckDB's ``epoch_us`` semantics on naive timestamps, so oracles replay
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_EPOCH_NTZ_SQL = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def epoch_us_expr(expr: Column, dtype: str) -> Column:
    """Epoch microseconds of an arbitrary Column with known dtype.

    - ``timestamp_ntz`` → ``timestamp_diff(MICROSECOND, epoch, col)``;
    - ``bigint`` → assumed to already be epoch micros (pass-through);
    - anything else (LTZ timestamp) → ``unix_micros``.
    """
    if dtype == "timestamp_ntz":
        return F.timestamp_diff("MICROSECOND", F.expr(_EPOCH_NTZ_SQL), expr)
    if dtype == "bigint":
        return expr
    return F.unix_micros(expr)


def epoch_us(df: DataFrame, col: str) -> Column:
    """Epoch microseconds of ``df[col]`` regardless of timestamp type."""
    return epoch_us_expr(F.col(col), dict(df.dtypes).get(col, ""))


def ntz_from_epoch_us(col: Column) -> Column:
    """TIMESTAMP_NTZ from epoch microseconds — integer arithmetic only
    (``timestamp_add`` against the epoch literal), session-tz-free."""
    return F.timestamp_add("MICROSECOND", col, F.expr(_EPOCH_NTZ_SQL))
