"""Synthetic sources (reference's FakeReader / CounterSource).

- ``counter_source(n)``: ids 1..n, key ``str(id % 10)``, value = id —
  the exact-value e2e contract source (``ralf/tests/test_e2e.py:17-34``,
  ``ralf/v2/tests/test_api.py:18-33``); built on ``spark.range`` so it
  parallelizes without data movement.
- ``fake_events(num_keys, timesteps)``: value=1 per key per tick —
  ``FakeReader`` (``ralf/operators/source.py:90-135``); the rate/pacing knob
  is a streaming concern (see ralf_spark.streaming.rate_events).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ralf_spark.table import FeatureTable


def counter_source(spark: SparkSession, n: int) -> FeatureTable:
    df = (
        spark.range(1, n + 1)
        .select(
            F.col("id"),
            (F.col("id") % 10).cast("string").alias("key"),
            F.col("id").alias("value"),
        )
    )
    return FeatureTable(df, key="key", seq="id")


def fake_events(
    spark: SparkSession, num_keys: int, timesteps: int
) -> FeatureTable:
    df = (
        spark.range(num_keys * timesteps)
        .select(
            F.col("id").alias("seq"),
            (F.col("id") % num_keys).cast("string").alias("key"),
            F.lit(1).alias("value"),
            (F.col("id") / num_keys).cast("long").alias("timestep"),
        )
    )
    return FeatureTable(df, key="key", seq="seq")
