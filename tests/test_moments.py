"""Incremental moment maintenance: merged summaries must equal a full
recompute, across arbitrary batch splits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ralf_spark.operators.moments import (
    batch_moments,
    merge_moments,
    moments_stats,
)
from ralf_spark.sources.fixtures import load_fixture

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events(spark):
    return load_fixture(spark, "events", SF_DIR).df


def _full(spark, events):
    return {
        r.user_id: (r.n, r.mean, r.var)
        for r in events.groupBy("user_id")
        .agg(
            F.count("value").alias("n"),
            F.avg("value").alias("mean"),
            F.var_pop("value").alias("var"),
        )
        .collect()
    }


def test_incremental_merge_equals_full_recompute(spark, events):
    cutoff = F.lit("2024-01-16 00:00:00").cast("timestamp")
    state = batch_moments(
        events.where(F.col("ts") < cutoff), "user_id", "value"
    )
    merged = merge_moments(
        state,
        batch_moments(
            events.where(F.col("ts") >= cutoff), "user_id", "value"
        ),
        "user_id",
    )
    got = {
        r.user_id: (r.n, r.mean, r.var_pop)
        for r in moments_stats(merged, "user_id").collect()
    }
    want = _full(spark, events)
    assert set(got) == set(want)
    for k, (n, mean, var) in want.items():
        gn, gmean, gvar = got[k]
        assert gn == n
        assert abs(gmean - mean) < 1e-9
        assert abs(gvar - var) < 1e-9


def test_merge_handles_one_sided_keys(spark):
    a = spark.createDataFrame(
        [("x", 1.0), ("x", 3.0)], "k string, v double"
    )
    b = spark.createDataFrame([("y", 10.0)], "k string, v double")
    merged = merge_moments(
        batch_moments(a, "k", "v"), batch_moments(b, "k", "v"), "k"
    )
    got = {
        r.k: (r.n, r.mean, r.var_pop)
        for r in moments_stats(merged, "k").collect()
    }
    assert got["x"] == (2, 2.0, 1.0)
    assert got["y"] == (1, 10.0, 0.0)


def test_three_way_incremental_chain(spark, events):
    """state ⊎ b1 ⊎ b2 across three arbitrary slices = full recompute."""
    parts = events.randomSplit([0.3, 0.3, 0.4], seed=7)
    state = batch_moments(parts[0], "user_id", "value")
    for p in parts[1:]:
        state = merge_moments(state, batch_moments(p, "user_id", "value"), "user_id")
    got = {
        r.user_id: (r.n, r.mean, r.var_pop)
        for r in moments_stats(state, "user_id").collect()
    }
    want = _full(spark, events)
    for k, (n, mean, var) in want.items():
        gn, gmean, gvar = got[k]
        assert gn == n
        assert abs(gmean - mean) < 1e-9
        assert abs(gvar - var) < 1e-9
