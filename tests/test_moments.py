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


def test_time_decayed_sum_matches_hand_fold(spark):
    """Half-life recurrence on a hand-computed sequence: gaps of exactly
    one and two half-lives halve resp. quarter the accumulated mass;
    irregular spacing is the point (per-event EWMA can't express it)."""
    import datetime as dt

    from ralf_spark.operators.moments import time_decayed_sum

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("a", t0, 1, 8.0),
        ("a", t0 + dt.timedelta(hours=1), 2, 4.0),   # 1 half-life
        ("a", t0 + dt.timedelta(hours=3), 3, 1.0),   # 2 half-lives
        ("b", t0, 4, 5.0),
    ]
    df = spark.createDataFrame(
        rows, "k string, ts timestamp_ntz, seq long, value double"
    )
    out = {
        r.k: (r.n_events, r.decayed_sum)
        for r in time_decayed_sum(
            df, "k", "ts", "value", half_life_s=3600.0, tiebreak_col="seq"
        ).collect()
    }
    # a: s1=8; s2=4 + 0.5*8 = 8; s3=1 + 0.25*8 = 3
    assert out["a"][0] == 3 and abs(out["a"][1] - 3.0) < 1e-9
    assert out["b"] == (1, 5.0)
    with pytest.raises(ValueError):
        time_decayed_sum(df, "k", "ts", "value", half_life_s=0)
