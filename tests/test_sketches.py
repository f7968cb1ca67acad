"""Semantic tests for the deterministic sketches — accuracy vs exact
counts (the oracle-parity suite already replays bit-determinism)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ralf_spark.operators.sketches import (
    hll_distinct,
    kmv_distinct,
    weighted_sample,
)
from ralf_spark.sources.fixtures import load_fixture

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events(spark):
    return load_fixture(spark, "events", SF_DIR).df


def test_kmv_exact_below_k(spark, events):
    """Groups with fewer than k distinct values are counted exactly."""
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    est = {
        r["event_type"]: r["est_distinct"]
        for r in kmv_distinct(
            events, ["event_type"], "user_id", k=1000
        ).collect()
    }
    assert est == exact


def test_kmv_estimation_accuracy(spark, events):
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.count_distinct("event_id").alias("n"))
        .collect()
    }
    est = {
        r["event_type"]: r["est_distinct"]
        for r in kmv_distinct(
            events, ["event_type"], "event_id", k=64
        ).collect()
    }
    for t, n in exact.items():
        assert abs(est[t] - n) / n < 0.5, (t, est[t], n)


def test_hll_estimation_accuracy(spark, events):
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.count_distinct("event_id").alias("n"))
        .collect()
    }
    est = {
        r["event_type"]: r["est_distinct"]
        for r in hll_distinct(events, ["event_type"], "event_id").collect()
    }
    # m=64 → relative error ~1.04/sqrt(64) = 13%; allow 4 sigma
    for t, n in exact.items():
        assert abs(est[t] - n) / n < 0.52, (t, est[t], n)


def test_weighted_sample_deterministic_and_biased(spark):
    docs = load_fixture(spark, "documents", SF_DIR).df.select(
        "doc_id", "n_chars"
    )
    s1 = weighted_sample(docs, "n_chars", 25, on="doc_id")
    s2 = weighted_sample(docs.repartition(7), "n_chars", 25, on="doc_id")
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    ids2 = sorted(r["doc_id"] for r in s2.collect())
    assert ids1 == ids2  # partitioning-independent
    assert len(ids1) == 25
    # weight-proportional: the sample should skew long
    avg_all = docs.agg(F.avg("n_chars")).first()[0]
    avg_sample = s1.agg(F.avg("n_chars")).first()[0]
    assert avg_sample > avg_all
