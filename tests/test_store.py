"""FeatureStore surface tests: CSV source (S4 batch), registry +
point/bulk query, SQL entry, and observe() counters (A4/X10)."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F
from pyspark.sql import Observation

from ralf_spark.store import FeatureStore
from ralf_spark.table import FeatureTable


def test_read_csv_roundtrip(spark, tmp_path):
    path = str(tmp_path / "in_csv")
    spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, k string, v double"
    ).write.option("header", True).mode("overwrite").csv(path)
    store = FeatureStore(spark)
    t = store.read_csv(path, key="k")
    got = {r.k: (r.id, r.v) for r in t.df.collect()}
    assert got == {"a": (1, 1.5), "b": (2, 2.5)}


def test_csv_streaming_replay(spark, tmp_path):
    """S4's streaming half: the same CSV replayed as a bounded stream."""
    from ralf_spark.streaming import file_events, run_bounded, write_memory

    path = str(tmp_path / "in_csv_s")
    spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(30)],
        "event_id long, user_id long, value double",
    ).write.option("header", True).mode("overwrite").csv(path)
    stream = file_events(
        spark, path, schema="event_id long, user_id long, value double",
        fmt="csv",
    )
    run_bounded(
        write_memory(stream, "csv_replay"),
        checkpoint=str(tmp_path / "ck_csv"),
    )
    # exactly the 30 data rows — the header line must NOT appear as a row
    assert spark.table("csv_replay").count() == 30
    assert spark.table("csv_replay").where(F.col("event_id").isNull()).count() == 0


def test_register_point_and_bulk(spark):
    store = FeatureStore(spark)
    t = FeatureTable(
        spark.createDataFrame(
            [(1, 1, 1.0), (1, 2, 9.0), (2, 1, 5.0)], "k long, seq long, v double"
        ),
        key="k", seq="seq",
    )
    store.register("feat", t)
    [row] = store.point_query("feat", 1)
    assert row.v == 9.0
    bulk = store.bulk_query("feat")
    assert hasattr(bulk, "collect")
    assert len(store.bulk_query("feat", collect=True)) == 2
    # registered name also usable from SQL
    assert store.sql("SELECT count(*) AS n FROM feat").df.collect()[0].n == 3


def test_observed_counters(spark):
    t = FeatureTable(
        spark.createDataFrame([(1, 1.0), (2, 2.0), (2, 3.0)], "k long, v double"),
        key="k",
    )
    obs = Observation("state")
    t.observed(
        obs,
        F.count(F.lit(1)).alias("num_records"),
        # DISTINCT aggregates are not allowed in observed metrics; the
        # sketch version is the metrics-safe spelling.
        F.approx_count_distinct("k").alias("num_keys"),
    ).collect()
    assert obs.get["num_records"] == 3
    assert obs.get["num_keys"] == 2


@pytest.mark.slow
def test_metrics_to_parquet_merges_observations(spark, tmp_path):
    """X10 closure: observation counters land in one long-format parquet
    metrics table with label columns, accumulating across runs — the
    reference's sqlite->parquet merge (ralf/v2/utils.py:36-69) as a call."""
    from ralf_spark.metrics import metrics_to_parquet

    path = str(tmp_path / "metrics")

    def run(tag):
        t = FeatureTable(
            spark.createDataFrame(
                [(1, 1.0), (2, 2.0), (2, 3.0)], "k long, v double"
            ),
            key="k",
        )
        obs = Observation()
        t.observed(obs, F.count(F.lit(1)).alias("num_records")).collect()
        metrics_to_parquet(
            spark, {"state": obs}, path, labels={"run_id": tag}
        )

    run("r1")
    run("r2")
    got = spark.read.parquet(path)
    assert set(got.columns) == {"observation", "metric", "value", "run_id"}
    rows = {(r.run_id, r.observation, r.metric, r.value) for r in got.collect()}
    assert rows == {
        ("r1", "state", "num_records", 3.0),
        ("r2", "state", "num_records", 3.0),
    }
    # non-numeric metrics are rejected, not silently stringified
    import pytest

    from ralf_spark.metrics import metrics_rows

    t = FeatureTable(
        spark.createDataFrame([(1, "a")], "k long, s string"), key="k"
    )
    obs = Observation()
    t.observed(obs, F.max("s").alias("max_s")).collect()
    with pytest.raises(TypeError, match="max_s"):
        metrics_rows({"state": obs})


def test_read_jsonl_with_schema_and_corrupt_records(spark, tmp_path):
    from ralf_spark.store import FeatureStore

    path = str(tmp_path / "events.jsonl")
    with open(path, "w") as f:
        f.write('{"k": "a", "v": 1.5}\n')
        f.write('{"k": "b", "v": 2.5}\n')
        f.write("not json at all\n")
    store = FeatureStore(spark)
    t = store.read_jsonl(
        path, schema="k string, v double, _corrupt_record string", key="k"
    )
    rows = {r.k: r.v for r in t.df.where("_corrupt_record IS NULL").collect()}
    assert rows == {"a": 1.5, "b": 2.5}
    bad = t.df.where("_corrupt_record IS NOT NULL").collect()
    assert len(bad) == 1 and "not json" in bad[0]._corrupt_record


def test_deploy_run_and_load_state_roundtrip(spark, tmp_path):
    """Reference deploy/run parity: deploy two tables (one derived) with
    connectors, run() materializes both states, load_state serves them
    back without recomputing lineage."""
    from ralf_spark.connectors import MemoryConnector, ParquetStateConnector
    from ralf_spark.store import FeatureStore
    from ralf_spark.table import FeatureTable

    store = FeatureStore(spark)
    events = FeatureTable(
        spark.createDataFrame(
            [(1, 1, 10.0), (1, 2, 20.0), (2, 1, 5.0)],
            "user_id long, seq long, value double",
        ),
        key="user_id", seq="seq",
    )
    totals = events.transform(
        lambda df: df.groupBy("user_id").sum("value")
    )
    store.deploy("events", events,
                 ParquetStateConnector(str(tmp_path / "ev"), key="user_id"))
    store.deploy("totals", FeatureTable(totals.df, key="user_id"),
                 MemoryConnector("totals_state", key="user_id"))
    store.run()

    ev_state = store.load_state("events")
    assert {r.user_id: r.value for r in ev_state.df.collect()} == {
        1: 20.0, 2: 5.0  # latest-per-key upsert semantics
    }
    tot = store.load_state("totals")
    assert {r[0]: r[1] for r in tot.df.collect()} == {1: 30.0, 2: 5.0}
