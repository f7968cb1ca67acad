"""Spark Python DataSource plugin for the reference's FakeReader."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from ralf_spark.sources.datasource import (
    FakeEventsDataSource,
    FakeEventsReader,
    FakeEventsStreamReader,
)
from ralf_spark.sources.synthetic import fake_events


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(FakeEventsDataSource)
    # required for pushFilters on Python data sources (runtime-settable)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")


def test_batch_read_matches_helper(spark):
    df = (
        spark.read.format("fake_events")
        .option("num_keys", 7)
        .option("timesteps", 13)
        .load()
    )
    got = sorted(tuple(r) for r in df.collect())
    want = sorted(
        (r.seq, r.key, r.value, r.timestep)
        for r in fake_events(spark, 7, 13).df.collect()
    )
    assert got == want
    assert df.rdd.getNumPartitions() == 4  # default num_partitions


def test_key_filter_pushdown_prunes_partitions(spark):
    rdr = FakeEventsReader(
        {"num_keys": "8", "timesteps": "10", "num_partitions": "4"}
    )
    from pyspark.sql.datasource import EqualTo, GreaterThan

    leftover = list(
        rdr.pushFilters([EqualTo(("key",), "3"), GreaterThan(("seq",), 5)])
    )
    # key filter absorbed, seq filter handed back to Spark
    assert len(leftover) == 1 and isinstance(leftover[0], GreaterThan)
    parts = rdr.partitions()
    assert len(parts) == 1 and parts[0].keys == (3,)

    df = (
        spark.read.format("fake_events")
        .option("num_keys", 8)
        .option("timesteps", 10)
        .load()
        .where(F.col("key") == "3")
    )
    rows = df.collect()
    assert len(rows) == 10 and all(r.key == "3" for r in rows)


def test_stream_reader_offsets_replayable(spark):
    rdr = FakeEventsStreamReader({"num_keys": "4", "rows_per_batch": "8"})
    start = rdr.initialOffset()
    it, nxt = rdr.read(start)
    first = list(it)
    assert len(first) == 8 and nxt == {"seq": 8}
    # deterministic replay between offsets (exactly-once contract)
    assert list(rdr.readBetweenOffsets(start, nxt)) == first
    it2, nxt2 = rdr.read(nxt)
    assert [r[0] for r in it2] == list(range(8, 16)) and nxt2 == {"seq": 16}


def test_stream_source_end_to_end(spark, tmp_path):
    stream = (
        spark.readStream.format("fake_events")
        .option("num_keys", 4)
        .option("rows_per_batch", 16)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("fake_stream")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table("fake_stream").count() >= 16:
                break
            time.sleep(0.5)
        rows = spark.table("fake_stream").orderBy("seq").collect()
        assert len(rows) >= 16
        assert [r.seq for r in rows[:4]] == [0, 1, 2, 3]
        assert rows[5].key == str(rows[5].seq % 4)
        assert rows[5].timestep == rows[5].seq // 4
    finally:
        q.stop()
