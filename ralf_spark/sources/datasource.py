"""The reference's synthetic source as a Spark Python DataSource plugin.

The reference exposes sources as plugin classes with a ``next()`` pull
loop (``ralf/operators/source.py:90-135`` FakeReader; registered into the
pipeline by name). Spark 4's Python DataSource API is the idiomatic
counterpart: a named, schema'd, *partitioned* source usable from both
``spark.read`` and ``spark.readStream`` — so the engine's synthetic
source is a real connector, not a helper function.

    spark.dataSource.register(FakeEventsDataSource)
    spark.read.format("fake_events")
         .option("num_keys", 8).option("timesteps", 100).load()
    spark.readStream.format("fake_events")
         .option("num_keys", 8).option("rows_per_batch", 64).load()

Scale shape: batch generation is split into one InputPartition per key
chunk (parallel, no driver materialization, no data movement); EqualTo
filters on ``key`` are accepted via ``pushFilters`` so filtered reads
skip whole partitions at generation time. The streaming reader is a
``SimpleDataSourceStreamReader`` whose offset is the global row sequence
— replayable micro-batches (same rows for the same offset range, the
exactly-once contract the reference's actor source cannot give).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

SCHEMA = "seq bigint, key string, value int, timestep bigint"


def _row(seq: int, num_keys: int) -> tuple[int, str, int, int]:
    # FakeReader contract: value=1 per key per tick, keys round-robin
    return (seq, str(seq % num_keys), 1, seq // num_keys)


@dataclass
class _KeyChunk(InputPartition):
    keys: tuple[int, ...]
    num_keys: int
    timesteps: int


class FakeEventsReader(DataSourceReader):
    def __init__(self, options):
        self.num_keys = int(options.get("num_keys", 10))
        self.timesteps = int(options.get("timesteps", 100))
        self.chunks = int(options.get("num_partitions", 4))
        self.wanted_keys: set[int] | None = None

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("key",):
                try:
                    k = int(f.value)
                except (TypeError, ValueError):
                    yield f
                    continue
                self.wanted_keys = {k} if self.wanted_keys is None else (
                    self.wanted_keys & {k}
                )
            else:
                yield f  # unsupported → Spark re-applies it

    def partitions(self) -> Sequence[InputPartition]:
        keys = range(self.num_keys)
        if self.wanted_keys is not None:
            keys = [k for k in keys if k in self.wanted_keys]
        chunk = max(1, -(-len(list(keys)) // self.chunks))
        keys = list(keys)
        return [
            _KeyChunk(tuple(keys[i : i + chunk]), self.num_keys, self.timesteps)
            for i in range(0, len(keys), chunk)
        ] or [_KeyChunk((), self.num_keys, self.timesteps)]

    def read(self, partition: _KeyChunk):
        for t in range(partition.timesteps):
            base = t * partition.num_keys
            for k in partition.keys:
                yield _row(base + k, partition.num_keys)


class FakeEventsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.num_keys = int(options.get("num_keys", 10))
        self.rows_per_batch = int(options.get("rows_per_batch", 32))

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def read(self, start: dict):
        lo = start["seq"]
        hi = lo + self.rows_per_batch
        # a LIST, not a generator: Spark's prefetch cache copy.copy()s the
        # returned iterator when planning partitions (generators can't be
        # copied/pickled); rows_per_batch bounds the materialization.
        rows = [_row(s, self.num_keys) for s in range(lo, hi)]
        return rows, {"seq": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay — same offsets, same rows (exactly-once)
        return (_row(s, self.num_keys) for s in range(start["seq"], end["seq"]))


class FakeEventsDataSource(DataSource):
    """``fake_events`` — the reference FakeReader as a named connector."""

    @classmethod
    def name(cls) -> str:
        return "fake_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema: StructType) -> FakeEventsReader:
        return FakeEventsReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> FakeEventsStreamReader:
        return FakeEventsStreamReader(self.options)
