"""Structured Streaming sources — the reference's source operators, Spark-shaped.

Reference surface (SURVEY.md §2.1): the v1/v2 engines pump records from
synthetic generators (``ralf/operators/source.py:90-135``), CSV replay
(``:138-198``), Kafka (``:55-87``) and Kinesis (``ralf/v2/kinesis_source.py:
9-162``). Here each becomes a ``readStream`` returning an events-shaped
streaming DataFrame; termination (the reference's ``StopIteration``) is the
streaming runtime's job — bounded runs use ``trigger(availableNow=True)``
(see ``ralf_spark.streaming.sinks.run_bounded``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: The canonical keyed-event stream schema (mirrors the events fixture and
#: the reference source schema ``(key, value, timestamp, ...)``,
#: ``ralf/operators/source.py:61-70``).
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def rate_events(
    spark: SparkSession,
    rows_per_batch: int = 100,
    num_keys: int = 10,
) -> DataFrame:
    """Synthetic keyed event stream — the ``FakeReader`` analog
    (``ralf/operators/source.py:90-135``: emit a value per key per tick).

    Built on ``rate-micro-batch`` so each micro-batch carries exactly
    ``rows_per_batch`` rows — deterministic batch sizes for tests and
    benchmarks (a plain ``rate`` source is wall-clock dependent).
    """
    raw = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .load()
    )
    return raw.select(
        F.col("value").alias("event_id"),
        F.col("timestamp").alias("ts"),
        (F.col("value") % num_keys).alias("user_id"),
        (F.col("value") % 97).cast("double").alias("value"),
    )


def file_events(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
    **options: str | bool | int,
) -> DataFrame:
    """File-replay source — the ``FileReader`` analog
    (``ralf/operators/source.py:138-198``): stream the files under ``path``
    in order. ``max_files_per_trigger`` bounds each micro-batch (replay
    pacing); with ``availableNow`` the stream drains and stops — the batch
    replay of a recorded stream. Extra ``options`` reach the reader
    (CSV defaults ``header=True`` to match the batch CSV source — without
    it the header line becomes a data row).
    """
    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if fmt == "csv":
        options.setdefault("header", True)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.format(fmt).load(path)


def kafka_events(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    value_schema: T.StructType | str | None = None,
) -> DataFrame:
    """Kafka-shaped source (``KafkaSource``, ``ralf/operators/source.py:
    55-87``): subscribe + decode JSON values into event columns.

    Requires the spark-sql-kafka connector on the classpath (not bundled in
    this environment, so this constructs the plan but can only run where
    the connector jar is deployed — same for a Kinesis connector, the
    ``ralf/v2/kinesis_source.py`` analog, whose shard->executor assignment
    Spark handles natively).
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .load()
    )
    schema = value_schema or EVENT_SCHEMA
    return raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("e")
    ).select("e.*")
