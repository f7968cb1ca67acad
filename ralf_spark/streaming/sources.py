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
    return reader.format(fmt).load(_as_stream_dir(path))


def _as_stream_dir(path: str) -> str:
    """FileStreamSource accepts only directories ("basePath must be a
    directory", even with an explicit basePath option). A single recorded
    file — e.g. one parquet fixture — is exposed through a temp dir with a
    symlink, so replaying a file needs no copy."""
    import os
    import tempfile

    if not os.path.isfile(path):
        return path
    d = tempfile.mkdtemp(prefix="stream_file_")
    os.symlink(os.path.abspath(path), os.path.join(d, os.path.basename(path)))
    return d


#: The reference's msgpack wire record (``ralf/operators/source.py:61-70``:
#: ``{"key": str, "value": float, "timestamp": int, "send_time": float}``;
#: ``create_time`` is stamped receiver-side, not carried on the wire).
KAFKA_MSGPACK_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("timestamp", T.LongType()),
        T.StructField("send_time", T.DoubleType()),
    ]
)

#: Spark type -> the coercion the reference applies per field at decode
#: (``source.py:80-86``: ``str(...)``, ``int(...)``, floats passed through).
_PY_COERCE = {
    T.StringType(): str,
    T.LongType(): int,
    T.IntegerType(): int,
    T.DoubleType(): float,
    T.FloatType(): float,
}


def decode_kafka_records(
    raw: DataFrame,
    value_schema: T.StructType | str | None = None,
    value_format: str = "json",
) -> DataFrame:
    """Decode a Kafka-wire DataFrame (binary ``value`` column) into event
    columns. Pure transform — unit-testable without the connector jar.

    ``value_format="json"`` (default): JVM-side ``from_json`` — zero
    Python in the hot path.

    ``value_format="msgpack"``: the reference's actual wire format
    (``ralf/operators/source.py:73-86`` — ``msgpack.loads`` per record).
    Spark has no native msgpack codec, so this is the one decode that
    must leave the JVM: an Arrow-batched ``mapInPandas`` kernel (never
    row-at-a-time UDF) unpacks each payload and coerces fields to the
    schema types exactly as the reference does (``str(key)``,
    ``int(timestamp)``). Uses the ``msgpack`` package when installed,
    else the spec-subset fallback codec
    (``ralf_spark.functions.msgpack_lite``). Default schema is the
    reference wire record :data:`KAFKA_MSGPACK_SCHEMA`.
    """
    if value_format == "json":
        schema = value_schema or EVENT_SCHEMA
        return raw.select(
            F.from_json(F.col("value").cast("string"), schema).alias("e")
        ).select("e.*")
    if value_format != "msgpack":
        raise ValueError(
            f"unsupported value_format {value_format!r} "
            "(supported: 'json', 'msgpack')"
        )
    schema = value_schema or KAFKA_MSGPACK_SCHEMA
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    fields = [(f.name, _PY_COERCE.get(f.dataType)) for f in schema.fields]

    def decode(batches):
        import pandas as pd

        try:
            from msgpack import unpackb as _loads  # real codec if present
        except ImportError:
            from ralf_spark.functions.msgpack_lite import unpackb as _loads

        for pdf in batches:
            records = [_loads(bytes(v)) for v in pdf["value"]]
            yield pd.DataFrame(
                {
                    name: [
                        None
                        if r.get(name) is None
                        else (coerce(r[name]) if coerce else r[name])
                        for r in records
                    ]
                    for name, coerce in fields
                }
            )

    return raw.select("value").mapInPandas(decode, schema=schema)


def kafka_events(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    value_schema: T.StructType | str | None = None,
    value_format: str = "json",
) -> DataFrame:
    """Kafka-shaped source (``KafkaSource``, ``ralf/operators/source.py:
    55-87``): subscribe + decode values into event columns.
    ``value_format="msgpack"`` replays a real reference topic (its wire
    format); ``"json"`` stays fully JVM-side.

    Requires the spark-sql-kafka connector on the classpath (not bundled in
    this environment, so this constructs the plan but can only run where
    the connector jar is deployed).
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .load()
    )
    return decode_kafka_records(raw, value_schema, value_format)


#: Raw schema produced by the aws-kinesis Structured Streaming connector
#: (per record: payload + shard/sequence metadata + arrival timestamp).
KINESIS_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("data", T.BinaryType()),
        T.StructField("streamName", T.StringType()),
        T.StructField("partitionKey", T.StringType()),
        T.StructField("shardId", T.StringType()),
        T.StructField("sequenceNumber", T.StringType()),
        T.StructField("approximateArrivalTimestamp", T.TimestampType()),
    ]
)


def decode_kinesis_records(
    raw: DataFrame,
    value_schema: T.StructType | str | None = None,
    shard_key: str | None = None,
) -> DataFrame:
    """Decode Kinesis wire records into event columns, Spark-shaped mirror
    of the reference's per-record loop (``ralf/v2/kinesis_source.py:
    115-162``): JSON-decode the ``data`` payload, stamp ``ingest_time``
    from the record's approximate arrival timestamp, and (optionally) carry
    a string ``shard_key`` column — the reference keys every record by
    ``str(e[shard_key])``.

    Pure transform over :data:`KINESIS_WIRE_SCHEMA` — unit-testable on a
    handcrafted DataFrame without any AWS dependency.
    """
    schema = value_schema or EVENT_SCHEMA
    out = raw.select(
        F.from_json(F.col("data").cast("string"), schema).alias("e"),
        F.col("approximateArrivalTimestamp").alias("ingest_time"),
    ).select("e.*", "ingest_time")
    if shard_key is not None:
        out = out.withColumn("shard_key", F.col(shard_key).cast("string"))
    return out


def kinesis_events(
    spark: SparkSession,
    stream_name: str,
    region: str,
    value_schema: T.StructType | str | None = None,
    shard_key: str | None = None,
    consumer_name: str | None = None,
    starting_position: str = "TRIM_HORIZON",
) -> DataFrame:
    """Kinesis-shaped source — the ``KinesisDataSource`` analog
    (``ralf/v2/kinesis_source.py:9-162``).

    What the reference hand-rolls, Spark's connector owns natively:

    - *consumer registration* (``prepare``, lines 58-101: deregister stale
      consumer, register, poll until ACTIVE) → the connector's
      enhanced-fan-out ``consumerName`` option; lifecycle is managed by the
      source, not user code.
    - *shard → replica round-robin* (lines 104-112: ``i % num_replicas ==
      shard_idx``) → shard-to-task assignment by the streaming engine,
      rebalanced on resharding (the reference asserts a FIXED shard count).
    - *sequence-number checkpointing* (lines 119-144) → the query's
      checkpoint location; exactly-once instead of the reference's
      at-most-once in-memory ``seq_no``.
    - *payload decode + ``ingest_time`` stamp* (lines 133-141) →
      :func:`decode_kinesis_records`.

    Requires the aws-kinesis Structured Streaming connector jar (not in
    this environment: the plan builds, only ``.start()`` needs the jar).
    """
    reader = (
        spark.readStream.format("aws-kinesis")
        .option("kinesis.streamName", stream_name)
        .option("kinesis.region", region)
        .option("kinesis.startingposition", starting_position)
    )
    if consumer_name is not None:
        reader = (
            reader.option("kinesis.consumerType", "EFO")
            .option("kinesis.consumerName", consumer_name)
        )
    raw = reader.load()
    return decode_kinesis_records(raw, value_schema, shard_key)
