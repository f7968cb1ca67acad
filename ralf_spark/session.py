"""SparkSession construction with scale-oriented defaults.

Defaults are tuned so the same logical plans behave well from local[32]
tests up to a large cluster: AQE on (runtime coalescing, skew-join
handling), broadcast threshold generous enough to broadcast TPC-H-style
dimension tables, Arrow enabled for every pandas UDF boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Scale-oriented defaults. On a real cluster most of these are set by the
# platform; locally they make plans representative of cluster behavior.
DEFAULT_CONFS: dict[str, str] = {
    # Adaptive execution: runtime partition coalescing, skew-join splitting,
    # and dynamic join-strategy switching — the main lever that lets the same
    # plan run at sf0.001 and at 100 TB.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Dimension tables (region/nation/customer/supplier/part at fact-relative
    # sizes) should broadcast; 64 MB covers them while AQE can still demote.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Arrow for all pandas UDF / toPandas boundaries.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Deterministic session timezone so timestamp round-trips match the
    # DuckDB oracle regardless of host TZ.
    "spark.sql.session.timeZone": "UTC",
    # The fixtures store TIMESTAMP(NANOS), which Spark's parquet reader
    # rejects by default; read nanos as epoch-ns bigint (converted to
    # timestamp by the loader). Session-wide so per-query code never
    # mutates shared conf.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Don't let tiny local files create a single giant partition at scale.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # Python DataSource plugins (sources/datasource.py) declare pushFilters;
    # Spark refuses to initialize them unless pushdown is explicitly on.
    "spark.sql.python.filterPushdown.enabled": "true",
    # Keep shuffle partition count moderate locally; AQE coalesces down.
    "spark.sql.shuffle.partitions": os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"
    ),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(
    app_name: str = "ralf_spark",
    master: str | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``)
    when no cluster master is configured; on a real deployment the caller's
    spark-submit master wins.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    confs = dict(DEFAULT_CONFS)
    # deployment-level overrides without code edits (r15): JSON map of
    # spark confs, applied over the engine defaults but under the
    # caller's explicit extra_confs — the knob the A/B harnesses and a
    # cluster submit script use to vary scale-dependent settings.
    env_confs = os.environ.get("SPARK_GRAFT_EXTRA_CONFS")
    if env_confs:
        import json

        confs.update(json.loads(env_confs))
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
