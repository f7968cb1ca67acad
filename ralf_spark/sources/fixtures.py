"""Loaders for the driver's TPC-H-ish parquet fixtures (TESTDATA.md).

Centralizes per-table keyed-table metadata so every query/test builds the
same FeatureTables.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ralf_spark.table import FeatureTable

#: table -> (key, ts, seq)
FIXTURE_TABLES: dict[str, tuple[str | None, str | None, str | None]] = {
    "region": ("r_regionkey", None, None),
    "nation": ("n_nationkey", None, None),
    "customer": ("c_custkey", None, None),
    "supplier": ("s_suppkey", None, None),
    "part": ("p_partkey", None, None),
    "orders": ("o_orderkey", "o_orderdate", "o_orderkey"),
    "lineitem": ("l_orderkey", "l_shipdate", "l_linenumber"),
    "events": ("user_id", "ts", "event_id"),
    "documents": ("doc_id", None, None),
    "embeddings": ("vec_id", None, None),
}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_fixture(
    spark: SparkSession, name: str, sf_dir: str | None = None
) -> FeatureTable:
    sf_dir = sf_dir or DEFAULT_SF_DIR
    key, ts, seq = FIXTURE_TABLES[name]
    # events.parquet stores TIMESTAMP(NANOS), which Spark rejects unless this
    # legacy conf is on. It MUST be set at runtime here (idempotent), not only
    # in session.py DEFAULT_CONFS: external harnesses (the correctness driver)
    # build their own SparkSession and never call get_spark(). Round-2
    # regression: moving this into session defaults broke 20/46 driver queries
    # with PARQUET_TYPE_ILLEGAL.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if ts is not None and dict(df.dtypes).get(ts) == "bigint":
        # events.parquet stores ts as TIMESTAMP(NANOS), read as epoch-ns
        # bigint (session.py sets spark.sql.legacy.parquet.nanosAsLong).
        # Integer `div` keeps the value exact: epoch-ns ~1.7e18 exceeds a
        # double's 2^53 integer range, so float division can be off by 1µs.
        df = df.withColumn(ts, F.timestamp_micros(F.expr(f"`{ts}` div 1000")))
    return FeatureTable(df, key=key, ts=ts, seq=seq)
