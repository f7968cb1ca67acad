"""Loaders for the driver's TPC-H-ish parquet fixtures (TESTDATA.md).

Centralizes per-table keyed-table metadata so every query/test builds the
same FeatureTables.
"""

from __future__ import annotations

import os
import weakref

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

#: per-session memo of loaded fixture FeatureTables (r15, guide §6): every
#: ``spark.read.parquet(path)`` builds a fresh InMemoryFileIndex — a
#: driver-side file listing plus a footer read for schema inference — so a
#: 6-table query paid ~0.5-1 s of pure metadata work per CONSTRUCTION, and
#: a bench pass re-paid it for every query. A catalog deployment gets this
#: amortization for free (the session caches table metadata); the memo is
#: the path-based spelling. Only the ANALYZED PLAN is reused — no rows, no
#: ``.cache()``: every action still computes from the parquet files.
#: Keyed weakly on the session so a stopped/replaced session re-lists.
_FIXTURE_MEMO: weakref.WeakKeyDictionary = weakref.WeakKeyDictionary()


def load_fixture(
    spark: SparkSession, name: str, sf_dir: str | None = None
) -> FeatureTable:
    sf_dir = sf_dir or DEFAULT_SF_DIR
    use_memo = os.environ.get("SPARK_GRAFT_FIXTURE_CACHE", "1") != "0"
    if use_memo:
        # liveness guard (r16, ADVICE r15 low): a memo hit must never
        # serve frames bound to a stopped SparkContext — getOrCreate can
        # hand back the same Python session object across a JVM restart,
        # and the cached DataFrames pin the session strongly, so the
        # WeakKeyDictionary alone can't evict them. A stopped session's
        # entries are dropped eagerly here (frees the leaked frames too).
        try:
            stopped = spark.sparkContext._jsc.sc().isStopped()
        except Exception:
            stopped = False
        try:
            if stopped:
                _FIXTURE_MEMO.pop(spark, None)
                use_memo = False
            else:
                memo = _FIXTURE_MEMO.setdefault(spark, {})
        except TypeError:  # un-weakrefable session stub (tests/mocks)
            memo, use_memo = {}, False
        if use_memo:
            hit = memo.get((sf_dir, name))
            if hit is not None:
                return hit
    key, ts, seq = FIXTURE_TABLES[name]
    # Fixture generations have stored event time three ways; normalize all
    # of them to TIMESTAMP_NTZ so every downstream plan sees one canonical
    # type. NTZ is the right canon: it is what current fixtures
    # (TIMESTAMP(MICROS, isAdjustedToUTC=false)) read as natively, it is
    # session-timezone-free, and it matches the DuckDB oracle's naive
    # timestamp semantics exactly.
    #
    # The legacy conf is set at runtime here (idempotent), not only in
    # session.py DEFAULT_CONFS: external harnesses (the correctness driver)
    # build their own SparkSession and never call get_spark(). Round-2
    # regression: relying on session defaults broke 20/46 driver queries
    # with PARQUET_TYPE_ILLEGAL on nanos-encoded fixtures.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if ts is not None:
        dt = dict(df.dtypes).get(ts)
        if dt == "bigint":
            # TIMESTAMP(NANOS) read as epoch-ns bigint under nanosAsLong.
            # Integer `div` keeps the value exact (epoch-ns ~1.7e18 exceeds
            # a double's 2^53 integer range); timestamp_add against the
            # epoch literal builds NTZ without touching the session tz.
            df = df.withColumn(
                ts,
                F.timestamp_add(
                    "MICROSECOND",
                    F.expr(f"`{ts}` div 1000"),
                    F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'"),
                ),
            )
        elif dt == "timestamp":
            # isAdjustedToUTC=true micros → LTZ. Rebuild NTZ from the
            # absolute instant (unix_micros) against the NTZ epoch literal:
            # session-timezone-FREE, so an external driver session that
            # doesn't pin UTC still gets the UTC wall clock the oracle
            # sees. (A cast('timestamp_ntz') would route through the
            # session timezone — ADVICE r4.)
            df = df.withColumn(
                ts,
                F.timestamp_add(
                    "MICROSECOND",
                    F.unix_micros(F.col(ts)),
                    F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'"),
                ),
            )
    out = FeatureTable(df, key=key, ts=ts, seq=seq)
    if use_memo:
        memo[(sf_dir, name)] = out
    return out
