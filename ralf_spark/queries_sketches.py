"""Registry entries for the deterministic sketch operators.

See ``ralf_spark.operators.sketches`` for the algorithms and the
cross-engine determinism argument; each query here replays bit-for-bit
in DuckDB, estimator output included — which is the point: an
*estimator* whose result is part of the correctness contract, not just
"close to exact".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ralf_spark.operators.sketches import (
    hll_distinct,
    hll_distinct_sql,
    kmv_distinct,
    kmv_distinct_sql,
    weighted_sample,
    weighted_sample_sql,
)
from ralf_spark.queries import _t, query


@query(
    "kmv_distinct_users",
    kmv_distinct_sql("events", ["event_type"], "user_id", k=32)
    + " ORDER BY event_type",
)
def kmv_distinct_users_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-user estimate per event type (k=32). The per-group
    k-smallest runs as WindowGroupLimit — map-side pre-limiting to k
    rows per group before the shuffle, so the exchange carries
    O(groups·k) rows however many distinct users there are."""
    ev = _t(spark, sf_dir, "events")
    return kmv_distinct(ev.df, ["event_type"], "user_id", k=32).orderBy(
        "event_type"
    )


@query(
    "hll_distinct_event_ids",
    hll_distinct_sql("events", ["event_type"], "event_id")
    + " ORDER BY event_type",
)
def hll_distinct_event_ids_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-event estimate per event type (m=64
    registers) — two partial-aggregating shuffles whose payload is at
    most m register rows per group, independent of cardinality. The
    estimate itself is order-independent (exact dyadic harmonic sum),
    so it is reproducible on any engine/partitioning."""
    ev = _t(spark, sf_dir, "events")
    return hll_distinct(ev.df, ["event_type"], "event_id").orderBy(
        "event_type"
    )


@query(
    "weighted_sample_docs",
    "SELECT * FROM ("
    + weighted_sample_sql(
        "documents", ["doc_id", "n_chars"], "n_chars", 20, "doc_id"
    )
    + ") ORDER BY doc_id",
)
def weighted_sample_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted deterministic document sample (k=20, weight =
    n_chars, Efraimidis-Spirakis keys from the content hash) — the
    'oversample long documents' pretraining mix knob, reproducible
    across runs/engines. Executes as TakeOrdered partial top-k."""
    docs = _t(spark, sf_dir, "documents")
    out = weighted_sample(
        docs.df.select("doc_id", "n_chars"), "n_chars", 20, on="doc_id"
    )
    return out.orderBy("doc_id")
