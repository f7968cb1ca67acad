"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY when the scan under-parallelizes.

    CPU-heavy operators (MinHash signatures, cosine scoring) inherit the
    scan's partitioning; a corpus packed into a few parquet files would
    otherwise run on a few cores. On a real cluster a 100 TB input already
    yields ~10^5 partitions (files.maxPartitionBytes), so this is a no-op
    there — the explicit check avoids paying a full-corpus shuffle at scale
    just to fix local small-file layouts.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def attach_cached(df: DataFrame, cached: list[DataFrame]) -> DataFrame:
    """Record the persisted intermediates a result plan depends on, so the
    caller can release them after its action (see :func:`unpersist_cached`).

    Persisted blocks otherwise accumulate across repeated operator
    invocations in a long-lived session (ADVICE r2)."""
    df._ralf_cached = list(cached)  # type: ignore[attr-defined]
    return df


def unpersist_cached(df: DataFrame, blocking: bool = False) -> None:
    """Release intermediates persisted by the operator that built ``df``.

    Call AFTER the final action on ``df`` — the plan re-computes from
    source if executed again afterwards. No-op for plans without attached
    cache state."""
    for cached in getattr(df, "_ralf_cached", []):
        cached.unpersist(blocking)
