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
