"""Cross-engine-stable hashing.

Spark's ``hash``/``xxhash64`` are murmur3/xxhash with Spark-specific seeds;
DuckDB's ``hash`` is different again. For operators whose OUTPUT must be
reproducible outside Spark (deterministic sampling, MinHash signatures,
SimHash fingerprints — all oracle-checked), the engine derives 64-bit
integers from md5, which every engine computes identically:

    stable_hash64(s) = bigint(first 15 hex chars of md5(s))   # 60 bits, >= 0

DuckDB spelling: ``('0x' || substring(md5(s), 1, 15))::BIGINT``.

md5 is ~2-3x slower than xxhash64 but still JVM-side, whole-stage-codegen
friendly, and only used where cross-engine determinism is part of the
operator contract; purely internal hashing uses ``F.xxhash64``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: number of leading md5 hex chars used (60 bits — fits int64, non-negative)
HEX_CHARS = 15


def stable_hash64(col: Column, salt: str | None = None) -> Column:
    """md5-derived non-negative 60-bit integer hash, identical in any engine."""
    s = col.cast("string")
    if salt is not None:
        s = F.concat(F.lit(salt), F.lit("|"), s)
    return F.conv(F.substring(F.md5(s), 1, HEX_CHARS), 16, 10).cast("bigint")


def stable_hash64_sql(expr: str, salt: str | None = None) -> str:
    """The identical hash as DuckDB/ANSI SQL text (for oracle queries)."""
    inner = f"CAST({expr} AS VARCHAR)"
    if salt is not None:
        inner = f"'{salt}' || '|' || {inner}"
    return f"CAST(('0x' || substring(md5({inner}), 1, {HEX_CHARS})) AS BIGINT)"


def default_hash_fn() -> str:
    """Engine-wide content-hash mode for the dedup/fingerprint family:
    ``"md5"`` (default — signatures replay bit-for-bit in the DuckDB
    oracles) or ``"xxhash64"`` (production — ~3-5x cheaper at the hashing
    stage, Spark-only). Operators whose ``hash_fn`` argument is left None
    resolve it here, so a deployment flips the whole family with
    ``SPARK_GRAFT_HASH_FN=xxhash64`` at submit time; the correctness
    gates never set the variable and stay oracle-replayable."""
    import os

    mode = os.environ.get("SPARK_GRAFT_HASH_FN", "md5")
    if mode not in ("md5", "xxhash64"):
        raise ValueError(
            f"SPARK_GRAFT_HASH_FN={mode!r} (expected 'md5' or 'xxhash64')"
        )
    return mode
