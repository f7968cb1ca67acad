"""Join operators.

The reference ships exactly one join: ``LeftJoin`` — a streaming key-equi
enrichment join where a left record is matched against the *latest right
state* for its key (``ralf/operators/join.py:10-63``; right-state upsert
``:41-45``, one-shot left buffer ``:34-40,47``). Batch re-expressions:

- ``enrichment_join``: equi-join of the left events against the right side's
  latest-per-key state — what the reference computes when the right record
  arrived first (the steady-state case). Catalyst picks broadcast vs
  shuffled-hash vs sort-merge; small right states broadcast automatically.
- ``asof_join``: time-correct variant — each left row joins the latest right
  row with ``right.ts <= left.ts`` for its key, which is precisely "the right
  state at left-arrival time" of the streaming operator, made deterministic.

Everything else (left/semi/anti/range joins, theta) comes free from the
DataFrame API; the engine exposes them through FeatureTable.transform.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ralf_spark.table import FeatureTable


def enrichment_join(
    left: FeatureTable,
    right: FeatureTable,
    on: str | Sequence[str] | None = None,
    how: str = "inner",
    broadcast_right: bool | None = None,
) -> FeatureTable:
    """Key-equi enrichment join against the right side's latest state
    (``ralf/operators/join.py:41-50``).

    ``broadcast_right=None`` lets Catalyst/AQE decide; ``True`` forces a
    broadcast hint (right side is a bounded dimension/state table);
    ``False`` forbids it (merge/shuffled-hash for two big sides).
    """
    keys = on or left.key
    if keys is None:
        raise ValueError("no join key: pass `on` or key the left table")
    # A right side with no ordering columns is already latest-state
    # (dimension tables: unique per key); otherwise reduce to latest-per-key.
    if right.key and (right.ts or right.seq):
        right_state = right.latest().df
    else:
        right_state = right.df
    if broadcast_right is True:
        right_state = F.broadcast(right_state)
    elif broadcast_right is False:
        right_state = right_state.hint("merge")
    joined = left.df.join(right_state, on=keys, how=how)
    return FeatureTable(joined, key=left.key, ts=left.ts, seq=left.seq)


def asof_join(
    left: FeatureTable,
    right: FeatureTable,
    left_on: str | None = None,
    right_on: str | None = None,
    tolerance: Column | None = None,
    right_payload: Sequence[str] | None = None,
    seq_comparable: bool | None = None,
) -> FeatureTable:
    """As-of join: for each left row, the latest right row at or before the
    left row's event time, per key — the deterministic batch spelling of the
    reference's "left record meets current right state" semantics
    (``ralf/operators/join.py:34-45``).

    Implementation: UNION the two sides tagged by origin, one rows-frame
    window ``last(right_payload, ignorenulls) OVER (PARTITION BY key ORDER BY
    arrival ROWS UNBOUNDED PRECEDING)``, keep left rows. One shuffle on the
    key, no join explosion, skew-safe under AQE — scales to fact-sized BOTH
    sides, which a range-join (``l.ts >= r.ts``) would not.

    Arrival order at equal ts: when both sides carry a comparable sequence
    column (``seq_comparable``, auto-detected as both tables having a seq),
    order is ``(ts, seq, side)`` — a right row is visible to a left row iff
    ``(r.ts, r.seq) <= (l.ts, l.seq)``, the engine's deterministic arrival
    order. Otherwise right sorts before left at equal ts (``(ts, side,
    seq)``), matching the reference where the state upsert happens before
    the left lookup.
    """
    lk = left_on or left.key
    rk = right_on or right.key
    if lk is None or rk is None or left.ts is None or right.ts is None:
        raise ValueError("asof_join needs keyed, time-stamped tables")
    if seq_comparable is None:
        seq_comparable = left.seq is not None and right.seq is not None
    rp = right_payload or [
        c for c in right.df.columns if c not in (rk, right.ts)
    ]
    lcols = left.df.columns

    l_tag = left.df.select(
        F.col(lk).alias("_k"),
        F.col(left.ts).alias("_t"),
        F.lit(1).alias("_side"),
        (F.col(left.seq) if left.seq else F.lit(0)).alias("_seq"),
        F.struct(*[F.col(c) for c in lcols]).alias("_l"),
        F.lit(None).cast(
            right.df.select(F.struct(*rp).alias("s")).schema["s"].dataType
        ).alias("_r"),
    )
    r_tag = right.df.select(
        F.col(rk).alias("_k"),
        F.col(right.ts).alias("_t"),
        F.lit(0).alias("_side"),
        (F.col(right.seq) if right.seq else F.lit(0)).alias("_seq"),
        F.lit(None).cast(
            left.df.select(F.struct(*lcols).alias("s")).schema["s"].dataType
        ).alias("_l"),
        F.struct(*rp).alias("_r"),
    )
    unioned = l_tag.unionByName(r_tag)
    order = ["_t", "_seq", "_side"] if seq_comparable else ["_t", "_side", "_seq"]
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.withColumn(
        "_rstate", F.last("_r", ignorenulls=True).over(w)
    ).withColumn(
        "_rts", F.last(F.when(F.col("_side") == 0, F.col("_t")), ignorenulls=True).over(w)
    )
    out = filled.where(F.col("_side") == 1)
    if tolerance is not None:
        out = out.withColumn(
            "_rstate",
            F.when(F.col("_t") - F.col("_rts") <= tolerance, F.col("_rstate")),
        )
    out = out.select("_l.*", *[F.col(f"_rstate.{c}").alias(c) for c in rp])
    return FeatureTable(out, key=lk if lk in out.columns else None,
                        ts=left.ts if left.ts in out.columns else None,
                        seq=left.seq if left.seq and left.seq in out.columns else None)


def one_shot_join(
    left: FeatureTable,
    right: FeatureTable,
    on: str | None = None,
) -> FeatureTable:
    """Reference LeftJoin's buffered-left semantics, batch-deterministic:
    each left row matches at most once, and a buffered left row is consumed
    by the FIRST right arrival after it (one-shot delete,
    ``ralf/operators/join.py:47``). Left rows arriving when right state
    exists join immediately (as-of); rows before any right state join the
    first subsequent right row.

    = as-of join, falling back to the *next* right row when no prior state.
    """
    key = on or left.key
    fwd = asof_join(left, right, left_on=key, right_on=key)
    # rows with no prior right state: match forward to first right row after
    rp = [c for c in right.df.columns if c not in (key, right.ts)]
    lcols = left.df.columns
    unmatched = fwd.df.where(F.col(rp[0]).isNull()).select(*lcols)
    matched = fwd.df.where(F.col(rp[0]).isNotNull())
    if left.ts is None or right.ts is None:
        raise ValueError("one_shot_join needs ts on both sides")
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").desc(), F.col("_side").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    l_tag = unmatched.select(
        F.col(key).alias("_k"), F.col(left.ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in lcols]).alias("_l"),
        F.lit(None).cast(
            right.df.select(F.struct(*rp).alias("s")).schema["s"].dataType
        ).alias("_r"),
    )
    r_tag = right.df.select(
        F.col(key).alias("_k"), F.col(right.ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            unmatched.select(F.struct(*lcols).alias("s")).schema["s"].dataType
        ).alias("_l"),
        F.struct(*rp).alias("_r"),
    )
    fwd_fill = (
        l_tag.unionByName(r_tag)
        .withColumn("_rstate", F.last("_r", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
        .select("_l.*", *[F.col(f"_rstate.{c}").alias(c) for c in rp])
    )
    out = matched.select(*lcols, *rp).unionByName(fwd_fill.select(*lcols, *rp))
    return FeatureTable(out, key=key, ts=left.ts, seq=left.seq)
