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

from ralf_spark.functions.timeutil import epoch_us, epoch_us_expr
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
    direction: str = "backward",
) -> FeatureTable:
    """As-of join: for each left row, the latest right row at or before the
    left row's event time, per key — the deterministic batch spelling of the
    reference's "left record meets current right state" semantics
    (``ralf/operators/join.py:34-45``).

    ``direction="forward"`` flips the lookup to the EARLIEST right row at
    or after the left time (label joins, next-reading imputation) — the
    identical single-shuffle plan with the window order reversed;
    ``tolerance`` then bounds ``r.ts - l.ts``.

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
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction!r}")
    fwd = direction == "forward"
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
    names = ["_t", "_seq", "_side"] if seq_comparable else ["_t", "_side", "_seq"]
    # forward: scan time DESCENDING so "last right so far" = nearest right
    # at-or-after; _side stays ASCENDING in both modes (right=0 before
    # left=1), which makes an equal-(ts, seq) right row visible either way.
    order = [
        F.col(c).desc() if fwd and c != "_side" else F.col(c).asc()
        for c in names
    ]
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
        gap = (
            F.col("_rts") - F.col("_t") if fwd
            else F.col("_t") - F.col("_rts")
        )
        out = out.withColumn(
            "_rstate", F.when(gap <= tolerance, F.col("_rstate"))
        )
    out = out.select("_l.*", *[F.col(f"_rstate.{c}").alias(c) for c in rp])
    return FeatureTable(out, key=lk if lk in out.columns else None,
                        ts=left.ts if left.ts in out.columns else None,
                        seq=left.seq if left.seq and left.seq in out.columns else None)


def one_shot_join(
    left: FeatureTable,
    right: FeatureTable,
    on: str | None = None,
    right_payload: Sequence[str] | None = None,
    seq_comparable: bool | None = None,
) -> FeatureTable:
    """Reference LeftJoin's buffered-left semantics, batch-deterministic
    (``ralf/operators/join.py:34-50``):

    - A left row arriving when right state exists joins the *current* right
      state (as-of, ``:36-40``).
    - A left row with no prior right state is **buffered**; the buffer is a
      latest-per-key upsert, so a later buffered left *overwrites* an
      earlier one (``left_table.update``, ``:38``) — overwritten rows are
      never emitted.
    - The FIRST right arrival consumes the buffered left (one-shot delete,
      ``:44-47``); a buffer no right arrival ever consumes is never emitted.

    So: per key, left rows after the first right arrival get the as-of
    match; of the left rows before it, only the latest joins (with that
    first right row); everything else is dropped.

    Plan: one union + rows-frame window (single shuffle on the key) for the
    as-of part, plus two map-side-partial hash aggs (latest buffered left,
    first right) and a key equi-join of those two tiny per-key tables.
    """
    key = on or left.key
    if key is None or left.ts is None or right.ts is None:
        raise ValueError("one_shot_join needs a key and ts on both sides")
    if seq_comparable is None:
        seq_comparable = left.seq is not None and right.seq is not None
    rp = right_payload or [
        c for c in right.df.columns if c not in (key, right.ts)
    ]
    lcols = left.df.columns

    l_tag = left.df.select(
        F.col(key).alias("_k"),
        F.col(left.ts).alias("_t"),
        F.lit(1).alias("_side"),
        (F.col(left.seq) if left.seq else F.lit(0)).alias("_seq"),
        F.struct(*[F.col(c) for c in lcols]).alias("_l"),
        F.lit(None).cast(
            right.df.select(F.struct(*rp).alias("s")).schema["s"].dataType
        ).alias("_r"),
    )
    r_tag = right.df.select(
        F.col(key).alias("_k"),
        F.col(right.ts).alias("_t"),
        F.lit(0).alias("_side"),
        (F.col(right.seq) if right.seq else F.lit(0)).alias("_seq"),
        F.lit(None).cast(
            left.df.select(F.struct(*lcols).alias("s")).schema["s"].dataType
        ).alias("_l"),
        F.struct(*rp).alias("_r"),
    )
    order = ["_t", "_seq", "_side"] if seq_comparable else ["_t", "_side", "_seq"]
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # _rstate is the right *struct*: NULL iff no prior right arrival — a
    # right row whose payload fields are legitimately NULL still counts as
    # state (the struct itself is non-null).
    lefts = (
        l_tag.unionByName(r_tag)
        .withColumn("_rstate", F.last("_r", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
    )
    matched = lefts.where(F.col("_rstate").isNotNull()).select(
        "_l.*", *[F.col(f"_rstate.{c}").alias(c) for c in rp]
    )
    # Buffered path: latest pre-first-right left per key joins the first
    # right row; earlier buffered lefts were overwritten, keys with no
    # right at all never emit.
    arrival = F.struct("_t", "_seq")
    last_buffered = (
        lefts.where(F.col("_rstate").isNull())
        .groupBy("_k")
        .agg(F.max_by("_l", arrival).alias("_l"))
    )
    first_right = r_tag.groupBy("_k").agg(
        F.min_by("_r", arrival).alias("_r")
    )
    buffered = last_buffered.join(first_right, "_k").select(
        "_l.*", *[F.col(f"_r.{c}").alias(c) for c in rp]
    )
    out = matched.unionByName(buffered)
    return FeatureTable(
        out,
        key=key if key in out.columns else None,
        ts=left.ts if left.ts in out.columns else None,
        seq=left.seq if left.seq and left.seq in out.columns else None,
    )


def interval_join(
    left: FeatureTable,
    right: FeatureTable,
    lookback: str,
    lookahead: str = "0 seconds",
    rsuffix: str = "_r",
) -> FeatureTable:
    """Time-bounded equi-join: each left row matches right rows with the
    same key whose timestamp lies in ``[left.ts - lookback,
    left.ts + lookahead]`` (bounds inclusive) — the "events near each
    other in time" join (clicks before a purchase, sensor readings
    around an alarm). Complements :func:`asof_join` (which keeps only
    the latest such match).

    Works identically on batch and streaming inputs: in streaming, put a
    watermark on BOTH sides (Spark then bounds the join state and ages
    out rows outside the interval — the stream-stream join Spark
    supports natively; the reference, one record at a time, cannot
    express this at all). At scale the equi-key drives one hash
    shuffle; the time predicate is a post-join filter on co-located
    rows, never a cross product.

    Right-side columns are suffixed with ``rsuffix``.
    """
    if left.key is None or right.key is None:
        raise ValueError("interval_join requires keyed tables")
    if left.ts is None or right.ts is None:
        raise ValueError("interval_join requires ts columns")
    ldf = left.df.alias("__l")
    rdf = right.df.alias("__r")
    lts, rts = F.col(f"__l.{left.ts}"), F.col(f"__r.{right.ts}")
    cond = (
        (F.col(f"__l.{left.key}") == F.col(f"__r.{right.key}"))
        & (rts >= lts - F.expr(f"INTERVAL {lookback}"))
        & (rts <= lts + F.expr(f"INTERVAL {lookahead}"))
    )
    out = ldf.join(rdf, cond, "inner").select(
        *[F.col(f"__l.{c}") for c in left.df.columns],
        *[
            F.col(f"__r.{c}").alias(c + rsuffix)
            for c in right.df.columns
        ],
    )
    return FeatureTable(out, key=left.key, ts=left.ts, seq=left.seq)


def scd2_history(
    df: DataFrame,
    key: str,
    ts_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type-2 intervals from a change stream:
    every record becomes a VERSION row valid from its own timestamp until
    the key's next change (NULL = still current). The materialized-history
    complement of :func:`asof_join` — an as-of lookup at time t is exactly
    "the version whose [valid_from, valid_to) contains t", so downstream
    engines (or plain BETWEEN predicates) get point-in-time correctness
    without re-running the as-of machinery.

    One window (lead over the key's time order) — a single shuffle keyed
    on the entity key, same partitioning every per-key operator here uses.
    Appends ``valid_from_us`` / ``valid_to_us`` (epoch micros, engine-
    portable) and ``is_current``.
    """
    order = [F.col(ts_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(key).orderBy(*order)
    nxt = F.lead(ts_col).over(w)
    ts_dtype = dict(df.dtypes).get(ts_col, "")
    return (
        df.withColumn("valid_from_us", epoch_us(df, ts_col))
        .withColumn("valid_to_us", epoch_us_expr(nxt, ts_dtype))
        .withColumn("is_current", nxt.isNull())
    )
