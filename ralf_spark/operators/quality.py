"""Data-quality operators: column profiling + declarative constraints.

The gate between "pipeline produced a table" and "a training job may
read it": profile the columns (nulls, distincts, ranges, moments) and
check declarative expectations (not-null, unique, in-range, accepted
values, minimum fraction) — the Deequ/Great-Expectations role, spelled
as ONE Spark aggregation per table so a 100 TB validation pass costs a
single scan.

Scale shape:

- :func:`column_profile` computes every column's metrics inside one
  ``agg`` (count/nulls/min/max/mean and an exact ``count_distinct`` per
  profiled column — all map-side partial; swap the distinct for
  ``approx_count_distinct`` at extreme cardinality via
  ``exact_distinct=False``) and unpivots driver-side: the driver sees
  one row per TABLE, the output is one row per column.
- :func:`check_constraints` folds every rule into the same single-scan
  aggregate; each rule reads its measured value out of the one result
  row. No per-rule scans, no collect of data rows.

The reference has no quality surface (its Schema validates types only,
``ralf/table.py``); this extends the engine's curation family (E9) the
way the north star asks — data validation as a first-class pipeline
stage. Deterministic and SQL-expressible, so the gates are
oracle-checked like every other operator.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def column_profile(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Per-column statistics in ONE aggregation pass.

    Returns one row per profiled column:
    ``(column, n_rows, n_nulls, null_frac, n_distinct, min_repr,
    max_repr, mean)`` — min/max as strings (type-erased so every column
    fits one schema), ``mean`` NULL for non-numeric columns.
    ``exact_distinct=False`` swaps ``count_distinct`` for
    ``approx_count_distinct`` (HLL++) — the extreme-cardinality
    spelling; everything else is identical.

    EAGER, unlike every other operator here: the single scan runs AT
    CALL TIME (the per-table result row collects to the driver and
    unpivots to one row per column — O(columns) driver traffic, fine at
    any table size), so the returned DataFrame is a small local one.
    Composing it into a larger lazy pipeline re-triggers nothing — it is
    already computed. Same contract for :func:`check_constraints`.
    """
    if cols is None:
        cols = df.columns
    numeric = {
        f.name
        for f in df.schema.fields
        if f.dataType.typeName()
        in ("byte", "short", "integer", "long", "float", "double", "decimal")
    }
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        col = F.col(c)
        aggs.append(
            F.sum(col.isNull().cast("long")).alias(f"_nulls_{c}")
        )
        aggs.append(
            (
                F.count_distinct(col)
                if exact_distinct
                else F.approx_count_distinct(col)
            ).alias(f"_nd_{c}")
        )
        aggs.append(F.min(col).cast("string").alias(f"_min_{c}"))
        aggs.append(F.max(col).cast("string").alias(f"_max_{c}"))
        if c in numeric:
            aggs.append(F.avg(col).alias(f"_mean_{c}"))
    row = df.agg(*aggs)
    spark = df.sparkSession
    per_col = []
    r = row.first()
    for c in cols:
        nulls = r[f"_nulls_{c}"] or 0  # sum over an empty table is NULL
        per_col.append(
            (
                c,
                int(r["_n"]),
                int(nulls),
                round(nulls / r["_n"], 6) if r["_n"] else 0.0,
                int(r[f"_nd_{c}"]),
                r[f"_min_{c}"],
                r[f"_max_{c}"],
                (
                    float(r[f"_mean_{c}"])
                    if c in numeric and r[f"_mean_{c}"] is not None
                    else None
                ),
            )
        )
    return spark.createDataFrame(
        per_col,
        "column string, n_rows bigint, n_nulls bigint, null_frac double,"
        " n_distinct bigint, min_repr string, max_repr string,"
        " mean double",
    )


@dataclass(frozen=True)
class Rule:
    """One declarative expectation; ``kind`` picks the check."""

    kind: str
    column: str
    lo: Any = None
    hi: Any = None
    values: tuple | None = None
    min_frac: float = 1.0

    def name(self) -> str:
        base = f"{self.kind}({self.column}"
        if self.kind == "in_range":
            base += f", {self.lo}, {self.hi}"
        elif self.kind == "accepted_values":
            base += ", {" + ", ".join(map(str, self.values or ())) + "}"
        elif self.kind == "freshness":
            base += f", {self.hi} min @ {self.lo}"
        elif self.kind == "schema_matches":
            import hashlib

            digest = hashlib.md5(
                repr(sorted(self.values or ())).encode()
            ).hexdigest()[:8]
            base += f", {len(self.values or ())} ref cols @{digest}"
        base += ")"
        if self.min_frac < 1.0:
            base += f" >= {self.min_frac}"
        return base


def schema_diff(df: DataFrame, reference) -> DataFrame:
    """Schema-drift check — column added / dropped / type-changed vs a
    reference schema (yesterday's table, a contract file): the OTHER
    thing a 100 TB nightly gate must catch besides value expectations,
    and the one check that costs literally nothing — it reads only
    metadata, no scan, no job.

    ``reference`` is a DDL string (``"a bigint, b string"``), a
    ``StructType``, or a ``{name: type_string}`` dict. Returns one row
    per column across BOTH schemas, ordered by name:
    ``(column, status, ref_type, cur_type)`` with status in
    ``match | added | dropped | type_changed`` — filter
    ``status != 'match'`` for the diff, or gate on the
    :func:`schema_matches` rule. Name→type comparison is
    order-insensitive and nullability-insensitive (Spark nullability is
    advisory); types compare by ``simpleString``. The reference's Schema
    check validates the name set only (``ralf/record.py:36-42``); this
    adds types and the direction of each drift.
    """
    from pyspark.sql.types import StructType

    if isinstance(reference, StructType):
        ref = {f.name: f.dataType.simpleString() for f in reference.fields}
    elif isinstance(reference, dict):
        ref = {str(k): str(v).lower() for k, v in reference.items()}
    else:
        parsed = StructType.fromDDL(str(reference))
        ref = {f.name: f.dataType.simpleString() for f in parsed.fields}
    cur = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    rows = []
    for name in sorted(set(ref) | set(cur)):
        r, c = ref.get(name), cur.get(name)
        if r is None:
            status = "added"
        elif c is None:
            status = "dropped"
        elif r != c:
            status = "type_changed"
        else:
            status = "match"
        rows.append((name, status, r, c))
    return df.sparkSession.createDataFrame(
        rows,
        "column string, status string, ref_type string, cur_type string",
    )


def not_null(column: str, min_frac: float = 1.0) -> Rule:
    return Rule("not_null", column, min_frac=min_frac)


def unique(column: str) -> Rule:
    return Rule("unique", column)


def in_range(column: str, lo, hi, min_frac: float = 1.0) -> Rule:
    return Rule("in_range", column, lo=lo, hi=hi, min_frac=min_frac)


def accepted_values(column: str, values, min_frac: float = 1.0) -> Rule:
    return Rule(
        "accepted_values", column, values=tuple(values), min_frac=min_frac
    )


def schema_matches(reference) -> Rule:
    """Declarative form of :func:`schema_diff` for the constraint gate:
    ``measured`` is the fraction of columns (union of both schemas) whose
    name AND type match; ``passed`` requires exactly 1.0. Pure metadata —
    contributes nothing to the gate's single scan. ``reference`` as in
    :func:`schema_diff` (DDL string / StructType / name→type dict)."""
    from pyspark.sql.types import StructType

    if isinstance(reference, StructType):
        ref = tuple(
            (f.name, f.dataType.simpleString()) for f in reference.fields
        )
    elif isinstance(reference, dict):
        ref = tuple((str(k), str(v).lower()) for k, v in reference.items())
    else:
        parsed = StructType.fromDDL(str(reference))
        ref = tuple(
            (f.name, f.dataType.simpleString()) for f in parsed.fields
        )
    return Rule("schema_matches", "*", values=ref)


def freshness(column: str, max_lag_minutes: float, as_of: str) -> Rule:
    """The staleness gate — the reference's founding concern (features
    decay as data ages) as a declarative expectation: ``max(column)``
    must lie within ``max_lag_minutes`` of ``as_of``.

    ``as_of`` is an explicit ISO timestamp string (the evaluation
    instant) rather than now(): the check stays deterministic, so it is
    replayable in tests/oracles and auditable after the fact — a
    monitoring job passes its scheduled run time. Unlike the fraction
    rules, ``measured`` is the OBSERVED LAG IN MINUTES and ``passed``
    is ``measured <= threshold`` (smaller is better); an empty table or
    all-NULL column FAILS with measured NULL — a silently-empty write
    is exactly the failure this gate exists to catch, the opposite of
    the vacuous pass the fraction rules apply."""
    return Rule(
        "freshness", column, lo=str(as_of), hi=float(max_lag_minutes)
    )


def psi_drift(
    baseline: DataFrame,
    candidate: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two table versions — the
    standard "did this feature drift?" score, per optional group:

        PSI = Σ_bins (p_cand - p_base) * ln(p_cand / p_base)

    (< 0.1 stable, 0.1-0.25 moderate shift, > 0.25 drifted — the usual
    reading). Detecting drift is the reference's entire reason to exist
    (features decay as distributions move — the ralf paper's premise);
    this operator is the MONITOR for it: run it between yesterday's and
    today's feature table and alert on the score.

    Spelling: fixed-width bins over ``[lo, hi]`` (defaults: baseline's
    min/max, one tiny agg; values outside clamp to the edge bins, NULLs
    are excluded) — each side reduces to ``bins`` counts per group in
    one map-side-partial agg, the two histograms full-outer join on
    (group, bin), and the PSI sum is one more tiny agg. Nothing but
    histogram rows ever shuffles; both sides are scanned exactly once.
    ``eps`` floors the proportions (standard PSI practice — an empty
    bin would make the log infinite); an empty SIDE within a group
    (zero total rows) yields ``psi = NULL`` rather than a score built
    entirely from eps floors. Deterministic given (lo, hi), so DuckDB
    replays it bit-for-bit (registry gate).

    Related: ``psi_split_drift`` (queries_features) checks the same
    statistic across the deterministic train/test SPLIT of one corpus
    (per-bin terms, Laplace smoothing); this operator is the reusable
    version-vs-version form (temporal drift, per group) a monitoring
    job calls.
    """
    if bins < 2:
        raise ValueError("bins must be >= 2")
    group_cols = list(group_cols or [])
    if lo is None or hi is None:
        row = baseline.agg(
            F.min(value_col).cast("double"), F.max(value_col).cast("double")
        ).first()
        lo = lo if lo is not None else row[0]
        hi = hi if hi is not None else row[1]
        if lo is None or hi is None:
            raise ValueError("empty baseline and no explicit lo/hi")
    if not hi > lo:
        raise ValueError("hi must exceed lo")
    width = (float(hi) - float(lo)) / bins

    def hist(df: DataFrame, name: str) -> DataFrame:
        v = F.col(value_col).cast("double")
        b = F.floor((v - F.lit(float(lo))) / F.lit(width)).cast("long")
        b = F.least(F.greatest(b, F.lit(0)), F.lit(bins - 1))
        return (
            df.where(v.isNotNull())
            .groupBy(*group_cols, b.alias("bin"))
            .agg(F.count(F.lit(1)).alias(name))
        )
    hb = hist(baseline, "_nb")
    hc = hist(candidate, "_nc")
    # union + re-aggregate instead of a FULL OUTER join (r11, VERDICT
    # r10 #5): Spark cannot broadcast-hash a full outer, so the
    # histogram align used to plan as two SortMergeJoins even at
    # bins × groups rows; padding each side with a zero twin column and
    # summing per (group, bin) is row-identical to full_outer +
    # coalesce-0 and plans as one hash aggregate — no join at all
    zero = F.lit(0).cast("long")
    j = (
        hb.select(*group_cols, "bin", "_nb", zero.alias("_nc"))
        .unionByName(
            hc.select(*group_cols, "bin", zero.alias("_nb"), "_nc")
        )
        .groupBy(*group_cols, "bin")
        .agg(F.sum("_nb").alias("_nb"), F.sum("_nc").alias("_nc"))
    )
    w = [*group_cols] if group_cols else []
    totals = j.groupBy(*w).agg(
        F.sum("_nb").alias("_tb"), F.sum("_nc").alias("_tc")
    )
    j = j.join(F.broadcast(totals), w) if w else j.crossJoin(
        F.broadcast(totals)
    )
    # the eps floor is for empty BINS; an empty SIDE (a group present in
    # only one table — e.g. a mistakenly-empty candidate write) must not
    # be scored from fabricated eps proportions: its psi is NULL, so a
    # monitoring job sees "not comparable" instead of a plausible number
    pb = F.when(
        F.col("_tb") > 0, F.greatest(F.col("_nb") / F.col("_tb"), F.lit(eps))
    )
    pc = F.when(
        F.col("_tc") > 0, F.greatest(F.col("_nc") / F.col("_tc"), F.lit(eps))
    )
    term = (pc - pb) * F.log(pc / pb)
    aggs = [
        F.round(F.sum(term), 6).alias("_psi"),
        F.max((F.col("_tb") == 0) | (F.col("_tc") == 0)).alias("_deg"),
    ]
    g = j.groupBy(*w).agg(*aggs) if w else j.agg(*aggs)
    return g.select(
        *w,
        F.when(F.col("_deg"), F.lit(None).cast("double"))
        .otherwise(F.col("_psi"))
        .alias("psi"),
    )


def check_constraints(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate every rule in ONE aggregation pass over ``df``.

    Returns one row per rule: ``(rule, passed, measured, threshold)`` —
    ``measured`` is the satisfying fraction (for ``unique``:
    distinct/non-null — NULLs are ignored, the SQL UNIQUE/Deequ
    convention, so a sparse-but-duplicate-free column passes and a
    failing fraction really means duplicates), ``passed`` is
    ``measured >= threshold`` (unique requires exactly 1.0). Empty
    tables (and all-NULL columns under ``unique``) pass vacuously.

    EAGER like :func:`column_profile`: the one scan runs at call time
    and the returned verdict DataFrame is a small local one (one row per
    rule) — already computed, nothing re-triggers downstream.
    """
    if not rules:
        raise ValueError("check_constraints needs at least one rule")
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    for i, rule in enumerate(rules):
        col = F.col(rule.column)
        if rule.kind == "not_null":
            ok = col.isNotNull()
        elif rule.kind == "in_range":
            ok = col.isNotNull() & col.between(F.lit(rule.lo), F.lit(rule.hi))
        elif rule.kind == "accepted_values":
            ok = col.isin(list(rule.values or ()))
        elif rule.kind == "unique":
            aggs.append(F.count_distinct(col).alias(f"_r{i}"))
            aggs.append(F.count(col).alias(f"_nn{i}"))  # non-null count
            continue
        elif rule.kind == "freshness":
            aggs.append(F.max(col).alias(f"_r{i}"))
            continue
        elif rule.kind == "schema_matches":
            continue  # pure metadata — no scan contribution
        else:
            raise ValueError(f"unknown rule kind {rule.kind!r}")
        aggs.append(F.sum(ok.cast("long")).alias(f"_r{i}"))
    r = df.agg(*aggs).first()
    n = int(r["_n"])
    out = []
    for i, rule in enumerate(rules):
        if rule.kind == "freshness":
            # measured = observed lag in MINUTES; smaller is better, so
            # passed = measured <= threshold (inverted vs the fraction
            # rules); empty/all-NULL FAILS (measured NULL) by contract
            threshold = float(rule.hi)
            mx = r[f"_r{i}"]
            if mx is None:
                out.append((rule.name(), False, None, threshold))
                continue
            as_of = _dt.datetime.fromisoformat(str(rule.lo))
            delta = as_of - mx
            # exact integer microseconds, ONE float division — the same
            # arithmetic a SQL replay does (date_diff µs / 6e7), so the
            # two engines agree bit-for-bit
            us = (
                delta.days * 86_400_000_000
                + delta.seconds * 1_000_000
                + delta.microseconds
            )
            measured = round(us / 60_000_000, 6)
            out.append(
                (rule.name(), bool(measured <= threshold), measured,
                 threshold)
            )
            continue
        if rule.kind == "schema_matches":
            # fraction of union-columns matching by (name, type); the
            # gate passes only on exact schema equality
            ref = dict(rule.values or ())
            cur = {
                f.name: f.dataType.simpleString() for f in df.schema.fields
            }
            union = set(ref) | set(cur)
            n_match = sum(1 for c in union if ref.get(c) == cur.get(c))
            measured = round(n_match / len(union), 6) if union else 1.0
            out.append((rule.name(), measured >= 1.0, measured, 1.0))
            continue
        if rule.kind == "unique":
            nn = int(r[f"_nn{i}"])
            measured = 1.0 if nn == 0 else round(int(r[f"_r{i}"]) / nn, 6)
        elif n == 0:
            measured = 1.0
        else:
            measured = round(int(r[f"_r{i}"]) / n, 6)
        threshold = 1.0 if rule.kind == "unique" else float(rule.min_frac)
        out.append(
            (rule.name(), bool(measured >= threshold), measured, threshold)
        )
    return df.sparkSession.createDataFrame(
        out, "rule string, passed boolean, measured double, threshold double"
    )
