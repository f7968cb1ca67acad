"""Load-shedding / maintenance policies, recast as deterministic queries.

The reference drops or defers updates at enqueue time by comparing a
candidate record against the key's current state
(``ralf/operator.py:199-208``, ``ralf/policies/load_shedding_policy.py``).
Timing-dependent semantics don't transfer to batch; per SURVEY.md §2.2
P3-P5 each policy becomes a deterministic query:

- sampling shed  (``make_sampling_policy``, ``load_shedding_policy.py:53-57``)
- keep-latest    (``newer_processing_time`` / ``later_complete_time``,
                  ``load_shedding_policy.py:6-11,60-61``)
- change detection (``make_mean_policy`` / ``make_cosine_policy``,
                  ``load_shedding_policy.py:14-50``)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ralf_spark.functions.hashing import stable_hash64
from ralf_spark.table import FeatureTable


def sampling_shed(
    table: FeatureTable, rate: float, on: str | Column | None = None
) -> FeatureTable:
    """Drop records with probability ``1 - rate``
    (``load_shedding_policy.py:53-57`` uses ``random.random() < rate``).

    Deterministic re-spec: content-hash sampling — keep a row iff
    ``stable_hash64(on) % 10_000 < rate * 10_000``. Same sample on every
    run and on every engine (the hash is md5-based, reproducible in SQL),
    unlike seeded ``rand()`` whose stream is partitioning-dependent.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    col = on if on is not None else (table.seq or table.key)
    if col is None:
        raise ValueError("sampling_shed needs a column to hash")
    if isinstance(col, str):
        col = F.col(col)
    bucket = stable_hash64(col.cast("string")) % 10_000
    return table.filter(bucket < int(rate * 10_000))


def stratified_sample(
    table: FeatureTable,
    strata_col: str | Column,
    fractions: dict[str, float],
    on: str | Column | None = None,
    default_fraction: float = 0.0,
) -> FeatureTable:
    """Per-stratum deterministic sampling — the training-data rebalancing
    op (down-weight over-represented sources/languages, up-weight rare
    ones). ``fractions`` maps stratum value → keep rate.

    Hash-based like :func:`sampling_shed` (and unlike ``df.sampleBy``,
    whose seeded Bernoulli stream depends on partitioning): the same row
    set survives on every run, every engine, every partition layout —
    reproducible dataset builds are the point.
    """
    sc = F.col(strata_col) if isinstance(strata_col, str) else strata_col
    col = on if on is not None else (table.seq or table.key)
    if col is None:
        raise ValueError("stratified_sample needs a column to hash")
    if isinstance(col, str):
        col = F.col(col)
    for v, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {v!r} must be in [0, 1]")
    bucket = stable_hash64(col.cast("string")) % 10_000
    rate = F.lit(int(default_fraction * 10_000))
    for v, f in fractions.items():
        rate = F.when(sc == v, F.lit(int(f * 10_000))).otherwise(rate)
    return table.filter(bucket < rate)


def dataset_split(
    table: FeatureTable,
    weights: dict[str, float],
    on: str | Column | None = None,
    out_col: str = "split",
) -> FeatureTable:
    """Deterministic train/val/test assignment — every dataset build's
    last step. ``weights`` maps split name → proportion (must sum to ~1);
    a row's split is decided by its content hash, so the assignment is
    stable across runs, engines, and re-partitions (a seeded
    ``randomSplit`` is none of those), and adding rows never moves
    existing rows between splits.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1 (got {total})")
    col = on if on is not None else (table.seq or table.key)
    if col is None:
        raise ValueError("dataset_split needs a column to hash")
    if isinstance(col, str):
        col = F.col(col)
    bucket = stable_hash64(col.cast("string")) % 10_000
    expr = None
    acc = 0
    names = list(weights)
    for name in names[:-1]:
        acc += int(weights[name] * 10_000)
        case = F.when(bucket < acc, F.lit(name))
        expr = case if expr is None else expr.when(bucket < acc, F.lit(name))
    expr = (
        expr.otherwise(F.lit(names[-1]))
        if expr is not None
        else F.lit(names[-1])
    )
    return table.with_column(out_col, expr)


def domain_quota_cap(
    table: FeatureTable,
    domain_col: str,
    cap: int,
    quality_col: str,
) -> DataFrame:
    """Per-domain quota capping — the Common-Crawl-curation staple: no
    single domain may contribute more than ``cap`` documents, and when a
    domain is over quota the ``cap`` highest-``quality_col`` documents
    survive (ties → lowest id — fully deterministic). Returns every input
    row plus a ``kept`` boolean, so the caller chooses filter vs audit.

    Skew-aware plan (domains are the canonical skewed key — a handful of
    mega-domains vs a long tail): a map-side-partial count first splits
    the corpus; UNDER-cap domains are kept outright via an anti-join and
    never pay a sort, so the per-domain ranking window runs only over the
    over-quota slice. Joins against the over-cap domain list carry NO
    broadcast hint — it is usually tiny and AQE will broadcast it, but at
    100 TB with millions of over-cap domains a forced hint would OOM
    instead of degrading to a shuffle join.

    NULL domains form ONE group subject to the cap like any other —
    ``groupBy`` and ``Window.partitionBy`` already group NULLs together,
    and the over-cap semi/anti joins use null-safe equality (``<=>``) so
    an over-quota NULL group is ranked, not silently kept (ADVICE r5).
    """
    idc = table.key
    if idc is None:
        raise ValueError("domain_quota_cap needs a keyed table")
    df = table.df
    over = (
        df.groupBy(domain_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > cap)
        .select(F.col(domain_col).alias("_over_dom"))
    )
    cond = F.col(domain_col).eqNullSafe(F.col("_over_dom"))
    under_rows = df.join(over, cond, "left_anti").withColumn(
        "kept", F.lit(True)
    )
    w = Window.partitionBy(domain_col).orderBy(
        F.col(quality_col).desc(), F.col(idc)
    )
    over_rows = df.join(over, cond, "left_semi").withColumn(
        "kept", F.row_number().over(w) <= cap
    )
    return under_rows.unionByName(over_rows)


def budgeted_prefix_sample(
    table: FeatureTable,
    cost_col: str,
    budget: int,
    priority_col: str | None = None,
    bin_width: int = 100,
) -> DataFrame:
    """Global-budget corpus selection: walk the corpus in priority order
    (``priority_col`` DESC, ties → lowest id) and keep rows until their
    cumulative ``cost_col`` (tokens, chars, bytes) exceeds ``budget`` —
    the "take the best N-token subset" step of every budgeted dataset
    build. Returns all rows + ``kept``. Fully deterministic: the kept set
    is a prefix of a total order, independent of partitioning.

    The naive spelling — ``sum(cost) OVER (ORDER BY priority)`` with no
    PARTITION BY — collapses the whole corpus into ONE task (Spark plans
    a single-partition window), which is the canonical 100 TB cliff.
    Distributed spelling used here, a two-phase prefix sum:

    1. bin rows by fixed-width priority bands (``floor(priority /
       bin_width)`` — a pure row-local expression, monotone in the sort
       order, so bins ARE contiguous prefix segments);
    2. per-bin cost totals (map-side-partial agg over #bins rows) →
       exclusive prefix of higher bins via one window over the TINY bin
       table;
    3. intra-bin running sum windowed PER BIN + the bin's prefix offset.

    Every heavy operation is partitioned by bin; only the #bins-row
    summary passes through a global window. ``priority_col`` defaults to
    ``cost_col`` (prefer expensive = longest documents first).
    """
    idc = table.key
    if idc is None:
        raise ValueError("budgeted_prefix_sample needs a keyed table")
    pri = priority_col or cost_col
    df = table.df.withColumn(
        "_bin", F.floor(F.col(pri) / F.lit(bin_width)).cast("long")
    )
    bin_totals = df.groupBy("_bin").agg(
        F.sum(F.col(cost_col)).cast("long").alias("_bin_total")
    )
    wb = (
        Window.orderBy(F.col("_bin").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefixes = bin_totals.withColumn(
        "_prefix", F.coalesce(F.sum("_bin_total").over(wb), F.lit(0))
    ).select("_bin", "_prefix")
    wr = (
        Window.partitionBy("_bin")
        .orderBy(F.col(pri).desc(), F.col(idc))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        df.join(prefixes, "_bin")
        .withColumn(
            "_running",
            F.col("_prefix") + F.sum(F.col(cost_col)).over(wr),
        )
        .withColumn("kept", F.col("_running") <= F.lit(budget))
        .drop("_bin", "_prefix", "_running")
    )


def last_emitted_mask(vals, threshold: float, metric: str, last=None):
    """Numpy-stepped last-emitted scan (VERDICT r5 #5): given a key's
    value sequence, return ``(keep_mask, final_last_emitted)`` under the
    reference's shed recurrence — emit iff the value moved >= threshold
    vs the LAST EMITTED value (first value always emits; a shed value
    never updates the baseline).

    The recurrence is data-dependent (emission mutates the baseline), so
    no closed-form vectorization exists; but between two emissions the
    baseline is CONSTANT, so the next emission is "first index where
    moved(v, last)" — a searchable predicate. The scan adapts to the
    key's emission density: a 256-row scalar sample decides between (a)
    a metric-specialized plain-float loop (dense emissions — numpy's
    ~µs per-call overhead would dominate short gaps) and (b) galloping
    vectorized windows (128, doubling to 64k) that jump shed runs in C
    (sparse emissions — the shed operator's actual working regime).
    Measured on a 2M-row hot key: ~3-10× at sparse/medium emission,
    parity at dense (BENCH_NOTES r6). ``last=None`` starts fresh
    (batch); streaming seeds it from GroupState and stores the returned
    value. Zero-baseline convention: ``rel`` with last == 0.0 emits on
    any change.
    """
    import numpy as np

    vals = np.asarray(vals, dtype="float64")
    n = len(vals)
    # python-float list for the scalar paths (one C pass, beats boxed
    # element access); materialized lazily — the sparse/gallop path only
    # ever touches the first 256 + per-emission scalars
    lst = vals[:257].tolist()
    keep = [False] * n
    i = 0
    if last is None:
        if n == 0:
            return np.zeros(0, dtype=bool), None
        keep[0] = True
        last = lst[0]
        i = 1

    if metric == "abs":
        def scan_range(lo, hi, base):
            e = 0
            for j in range(lo, hi):
                if abs(lst[j] - base) >= threshold:
                    keep[j] = True
                    base = lst[j]
                    e += 1
            return base, e
    else:
        def scan_range(lo, hi, base):
            e = 0
            for j in range(lo, hi):
                v = lst[j]
                if (v != base if base == 0.0
                        else abs(v - base) / abs(base) >= threshold):
                    keep[j] = True
                    base = v
                    e += 1
            return base, e

    def gallop(start, base):
        # vectorized "first index >= start where moved(v, base)"
        j, step = start, 128
        while j < n:
            seg = vals[j:j + step]
            if metric == "abs":
                moved = np.abs(seg - base) >= threshold
            elif base == 0.0:
                moved = seg != base
            else:
                moved = np.abs(seg - base) / abs(base) >= threshold
            idx = int(np.argmax(moved))
            if moved[idx]:
                return j + idx
            j += len(seg)
            step = min(step * 2, 1 << 16)
        return -1

    sample_hi = min(n, i + 256)
    last, emits = scan_range(i, sample_hi, last)
    if sample_hi < n:
        if emits * 64 >= sample_hi - i:  # dense: stay scalar
            lst = vals.tolist()
            last, _ = scan_range(sample_hi, n, last)
        else:  # sparse: jump shed runs vectorized
            pos = sample_hi
            while pos < n:
                hit = gallop(pos, last)
                if hit < 0:
                    break
                keep[hit] = True
                last = float(vals[hit])
                pos = hit + 1
    return np.asarray(keep, dtype=bool), last


def keep_latest(table: FeatureTable) -> FeatureTable:
    """Process-only-newer policy in batch = keep the latest record per key
    (``newer_processing_time``, ``load_shedding_policy.py:6-7``; enforcement
    vs current state ``ralf/operator.py:199-208``)."""
    return table.latest()


def change_detection_filter(
    table: FeatureTable,
    value: str,
    threshold: float,
    metric: str = "abs",
    semantics: str = "last_emitted",
    payload_cols: list[str] | None = None,
) -> FeatureTable:
    """Approximate-maintenance filter: emit a key's update only when the
    feature moved more than ``threshold`` — the batch spelling of
    ``make_mean_policy`` (``load_shedding_policy.py:41-49``).

    ``semantics`` picks the comparison baseline:

    - ``"last_emitted"`` (default — the FAITHFUL reference semantics): a
      shed record never updates the state table (``ralf/operator.py:
      199-208`` skips ``event.process()``), so each candidate compares
      against the last value that was actually emitted. Inherently a
      per-key sequential scan → Arrow-batched ``applyInPandas``; one
      shuffle on the key, per-key groups stream through pandas.
      E.g. values [0, 9, 18] at threshold 10 emit 0 then 18.
    - ``"previous_row"``: compare against the immediately preceding row,
      emitted or not — a cheaper pure-window variant (``lag`` over one
      sort), NOT the reference behavior: [0, 9, 18] emits only 0.

    Zero-baseline convention for ``metric="rel"``: when the comparison
    baseline is exactly 0.0 the ratio is undefined; the engine emits on
    ANY change from zero (and sheds an exact repeat of zero). This is a
    deliberate divergence from the reference, whose mean policy divides
    unguarded and crashes the task
    (``ralf/policies/load_shedding_policy.py:46``).

    ``payload_cols`` prunes the ``last_emitted`` path's Arrow channel to
    the named columns (plus key/order/value) — the same lever as
    ``latest(payload_cols=...)``: the pass-through default round-trips
    EVERY column of the row through pandas, so a fat unused JSON/text
    column dominates the operator's cost (measured 5.1s → 1.6s at sf0.1
    just by not shipping ``props``, BENCH_NOTES r7; at 100 TB the
    payload is the whole bill). Catalyst cannot prune this for you — the
    apply-in-pandas schema is the contract — so callers that drop
    columns AFTER the filter should name the survivors here instead.
    """
    if table.key is None:
        raise ValueError("change_detection_filter requires a keyed table")
    if metric not in ("abs", "rel"):
        raise ValueError(f"unknown metric {metric!r}")
    if semantics == "previous_row":
        v = F.col(value)
        w = Window.partitionBy(table.key).orderBy(*table.order_cols())
        prev = F.lag(v).over(w)
        if metric == "abs":
            moved = F.abs(v - prev) >= threshold
        else:  # rel — emit on any change from a zero baseline
            moved = F.when(prev == 0, v != prev).otherwise(
                F.abs(v - prev) / F.abs(prev) >= threshold
            )
        keep = prev.isNull() | moved
        return table._with(
            table.df.withColumn("_keep", keep).where("_keep").drop("_keep")
        )
    if semantics != "last_emitted":
        raise ValueError(f"unknown semantics {semantics!r}")

    order = [c for c in (table.ts, table.seq) if c is not None]
    if not order:
        raise ValueError("last_emitted semantics needs ts/seq ordering")
    df = table.df
    if payload_cols is not None:
        needed, seen = [], set()
        for c in [table.key, *order, value, *payload_cols]:
            if c not in seen:
                needed.append(c)
                seen.add(c)
        df = df.select(*needed)
    schema = df.schema
    key = table.key

    # mapInPandas over key-clustered, key-sorted partitions instead of
    # groupBy.applyInPandas (r7): the grouped-map channel materializes
    # ONE pandas frame PER KEY, and its per-group machinery (~ms) — not
    # the scan — dominated at real key cardinality (measured 5.3s for
    # 1.5k keys / 100k rows at sf0.1; 3.5 ms/key × 10^8 keys would be
    # days). Same plan shape (one hash exchange + in-partition sort),
    # but Arrow frames are per-10k-rows; key runs are contiguous, and
    # the one piece of cross-frame state the recurrence needs — the
    # last-emitted baseline of the key straddling a frame boundary —
    # carries in the iterator (measured 5.3s → ~0.9s; BENCH_NOTES r7).
    def scan_stream(batches):
        import numpy as np
        import pandas as pd

        carry_key, carry_last = None, None
        first = True
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            keys = pdf[key]
            vals = pdf[value].to_numpy(dtype="float64")
            # null-safe run starts (groupBy groups all NULL keys as one)
            prev = keys.shift()
            changed = ~((keys == prev) | (keys.isna() & prev.isna()))
            changed.iloc[0] = True
            starts = np.flatnonzero(changed.to_numpy())
            ends = np.append(starts[1:], n)
            keep = np.zeros(n, dtype=bool)
            for s, e in zip(starts, ends):
                k = keys.iloc[s]
                same = (
                    not first
                    and s == 0
                    and (
                        (pd.isna(k) and pd.isna(carry_key))
                        or (not pd.isna(k) and k == carry_key)
                    )
                )
                seed = carry_last if same else None
                mask, last = last_emitted_mask(
                    vals[s:e], threshold, metric, seed
                )
                keep[s:e] = mask
                carry_key, carry_last = k, last
            first = False
            out = pdf[keep]
            if len(out):
                yield out

    pre = df.repartition(key).sortWithinPartitions(key, *order)
    out = pre.mapInPandas(scan_stream, schema)
    return table._with(out)


def change_detection_window(
    table: FeatureTable,
    window_col: str,
    order_col: str,
    threshold: float,
    metric: str = "mean_rel",
    seasonality: int = 24 * 7,
) -> FeatureTable:
    """Change detection over *window array* payloads vs the last emitted
    window — the reference's ``make_mean_policy`` / ``make_cosine_policy``
    shapes (``load_shedding_policy.py:14-50``; both reduce the
    ``window: List[Record]`` payload and compare against current state).

    - ``metric="mean_rel"``: relative change of the window sum (the
      reference's "mean" policy sums the window and takes
      ``|cand - curr| / |curr|``, ``:42-46``). A zero last-emitted sum
      emits on any change (the engine's zero-baseline convention — the
      reference divides unguarded and crashes, ``:46``).
    - ``metric="cosine"``: cosine *distance* (1 - cos) between candidate
      and last-emitted window vectors.
    - ``metric="cosine_seasonal"``: the reference's actual cosine policy
      (``make_cosine_policy``, ``:14-38``): rotate the last-emitted window
      by ``(Δorder*100) % seasonality + 1`` positions (aligning the same
      phase of a 24×7-step weekly cycle), score
      ``Σ|cand_i·rot_i| / (Σcand² · Σcurr²)``, and emit when the score
      reaches ``threshold``. ``seasonality`` defaults to the reference's
      ``24 * 7``.

    Per-key sequential scan via ``applyInPandas``: one shuffle on the key.
    """
    if table.key is None:
        raise ValueError("change_detection_window requires a keyed table")
    if metric not in ("mean_rel", "cosine", "cosine_seasonal"):
        raise ValueError(f"unknown metric {metric!r}")
    schema = table.df.schema

    key = table.key

    # mapInPandas over key-clustered sorted partitions (r7) — same
    # per-group-channel-overhead fix as the last_emitted path above; the
    # cross-frame carry is the straddling key's (last window, last order).
    def scan_stream(batches):
        import numpy as np
        import pandas as pd

        def step(cand, o, last, last_o):
            if last is None:
                return True
            if metric == "mean_rel":
                cur = last.sum()
                if cur == 0.0:  # zero baseline: emit on any change
                    return cand.sum() != cur
                return abs(cand.sum() - cur) / abs(cur) >= threshold
            if metric == "cosine":
                denom = np.linalg.norm(cand) * np.linalg.norm(last)
                cos = float(cand @ last) / denom if denom else 0.0
                return (1.0 - cos) >= threshold
            # cosine_seasonal — load_shedding_policy.py:16-38
            t = int(float(o) * 100 - float(last_o) * 100)
            off = t % seasonality + 1
            rot = np.concatenate([last[off:], last[:off]])
            a = float(np.abs(cand * rot).sum())
            b = float((cand * cand).sum())
            c = float((last * last).sum())
            score = a / (b * c) if b and c else 0.0
            return score >= threshold

        carry_key, last, last_o = None, None, None
        first = True
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            keys = pdf[key]
            prev = keys.shift()
            changed = ~((keys == prev) | (keys.isna() & prev.isna()))
            changed.iloc[0] = True
            run_start = changed.to_numpy()
            keep = []
            for i, (win, o, k, new_run) in enumerate(zip(
                pdf[window_col], pdf[order_col], keys, run_start
            )):
                if new_run:
                    same = (
                        not first and i == 0
                        and ((pd.isna(k) and pd.isna(carry_key))
                             or (not pd.isna(k) and k == carry_key))
                    )
                    if not same:
                        last, last_o = None, None
                    carry_key = k
                cand = np.asarray(list(win), dtype="float64")
                emit = step(cand, o, last, last_o)
                if emit:
                    last, last_o = cand, o
                keep.append(emit)
            first = False
            out = pdf[np.asarray(keep, dtype=bool)]
            if len(out):
                yield out

    pre = table.df.repartition(key).sortWithinPartitions(key, order_col)
    out = pre.mapInPandas(scan_stream, schema)
    return table._with(out)


# ------------------------------------------------------- robust outliers
#: scale factor making MAD a consistent sigma estimator under normality
MAD_SIGMA = 1.4826


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier flags: robust_z = (x - median) /
    (1.4826 * MAD), flagged when |robust_z| > threshold. Median/MAD
    resist the contamination that wrecks mean/stddev z-scores — the
    anomaly gate for feature pipelines (bad sensors, log corruption).

    Two exact-median passes over the group keys (Spark's ``median`` is a
    partial-aggregating sort-based exact aggregate); group stats are
    dimension-sized and broadcast back — rows shuffle only for the two
    per-group aggregations. Groups where MAD = 0 (constant bulk) yield
    NULL robust_z and are never flagged.
    """
    med = df.groupBy(group_col).agg(F.median(value_col).alias("_med"))
    dev = df.join(F.broadcast(med), group_col).withColumn(
        "_adev", F.abs(F.col(value_col) - F.col("_med"))
    )
    mad = dev.groupBy(group_col).agg(F.median("_adev").alias("_mad"))
    z = F.when(
        F.col("_mad") > 0,
        (F.col(value_col) - F.col("_med"))
        / (F.lit(MAD_SIGMA) * F.col("_mad")),
    )
    return (
        dev.join(F.broadcast(mad), group_col)
        .withColumn("robust_z", z)
        .withColumn(
            "is_outlier",
            F.coalesce(F.abs(F.col("robust_z")) > z_threshold, F.lit(False)),
        )
        .drop("_adev")
        .withColumnRenamed("_med", "group_median")
        .withColumnRenamed("_mad", "group_mad")
    )


def mixture_rates(
    counts: dict[str, int],
    weights: dict[str, int],
    grain: int = 10_000,
) -> dict[str, int]:
    """Feasible per-source keep THRESHOLDS (out of ``grain``) that realize
    a target mixture — the dataset-mixing staple (compose web/code/books
    at w_web : w_code : w_books): keep every row of the most-constrained
    source (the one with the smallest count/weight ratio) and sample the
    others down so surviving counts sit in the target proportions, i.e.
    the largest mixture the corpus can supply without up-sampling.

    EXACT integer arithmetic throughout (r9): s* = argmin count_s/w_s by
    cross-multiplied comparison (ties → smallest source name), and
    threshold_s = min(grain, grain·w_s·count_{s*} // (w_{s*}·count_s)) —
    a pure rational, so a SQL engine derives the identical thresholds
    from the identical counts (the gate's oracle does). Float rates would
    diverge in the last ulp across engines and flip hash rows.

    Sources with weight but no rows are vacuously unconstrained
    (threshold = grain) and excluded from the argmin. The realized mix
    deviates from the target by at most 1/grain per source (floor) plus
    hash-sampling noise O(1/√count)."""
    if grain <= 0:
        raise ValueError("grain must be positive")
    live = {s: c for s, c in counts.items()
            if s in weights and c > 0}
    for s, w in weights.items():
        if not isinstance(w, int) or w <= 0:
            raise ValueError(f"weight for {s!r} must be a positive int")
    if not live:
        return {s: grain for s in weights}
    # exact argmin of count/weight via cross-multiplication
    star = None
    for s in sorted(live):
        if star is None or (
            live[s] * weights[star] < live[star] * weights[s]
        ):
            star = s
    out = {}
    for s in weights:
        c = live.get(s)
        if c is None:
            out[s] = grain
        else:
            out[s] = min(
                grain,
                grain * weights[s] * live[star] // (weights[star] * c),
            )
    return out


def mixture_sample(
    table: FeatureTable,
    source_col: str,
    weights: dict[str, int],
    on: str | Column | None = None,
    grain: int = 10_000,
) -> DataFrame:
    """Deterministic source-mixture sampling: down-sample each source so
    the SURVIVORS sit in the ``weights`` proportions (the largest such
    mixture the corpus supports — see :func:`mixture_rates`). Returns
    every input row of a weighted source plus a ``kept`` boolean (the
    :func:`domain_quota_cap` audit contract); rows whose source carries
    no weight are excluded (they are not part of the recipe).

    Plan: ONE map-side-partial count per source (collected — source
    cardinality is recipe-sized by contract), thresholds derived
    driver-side in exact ints, then a row-local hash test — no shuffle
    beyond the count; the sample itself never re-scans. Hash-based like
    :func:`stratified_sample`: the surviving set is stable across runs,
    engines, and partition layouts."""
    idc = on if on is not None else (table.seq or table.key)
    if idc is None:
        raise ValueError("mixture_sample needs a column to hash")
    if isinstance(idc, str):
        idc = F.col(idc)
    sc = F.col(source_col)
    df = table.df.where(sc.isin(list(weights)))
    counts = {
        r[0]: r[1]
        for r in df.groupBy(sc).agg(F.count(F.lit(1))).collect()
    }
    thresholds = mixture_rates(counts, weights, grain)
    thr = F.lit(0)
    for s, t in thresholds.items():
        thr = F.when(sc == s, F.lit(t)).otherwise(thr)
    bucket = stable_hash64(idc.cast("string"), salt="mix") % grain
    return df.withColumn("kept", bucket < thr)


def mixture_repeat_factors(
    counts: dict[str, int],
    weights: dict[str, int],
    grain: int = 10_000,
) -> dict[str, tuple[int, int]]:
    """UP-sampling twin of :func:`mixture_rates`: per-source repeat
    factors (full_copies, extra_copy_threshold) that realize the target
    mixture by REPEATING scarce sources (the epoch-style recipe — books
    seen ~3×/epoch) instead of discarding rich ones. The RICHEST
    count/weight source is emitted exactly once; source s repeats
    r_s = (w_s·c_big)/(w_big·c_s) ≥ 1 times — ``full_copies = ⌊r_s⌋``
    copies always, plus one more iff the row's hash bucket falls under
    ``extra_copy_threshold`` (= grain·frac(r_s), floored). All exact
    integer rationals, same cross-engine contract as
    :func:`mixture_rates`; zero-count / absent sources get (1, 0)."""
    if grain <= 0:
        raise ValueError("grain must be positive")
    live = {s: c for s, c in counts.items() if s in weights and c > 0}
    for s, w in weights.items():
        if not isinstance(w, int) or w <= 0:
            raise ValueError(f"weight for {s!r} must be a positive int")
    if not live:
        return {s: (1, 0) for s in weights}
    big = None  # exact argmax of count/weight, ties -> smallest name
    for s in sorted(live):
        if big is None or (live[s] * weights[big] > live[big] * weights[s]):
            big = s
    out = {}
    for s in weights:
        c = live.get(s)
        if c is None:
            out[s] = (1, 0)
        else:
            num, den = weights[s] * live[big], weights[big] * c
            full = num // den
            out[s] = (full, grain * (num - full * den) // den)
    return out


def mixture_upsample(
    table: FeatureTable,
    source_col: str,
    weights: dict[str, int],
    on: str | Column | None = None,
    grain: int = 10_000,
    copy_col: str = "copy",
) -> DataFrame:
    """Realize a target source mixture by REPETITION
    (:func:`mixture_repeat_factors`): every row of a weighted source is
    emitted ``full_copies`` times, plus one extra copy decided by the
    row's content hash — deterministic fractional epochs. Output = the
    input columns plus ``copy_col`` (0-based repeat index, so downstream
    keys stay unique as (key, copy)); unweighted sources are excluded.

    Plan: one map-side-partial count per source (collected — recipe-sized
    by contract), then a row-local ``explode(sequence(...))`` whose
    fan-out is the per-row copy count — output-sized, the same bounded
    explode contract as the sliding-window explode strategy. No shuffle
    beyond the count."""
    idc = on if on is not None else (table.seq or table.key)
    if idc is None:
        raise ValueError("mixture_upsample needs a column to hash")
    if isinstance(idc, str):
        idc = F.col(idc)
    sc = F.col(source_col)
    df = table.df.where(sc.isin(list(weights)))
    cnts = {
        r[0]: r[1]
        for r in df.groupBy(sc).agg(F.count(F.lit(1))).collect()
    }
    factors = mixture_repeat_factors(cnts, weights, grain)
    full = F.lit(1)
    thr = F.lit(0)
    for s, (nf, t) in factors.items():
        full = F.when(sc == s, F.lit(nf)).otherwise(full)
        thr = F.when(sc == s, F.lit(t)).otherwise(thr)
    bucket = stable_hash64(idc.cast("string"), salt="mix") % grain
    # n_copies >= 1 always: the richest source's factor is exactly (1, 0)
    # and every repeat factor is >= 1 by the argmax construction
    n_copies = full + (bucket < thr).cast("int")
    return df.withColumn(
        copy_col, F.explode(F.sequence(F.lit(0), n_copies - 1))
    )
