"""Policy operator contract tests (P3-P5), incl. the last-emitted vs
previous-row change-detection divergence the reference semantics require."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ralf_spark.operators.policies import (
    change_detection_filter,
    change_detection_window,
    keep_latest,
    sampling_shed,
)
from ralf_spark.table import FeatureTable


def _seq(spark, values):
    rows = [("k", i, i, float(v)) for i, v in enumerate(values)]
    return FeatureTable(
        spark.createDataFrame(rows, "k string, ts long, seq long, value double"),
        key="k", ts="ts", seq="seq",
    )


def test_last_emitted_vs_previous_row_divergence(spark):
    # The ADVICE case: [0, 9, 18] at threshold 10.
    # Reference (last emitted): 0 emits; 9 compares to 0 -> shed (state
    # stays 0); 18 compares to 0 -> emits. Previous-row: 18 compares to 9
    # -> shed.
    t = _seq(spark, [0, 9, 18])
    le = change_detection_filter(t, "value", 10.0, semantics="last_emitted")
    pr = change_detection_filter(t, "value", 10.0, semantics="previous_row")
    assert sorted(r.value for r in le.df.collect()) == [0.0, 18.0]
    assert sorted(r.value for r in pr.df.collect()) == [0.0]


def test_last_emitted_rel_metric(spark):
    # rel threshold 0.5 vs last emitted: 100 emits; 120 (20%) shed;
    # 160 (60% vs 100) emits; 200 (25% vs 160) shed.
    t = _seq(spark, [100, 120, 160, 200])
    out = change_detection_filter(
        t, "value", 0.5, metric="rel", semantics="last_emitted"
    )
    assert sorted(r.value for r in out.df.collect()) == [100.0, 160.0]


def test_change_detection_rejects_bad_args(spark):
    t = _seq(spark, [1, 2])
    with pytest.raises(ValueError):
        change_detection_filter(t, "value", 1.0, metric="nope")
    with pytest.raises(ValueError):
        change_detection_filter(t, "value", 1.0, semantics="nope")


def test_window_mean_rel_last_emitted(spark):
    # windows sums: [10, 11, 14] with rel threshold 0.3:
    # 10 emits; 11 (10%) shed; 14 (40% vs 10) emits.
    rows = [
        ("k", 0, [5.0, 5.0]),
        ("k", 1, [5.0, 6.0]),
        ("k", 2, [7.0, 7.0]),
    ]
    t = FeatureTable(
        spark.createDataFrame(rows, "k string, wid long, vals array<double>"),
        key="k",
    )
    out = change_detection_window(
        t, window_col="vals", order_col="wid", threshold=0.3, metric="mean_rel"
    )
    assert sorted(r.wid for r in out.df.collect()) == [0, 2]


def test_window_cosine_last_emitted(spark):
    # same direction -> cos dist 0 -> shed; orthogonal -> dist 1 -> emit
    rows = [
        ("k", 0, [1.0, 0.0]),
        ("k", 1, [2.0, 0.0]),   # parallel to window 0 -> shed
        ("k", 2, [0.0, 1.0]),   # orthogonal to last emitted -> emit
        ("k", 3, [0.0, 5.0]),   # parallel to window 2 -> shed
    ]
    t = FeatureTable(
        spark.createDataFrame(rows, "k string, wid long, vals array<double>"),
        key="k",
    )
    out = change_detection_window(
        t, window_col="vals", order_col="wid", threshold=0.5, metric="cosine"
    )
    assert sorted(r.wid for r in out.df.collect()) == [0, 2]


def test_window_cosine_seasonal_matches_reference_formula(spark):
    """cosine_seasonal replays make_cosine_policy exactly
    (ralf/policies/load_shedding_policy.py:14-38): rotate the last-emitted
    window by (Δorder*100) % seasonality + 1, score Σ|c·rot|/(Σc²·Σcurr²),
    emit at score >= threshold. Verified against a plain-Python replay of
    the reference loop on the same data."""
    import numpy as np

    rng = [
        ("k", i, [float((i * 7 + j * 3) % 5 + 1) for j in range(6)])
        for i in range(8)
    ]
    seasonality, threshold = 4, 0.02

    # plain-Python replay of the reference policy
    want, last, last_o = [], None, None
    for _, o, win in rng:
        cand = np.asarray(win)
        if last is None:
            emit = True
        else:
            t = int(o * 100 - last_o * 100)
            off = t % seasonality + 1
            rot = np.concatenate([last[off:], last[:off]])
            score = float(np.abs(cand * rot).sum()) / (
                float((cand**2).sum()) * float((last**2).sum())
            )
            emit = score >= threshold
        if emit:
            last, last_o = cand, o
            want.append(o)

    t = FeatureTable(
        spark.createDataFrame(rng, "k string, wid long, vals array<double>"),
        key="k",
    )
    out = change_detection_window(
        t, window_col="vals", order_col="wid", threshold=threshold,
        metric="cosine_seasonal", seasonality=seasonality,
    )
    got = sorted(r.wid for r in out.df.collect())
    assert got == want
    assert 0 < len(got) < len(rng)  # the test must exercise both outcomes


def test_sampling_shed_deterministic_and_ratioed(spark):
    t = FeatureTable(
        spark.range(0, 10_000).select(
            F.col("id").alias("seq"), F.col("id").alias("k")
        ),
        key="k", seq="seq",
    )
    a = sampling_shed(t, 0.25, on=F.col("seq")).df.count()
    b = sampling_shed(t, 0.25, on=F.col("seq")).df.count()
    assert a == b
    assert 0.2 < a / 10_000 < 0.3


def test_keep_latest_is_latest_per_key(spark):
    rows = [("a", 1, 1, 10.0), ("a", 2, 2, 20.0), ("b", 1, 3, 5.0)]
    t = FeatureTable(
        spark.createDataFrame(rows, "k string, ts long, seq long, value double"),
        key="k", ts="ts", seq="seq",
    )
    out = {r.k: r.value for r in keep_latest(t).df.collect()}
    assert out == {"a": 20.0, "b": 5.0}


def test_domain_quota_cap_contract(spark):
    """Over-quota domains keep exactly cap best-by-quality docs (ties ->
    lowest id); under-cap domains are fully kept and never enter the
    ranking window."""
    from ralf_spark.operators.policies import domain_quota_cap
    from ralf_spark.table import FeatureTable

    rows = (
        [(i, "big", float(100 - i)) for i in range(10)]   # over cap
        + [(20, "big", 90.0), (21, "big", 90.0)]          # quality ties
        + [(30, "small", 1.0), (31, "small", 2.0)]        # under cap
    )
    t = FeatureTable(
        spark.createDataFrame(rows, "doc_id long, source string, q double"),
        key="doc_id",
    )
    out = {r.doc_id: r.kept for r in
           domain_quota_cap(t, "source", cap=3, quality_col="q").collect()}
    assert len(out) == len(rows)                       # audit mode: all rows
    assert out[30] and out[31]                         # under-cap: all kept
    kept_big = sorted(i for i, (d, s, q) in
                      zip([r[0] for r in rows], rows) if s == "big" and out[i])
    # top-3 by quality: docs 0 (100), 1 (99), 2 (98); the 90.0 tie pair
    # loses to them and between themselves lower id would win first
    assert kept_big == [0, 1, 2]


def test_budgeted_prefix_sample_matches_greedy_and_stays_partitioned(spark):
    """The two-phase prefix sum must (a) compute exactly the greedy
    priority-order prefix - including rows straddling bin boundaries -
    and (b) keep the heavy window partitioned by bin: the only
    single-partition exchange in the plan is the #bins-row summary."""
    from ralf_spark.operators.policies import budgeted_prefix_sample
    from ralf_spark.plans.explain import explain_str
    from ralf_spark.table import FeatureTable

    rows = [(i, (i * 37) % 250 + 1) for i in range(60)]  # costs 1..250
    t = FeatureTable(
        spark.createDataFrame(rows, "doc_id long, cost long"), key="doc_id"
    )
    budget = 2000
    out = budgeted_prefix_sample(t, "cost", budget, bin_width=50)
    got = {r.doc_id: r.kept for r in out.collect()}
    # driver-side greedy reference
    acc, want = 0, {}
    for doc_id, cost in sorted(rows, key=lambda r: (-r[1], r[0])):
        acc += cost
        want[doc_id] = acc <= budget
    assert got == want
    assert any(got.values()) and not all(got.values())
    import re

    plan = explain_str(out)
    specs = re.findall(r"windowspecdefinition\([^)]*\)", plan)
    assert specs, plan
    for spec in specs:
        # every window whose running sum touches per-row cost must be
        # PARTITIONED by the bin; only the #bins-row summary window
        # (over _bin_total) may be global
        if "cost#" in spec:
            assert "_bin#" in spec, spec


def test_rel_zero_baseline_emits_on_any_change(spark):
    """Zero-baseline convention (VERDICT r5 / ADVICE r5): a rel metric
    with a 0.0 baseline emits on ANY change and sheds an exact repeat of
    zero, in BOTH batch spellings — the reference divides unguarded and
    crashes (load_shedding_policy.py:46)."""
    # walk at rel threshold 0.5: 0 emit (first); 0 shed (repeat of zero);
    # 5 emit (change from zero); 5 shed (0%); 0 emit (100%);
    # 0 shed (repeat of zero); 7 emit (change from zero)
    t = _seq(spark, [0, 0, 5, 5, 0, 0, 7])
    le = change_detection_filter(
        t, "value", 0.5, metric="rel", semantics="last_emitted"
    )
    assert sorted(r.seq for r in le.df.collect()) == [0, 2, 4, 6]
    # previous_row baselines happen to coincide on this sequence
    pr = change_detection_filter(
        t, "value", 0.5, metric="rel", semantics="previous_row"
    )
    assert sorted(r.seq for r in pr.df.collect()) == [0, 2, 4, 6]


@pytest.mark.slow
def test_streaming_rel_zero_baseline_matches_batch(spark, tmp_path):
    """The stateful streaming policy shares the zero-baseline convention
    (emit on any change from 0.0) instead of raising ZeroDivisionError
    inside the pandas scan (ADVICE r5)."""
    from ralf_spark.streaming import (
        file_events,
        run_bounded,
        streaming_change_detection_filter,
        write_memory,
    )

    rows = [(i, 7, float(v)) for i, v in enumerate([0, 0, 5, 5, 0, 0, 7])]
    src = str(tmp_path / "zero_src")
    spark.createDataFrame(
        rows, "event_id long, user_id long, value double"
    ).coalesce(1).write.parquet(src)
    stream = file_events(
        spark, src, schema="event_id long, user_id long, value double"
    )
    out = streaming_change_detection_filter(
        stream, threshold=0.5, metric="rel", order_cols=("event_id",)
    )
    run_bounded(
        write_memory(out, "chg_zero_stream"),
        checkpoint=str(tmp_path / "ck"),
        shuffle_partitions=2,
    )
    got = sorted(r.event_id for r in spark.table("chg_zero_stream").collect())
    assert got == [0, 2, 4, 6]


def test_window_mean_rel_zero_baseline(spark):
    # window sums [0, 0, 3]: 0 emits (first); repeat of zero sheds;
    # any change from a zero baseline emits
    rows = [
        ("k", 0, [1.0, -1.0]),
        ("k", 1, [2.0, -2.0]),
        ("k", 2, [1.0, 2.0]),
    ]
    t = FeatureTable(
        spark.createDataFrame(rows, "k string, wid long, vals array<double>"),
        key="k",
    )
    out = change_detection_window(
        t, window_col="vals", order_col="wid", threshold=0.3, metric="mean_rel"
    )
    assert sorted(r.wid for r in out.df.collect()) == [0, 2]


def test_domain_quota_cap_null_domain_is_capped(spark):
    """NULL domains form one cappable group (ADVICE r5): the null-safe
    semi/anti joins must route an over-quota NULL group through the
    ranking window instead of keeping it wholesale."""
    from ralf_spark.operators.policies import domain_quota_cap

    rows = [(i, None, float(10 - i)) for i in range(5)] + [
        (10, "a", 1.0), (11, "a", 2.0)
    ]
    t = FeatureTable(
        spark.createDataFrame(rows, "doc_id long, source string, q double"),
        key="doc_id",
    )
    out = {r.doc_id: r.kept for r in
           domain_quota_cap(t, "source", cap=2, quality_col="q").collect()}
    assert len(out) == len(rows)
    # NULL group over quota: top-2 by quality (docs 0, 1) survive
    assert [i for i in range(5) if out[i]] == [0, 1]
    assert out[10] and out[11]  # under-cap named domain untouched


def test_mixture_rates_exact_rationals_and_edges():
    """r9: waterfilling thresholds — the scarcest count/weight source
    keeps everything, others scale by the exact integer rational;
    zero-count and absent sources are vacuously unconstrained; ties in
    the argmin break to the smallest source name."""
    import pytest

    from ralf_spark.operators.policies import mixture_rates

    t = mixture_rates({"web": 1000, "code": 100, "books": 50},
                      {"web": 5, "code": 3, "books": 2})
    assert t == {"web": 1250, "code": 7500, "books": 10_000}
    # tie: both ratios equal -> 'a' is the star; both keep everything
    t2 = mixture_rates({"a": 10, "b": 20}, {"a": 1, "b": 2})
    assert t2 == {"a": 10_000, "b": 10_000}
    # zero-count source: unconstrained, and not the argmin
    t3 = mixture_rates({"a": 100, "b": 0}, {"a": 1, "b": 1})
    assert t3 == {"a": 10_000, "b": 10_000}
    assert mixture_rates({}, {"a": 1}) == {"a": 10_000}
    with pytest.raises(ValueError):
        mixture_rates({"a": 1}, {"a": 0})
    with pytest.raises(ValueError):
        mixture_rates({"a": 1}, {"a": 1.5})  # type: ignore[dict-item]


def test_mixture_sample_realizes_target_proportions(spark):
    """End-to-end on a deliberately imbalanced corpus: survivors sit
    within sampling noise of the 5:3:2 recipe, the scarcest source is
    kept whole, unweighted sources are excluded, and the row set is
    deterministic across invocations."""
    from ralf_spark.operators.policies import mixture_sample
    from ralf_spark.table import FeatureTable

    rows = (
        [(i, "web") for i in range(4000)]
        + [(10_000 + i, "code") for i in range(1200)]
        + [(20_000 + i, "books") for i in range(300)]
        + [(30_000 + i, "junk") for i in range(500)]
    )
    t = FeatureTable(
        spark.createDataFrame(rows, "doc_id long, source string"),
        key="doc_id",
    )
    out = mixture_sample(t, "source", {"web": 5, "code": 3, "books": 2})
    kept = {
        r[0]: r[1]
        for r in out.where("kept").groupBy("source").count().collect()
    }
    assert "junk" not in kept and set(kept) == {"web", "code", "books"}
    assert kept["books"] == 300  # scarcest (300/2=150): kept whole
    # targets: web = 5/2*300 = 750, code = 3/2*300 = 450; hash noise
    assert abs(kept["web"] - 750) < 80
    assert abs(kept["code"] - 450) < 60
    again = {
        r[0]: r[1]
        for r in mixture_sample(
            t, "source", {"web": 5, "code": 3, "books": 2}
        ).where("kept").groupBy("source").count().collect()
    }
    assert again == kept


def test_mixture_upsample_factors_and_output(spark):
    """r9: repeat factors are exact rationals (richest source exactly
    once), the exploded output realizes the mix, copy indexes are dense
    per row, and the emitted set is deterministic."""
    from ralf_spark.operators.policies import (
        mixture_repeat_factors,
        mixture_upsample,
    )
    from ralf_spark.table import FeatureTable

    assert mixture_repeat_factors(
        {"web": 1000, "code": 100}, {"web": 5, "code": 3}
    ) == {"web": (1, 0), "code": (6, 0)}
    assert mixture_repeat_factors(
        {"a": 300, "b": 100}, {"a": 2, "b": 1}
    ) == {"a": (1, 0), "b": (1, 5000)}
    assert mixture_repeat_factors({}, {"a": 1}) == {"a": (1, 0)}

    rows = (
        [(i, "web") for i in range(900)]
        + [(10_000 + i, "books") for i in range(100)]
    )
    t = FeatureTable(
        spark.createDataFrame(rows, "doc_id long, source string"),
        key="doc_id",
    )
    out = mixture_upsample(t, "source", {"web": 3, "books": 2})
    emitted = {
        r[0]: r[1] for r in out.groupBy("source").count().collect()
    }
    assert emitted["web"] == 900  # richest: exactly once
    # books repeat r = 2*900/(3*100) = 6 exactly -> 600 emitted
    assert emitted["books"] == 600
    copies = out.where("source = 'books'").groupBy("doc_id").count()
    assert {r[1] for r in copies.collect()} == {6}
    # fractional case: per-row copy index is dense 0..n-1
    out2 = mixture_upsample(t, "source", {"web": 1, "books": 1})
    one = out2.where("doc_id = 10000").select("copy").collect()
    assert sorted(r[0] for r in one) == list(range(len(one)))
