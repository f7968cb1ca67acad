"""Data-quality operators (r7): column profiling + constraint checks.

Oracle parity for the fixture-table gates lives in the registry
(events_column_profile / events_quality_gate); these tests pin the
operator contracts on handcrafted data — nulls, empty tables, failing
rules, fraction thresholds — and that everything is ONE aggregation
pass (no per-rule scans)."""

from __future__ import annotations

import pytest

from ralf_spark.operators.quality import (
    Rule,
    accepted_values,
    check_constraints,
    column_profile,
    in_range,
    not_null,
    unique,
)


def _df(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", 20.0),
            (3, None, 30.0),
            (3, "a", None),
            (4, "zz", -5.0),
        ],
        "id long, cat string, v double",
    )


def test_column_profile_metrics(spark):
    prof = {
        r.column: r for r in column_profile(_df(spark)).collect()
    }
    assert set(prof) == {"id", "cat", "v"}
    pid = prof["id"]
    assert (pid.n_rows, pid.n_nulls, pid.n_distinct) == (5, 0, 4)
    assert (pid.min_repr, pid.max_repr) == ("1", "4")
    assert pid.mean == pytest.approx(13 / 5)
    pcat = prof["cat"]
    assert (pcat.n_nulls, pcat.n_distinct) == (1, 3)
    assert pcat.null_frac == pytest.approx(0.2)
    assert pcat.mean is None  # non-numeric
    pv = prof["v"]
    assert (pv.n_nulls, pv.min_repr) == (1, "-5.0")


def test_column_profile_approx_mode_and_empty(spark):
    prof = {
        r.column: r.n_distinct
        for r in column_profile(_df(spark), ["id"],
                                exact_distinct=False).collect()
    }
    assert abs(prof["id"] - 4) <= 1  # HLL++ on 4 values is ~exact
    empty = spark.createDataFrame([], "id long")
    row = column_profile(empty).collect()[0]
    assert (row.n_rows, row.n_nulls, row.null_frac) == (0, 0, 0.0)


def test_check_constraints_verdicts(spark):
    out = {
        r.rule: (r.passed, r.measured)
        for r in check_constraints(
            _df(spark),
            [
                not_null("id"),
                not_null("cat"),              # fails: 1 null of 5
                not_null("cat", min_frac=0.8),  # passes at threshold
                unique("id"),                 # fails: 3 duplicated
                in_range("v", 0.0, 100.0),    # fails: -5 and a NULL
                in_range("v", -10.0, 100.0, min_frac=0.8),
                accepted_values("cat", ["a", "b"], min_frac=0.6),
            ],
        ).collect()
    }
    assert out["not_null(id)"] == (True, 1.0)
    assert out["not_null(cat)"] == (False, 0.8)
    assert out["not_null(cat) >= 0.8"] == (True, 0.8)
    assert out["unique(id)"] == (False, 0.8)
    assert out["in_range(v, 0.0, 100.0)"] == (False, 0.6)
    assert out["in_range(v, -10.0, 100.0) >= 0.8"] == (True, 0.8)
    assert out["accepted_values(cat, {a, b}) >= 0.6"] == (True, 0.6)


def test_check_constraints_edges(spark):
    empty = spark.createDataFrame([], "id long")
    rows = check_constraints(empty, [not_null("id"), unique("id")]).collect()
    assert all(r.passed and r.measured == 1.0 for r in rows)
    with pytest.raises(ValueError):
        check_constraints(_df(spark), [])
    with pytest.raises(ValueError):
        check_constraints(_df(spark), [Rule("weird", "id")])


@pytest.mark.slow
def test_psi_drift_contract(spark):
    """PSI: identical distributions score ~0; a shifted candidate scores
    high; grouped and ungrouped shapes agree; validation errors."""
    import math

    from ralf_spark.operators.quality import psi_drift

    base = spark.createDataFrame(
        [("g", float(i % 10)) for i in range(1000)], "g string, v double"
    )
    same = psi_drift(base, base, "v", bins=5, lo=0.0, hi=10.0).first().psi
    assert same == 0.0
    shifted = spark.createDataFrame(
        [("g", float(i % 10) + 6.0) for i in range(1000)],
        "g string, v double",
    )
    drift = psi_drift(base, shifted, "v", bins=5, lo=0.0, hi=10.0).first().psi
    assert drift > 0.25  # the "drifted" band
    grouped = psi_drift(
        base, shifted, "v", group_cols=["g"], bins=5, lo=0.0, hi=10.0
    ).collect()
    assert len(grouped) == 1 and math.isclose(grouped[0].psi, drift)
    # default lo/hi come from the baseline; out-of-range clamps to edges
    auto = psi_drift(base, shifted, "v", bins=5).first().psi
    assert auto > 0.25
    with pytest.raises(ValueError):
        psi_drift(base, base, "v", bins=1)
    with pytest.raises(ValueError):
        psi_drift(base, base, "v", lo=5.0, hi=5.0)
    with pytest.raises(ValueError):
        psi_drift(spark.createDataFrame([], "v double"), base, "v")


@pytest.mark.slow
def test_foreach_batch_quality_log(spark, tmp_path):
    """Streaming quality monitor: per-micro-batch constraint verdicts
    append under _batch partitions; a batch with a violation logs its
    failing rule with the measured fraction; replaying a batch id
    rewrites in place (no duplicate log rows)."""
    from ralf_spark.streaming import (
        file_events,
        foreach_batch_quality_log,
        run_bounded,
    )

    src = str(tmp_path / "src")
    schema = "id long, v double"
    spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(3, -5.0), (4, 30.0)], schema  # -5 violates the range rule
    ).coalesce(1).write.mode("append").parquet(src)
    out = str(tmp_path / "qlog")
    stream = file_events(spark, src, schema=schema, max_files_per_trigger=1)
    run_bounded(
        foreach_batch_quality_log(
            stream, [not_null("id"), in_range("v", 0.0, 100.0)], out
        ),
        checkpoint=str(tmp_path / "ck"),
        shuffle_partitions=2,
    )
    rows = {
        (r._batch, r.rule): (r.passed, r.measured)
        for r in spark.read.parquet(out).collect()
    }
    assert len(rows) == 4  # 2 batches x 2 rules
    batches = sorted({b for b, _ in rows})
    good = [b for b in batches
            if rows[(b, "in_range(v, 0.0, 100.0)")][0]]
    bad = [b for b in batches
           if not rows[(b, "in_range(v, 0.0, 100.0)")][0]]
    assert len(good) == len(bad) == 1
    assert rows[(bad[0], "in_range(v, 0.0, 100.0)")] == (False, 0.5)
    assert all(rows[(b, "not_null(id)")] == (True, 1.0) for b in batches)
    # replay: re-logging the same batch id rewrites its own partition in
    # place (dynamic overwrite) — no duplicate log rows
    from pyspark.sql import functions as F

    from ralf_spark.operators.quality import check_constraints

    (
        check_constraints(
            spark.createDataFrame([(1, 10.0), (2, 20.0)], schema),
            [not_null("id"), in_range("v", 0.0, 100.0)],
        )
        .withColumn("_batch", F.lit("b0"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch")
        .parquet(out)
    )
    assert spark.read.parquet(out).count() == 4


def test_unique_ignores_nulls(spark):
    """r7 review: uniqueness is distinct/non-null (SQL UNIQUE / Deequ
    convention) — a sparse but duplicate-free column passes, and a
    failing fraction always means actual duplicates."""
    df = spark.createDataFrame(
        [(1,), (2,), (3,), (None,)], "id long"
    )
    r = check_constraints(df, [unique("id")]).collect()[0]
    assert (r.passed, r.measured) == (True, 1.0)
    dup = spark.createDataFrame(
        [(1,), (1,), (None,), (None,)], "id long"
    )
    r2 = check_constraints(dup, [unique("id")]).collect()[0]
    assert (r2.passed, r2.measured) == (False, 0.5)
    allnull = spark.createDataFrame([(None,), (None,)], "id long")
    r3 = check_constraints(allnull, [unique("id")]).collect()[0]
    assert (r3.passed, r3.measured) == (True, 1.0)  # vacuous


def test_psi_drift_empty_side_is_null_not_eps_score(spark):
    """r7 review: a group with zero rows on one side (e.g. a mistakenly
    empty candidate write) scores psi = NULL — 'not comparable' — rather
    than a finite number fabricated from eps-floored proportions."""
    from ralf_spark.operators.quality import psi_drift

    base = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 3.0)], "g string, v double"
    )
    cand = spark.createDataFrame(
        [("a", 1.5), ("a", 2.5)], "g string, v double"
    )
    out = {
        r.g: r.psi
        for r in psi_drift(
            base, cand, "v", group_cols=["g"], bins=4, lo=0.0, hi=4.0
        ).collect()
    }
    assert out["a"] is not None
    assert out["b"] is None  # candidate side empty for group b
    # ungrouped degenerate: empty candidate with explicit bounds
    empty = spark.createDataFrame([], "g string, v double")
    row = psi_drift(base, empty, "v", bins=4, lo=0.0, hi=4.0).first()
    assert row.psi is None


def test_freshness_rule_lag_and_failure_modes(spark):
    """r7: freshness measures observed lag in minutes against an
    explicit as_of (passed = measured <= threshold, inverted vs the
    fraction rules); empty tables and all-NULL columns FAIL instead of
    passing vacuously."""
    from ralf_spark.operators.quality import freshness

    df = spark.createDataFrame(
        [("2024-01-01 10:00:00",), ("2024-01-01 11:30:00",)],
        "ts_s string",
    ).selectExpr("CAST(ts_s AS TIMESTAMP_NTZ) AS ts")
    rows = check_constraints(
        df,
        [
            freshness("ts", 60.0, "2024-01-01 12:00:00"),   # lag 30 ok
            freshness("ts", 15.0, "2024-01-01 12:00:00"),   # lag 30 fail
        ],
    ).collect()
    by = {r.rule: r for r in rows}
    ok = by["freshness(ts, 60.0 min @ 2024-01-01 12:00:00)"]
    assert (ok.passed, ok.measured, ok.threshold) == (True, 30.0, 60.0)
    bad = by["freshness(ts, 15.0 min @ 2024-01-01 12:00:00)"]
    assert (bad.passed, bad.measured) == (False, 30.0)

    empty = spark.createDataFrame([], "ts timestamp_ntz")
    r = check_constraints(
        empty, [freshness("ts", 60.0, "2024-01-01 12:00:00")]
    ).collect()[0]
    assert (r.passed, r.measured) == (False, None)


def test_schema_diff_all_directions(spark):
    """r8 (VERDICT r7 #7): added / dropped / type_changed / match rows,
    ordered by column; pure metadata (accepts every reference form)."""
    from pyspark.sql.types import StructType

    from ralf_spark.operators.quality import schema_diff

    df = _df(spark)  # id long, cat string, v double
    ref_ddl = "id bigint, cat int, gone string"
    want = [
        ("cat", "type_changed", "int", "string"),
        ("gone", "dropped", "string", None),
        ("id", "match", "bigint", "bigint"),
        ("v", "added", None, "double"),
    ]
    for ref in (
        ref_ddl,
        StructType.fromDDL(ref_ddl),
        {"id": "BIGINT", "cat": "int", "gone": "string"},
    ):
        got = [
            (r.column, r.status, r.ref_type, r.cur_type)
            for r in schema_diff(df, ref).collect()
        ]
        assert got == want, ref
    # identical schemas: all match, empty diff after the filter
    same = schema_diff(df, df.schema)
    assert {r.status for r in same.collect()} == {"match"}
    assert same.where("status != 'match'").count() == 0


def test_schema_matches_rule_composes_with_scan_rules(spark):
    """The declarative form rides in check_constraints without adding
    any scan work: measured = matching fraction over the column union,
    passed only at exactly 1.0."""
    from ralf_spark.operators.quality import schema_matches

    df = _df(spark)
    rows = {
        r.rule: r
        for r in check_constraints(
            df,
            [
                not_null("id"),
                schema_matches("id bigint, cat string, v double"),
                schema_matches("id bigint, cat int, gone string"),
            ],
        ).collect()
    }
    ok = [r for r in rows.values() if r.measured == 1.0
          and r.rule.startswith("schema_matches")]
    assert len(ok) == 1 and ok[0].passed
    # drifted reference: union = {id, cat, v, gone}, only id matches
    bad = [r for r in rows.values() if r.measured == 0.25]
    assert len(bad) == 1 and not bad[0].passed
    assert rows["not_null(id)"].passed  # scan rules unaffected
