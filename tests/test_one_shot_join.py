"""one_shot_join contract tests — the reference LeftJoin's buffered
semantics (``ralf/operators/join.py:34-50``), batch-deterministic:

- left with prior right state joins the current state (as-of)
- left before any right is buffered; the buffer is a latest-per-key upsert
  (later buffered left OVERWRITES earlier — overwritten rows never emit)
- the first right arrival consumes the buffer; unconsumed buffers never emit
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ralf_spark.operators.joins import one_shot_join
from ralf_spark.table import FeatureTable


def _sides(spark, left_rows, right_rows):
    left = FeatureTable(
        spark.createDataFrame(left_rows, "k string, ts long, seq long"),
        key="k", ts="ts", seq="seq",
    )
    right = FeatureTable(
        spark.createDataFrame(right_rows, "k string, ts long, seq long, rv string"),
        key="k", ts="ts", seq="seq",
    )
    return left, right


def _run(spark, left_rows, right_rows):
    left, right = _sides(spark, left_rows, right_rows)
    out = one_shot_join(left, right, right_payload=["rv"])
    return sorted((r.k, r.ts, r.seq, r.rv) for r in out.df.collect())


def test_buffered_left_consumed_by_first_right(spark):
    # left@1 buffered -> consumed by right@2; left@3 joins as-of (state R1)
    out = _run(
        spark,
        [("a", 1, 10), ("a", 3, 30)],
        [("a", 2, 20, "R1")],
    )
    assert out == [("a", 1, 10, "R1"), ("a", 3, 30, "R1")]


def test_buffer_overwrite_drops_earlier_left(spark):
    # two lefts before any right: only the later one emits
    out = _run(
        spark,
        [("b", 1, 10), ("b", 2, 20)],
        [("b", 3, 30, "RB")],
    )
    assert out == [("b", 2, 20, "RB")]


def test_no_right_never_emits(spark):
    out = _run(spark, [("c", 1, 10), ("c", 2, 20)], [("zzz", 1, 1, "X")])
    assert out == []


def test_asof_tracks_latest_state(spark):
    out = _run(
        spark,
        [("d", 2, 20), ("d", 4, 40)],
        [("d", 1, 10, "RD1"), ("d", 3, 30, "RD2")],
    )
    assert out == [("d", 2, 20, "RD1"), ("d", 4, 40, "RD2")]


def test_null_right_payload_still_counts_as_state(spark):
    # A right row whose payload is NULL is real state; the left row after it
    # is matched (not misrouted into the buffered path).
    out = _run(
        spark,
        [("e", 2, 20), ("e", 4, 40)],
        [("e", 1, 10, None), ("e", 3, 30, "RE")],
    )
    assert out == [("e", 2, 20, None), ("e", 4, 40, "RE")]


def test_equal_ts_right_visible_when_seq_le(spark):
    # (ts, seq, side) ordering: right (ts=5, seq=1) visible to left (5, 2);
    # right (5, 9) is not visible to left (5, 2).
    out = _run(
        spark,
        [("f", 5, 2)],
        [("f", 5, 1, "early"), ("f", 5, 9, "late")],
    )
    assert out == [("f", 5, 2, "early")]


def test_each_left_emits_at_most_once(spark):
    out = _run(
        spark,
        [("g", 1, 10), ("g", 2, 20), ("g", 6, 60)],
        [("g", 3, 30, "R1"), ("g", 4, 40, "R2"), ("g", 5, 50, "R3")],
    )
    # left@1 overwritten by left@2; left@2 consumed by first right R1;
    # left@6 as-of latest state R3. Exactly one row per surviving left.
    assert out == [("g", 2, 20, "R1"), ("g", 6, 60, "R3")]


def test_asof_join_tolerance_masks_stale_state(spark):
    """asof_join(tolerance=...): right state older than the tolerance at the
    left row's time is returned as NULL rather than matched."""
    import pyspark.sql.functions as F

    from ralf_spark.operators.joins import asof_join

    left = FeatureTable(
        spark.createDataFrame(
            [("a", 10, 1), ("a", 100, 2)], "k string, ts long, seq long"
        ),
        key="k", ts="ts", seq="seq",
    )
    right = FeatureTable(
        spark.createDataFrame(
            [("a", 5, 1, "fresh-at-10")], "k string, ts long, seq long, rv string"
        ),
        key="k", ts="ts", seq="seq",
    )
    out = asof_join(left, right, right_payload=["rv"], tolerance=F.lit(20))
    got = {r.ts: r.rv for r in out.df.collect()}
    # at ts=10 the state (ts=5) is 5 old -> within 20; at ts=100 it's 95 old
    assert got == {10: "fresh-at-10", 100: None}
