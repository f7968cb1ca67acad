"""Property-based semantics checks (hypothesis).

The oracle gate checks fixed queries on fixed data; these tests pin the
OPERATOR CONTRACTS against independent reference implementations on random
inputs:

- sliding/tumbling count windows vs a pure-Python replay of the reference's
  emit-then-trim buffer loop (``ralf/operators/window.py:44-51, 107-120``);
- the as-of join vs ``pandas.merge_asof`` (backward direction), the
  community-standard as-of semantics.

Examples are capped (Spark pays ~0.5 s per materialization) and sizes kept
tiny — the value is in the random shapes, not the row counts.
"""

from __future__ import annotations

import pytest

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ralf_spark.operators.joins import asof_join
from ralf_spark.operators.windows import (
    sliding_count_window,
    tumbling_count_window,
)
from ralf_spark.table import FeatureTable

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _ref_sliding(values, window, slide):
    """The reference's buffer loop: append; at len == window emit a copy,
    then drop the oldest ``slide`` entries."""
    buf, out = [], []
    for pos, v in enumerate(values, start=1):
        buf.append((pos, v))
        if len(buf) == window:
            out.append((pos, [x[1] for x in buf]))
            del buf[:slide]
    return out


@given(
    n=st.integers(0, 40),
    window=st.integers(1, 10),
    slide=st.integers(1, 12),
    strategy=st.sampled_from(["frame", "explode"]),
)
@pytest.mark.slow
@settings(**_SETTINGS)
def test_sliding_window_matches_reference_buffer_loop(
    spark, n, window, slide, strategy
):
    values = [float(i * 7 % 13) for i in range(n)]
    rows = [("k", i, i, v) for i, v in enumerate(values)]
    t = FeatureTable(
        spark.createDataFrame(
            rows, "k string, ts long, seq long, v double"
        )
        if rows
        else spark.createDataFrame([], "k string, ts long, seq long, v double"),
        key="k", ts="ts", seq="seq",
    )
    got = sorted(
        (r.pos, [x["v"] for x in r.window])
        for r in sliding_count_window(
            t, window_size=window, slide_size=slide,
            payload_cols=["v"], payload_strategy=strategy,
        ).df.collect()
    )
    want = _ref_sliding(values, window, slide)
    assert got == want


def _ref_tumbling(values, size):
    buf, out, wid = [], [], 0
    for v in values:
        buf.append(v)
        if len(buf) == size:
            out.append((wid, list(buf)))
            buf, wid = [], wid + 1
    return out


@pytest.mark.slow
@given(n=st.integers(0, 40), size=st.integers(1, 9))
@settings(**_SETTINGS)
def test_tumbling_window_matches_reference_buffer_loop(spark, n, size):
    values = [float(i * 5 % 11) for i in range(n)]
    rows = [("k", i, i, v) for i, v in enumerate(values)]
    t = FeatureTable(
        spark.createDataFrame(
            rows, "k string, ts long, seq long, v double"
        )
        if rows
        else spark.createDataFrame([], "k string, ts long, seq long, v double"),
        key="k", ts="ts", seq="seq",
    )
    got = sorted(
        (r.window_id, [x["v"] for x in r.window])
        for r in tumbling_count_window(
            t, size=size, payload_cols=["v"]
        ).df.collect()
    )
    assert got == _ref_tumbling(values, size)


@given(
    left_ts=st.lists(st.integers(0, 30), min_size=0, max_size=15),
    right_ts=st.lists(st.integers(0, 30), min_size=0, max_size=15),
)
@pytest.mark.slow
@settings(**_SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, left_ts, right_ts):
    """Single key, unique strictly-increasing seq per side; right payload =
    its ts. merge_asof(direction="backward") is the independent reference.
    Ties: our arrival order is (ts, side) with right first — a right row at
    t is visible to a left row at t, exactly merge_asof's <= semantics."""
    left_rows = [
        ("k", ts, i, float(i)) for i, ts in enumerate(sorted(left_ts))
    ]
    right_rows = [
        ("k", ts, i, float(ts)) for i, ts in enumerate(sorted(right_ts))
    ]
    schema = "k string, ts long, seq long, payload double"
    ldf = (
        spark.createDataFrame(left_rows, schema)
        if left_rows
        else spark.createDataFrame([], schema)
    )
    rdf = (
        spark.createDataFrame(right_rows, schema)
        if right_rows
        else spark.createDataFrame([], schema)
    )
    left = FeatureTable(ldf, key="k", ts="ts")
    right = FeatureTable(
        rdf.select("k", "ts", rdf.payload.alias("state")), key="k", ts="ts"
    )
    out = asof_join(left, right, right_payload=["state"])
    got = {
        r.seq: r.state for r in out.df.collect()
    }

    lpd = pd.DataFrame(left_rows, columns=["k", "ts", "seq", "payload"])
    rpd = pd.DataFrame(right_rows, columns=["k", "ts", "seq", "state"])
    if len(lpd) and not len(rpd):
        want = {int(r.seq): None for r in lpd.itertuples()}
    elif len(lpd):
        merged = pd.merge_asof(
            lpd.sort_values("ts", kind="mergesort"),
            rpd.sort_values("ts", kind="mergesort")[["ts", "state"]],
            on="ts",
            direction="backward",
        )
        want = {
            int(r.seq): (None if pd.isna(r.state) else float(r.state))
            for r in merged.itertuples()
        }
    else:
        want = {}
    assert got == want


@given(
    left_ts=st.lists(st.integers(0, 30), min_size=0, max_size=15),
    right_ts=st.lists(st.integers(0, 30), min_size=0, max_size=15),
)
@pytest.mark.slow
@settings(**_SETTINGS)
def test_asof_join_forward_matches_pandas_merge_asof(spark, left_ts, right_ts):
    """direction="forward": earliest right at-or-after each left row —
    merge_asof(direction="forward") is the independent reference (also
    inclusive at equal ts)."""
    left_rows = [
        ("k", ts, i, float(i)) for i, ts in enumerate(sorted(left_ts))
    ]
    right_rows = [
        ("k", ts, i, float(ts)) for i, ts in enumerate(sorted(right_ts))
    ]
    schema = "k string, ts long, seq long, payload double"
    ldf = (
        spark.createDataFrame(left_rows, schema)
        if left_rows
        else spark.createDataFrame([], schema)
    )
    rdf = (
        spark.createDataFrame(right_rows, schema)
        if right_rows
        else spark.createDataFrame([], schema)
    )
    left = FeatureTable(ldf, key="k", ts="ts")
    right = FeatureTable(
        rdf.select("k", "ts", rdf.payload.alias("state")), key="k", ts="ts"
    )
    out = asof_join(left, right, right_payload=["state"], direction="forward")
    got = {r.seq: r.state for r in out.df.collect()}

    lpd = pd.DataFrame(left_rows, columns=["k", "ts", "seq", "payload"])
    rpd = pd.DataFrame(right_rows, columns=["k", "ts", "seq", "state"])
    if len(lpd) and not len(rpd):
        want = {int(r.seq): None for r in lpd.itertuples()}
    elif len(lpd):
        merged = pd.merge_asof(
            lpd.sort_values("ts", kind="mergesort"),
            rpd.sort_values("ts", kind="mergesort")[["ts", "state"]],
            on="ts",
            direction="forward",
        )
        want = {
            int(r.seq): (None if pd.isna(r.state) else float(r.state))
            for r in merged.itertuples()
        }
    else:
        want = {}
    assert got == want


# ------------------------------------------------------- sketches (E6)

def _hash60(v) -> int:
    import hashlib

    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)


@pytest.mark.slow
@given(values=st.lists(st.integers(0, 10_000), min_size=0, max_size=60))
@settings(**_SETTINGS)
def test_kmv_matches_pure_python_replay(spark, values):
    """KMV contract on arbitrary inputs: exact below k, and above k the
    estimate equals the closed-form (k-1)*2^60/h_(k) computed from an
    independent pure-Python md5 replay."""
    from ralf_spark.operators.sketches import kmv_distinct

    k = 8
    df = spark.createDataFrame(
        [("g", v) for v in values] or [("g", None)], "g string, v long"
    ).where("v IS NOT NULL")
    got = {
        r.g: r.est_distinct
        for r in kmv_distinct(df, ["g"], "v", k=k).collect()
    }
    distinct_hashes = sorted({_hash60(v) for v in values})
    if not distinct_hashes:
        assert got == {}
    elif len(distinct_hashes) < k:
        assert got == {"g": len(distinct_hashes)}
    else:
        import math

        want = math.floor(
            float(k - 1) * float(2**60) / float(distinct_hashes[k - 1])
        )
        assert got == {"g": want}


@pytest.mark.slow
@given(values=st.lists(st.integers(0, 10_000), min_size=1, max_size=60))
@settings(**_SETTINGS)
def test_hll_matches_pure_python_replay(spark, values):
    """HLL registers/estimate replay exactly in pure Python — the
    order-independence argument (exact dyadic sums) means ANY grouping
    of the input must give the same registers, hence the same number."""
    from ralf_spark.operators.sketches import hll_distinct

    got = [
        r.est_distinct
        for r in hll_distinct(
            spark.createDataFrame([("g", v) for v in values], "g string, v long"),
            ["g"], "v",
        ).collect()
    ]

    m, rest_bits = 64, 54
    regs: dict[int, int] = {}
    for v in values:
        h = _hash60(v)
        bucket, rest = h >> rest_bits, h % (1 << rest_bits)
        rho = (rest_bits + 1 - rest.bit_length()) if rest else rest_bits + 1
        rho = min(rho, 40)
        regs[bucket] = max(regs.get(bucket, 0), rho)
    s = sum(2.0**-r for r in regs.values()) + (m - len(regs))
    e = 0.709 * m * m / s
    v_empty = m - len(regs)
    import math

    if e <= 2.5 * m and v_empty > 0:
        e = float(m) * math.log(float(m) / v_empty)
    assert got == [round(e, 2)]


# ------------------------------------------------- last-emitted shed scan
def _ref_last_emitted(values, threshold, metric, last=None):
    """Pure-Python replay of the reference's shed recurrence
    (``ralf/policies/load_shedding_policy.py:41-49`` enforced at
    ``ralf/operator.py:199-208``), with the engine's zero-baseline
    convention for rel."""
    keep = []
    for v in values:
        if last is None:
            emit = True
        elif metric == "abs":
            emit = abs(v - last) >= threshold
        elif last == 0.0:
            emit = v != last
        else:
            emit = abs(v - last) / abs(last) >= threshold
        if emit:
            last = v
        keep.append(emit)
    return keep, last


@given(
    values=st.lists(
        st.one_of(
            st.floats(-50, 50).map(lambda x: round(x, 2)),
            st.just(0.0),
        ),
        max_size=300,
    ),
    threshold=st.sampled_from([0.0, 0.5, 3.0, 10.0]),
    metric=st.sampled_from(["abs", "rel"]),
    seeded=st.booleans(),
    seed=st.floats(-10, 10).map(lambda x: round(x, 2)),
)
@settings(max_examples=60, deadline=None)
def test_last_emitted_mask_matches_reference_recurrence(
    values, threshold, metric, seeded, seed
):
    """The galloping numpy scan (VERDICT r5 #5) must reproduce the
    row-at-a-time recurrence exactly — including the seeded (streaming
    GroupState) entry path and the zero-baseline rel convention."""
    from ralf_spark.operators.policies import last_emitted_mask

    last0 = seed if seeded else None
    want_keep, want_last = _ref_last_emitted(values, threshold, metric, last0)
    got_keep, got_last = last_emitted_mask(values, threshold, metric, last0)
    assert list(got_keep) == want_keep
    assert got_last == want_last


# ------------------------------------------------------ domain quota cap
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c", None]),   # skewed domains + NULL
            st.integers(0, 50),                        # quality (ties likely)
        ),
        max_size=40,
    ),
    cap=st.integers(1, 5),
)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.slow
def test_domain_quota_cap_matches_reference_ranking(spark, rows, cap):
    """domain_quota_cap vs a pure-Python replay of the windowed-oracle
    semantics (rank by quality DESC, id ASC within EVERY domain group,
    NULL forming one group like SQL PARTITION BY): the under-cap anti-join
    shortcut and the null-safe joins must never change which rows survive
    (ADVICE r5)."""
    from ralf_spark.operators.policies import domain_quota_cap
    from ralf_spark.table import FeatureTable

    data = [(i, d, float(q)) for i, (d, q) in enumerate(rows)]
    want = {}
    groups = {}
    for i, d, q in data:
        groups.setdefault(d, []).append((i, q))
    for d, members in groups.items():
        ranked = sorted(members, key=lambda m: (-m[1], m[0]))
        for rank, (i, _) in enumerate(ranked):
            want[i] = rank < cap
    if not data:
        return
    t = FeatureTable(
        spark.createDataFrame(data, "doc_id long, source string, q double"),
        key="doc_id",
    )
    got = {r.doc_id: r.kept for r in
           domain_quota_cap(t, "source", cap=cap, quality_col="q").collect()}
    assert got == want


# ----------------------------------------- segmented per-key sequence folds
def _ref_decayed(seq, hl_s):
    """Pure-Python decay fold over (us, x) pairs already in order."""
    s = t = None
    for us, x in seq:
        s = x if s is None else x + 0.5 ** ((us - t) / (hl_s * 1e6)) * s
        t = us
    return s


def _ref_ewma(xs, alpha):
    s = None
    for x in xs:
        s = x if s is None else alpha * x + (1 - alpha) * s
    return s


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(0, 3_600_000_000),   # event time, epoch micros
            st.floats(-100, 100, allow_nan=False, allow_infinity=False,
                      width=32),
        ),
        min_size=1,
        max_size=50,
    ),
    segment_s=st.floats(0.001, 4000.0),
    hl_s=st.floats(0.1, 7200.0),
    alpha=st.floats(0.01, 0.99),
)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.slow
def test_segmented_folds_equal_single_fold(spark, rows, segment_s, hl_s,
                                           alpha):
    """VERDICT r6 #1: the two-phase segmented spellings (per-key memory
    bounded by the time bucket, not the key's event count) must equal the
    single-array fold AND a pure-Python reference fold, for any segment
    length — including segments much smaller than event gaps (many
    single-event buckets) and larger than the whole span (one bucket)."""
    import math

    from ralf_spark.operators.moments import ewma_per_key, time_decayed_sum

    data = [(k, us, i, float(x)) for i, (k, us, x) in enumerate(rows)]
    df = spark.createDataFrame(data, "k string, us long, seq long, x double")
    ordered = {}
    for k, us, seq, x in sorted(data, key=lambda r: (r[1], r[2])):
        ordered.setdefault(k, []).append((us, x))

    single = time_decayed_sum(df, "k", "us", "x", half_life_s=hl_s,
                              tiebreak_col="seq")
    seg = time_decayed_sum(df, "k", "us", "x", half_life_s=hl_s,
                           tiebreak_col="seq", segment_s=segment_s)
    got_single = {r.k: (r.n_events, r.decayed_sum, r.last_ts_us)
                  for r in single.collect()}
    got_seg = {r.k: (r.n_events, r.decayed_sum, r.last_ts_us)
               for r in seg.collect()}
    assert set(got_seg) == set(got_single) == set(ordered)
    for k, evs in ordered.items():
        want = _ref_decayed(evs, hl_s)
        for got in (got_single[k], got_seg[k]):
            assert got[0] == len(evs)
            assert math.isclose(got[1], want, rel_tol=1e-9, abs_tol=1e-9)
            assert got[2] == evs[-1][0]

    e_single = {r.k: (r.n_events, r.ewma)
                for r in ewma_per_key(df, "k", "us", "x", alpha=alpha,
                                      tiebreak_col="seq").collect()}
    e_seg = {r.k: (r.n_events, r.ewma)
             for r in ewma_per_key(df, "k", "us", "x", alpha=alpha,
                                   tiebreak_col="seq",
                                   segment_s=segment_s).collect()}
    assert set(e_seg) == set(e_single) == set(ordered)
    for k, evs in ordered.items():
        want = _ref_ewma([x for _, x in evs], alpha)
        for got in (e_single[k], e_seg[k]):
            assert got[0] == len(evs)
            assert math.isclose(got[1], want, rel_tol=1e-9, abs_tol=1e-9)


def _ref_dup_spans(texts: dict[int, str], n: int, min_occ: int = 2):
    """Independent reference for exact-substring spans: count every
    n-gram corpus-wide, keep positions whose gram repeats, merge
    positions into maximal spans (gap <= n merges)."""
    from collections import Counter

    toks = {d: [t for t in s.split() if t] for d, s in texts.items()}
    grams: Counter = Counter()
    for tk in toks.values():
        for i in range(len(tk) - n + 1):
            grams[tuple(tk[i : i + n])] += 1
    out = []
    for d, tk in sorted(toks.items()):
        out.extend(
            (d, s, e)
            for s, e in _merge_positions(
                [
                    i + 1
                    for i in range(len(tk) - n + 1)
                    if grams[tuple(tk[i : i + n])] >= min_occ
                ],
                n,
            )
        )
    return sorted(set(out))


def _merge_positions(pos: list[int], n: int):
    spans = []
    for p in pos:
        if spans and p <= spans[-1][2] + n:
            spans[-1][1] = max(spans[-1][1], p + n - 1)
            spans[-1][2] = p
        else:
            spans.append([p, p + n - 1, p])
    return [(s, e) for s, e, _ in spans]


def _ref_cross_spans(
    train: dict[int, str], other: dict[int, str], n: int
):
    """Independent reference for cross-corpus spans: a train position is
    contaminated iff its n-gram occurs ANYWHERE in ``other`` (within-
    train repeats do not count); merge like the corpus-wide detector."""
    ttoks = {d: s.split() for d, s in train.items()}
    ograms = {
        tuple(tk[i : i + n])
        for tk in (s.split() for s in other.values())
        for i in range(len(tk) - n + 1)
    }
    out = []
    for d, tk in sorted(ttoks.items()):
        out.extend(
            (d, s, e)
            for s, e in _merge_positions(
                [
                    i + 1
                    for i in range(len(tk) - n + 1)
                    if tuple(tk[i : i + n]) in ograms
                ],
                n,
            )
        )
    return sorted(set(out))


@given(
    train=st.lists(
        st.lists(st.integers(0, 5), min_size=0, max_size=24),
        min_size=1, max_size=5,
    ),
    other=st.lists(
        st.lists(st.integers(0, 5), min_size=0, max_size=24),
        min_size=1, max_size=4,
    ),
    n=st.integers(2, 5),
)
@pytest.mark.slow
@settings(**_SETTINGS)
def test_cross_corpus_spans_match_reference(spark, train, other, n):
    """r12 span-level decontamination vs an independent reference —
    strictly cross-corpus (a train-only repeat must NOT be flagged),
    maximal-span merge identical to the corpus-wide detector's."""
    from ralf_spark.operators.dedup import cross_corpus_duplicate_spans

    ttexts = {
        d: " ".join(f"t{x}" for x in tk) for d, tk in enumerate(train)
    }
    otexts = {
        d: " ".join(f"t{x}" for x in tk) for d, tk in enumerate(other)
    }
    tft = FeatureTable(
        spark.createDataFrame(
            [(d, s) for d, s in ttexts.items()], "doc_id long, text string"
        ),
        key="doc_id",
    )
    oft = FeatureTable(
        spark.createDataFrame(
            [(d, s) for d, s in otexts.items()], "doc_id long, text string"
        ),
        key="doc_id",
    )
    got = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in cross_corpus_duplicate_spans(
            tft, oft, min_tokens=n
        ).collect()
    )
    assert got == _ref_cross_spans(ttexts, otexts, n)


@given(
    data=st.lists(
        st.lists(
            st.integers(0, 5), min_size=0, max_size=24
        ),  # tiny alphabet -> organic repeats within and across docs
        min_size=1,
        max_size=8,
    ),
    n=st.integers(2, 5),
)
@pytest.mark.slow
@settings(**_SETTINGS)
def test_duplicate_span_ranges_matches_reference(spark, data, n):
    from ralf_spark.operators.dedup import duplicate_span_ranges

    texts = {
        d: " ".join(f"t{x}" for x in tk) for d, tk in enumerate(data)
    }
    t = FeatureTable(
        spark.createDataFrame(
            [(d, s) for d, s in texts.items()], "doc_id long, text string"
        ),
        key="doc_id",
    )
    got = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicate_span_ranges(t, min_tokens=n).collect()
    )
    assert got == _ref_dup_spans(texts, n)
