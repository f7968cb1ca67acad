"""Unit tests for the second curation batch (§2.10): PII scan, bigram LM,
DSIR weights, mixture weights, containment pairs, kNN graph.

Contracts on handcrafted data; oracle parity at fixture scale lives in the
driver registry (``queries_curation.py``).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from ralf_spark.operators.dedup import containment_pairs
from ralf_spark.operators.retrieval import (
    bigram_nll,
    dsir_log_weights,
    mixture_weights,
)
from ralf_spark.operators.similarity import knn_graph
from ralf_spark.operators.text_analysis import pii_counts, redact_pii
from ralf_spark.table import FeatureTable


def _docs(spark, rows, schema="doc_id long, text string"):
    return FeatureTable(spark.createDataFrame(rows, schema), key="doc_id")


# -------------------------------------------------------------- PII scan
def test_pii_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a@b.co and c.d+x@e.org ip 10.1.2.3 call +14155550123"),
            (2, "no pii in this clean sentence"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in df.select("doc_id", *pii_counts(F.col("text"))).collect()
    }
    assert rows[1].emails == 2 and rows[1].ipv4 == 1 and rows[1].phones == 1
    assert (
        rows[2].emails == rows[2].ipv4 == rows[2].phones
        == rows[2].id_numbers == 0
    )
    red = df.where("doc_id = 1").select(
        redact_pii(F.col("text")).alias("r")
    ).collect()[0].r
    assert "<EMAILS>" in red and "<IPV4>" in red and "<PHONES>" in red
    assert "a@b.co" not in red and "10.1.2.3" not in red


# ------------------------------------------------------------- bigram LM
def test_bigram_nll_matches_hand_computation(spark):
    # corpus: "a b" (x2) and "a c" -> c2: {a b:2, a c:1}; c1: {a:3}; V=3
    t = _docs(spark, [(1, "a b"), (2, "a b"), (3, "a c")])
    rows = {r.doc_id: r for r in bigram_nll(t).collect()}
    p_ab = (2 + 1) / (3 + 3)
    p_ac = (1 + 1) / (3 + 3)
    assert rows[1].n_bigrams == 1
    assert rows[1].avg_nll == pytest.approx(-math.log(p_ab))
    assert rows[3].avg_nll == pytest.approx(-math.log(p_ac))


def test_bigram_nll_skips_single_token_docs(spark):
    t = _docs(spark, [(1, "solo"), (2, "two tokens")])
    assert [r.doc_id for r in bigram_nll(t).collect()] == [2]


def test_bigram_nll_flags_unusual_order(spark):
    # same unigrams, rare order: "b a" scores higher than the common "a b"
    t = _docs(spark, [(1, "a b"), (2, "a b"), (3, "a b"), (4, "b a")])
    rows = {r.doc_id: r.avg_nll for r in bigram_nll(t).collect()}
    assert rows[4] > rows[1]


# ----------------------------------------------------------- DSIR weights
def test_dsir_weights_favor_target_vocabulary(spark):
    rows = [
        (1, "alpha alpha beta", "target"),
        (2, "alpha beta beta", "target"),
        (3, "gamma gamma delta", "raw"),
        (4, "alpha alpha alpha", "raw"),  # target-like raw doc
        (5, "gamma delta delta", "raw"),
    ]
    t = FeatureTable(
        spark.createDataFrame(rows, "doc_id long, text string, source string"),
        key="doc_id",
    )
    w = {
        r.doc_id: r.log_weight
        for r in dsir_log_weights(t, F.col("source") == "target").collect()
    }
    # the target-vocabulary raw doc outranks the off-target raw docs
    assert w[4] > w[3] and w[4] > w[5]
    assert w[4] > 0 and w[3] < 0


# -------------------------------------------------------- mixture weights
def test_mixture_weights_sum_to_one_and_flatten(spark):
    t = FeatureTable(
        spark.createDataFrame(
            [(1, "a b c d", "big"), (2, "a b c d", "big"), (3, "a", "small")],
            "doc_id long, text string, source string",
        ),
        key="doc_id",
    )
    rows = {r.source: r for r in mixture_weights(t, alpha=0.5).collect()}
    assert rows["big"].n_tokens == 8 and rows["small"].n_tokens == 1
    assert sum(r.p_raw for r in rows.values()) == pytest.approx(1.0)
    assert sum(r.p_sample for r in rows.values()) == pytest.approx(1.0)
    # alpha < 1 flattens: small source gains share vs proportional
    assert rows["small"].p_sample > rows["small"].p_raw
    assert rows["big"].p_sample < rows["big"].p_raw


# ------------------------------------------------------ containment pairs
def test_containment_detects_excerpt_jaccard_misses(spark):
    quote = "alpha beta gamma delta epsilon"
    long_doc = (
        f"{quote} zeta eta theta iota kappa lambda mu nu xi omicron pi rho"
    )
    t = _docs(spark, [(1, quote), (2, long_doc), (3, "totally different words here")])
    rows = {
        (r.src_id, r.dst_id): r.containment
        for r in containment_pairs(t, threshold=0.5, max_df=5).collect()
    }
    # doc1 fully contained in doc2; reverse direction dilutes below 0.5
    assert rows[(1, 2)] == pytest.approx(1.0)
    assert (2, 1) not in rows
    assert not any(3 in p for p in rows)


def test_containment_symmetric_dup_yields_both_directions(spark):
    text = "one two three four five six"
    t = _docs(spark, [(1, text), (2, text)])
    rows = {
        (r.src_id, r.dst_id): r.containment
        for r in containment_pairs(t, threshold=0.9, max_df=5).collect()
    }
    assert rows[(1, 2)] == pytest.approx(1.0)
    assert rows[(2, 1)] == pytest.approx(1.0)


# -------------------------------------------------------------- kNN graph
def _unit(theta):
    return [math.cos(theta), math.sin(theta)] + [0.0] * 62


def test_knn_graph_ranks_by_cosine_within_bucket(spark):
    # 4 near-identical vectors land in one bucket; each gets the other 3
    vecs = [(i, _unit(0.001 * i)) for i in range(4)]
    t = FeatureTable(
        spark.createDataFrame(vecs, "vec_id long, embedding array<double>"),
        key="vec_id",
    )
    out = knn_graph(t, k=2, nbits=6, dim=64).collect()
    per = {}
    for r in out:
        per.setdefault(r.vec_id, []).append(r)
    assert set(per) == {0, 1, 2, 3}
    for vid, rows in per.items():
        assert len(rows) == 2
        assert rows[0].rank == 1 and rows[1].rank == 2
        assert rows[0].cos_sim >= rows[1].cos_sim
        assert all(r.neighbor_id != vid for r in rows)
    # nearest neighbor of 0 is 1 (smallest angle gap)
    assert per[0][0].neighbor_id == 1
