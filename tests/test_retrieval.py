"""Unit tests for the retrieval / curation operators (§2.10 additions).

Contracts on handcrafted data: BM25 ordering + idf monotonicity, unigram
NLL preferring common tokens, duplicated-span fractions, SemDeDup keeping
exactly one survivor per duplicate group, hard negatives excluding
same-label neighbors. Oracle parity at fixture scale lives in the driver
registry (``queries_retrieval.py``).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from ralf_spark.operators.dedup import duplicated_spans
from ralf_spark.operators.retrieval import (
    bm25_scores,
    hard_negatives,
    unigram_nll,
)
from ralf_spark.operators.similarity import assign_to_seeds, semdedup_prune
from ralf_spark.plans.explain import explain_str
from ralf_spark.table import FeatureTable


def _docs(spark, rows):
    return FeatureTable(
        spark.createDataFrame(rows, "doc_id long, text string"), key="doc_id"
    )


def _emb(spark, rows):
    return FeatureTable(
        spark.createDataFrame(
            rows, "vec_id long, label string, embedding array<double>"
        ),
        key="vec_id",
    )


# ------------------------------------------------------------------ BM25
def test_bm25_ranks_matching_docs_and_drops_nonmatching(spark):
    t = _docs(
        spark,
        [
            (1, "spark spark spark short"),
            (2, "spark mentioned once in a much longer document overall"),
            (3, "nothing relevant here at all"),
        ],
    )
    rows = {r.doc_id: r.bm25 for r in bm25_scores(t, ["spark"]).collect()}
    assert set(rows) == {1, 2}  # doc 3 matches no term
    assert rows[1] > rows[2] > 0  # higher tf + shorter doc wins


def test_bm25_rare_term_outscores_common_term(spark):
    t = _docs(
        spark,
        [(1, "common rare"), (2, "common x"), (3, "common y"), (4, "common z")],
    )
    common = {
        r.doc_id: r.bm25 for r in bm25_scores(t, ["common"]).collect()
    }
    rare = {r.doc_id: r.bm25 for r in bm25_scores(t, ["rare"]).collect()}
    assert rare[1] > common[1]  # idf: df=1 term beats df=4 term at equal tf


# ----------------------------------------------------------- unigram NLL
def test_unigram_nll_rare_tokens_score_higher(spark):
    t = _docs(
        spark,
        [(1, "the the the the"), (2, "zzyzx qwerty"), (3, "the the qwerty")],
    )
    rows = {r.doc_id: r.avg_nll for r in unigram_nll(t).collect()}
    assert rows[2] > rows[3] > rows[1]


def test_unigram_nll_matches_hand_computation(spark):
    # corpus: a a b -> counts {a:2, b:1}, total=3, vocab=2
    t = _docs(spark, [(1, "a a"), (2, "b")])
    rows = {r.doc_id: r for r in unigram_nll(t).collect()}
    p_a, p_b = (2 + 1) / (3 + 2), (1 + 1) / (3 + 2)
    assert rows[1].n_toks == 2 and rows[2].n_toks == 1
    assert rows[1].avg_nll == pytest.approx(-math.log(p_a))
    assert rows[2].avg_nll == pytest.approx(-math.log(p_b))


# ------------------------------------------------------ duplicated spans
def test_duplicated_spans_flags_cross_doc_repeats(spark):
    shared = "one two three"
    t = _docs(
        spark,
        [
            (1, f"{shared} unique tail"),
            (2, f"other head {shared}"),
            (3, "totally fresh words here now"),
        ],
    )
    rows = {r.doc_id: r for r in duplicated_spans(t, n=3).collect()}
    # doc1 spans: 3 of 3-token; exactly the "one two three" span repeats
    assert rows[1].n_spans == 3 and rows[1].dup_spans == 1
    assert rows[2].dup_spans == 1
    assert rows[3].dup_spans == 0 and rows[3].dup_frac == 0.0


def test_duplicated_spans_counts_within_doc_repeats(spark):
    t = _docs(spark, [(1, "a b a b a b")])  # "a b a"/"b a b" repeat inside
    r = duplicated_spans(t, n=3).collect()[0]
    assert r.n_spans == 4 and r.dup_spans == 4 and r.dup_frac == 1.0


def test_duplicated_spans_skips_short_docs(spark):
    t = _docs(spark, [(1, "too short"), (2, "a b c d e f g h i j k")])
    ids = [r.doc_id for r in duplicated_spans(t, n=10).collect()]
    assert ids == [2]


# --------------------------------------------------------------- SemDeDup
def _unit(theta):
    return [math.cos(theta), math.sin(theta)]


def test_assign_to_seeds_picks_max_cosine(spark):
    corpus = _emb(
        spark,
        [(10, "x", _unit(0.1)), (11, "x", _unit(1.5)), (12, "x", _unit(3.0))],
    )
    seeds = spark.createDataFrame(
        [(0, _unit(0.0)), (1, _unit(math.pi / 2))],
        "seed_id long, seed_vec array<double>",
    )
    rows = {r.vec_id: r.cluster for r in assign_to_seeds(corpus, seeds).collect()}
    assert rows == {10: 0, 11: 1, 12: 1}


def test_semdedup_keeps_one_survivor_per_dup_group(spark):
    # three near-identical vectors + one distant, single seed cluster
    corpus = _emb(
        spark,
        [
            (1, "x", _unit(0.00)),
            (2, "x", _unit(0.01)),
            (3, "x", _unit(0.02)),
            (4, "x", _unit(2.5)),
        ],
    )
    seeds = spark.createDataFrame(
        [(0, _unit(0.0))], "seed_id long, seed_vec array<double>"
    )
    rows = {r.vec_id: r.pruned for r in semdedup_prune(corpus, seeds, 0.99).collect()}
    # lowest id survives; later members of the dup group are pruned
    assert rows == {1: False, 2: True, 3: True, 4: False}


def test_semdedup_seed_join_is_broadcast(spark):
    corpus = _emb(spark, [(1, "x", _unit(0.0)), (2, "x", _unit(1.0))])
    seeds = spark.createDataFrame(
        [(0, _unit(0.0))], "seed_id long, seed_vec array<double>"
    )
    plan = explain_str(assign_to_seeds(corpus, seeds), mode="extended")
    assert "broadcast" in plan.lower()


def test_assign_two_level_matches_brute_and_probes_nearest_group(spark):
    """r8 (SCALEPROBE finding 3): the coarse-probed assignment. With
    well-separated groups (or nprobe >= G) it equals the brute argmax;
    output schema and tie rules match assign_to_seeds exactly."""
    from ralf_spark.operators.similarity import assign_to_seeds_two_level

    # 9 seeds in three angular clumps; coarse = first ceil(sqrt(9)) = 3
    # seeds by id = one per clump
    seeds = spark.createDataFrame(
        [(0, _unit(0.0)), (1, _unit(1.5)), (2, _unit(3.0)),
         (3, _unit(0.05)), (4, _unit(0.10)), (5, _unit(1.55)),
         (6, _unit(1.60)), (7, _unit(3.05)), (8, _unit(3.10))],
        "seed_id long, seed_vec array<double>",
    )
    corpus = _emb(
        spark,
        [(10, "x", _unit(0.07)), (11, "x", _unit(1.52)),
         (12, "x", _unit(3.08)), (13, "x", _unit(0.02))],
    )
    brute = {
        (r.vec_id, r.cluster, round(r.seed_cos, 9))
        for r in assign_to_seeds(corpus, seeds).collect()
    }
    two = {
        (r.vec_id, r.cluster, round(r.seed_cos, 9))
        for r in assign_to_seeds_two_level(corpus, seeds).collect()
    }
    assert two == brute
    # nprobe >= G always degenerates to the exact scan regardless of
    # cluster separation
    allp = {
        (r.vec_id, r.cluster, round(r.seed_cos, 9))
        for r in assign_to_seeds_two_level(
            corpus, seeds, nprobe=3
        ).collect()
    }
    assert allp == brute
    # and semdedup_prune(two_level=True) composes it end-to-end
    from ralf_spark.operators.similarity import semdedup_prune

    rows = {
        r.vec_id: (r.cluster, r.pruned)
        for r in semdedup_prune(
            corpus, seeds, 0.999, two_level=True
        ).collect()
    }
    assert set(rows) == {10, 11, 12, 13}


def test_assign_two_level_survives_duplicate_seed_vectors(spark):
    """Duplicate seed vectors can empty a coarse center's own group (its
    seed ties at cos 1.0 with a lower-id center); the probe set must
    restrict to NON-EMPTY groups so no vector strands."""
    from ralf_spark.operators.similarity import assign_to_seeds_two_level

    seeds = spark.createDataFrame(
        [(0, _unit(0.0)), (1, _unit(0.0)), (2, _unit(0.0)),
         (3, _unit(1.5))],
        "seed_id long, seed_vec array<double>",
    )
    corpus = _emb(spark, [(10, "x", _unit(0.01)), (11, "x", _unit(1.49))])
    rows = {
        r.vec_id: r.cluster
        for r in assign_to_seeds_two_level(
            corpus, seeds, n_coarse=3, nprobe=1
        ).collect()
    }
    # every vector assigned; ties at cos 1.0 go to the lowest seed id
    assert set(rows) == {10, 11}
    assert rows[10] == 0


# --------------------------------------------------------- hard negatives
def test_hard_negatives_excludes_same_label(spark):
    corpus = _emb(
        spark,
        [
            (1, "a", _unit(0.00)),  # same label as anchor: must not appear
            (2, "b", _unit(0.05)),
            (3, "b", _unit(0.10)),
            (4, "c", _unit(3.00)),
        ],
    )
    anchors = spark.createDataFrame(
        [(100, "a", _unit(0.0))],
        "anchor_id long, anchor_label string, anchor_vec array<double>",
    )
    rows = hard_negatives(corpus, anchors, k=2).collect()
    assert [r.neighbor_id for r in rows] == [2, 3]
    assert all(r.anchor_id == 100 for r in rows)
    assert rows[0].cos_sim > rows[1].cos_sim
