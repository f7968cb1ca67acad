"""Registry entries: corpus-curation operators, second batch (§2.10).

PII scanning, bigram-LM quality, DSIR importance weights, data-mixture
weights, directed containment (quote/excerpt) dedup, and the corpus kNN
graph. Every query is paired with a DuckDB oracle replaying identical
arithmetic (regexes, hashes, and LSH planes included).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ralf_spark.operators.dedup import containment_pairs, containment_pairs_sql
from ralf_spark.operators.retrieval import (
    bigram_nll,
    bigram_nll_oracle_sql,
    dsir_log_weights,
    dsir_log_weights_oracle_sql,
    mixture_weights,
    mixture_weights_oracle_sql,
    pack_sequences,
    pack_sequences_oracle_sql,
)
from ralf_spark.operators.similarity import knn_graph, sign_lsh_bucket_sql
from ralf_spark.operators.text_analysis import (
    PII_PATTERNS,
    pii_counts,
    pii_counts_sql,
)
from ralf_spark.queries import _docs_par, _t, query
from ralf_spark.table import FeatureTable

#: deterministic PII injection — the synthetic corpus contains no PII, so
#: every 7th document gets a suffix with one email / ip / phone appended
#: IDENTICALLY in both engines; the scan then has non-trivial hits to hash.
_PII_SUFFIX = "@example.com ip 10.1.2.3 call +14155550123"

_PII_TOTAL_SQL = " + ".join(
    f"len(regexp_extract_all(t, '{p}'))" for p in PII_PATTERNS.values()
)


@query(
    "pii_scan",
    f"""
    WITH aug AS (
      SELECT doc_id,
             text || CASE WHEN doc_id % 7 = 0
               THEN ' contact user' || doc_id || '{_PII_SUFFIX}'
               ELSE '' END AS t
      FROM documents
    )
    SELECT doc_id, {', '.join(pii_counts_sql('t'))},
           ({_PII_TOTAL_SQL}) > 0 AS has_pii
    FROM aug ORDER BY doc_id
    """,
)
def pii_scan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: per-document PII hit counts (emails / ipv4 / phones / long id
    runs) via engine-portable regexes — the scrub gate every training
    corpus passes through. Synthetic docs carry no PII, so a deterministic
    suffix is injected on doc_id % 7 == 0 in BOTH engines."""
    docs = _docs_par(spark, sf_dir)
    aug = docs.df.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit(_PII_SUFFIX),
                ),
            ).otherwise(F.lit("")),
        ).alias("t"),
    )
    counts = pii_counts(F.col("t"))
    total = None
    for c in counts:
        total = c if total is None else total + c
    return aug.select(
        "doc_id", *counts, (total > 0).alias("has_pii")
    ).orderBy("doc_id")


@query("bigram_nll_quality", bigram_nll_oracle_sql())
def bigram_nll_quality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean conditional NLL under the corpus bigram LM
    (add-1 smoothing) — order-sensitive quality upgrade of unigram NLL."""
    docs = _docs_par(spark, sf_dir)
    return (
        bigram_nll(docs)
        .select("doc_id", "n_bigrams", F.round("avg_nll", 4).alias("avg_nll"))
        .orderBy("doc_id")
    )


#: DSIR target domain: the first five synthetic sources stand in for the
#: "high-quality target" corpus (e.g. wiki+books in the paper).
_DSIR_TARGET = ("src0", "src1", "src2", "src3", "src4")


@query(
    "dsir_importance_weights",
    dsir_log_weights_oracle_sql(
        "source IN (" + ", ".join(f"'{s}'" for s in _DSIR_TARGET) + ")"
    ),
)
def dsir_importance_weights_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (arXiv:2302.03169) hashed-unigram importance log-weights of
    every document toward the target domain (sources src0-src4)."""
    docs = _docs_par(spark, sf_dir)
    out = dsir_log_weights(docs, F.col("source").isin(*_DSIR_TARGET))
    return out.select(
        "doc_id", "n_toks", F.round("log_weight", 4).alias("log_weight")
    ).orderBy("doc_id")


@query("mixture_weights", mixture_weights_oracle_sql(alpha=0.5))
def mixture_weights_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token counts and temperature-scaled (alpha=0.5) sampling
    weights — the data-mixing table a multi-domain training run starts
    from."""
    docs = _t(spark, sf_dir, "documents")
    out = mixture_weights(docs, alpha=0.5)
    return out.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round("p_raw", 6).alias("p_raw"),
        F.round("p_sample", 6).alias("p_sample"),
    ).orderBy("source")


@query("containment_pairs", containment_pairs_sql(threshold=0.5))
def containment_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed containment near-dups (|A∩B|/|A| >= 0.5) over rare-shingle
    candidates — catches the quote/excerpt case Jaccard misses."""
    docs = _t(spark, sf_dir, "documents")
    out = containment_pairs(docs, threshold=0.5)
    return out.select(
        "src_id", "dst_id", F.round("containment", 4).alias("containment")
    ).orderBy("src_id", "dst_id")


@query(
    "knn_graph",
    f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS vec,
             {sign_lsh_bucket_sql('embedding::DOUBLE[]', 6, 64)} AS bucket
      FROM embeddings
    ),
    scored AS (
      SELECT a.vec_id, b.vec_id AS neighbor_id,
             list_dot_product(a.vec, b.vec) /
               (sqrt(list_dot_product(a.vec, a.vec)) *
                sqrt(list_dot_product(b.vec, b.vec))) AS cos,
             row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY list_dot_product(a.vec, b.vec) /
                        (sqrt(list_dot_product(a.vec, a.vec)) *
                         sqrt(list_dot_product(b.vec, b.vec))) DESC,
                        b.vec_id
             ) AS rnk
      FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    )
    SELECT vec_id, neighbor_id, round(cos, 4) AS cos_sim, rnk
    FROM scored WHERE rnk <= 3 ORDER BY vec_id, rnk
    """,
)
def knn_graph_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide approximate kNN graph (top-3 cosine neighbors within
    each sign-LSH bucket) — the self-join building block for clustering
    and diversity selection; Σ bucket², never n²."""
    emb = _t(spark, sf_dir, "embeddings")
    out = knn_graph(emb, k=3, nbits=6, dim=64)
    return out.select(
        "vec_id",
        "neighbor_id",
        F.round("cos_sim", 4).alias("cos_sim"),
        F.col("rank").alias("rnk"),
    ).orderBy("vec_id", "rnk")


@query("pack_sequences", pack_sequences_oracle_sql(seq_len=256))
def pack_sequences_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing map: per-source token streams cut into
    256-token bins; each doc gets its start bin + offset (padding-free
    writer input). seq_len=256 keeps bins non-trivial at fixture scale."""
    docs = _docs_par(spark, sf_dir)
    return pack_sequences(docs, seq_len=256).orderBy("doc_id")


@query(
    "dedup_keep_best",
    f"""
    WITH RECURSIVE pairs AS (
      SELECT DISTINCT least(src_id, dst_id) AS id1,
                      greatest(src_id, dst_id) AS id2
      FROM ({containment_pairs_sql(threshold=0.5)})
    ),
    edges AS (
      SELECT id1 AS a, id2 AS b FROM pairs
      UNION
      SELECT id2, id1 FROM pairs
    ),
    reach AS (
      SELECT DISTINCT a AS id, a AS r FROM edges
      UNION
      SELECT e.b, r.r FROM reach r JOIN edges e ON e.a = r.id
    ),
    labels AS (SELECT id, min(r) AS rep FROM reach GROUP BY id),
    base AS (
      SELECT d.doc_id AS id,
             CAST(len(list_filter(string_split(d.text, ' '), t -> t <> ''))
                  AS INTEGER) AS quality,
             coalesce(l.rep, d.doc_id) AS cluster_rep
      FROM documents d LEFT JOIN labels l ON d.doc_id = l.id
    )
    SELECT id, cluster_rep, quality,
           row_number() OVER (
             PARTITION BY cluster_rep ORDER BY quality DESC, id
           ) = 1 AS kept
    FROM base ORDER BY id
    """,
)
def dedup_keep_best_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup SELECTION policy: containment pairs → connected
    components → keep the longest (most tokens) document per cluster;
    singletons always kept. Covers the whole corpus with a kept flag."""
    from ralf_spark.functions.text import tokens
    from ralf_spark.operators.dedup import dedup_keep_best

    docs = _docs_par(spark, sf_dir)
    pairs = (
        containment_pairs(docs, threshold=0.5)
        .select(
            F.least("src_id", "dst_id").alias("id1"),
            F.greatest("src_id", "dst_id").alias("id2"),
        )
        .distinct()
    )
    sized = FeatureTable(
        docs.df.select(
            "doc_id",
            F.size(tokens(F.col("text"))).alias("quality"),
        ),
        key="doc_id",
    )
    out = dedup_keep_best(sized, pairs, "quality")
    return out.select(
        F.col("id"), "cluster_rep", "quality", "kept"
    ).orderBy("id")


from ralf_spark.operators.dedup import (  # noqa: E402
    MinHashIndex,
    incremental_minhash_oracle_sql,
)


@query("incremental_minhash_index", incremental_minhash_oracle_sql())
def incremental_minhash_index_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 incremental maintenance: build the persistent LSH index on the
    even-doc_id half of the corpus, then ``add()`` the odd half — the
    crawl-loop dedup round. The returned pairs (everything touching the
    new batch, MinHash-estimated Jaccard) must equal the batch pipeline
    over the full corpus restricted to pairs with an odd member, because
    banding is deterministic and add() joins new buckets against
    stored ∪ new. Only the new half is hashed in the add round — the
    incremental-cost contract."""
    import hashlib as _hl
    import tempfile as _tf

    docs = _docs_par(spark, sf_dir)
    tag = _hl.md5(sf_dir.encode()).hexdigest()[:8]
    path = _tf.mkdtemp(prefix=f"mh_index_{tag}_")
    index = MinHashIndex(path, num_perm=16, bands=8, hash_fn="md5")
    even = FeatureTable(
        docs.df.where(F.col("doc_id") % 2 == 0), key="doc_id"
    )
    odd = FeatureTable(
        docs.df.where(F.col("doc_id") % 2 == 1), key="doc_id"
    )
    index.build(even)
    pairs = index.add(odd, threshold=0.5)
    return pairs.orderBy("id1", "id2")


@query(
    "domain_quota_cap",
    """
    SELECT doc_id, source,
           (row_number() OVER (
              PARTITION BY source ORDER BY n_chars DESC, doc_id) <= 15)
             AS kept
    FROM documents ORDER BY doc_id
    """,
)
def domain_quota_cap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota capping (Common-Crawl curation: no source may
    contribute more than N docs; over-quota sources keep their N best by
    length, ties -> lowest id). Skew-aware split plan: under-cap domains
    bypass the ranking window entirely; only the over-quota slice sorts
    (``operators/policies.py:domain_quota_cap``)."""
    from ralf_spark.operators.policies import domain_quota_cap

    docs = _t(spark, sf_dir, "documents")
    out = domain_quota_cap(docs, domain_col="source", cap=15,
                           quality_col="n_chars")
    return out.select("doc_id", "source", "kept").orderBy("doc_id")


@query(
    "token_budget_sample",
    """
    SELECT doc_id, source,
           (sum(n_chars) OVER (
              ORDER BY n_chars DESC, doc_id
              ROWS UNBOUNDED PRECEDING) <= 60000) AS kept
    FROM documents ORDER BY doc_id
    """,
)
def token_budget_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted dataset build: keep the highest-priority prefix of the
    corpus (longest docs first, ties -> lowest id) until a global 60k-char
    budget is exhausted. The oracle is the naive single-window cumulative
    sum; the engine spelling is the DISTRIBUTED two-phase prefix sum
    (fixed-width priority bins; only a #bins-row summary crosses a global
    window - ``operators/policies.py:budgeted_prefix_sample``), proving
    the scale-safe plan computes the identical prefix."""
    from ralf_spark.operators.policies import budgeted_prefix_sample

    docs = _t(spark, sf_dir, "documents")
    out = budgeted_prefix_sample(
        docs, cost_col="n_chars", budget=60_000, bin_width=100
    )
    return out.select("doc_id", "source", "kept").orderBy("doc_id")


from ralf_spark.operators.dedup import (  # noqa: E402
    simhash_near_dup_pairs,
    simhash_pairs_oracle_sql,
)


@query("simhash_near_dup_pairs", simhash_pairs_oracle_sql())
def simhash_near_dup_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 SimHash dedup (Manku et al. WWW'07): 48-bit fingerprints,
    Hamming-pigeonhole banding (4 bands for radius 3) -> band-bucket
    equi-join candidates -> popcount verification. One 64-bit word per
    doc instead of a MinHash signature vector - the cheap global-radius
    dedup index."""
    docs = _docs_par(spark, sf_dir)
    return simhash_near_dup_pairs(
        docs, bits=48, max_hamming=3
    ).orderBy("id1", "id2")
