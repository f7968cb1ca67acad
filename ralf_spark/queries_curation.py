"""Registry entries: corpus-curation operators, second batch (§2.10).

PII scanning, bigram-LM quality, DSIR importance weights, data-mixture
weights, directed containment (quote/excerpt) dedup, and the corpus kNN
graph. Every query is paired with a DuckDB oracle replaying identical
arithmetic (regexes, hashes, and LSH planes included).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ralf_spark.functions.text import tokens_sql
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
from ralf_spark.queries import _docs_par, _scratch, _t, query
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
             CAST(len({tokens_sql('d.text')})
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
    path = _scratch(f"mh_index_{tag}_")
    index = MinHashIndex(path, num_perm=16, bands=8)  # hash_fn: env default
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
    "minhash_index_check_serving",
    incremental_minhash_oracle_sql(cross_only=True),
)
def minhash_index_check_serving_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 read-only serving check (r13): build the persistent LSH index
    on the even-doc half, then ``check()`` the odd half WITHOUT folding
    it in — "is this incoming batch a near-dup of the corpus?". Returns
    only CROSS pairs (one odd, one even id: the batch's own internal
    repeats don't count when screening against a fixed corpus), pinned
    against the batch pipeline restricted to exactly-one-odd pairs. The
    index is byte-untouched by the check (read-only contract: no lease,
    meta verified never written) — re-running the same check twice is
    trivially idempotent, and GramIndex.check() gains its MinHash
    sibling."""
    import hashlib as _hl

    docs = _docs_par(spark, sf_dir)
    tag = _hl.md5(sf_dir.encode()).hexdigest()[:8]
    path = _scratch(f"mh_check_{tag}_")
    index = MinHashIndex(path, num_perm=16, bands=8)
    even = FeatureTable(
        docs.df.where(F.col("doc_id") % 2 == 0), key="doc_id"
    )
    odd = FeatureTable(
        docs.df.where(F.col("doc_id") % 2 == 1), key="doc_id"
    )
    index.build(even)
    pairs = index.check(odd, threshold=0.5)
    return pairs.orderBy("id1", "id2")


@query(
    "concurrent_minhash_adds_serial_equiv",
    incremental_minhash_oracle_sql(
        new_pred="_id % 4 = 3", cross_only=True
    ),
)
def concurrent_minhash_adds_serial_equiv_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """E2 multi-writer ingest, MinHash spelling (r14, VERDICT r13 #1 —
    the GramIndex gate's LSH sibling): the corpus quarters %4∈{1,2}
    fold into an even-quarter-built index by two CONCURRENT ``add()``
    calls under tag-scoped leases, then the held-out quarter (%4==3)
    is screened read-only against the settled store. The cross pairs
    must equal the one-shot batch LSH over the full corpus restricted
    to exactly-one-%4==3 pairs — i.e. the concurrently-folded
    bucket/signature store is byte-equivalent to serial ingest (the
    projection under frozen hashing is deterministic per document and
    each batch owns its ``_batch`` partition, so folds commute)."""
    import hashlib as _hl
    import threading

    docs = _docs_par(spark, sf_dir)
    tag = _hl.md5(sf_dir.encode()).hexdigest()[:8]
    idx = MinHashIndex(
        _scratch(f"mh_conc_{tag}_"), num_perm=16, bands=8,
        auto_maintain=0, concurrent_adds=True,
    )
    part = lambda m: FeatureTable(  # noqa: E731
        docs.df.where(F.col("doc_id") % 4 == m), key="doc_id"
    )
    idx.build(part(0))
    errors: list[BaseException] = []

    def add(m: int, wid: str) -> None:
        try:
            pairs = idx.add(part(m), batch_tag=f"t{m}", writer_id=wid)
            pairs.count()
            from ralf_spark.operators.util import unpersist_cached

            unpersist_cached(pairs)
        except BaseException as e:  # noqa: BLE001 - surfaced below
            errors.append(e)

    threads = [
        threading.Thread(target=add, args=(1, "worker-a")),
        threading.Thread(target=add, args=(2, "worker-b")),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    if errors:
        raise errors[0]
    return idx.check(part(3), threshold=0.5).orderBy("id1", "id2")


@query(
    "streaming_minhash_screen",
    incremental_minhash_oracle_sql(cross_only=True),
)
def streaming_minhash_screen_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING near-dup screening (r13): the odd-doc half arrives as
    two micro-batches through ``foreach_batch_minhash_screen``, each
    checked READ-ONLY against a fixed even-doc MinHashIndex and its
    cross pairs appended exactly-once (batch-id-keyed dynamic
    overwrite). Because the corpus store never changes, per-batch
    screening equals screening all odd docs at once — the oracle is the
    SAME one-shot cross-pairs replay that gates
    ``minhash_index_check_serving``, which pins batch-decomposition
    invariance."""
    import hashlib as _hl
    import os as _os
    import time as _time

    from ralf_spark.streaming import (
        foreach_batch_minhash_screen,
        run_bounded,
    )

    docs = _docs_par(spark, sf_dir)
    tag = _hl.md5(sf_dir.encode()).hexdigest()[:8]
    index = MinHashIndex(_scratch(f"mh_screen_{tag}_"), num_perm=16,
                         bands=8)
    index.build(FeatureTable(
        docs.df.where(F.col("doc_id") % 2 == 0), key="doc_id"
    ))
    odd = docs.df.where(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    src = _scratch("mh_screen_stream_")
    now = _time.time()
    for i, pred in enumerate(
        (F.col("doc_id") % 4 == 1, F.col("doc_id") % 4 == 3)
    ):
        staged = f"{src}/_stage{i}"
        odd.where(pred).coalesce(1).write.parquet(staged)
        part = next(
            f for f in _os.listdir(staged) if f.endswith(".parquet")
        )
        dst = f"{src}/batch{i}.parquet"
        _os.rename(f"{staged}/{part}", dst)
        _os.utime(dst, (now - 100 + i, now - 100 + i))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_path = _scratch(f"mh_screen_out_{tag}_") + "/pairs"
    run_bounded(
        foreach_batch_minhash_screen(
            stream, index, out_path, key="doc_id", threshold=0.5
        ),
        checkpoint=_scratch("ck_mh_screen_"),
        shuffle_partitions=8,
    )
    return (
        spark.read.parquet(out_path)
        .select("id1", "id2", "est_jaccard")
        .orderBy("id1", "id2")
    )


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
    # blocks pinned to the minimum-band spelling this gate documents
    # (r9: the default auto-selects from the corpus count)
    return simhash_near_dup_pairs(
        docs, bits=48, max_hamming=3, blocks=4
    ).orderBy("id1", "id2")


@query("simhash_block_pairs", simhash_pairs_oracle_sql())
def simhash_block_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 SimHash dedup, Manku block-combination tables (r8): the same
    48-bit fingerprints and radius, but candidates come from C(6,3)=20
    tables each keyed on a 24-bit THREE-block concatenation instead of 4
    tables keyed on 12 bits — the configuration that removes the
    n²/2^12 random-collision candidate floor the 48x scale probe
    exposed (SCALEPROBE.md). Output is identical to
    ``simhash_near_dup_pairs`` by construction (exact popcount
    verification; only the candidate set changes), so the gate reuses
    the SAME DuckDB oracle — a hash-match here proves the pigeonhole
    argument for the wider keys end-to-end."""
    docs = _docs_par(spark, sf_dir)
    return simhash_near_dup_pairs(
        docs, bits=48, max_hamming=3, blocks=6
    ).orderBy("id1", "id2")


def _curation_pipeline_oracle_sql(
    q_min: float = 0.35,
    jaccard_threshold: float = 0.5,
    decon_n: int = 8,
    eval_pct: int = 5,
    cap: int = 10,
    budget: int = 40_000,
    num_perm: int = 16,
    bands: int = 8,
) -> str:
    """One composed DuckDB replay of the ENTIRE curation pipeline — the
    same stage chain the Spark query builds from the real operators."""
    from ralf_spark.functions.hashing import HEX_CHARS, stable_hash64_sql
    from ralf_spark.functions.text import (
        distinct_shingles_sql,
        tokens_sql,
        word_shingles_sql,
    )
    from ralf_spark.operators.text_analysis import (
        language_id_sql,
        quality_score_sql,
    )

    rows_per_band = num_perm // bands
    hash_expr = (
        f"CAST(('0x' || substring(md5('mh{{p}}' || '|' || s), 1,"
        f" {HEX_CHARS})) AS BIGINT)"
    )
    sig_items = ", ".join(
        "list_min(list_transform(sh, s -> " + hash_expr.format(p=p) + "))"
        for p in range(num_perm)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS _band, md5("
        + " || ',' || ".join(
            f"CAST(_sig[{b * rows_per_band + r + 1}] AS VARCHAR)"
            for r in range(rows_per_band)
        )
        + ") AS _key FROM sigs"
        for b in range(bands)
    )
    jac = (
        "len(list_intersect(s1.sh, s2.sh)) /"
        " len(list_distinct(list_concat(s1.sh, s2.sh)))"
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, text, source, n_chars, {tokens_sql('text')} AS w
      FROM documents
    ),
    st1 AS (SELECT * FROM toks WHERE {language_id_sql('w')} = 'en'),
    st2 AS (
      SELECT * FROM st1
      WHERE round({quality_score_sql('w')}, 4) >= {q_min}
    ),
    st3 AS (
      SELECT * FROM st2
      QUALIFY doc_id = min(doc_id) OVER (PARTITION BY md5(text))
    ),
    sh3 AS (
      SELECT doc_id, {distinct_shingles_sql('w', 3)} AS sh FROM st3
    ),
    sh3ne AS (SELECT * FROM sh3 WHERE len(sh) > 0),
    sigs AS (SELECT doc_id, sh, [{sig_items}] AS _sig FROM sh3ne),
    buckets AS ({band_rows}),
    cand AS (
      SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
      FROM buckets a JOIN buckets b
        ON a._band = b._band AND a._key = b._key AND a.doc_id < b.doc_id
    ),
    dup2 AS (
      SELECT DISTINCT id2 FROM cand
      JOIN sh3ne s1 ON id1 = s1.doc_id
      JOIN sh3ne s2 ON id2 = s2.doc_id
      WHERE {jac} >= {jaccard_threshold}
    ),
    st4 AS (
      SELECT * FROM st3 WHERE doc_id NOT IN (SELECT id2 FROM dup2)
    ),
    evg AS (
      SELECT DISTINCT unnest(list_distinct(
        {word_shingles_sql('w', decon_n)})) AS g
      FROM toks
      WHERE {stable_hash64_sql('text', salt='decon')} % 100 < {eval_pct}
    ),
    contam AS (
      SELECT DISTINCT t.doc_id FROM (
        SELECT doc_id, unnest(list_distinct(
          {word_shingles_sql('w', decon_n)})) AS g
        FROM st4) t JOIN evg USING (g)
    ),
    st5 AS (
      SELECT * FROM st4
      WHERE {stable_hash64_sql('text', salt='decon')} % 100 >= {eval_pct}
        AND doc_id NOT IN (SELECT doc_id FROM contam)
    ),
    st6 AS (
      SELECT * FROM st5
      QUALIFY row_number() OVER (
        PARTITION BY source ORDER BY n_chars DESC, doc_id) <= {cap}
    ),
    st7 AS (
      SELECT * FROM st6
      QUALIFY sum(n_chars) OVER (
        ORDER BY n_chars DESC, doc_id
        ROWS UNBOUNDED PRECEDING) <= {budget}
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM st7 GROUP BY source ORDER BY source
    """


def curation_pipeline(
    spark: SparkSession,
    sf_dir: str,
    q_min: float = 0.35,
    jaccard_threshold: float = 0.5,
    decon_n: int = 8,
    eval_pct: int = 5,
    cap: int = 10,
    budget: int = 40_000,
    num_perm: int = 16,
    bands: int = 8,
) -> DataFrame:
    """The parameterized curation build behind the composition gate; every
    knob is shared verbatim with ``_curation_pipeline_oracle_sql`` and the
    non-default-parameter parity test replays BOTH at alternate settings,
    so a silently-ignored parameter (the ADVICE-r4 ``new_pred`` bug class)
    fails a test instead of shipping a wrong oracle."""
    from ralf_spark.functions.hashing import stable_hash64
    from ralf_spark.functions.text import distinct_shingles
    from ralf_spark.operators.dedup import exact_dedup, near_dup_pairs
    from ralf_spark.operators.policies import (
        budgeted_prefix_sample,
        domain_quota_cap,
    )
    from ralf_spark.operators.text_analysis import (
        language_id,
        quality_score,
    )
    from ralf_spark.operators.util import attach_cached

    df = _t(spark, sf_dir, "documents").df
    st1 = df.where(language_id(F.col("text")) == "en")
    # Persist each survivor set that feeds TWO downstream branches: st2
    # (exact-dedup winners + the semi-join left side), st3 (LSH hashing +
    # the anti-join left side), st4 (contamination shingles + st5) — the
    # language/quality/tokenize expression chains would otherwise
    # re-execute once per referencing branch, compounding stage by stage
    # (r7: warm 11.7s -> measured below; same recompute class as
    # semdedup/minhash — BENCH_NOTES). Cluster spelling: checkpoint each
    # stage to parquet, which is also the natural audit trail of a
    # curation build. Released via attach_cached after the action.
    st2 = st1.where(
        F.round(quality_score(F.col("text")), 4) >= q_min
    ).persist()
    t2 = FeatureTable(st2, key="doc_id")
    keep = exact_dedup(t2, on=F.col("text")).df.select(
        F.col("keep_id").alias("doc_id")
    )
    st3 = st2.join(keep, "doc_id", "left_semi").persist()
    t3 = FeatureTable(st3, key="doc_id")
    pairs = near_dup_pairs(
        t3, num_perm=num_perm, bands=bands, threshold=jaccard_threshold
    )
    # The pipeline consumes ONLY the (tiny) duplicate-id set; checkpoint
    # it so the whole LSH subtree (shingles + signatures + bucket join +
    # verification, ~2x bigger since the r8 verify prefilter) becomes a
    # LEAF for every downstream stage's analysis — the same
    # lineage-severing dedup_clusters uses per closure round (r8 A/B:
    # the composed plan's DRIVER-side analysis was the regression, jobs
    # were flat). r9 (ADVICE): eager=False — the checkpointed PLAN is
    # substituted at call time (analysis stays leaf-cheap) but the job
    # runs at the caller's first action, not at plan construction; the
    # LSH caches therefore stay attached until the caller releases them
    # (the checkpoint job is their last reader), and the checkpoint
    # blocks themselves get a release handle in the same list. Local
    # checkpoint blocks are executor-local (a lost executor loses them);
    # on a cluster flip to reliable .checkpoint() — identical shape.
    dup_ids = (
        pairs.select(F.col("id2").alias("doc_id"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # The lazy checkpoint's LogicalRDD has no size statistics until it
    # materializes, which would flip this anti join (and everything
    # downstream) to SMJ in the STATIC plan — AQE re-converts at runtime,
    # but the id set is tiny BY CONTRACT (∝ verified duplicates, ids
    # only), so hint it explicitly; same for the contamination id set
    # below. Unlike the dedup verify join (bucket-stats-guarded, r9),
    # these are id-only projections: even 10⁸ dup ids broadcast at ~1 GB,
    # and a corpus that duplicate-heavy has bigger problems upstream.
    st4 = st3.join(F.broadcast(dup_ids), "doc_id", "left_anti").persist()
    is_eval = stable_hash64(F.col("text"), salt="decon") % 100 < eval_pct
    ev_grams = (
        df.where(is_eval)
        .select(
            F.explode(distinct_shingles(F.col("text"), decon_n)).alias("g")
        )
        .distinct()
    )
    contam = (
        st4.select(
            "doc_id",
            F.explode(distinct_shingles(F.col("text"), decon_n)).alias("g"),
        )
        .join(ev_grams, "g")
        .select("doc_id")
        .distinct()
    )
    st5 = st4.where(~is_eval).join(F.broadcast(contam), "doc_id", "left_anti")
    st6 = (
        domain_quota_cap(
            FeatureTable(st5, key="doc_id"), "source", cap=cap,
            quality_col="n_chars",
        )
        .where("kept")
        .drop("kept")
    )
    st7 = (
        budgeted_prefix_sample(
            FeatureTable(st6, key="doc_id"), "n_chars", budget
        )
        .where("kept")
    )
    out = (
        st7.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("source")
    )
    # r9: the LSH caches ride along until the caller's action materializes
    # the (lazy) dup_ids checkpoint — their last reader — and the
    # checkpoint blocks get their own release handle
    from ralf_spark.operators.util import CheckpointHandle

    return attach_cached(
        out,
        [st2, st3, st4]
        + list(getattr(pairs, "_ralf_cached", []))
        + [CheckpointHandle(dup_ids)],
    )


@query("curation_pipeline_end2end", _curation_pipeline_oracle_sql())
def curation_pipeline_end2end_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP composition gate: the full training-data curation build —
    language filter -> quality filter -> exact dedup -> MinHash/LSH
    near-dedup (drop the larger id of each verified pair; the keep-best
    cluster policy is its own gated query) -> eval-split decontamination
    (8-gram overlap) -> per-domain quota cap -> global char budget —
    chained through the REAL operators (:func:`curation_pipeline`),
    checked end to end against ONE composed DuckDB replay. Isolated
    operator oracles cannot catch stage-boundary bugs (a filter reordered
    across a dedup, a policy applied to the wrong survivor set); this
    gate can. Output: per-source survivor counts/chars/id-range of the
    final training set."""
    return curation_pipeline(spark, sf_dir)


from ralf_spark.operators.dedup import (  # noqa: E402
    duplicate_span_ranges,
    duplicate_span_ranges_sql,
    remove_duplicate_spans,
    remove_duplicate_spans_sql,
)


@query(
    "exact_substring_spans",
    duplicate_span_ranges_sql() + "\n    ORDER BY doc_id, span_start",
)
def exact_substring_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 exact-substring dedup (Lee et al. 2022): every maximal span of
    >= 8 whitespace tokens whose 8-gram windows each repeat corpus-wide —
    the removal targets the paper's suffix-array pass produces, built here
    from a linear gram scan + one digest groupBy + an island merge (no
    suffix array, no self-join; see :func:`duplicate_span_ranges` for the
    100 TB shuffle story). Complements the MinHash/Jaccard family (whole
    near-duplicate DOCUMENTS) and ``duplicate_ngram_spans`` (per-doc
    duplicated-window COUNTS): this one emits the actual removal RANGES
    — verbatim duplicated regions inside otherwise-distinct documents
    (licenses, boilerplate, quoted excerpts)."""
    docs = _docs_par(spark, sf_dir)
    return duplicate_span_ranges(docs, min_tokens=8).orderBy(
        "doc_id", "span_start"
    )


@query(
    "exact_substring_dup_frac",
    f"""
    WITH spans AS ({duplicate_span_ranges_sql()}),
    per_doc AS (
      SELECT doc_id, sum(span_tokens) AS dup_tokens FROM spans
      GROUP BY doc_id
    ),
    toks AS (
      SELECT doc_id,
             len({tokens_sql('text')})
               AS n_tokens
      FROM documents
    )
    SELECT t.doc_id,
           t.n_tokens,
           coalesce(p.dup_tokens, 0) AS dup_tokens,
           round(coalesce(p.dup_tokens, 0) / CAST(t.n_tokens AS DOUBLE), 4)
             AS dup_frac
    FROM toks t LEFT JOIN per_doc p ON t.doc_id = p.doc_id
    WHERE t.n_tokens > 0
    ORDER BY t.doc_id
    """,
)
def exact_substring_dup_frac_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2/E4: per-document duplicated-token fraction from the MERGED
    exact-substring spans — the fraction of the document that span
    removal would actually delete (distinct from ``duplicate_ngram_
    spans``'s duplicated-WINDOW fraction, which double-counts tokens
    shared by overlapping windows). One extra aggregate + a
    broadcast-size left join back onto per-doc token counts."""
    from ralf_spark.functions.text import tokens as _tokens

    docs = _docs_par(spark, sf_dir)
    spans = duplicate_span_ranges(docs, min_tokens=8)
    per_doc = spans.groupBy("doc_id").agg(
        F.sum("span_tokens").alias("dup_tokens")
    )
    toks = docs.df.select(
        "doc_id", F.size(_tokens(F.col("text"))).alias("n_tokens")
    )
    return (
        toks.join(per_doc, "doc_id", "left")
        .where(F.col("n_tokens") > 0)
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0))
                / F.col("n_tokens").cast("double"),
                4,
            ).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


@query(
    "incremental_gram_index",
    f"""
    WITH allspans AS ({duplicate_span_ranges_sql()})
    SELECT doc_id, span_start, span_end, span_tokens
    FROM allspans WHERE doc_id % 2 = 1
    ORDER BY doc_id, span_start
    """,
)
def incremental_gram_index_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 incremental exact-substring dedup: build the persistent gram
    digest store on the even-doc half, then ``add()`` the odd half — the
    crawl-loop ExactSubstr round. The add's spans must equal the BATCH
    detector over the full corpus restricted to odd docs, because
    membership-in-store OR repeated-within-batch is exactly
    corpus-so-far occurrence >= 2 (see :class:`GramIndex`). Only the new
    half is tokenized/hashed in the add round — the incremental-cost
    contract, same shape as ``incremental_minhash_index``.

    The returned plan carries the add's persisted intermediates via the
    ``attach_cached`` convention (operators/util.py): every harness
    caller — ``compare_query``, the sweep, the bench drain — calls
    ``unpersist_cached`` after its action, which releases them; a direct
    caller that keeps the session alive must do the same."""
    import hashlib as _hl

    from ralf_spark.operators.dedup import GramIndex

    docs = _docs_par(spark, sf_dir)
    tag = _hl.md5(sf_dir.encode()).hexdigest()[:8]
    idx = GramIndex(_scratch(f"gram_index_{tag}_"), min_tokens=8)
    even = FeatureTable(
        docs.df.where(F.col("doc_id") % 2 == 0), key="doc_id"
    )
    odd = FeatureTable(
        docs.df.where(F.col("doc_id") % 2 == 1), key="doc_id"
    )
    idx.build(even)
    spans = idx.add(odd)
    # re-attach through the sort: orderBy returns a NEW DataFrame and
    # drops the attribute-based cache handle, so the harness's
    # unpersist_cached would otherwise be a no-op here (r12 review —
    # this closes ADVICE r11 #4 properly instead of documenting it)
    from ralf_spark.operators.util import attach_cached

    return attach_cached(
        spans.orderBy("doc_id", "span_start"),
        getattr(spans, "_ralf_cached", []),
    )


@query(
    "gram_index_retro_spans",
    f"""
    WITH allspans AS ({duplicate_span_ranges_sql()})
    SELECT doc_id, span_start, span_end, span_tokens
    FROM allspans ORDER BY doc_id, span_start
    """,
)
def gram_index_retro_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 retro-flagging (r12, full Lee et al. parity in the incremental
    path): a count-mode :class:`GramIndex` ingests the corpus as two
    crawl batches (even docs built, odd docs added), then ``retro()``
    emits corpus-wide duplicated spans — INCLUDING the earlier copies
    whose duplicates only arrived in the second batch, which ``add()``
    alone cannot flag. The oracle is the one-shot batch detector over
    the whole corpus: the gate pins ``build(A); add(B); retro()`` ≡
    batch spans over A ∪ B for both halves' documents.

    Scale: retro is ONE O(store) pass — groupBy(digest) occurrence count
    over the position log + rejoin — run once per maintenance cadence,
    never per add (probe-measured in SCALEPROBE.md)."""
    import hashlib as _hl

    from ralf_spark.operators.dedup import GramIndex

    docs = _docs_par(spark, sf_dir)
    tag = _hl.md5(sf_dir.encode()).hexdigest()[:8]
    idx = GramIndex(
        _scratch(f"gram_retro_{tag}_"), min_tokens=8, count_mode=True
    )
    even = FeatureTable(
        docs.df.where(F.col("doc_id") % 2 == 0), key="doc_id"
    )
    odd = FeatureTable(
        docs.df.where(F.col("doc_id") % 2 == 1), key="doc_id"
    )
    idx.build(even)
    spans = idx.add(odd)
    spans.count()  # drain the add (its span output is the odd half only)
    from ralf_spark.operators.util import unpersist_cached

    unpersist_cached(spans)
    return idx.retro(spark).orderBy("doc_id", "span_start")


@query(
    "gram_index_retro_delta_spans",
    f"""
    WITH allspans AS ({duplicate_span_ranges_sql()})
    SELECT doc_id, span_start, span_end, span_tokens
    FROM allspans ORDER BY doc_id, span_start
    """,
)
def gram_index_retro_delta_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 DELTA retro-flagging (r13, VERDICT r12 #3): the corpus arrives
    as two crawl batches into a count-mode :class:`GramIndex`; after
    each batch one ``retro_delta()`` cadence runs, and the deltas fold
    LATEST-WINS PER DOCUMENT. The folded result must equal the one-shot
    batch detector over the whole corpus — i.e. accumulated
    ``retro_delta()`` ≡ ``retro()`` — while each cadence joins only the
    NEW tags' digests against the store and emits only documents the
    new data touched (the lazy latest-wins fold here is
    ``delta2 ∪ (delta1 ⟕̸ delta2.doc_id)``: a broadcast anti-join over
    two delta-sized frames, never the store)."""
    import hashlib as _hl

    from ralf_spark.operators.dedup import GramIndex

    docs = _docs_par(spark, sf_dir)
    tag = _hl.md5(sf_dir.encode()).hexdigest()[:8]
    idx = GramIndex(
        _scratch(f"gram_rdelta_{tag}_"), min_tokens=8, count_mode=True
    )
    even = FeatureTable(
        docs.df.where(F.col("doc_id") % 2 == 0), key="doc_id"
    )
    odd = FeatureTable(
        docs.df.where(F.col("doc_id") % 2 == 1), key="doc_id"
    )
    idx.build(even)
    # r14 two-phase watermark: each cadence is consumed (persisted +
    # drained) BEFORE commit_retro_delta promotes its pending tags —
    # the exactly-once sequencing a crash-safe caller uses
    d1 = idx.retro_delta(spark).persist()  # covers the base tag
    d1.count()
    idx.commit_retro_delta(spark)
    spans = idx.add(odd)
    spans.count()  # drain the add
    from ralf_spark.operators.util import attach_cached, unpersist_cached

    unpersist_cached(spans)
    d2 = idx.retro_delta(spark).persist()  # covers the odd batch's tag
    d2.count()
    idx.commit_retro_delta(spark)
    folded = d2.unionByName(
        d1.join(
            F.broadcast(d2.select("doc_id").distinct()),
            "doc_id",
            "left_anti",
        )
    )
    cached = (
        [d1, d2]
        + list(getattr(d1, "_ralf_cached", []))
        + list(getattr(d2, "_ralf_cached", []))
    )
    return attach_cached(
        folded.orderBy("doc_id", "span_start"), cached
    )


from ralf_spark.operators.dedup import (  # noqa: E402
    cross_corpus_duplicate_spans_sql,
)


@query(
    "concurrent_gram_adds_serial_equiv",
    cross_corpus_duplicate_spans_sql(
        table="(SELECT * FROM documents WHERE doc_id % 4 = 3)",
        other="(SELECT * FROM documents WHERE doc_id % 4 < 3)",
    )
    + " ORDER BY doc_id, span_start",
)
def concurrent_gram_adds_serial_equiv_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """E2 multi-writer ingest (r14, VERDICT r13 #1): the train corpus
    arrives as a base build plus TWO crawl batches folded by CONCURRENT
    ``add()`` calls (tag-scoped leases — neither takes the store root,
    neither serializes behind the other), and a held-out eval quarter
    is then screened read-only against the settled store. The result
    must equal the one-shot cross-corpus detector over train ∪ eval —
    i.e. the concurrently-folded store is byte-equivalent to serial
    ingest (the digest-set union commutes; the tag leases only order
    writers against EXCLUSIVE operations, never against each other)."""
    import hashlib as _hl
    import threading

    from ralf_spark.operators.dedup import GramIndex

    docs = _docs_par(spark, sf_dir)
    tag = _hl.md5(sf_dir.encode()).hexdigest()[:8]
    idx = GramIndex(
        _scratch(f"gram_conc_{tag}_"), min_tokens=8, auto_maintain=0,
        concurrent_adds=True,
    )
    part = lambda m: FeatureTable(  # noqa: E731
        docs.df.where(F.col("doc_id") % 4 == m), key="doc_id"
    )
    idx.build(part(0))
    errors: list[BaseException] = []

    def add(m: int, wid: str) -> None:
        try:
            spans = idx.add(part(m), batch_tag=f"t{m}", writer_id=wid)
            spans.count()
            from ralf_spark.operators.util import unpersist_cached

            unpersist_cached(spans)
        except BaseException as e:  # noqa: BLE001 - surfaced below
            errors.append(e)

    threads = [
        threading.Thread(target=add, args=(1, "worker-a")),
        threading.Thread(target=add, args=(2, "worker-b")),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    if errors:
        raise errors[0]
    return idx.check(part(3)).orderBy("doc_id", "span_start")


@query(
    "streaming_gram_dedup",
    f"""
    WITH even_spans AS (
      {duplicate_span_ranges_sql(table="(SELECT * FROM documents WHERE doc_id % 2 = 0)")}
    ),
    all_spans AS (
      {duplicate_span_ranges_sql()}
    )
    SELECT doc_id, span_start, span_end, span_tokens FROM even_spans
    UNION ALL
    SELECT doc_id, span_start, span_end, span_tokens FROM all_spans
    WHERE doc_id % 2 = 1
    ORDER BY doc_id, span_start
    """,
)
def streaming_gram_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING exact-substring dedup: the documents table arrives as
    two micro-batches (even docs, then odd) through
    ``foreach_batch_gram_dedup`` — each batch's duplicated spans are
    detected against everything seen so far and appended exactly-once to
    the spans log. The oracle composes the per-step contract: batch 1's
    spans over the even half alone, plus batch 2's spans over the full
    corpus restricted to odd docs."""
    import hashlib as _hl
    import os as _os
    import time as _time

    from ralf_spark.operators.dedup import GramIndex
    from ralf_spark.streaming import foreach_batch_gram_dedup, run_bounded

    docs = _t(spark, sf_dir, "documents").df.select("doc_id", "text")
    src = _scratch("gram_stream_")
    now = _time.time()
    for i, pred in enumerate(
        (F.col("doc_id") % 2 == 0, F.col("doc_id") % 2 == 1)
    ):
        staged = f"{src}/_stage{i}"
        docs.where(pred).coalesce(1).write.parquet(staged)
        part = next(
            f for f in _os.listdir(staged) if f.endswith(".parquet")
        )
        dst = f"{src}/batch{i}.parquet"
        _os.rename(f"{staged}/{part}", dst)
        # mtime pins micro-batch order: even half first
        _os.utime(dst, (now - 100 + i, now - 100 + i))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    tag = _hl.md5(sf_dir.encode()).hexdigest()[:8]
    idx = GramIndex(_scratch(f"gram_sidx_{tag}_"), min_tokens=8)
    spans_path = _scratch(f"gram_slog_{tag}_") + "/spans"
    run_bounded(
        foreach_batch_gram_dedup(
            stream, idx, spans_path, key="doc_id"
        ),
        checkpoint=_scratch("ck_gram_"),
        shuffle_partitions=8,
    )
    return (
        spark.read.parquet(spans_path)
        .select("doc_id", "span_start", "span_end", "span_tokens")
        .orderBy("doc_id", "span_start")
    )


@query(
    "exact_substring_removal",
    remove_duplicate_spans_sql() + "\n    ORDER BY doc_id",
)
def exact_substring_removal_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 exact-substring dedup, transform half: the CLEANED corpus with
    every duplicated >= 8-token span cut out (Lee et al. 2022's
    ExactSubstr deletion pass) — detect (:func:`duplicate_span_ranges`)
    then cut (row-local token filter against the doc's merged span
    list). Every doc survives with its kept/removed token counts; docs
    without duplicated spans pass through verbatim — hash-gated on the
    full cleaned text, so a one-token-off cut fails the gate."""
    docs = _docs_par(spark, sf_dir)
    return remove_duplicate_spans(docs, min_tokens=8).orderBy("doc_id")


# Registry finalization: re-applies the driver-prefix ordering when THIS
# module was the import entry point (circular-entry tolerance; no-op when
# ralf_spark.queries was imported first and has already finalized).
from ralf_spark.queries import finalize_registry as _finalize  # noqa: E402

_finalize()
