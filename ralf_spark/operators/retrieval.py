"""Corpus retrieval / training-data scoring operators (north-star §2.10).

The reference has no text-retrieval surface (its features are scalar
per-key aggregates); these cover what an LLM-training-data pipeline needs
on top of dedup/similarity: BM25 keyword retrieval, unigram-LM quality
scoring, and hard-negative mining for embedding-model training.

All three are pure relational compositions — the heavy input (corpus) is
scanned once and the tiny derived state (corpus statistics, query terms,
anchor vectors) is broadcast back over it, so no operator shuffles the
corpus itself:

- **BM25**: per-term tf columns are computed scan-side with native
  higher-order functions; (N, avgdl, df_t) is a single-row aggregate
  cross-joined back (broadcast). Cost at 100 TB = one corpus scan + a
  1-row shuffle; adding query terms adds columns, not passes.
- **Unigram NLL**: token counts are a vocabulary-sized aggregate; the
  corpus-total is a 1-row aggregate over *that* (never over the corpus).
  The token→count join is AQE-decided (vocabularies are Zipf-bounded:
  even a 100 TB web corpus has ~10^8 distinct tokens ≈ executor-memory
  scale; if not, the equi-join on token is still a well-partitioned
  shuffle, never a cross product).
- **Hard negatives**: identical plan shape to ``similarity.cosine_topk``
  (broadcast anchors × corpus scan), with a label-mismatch predicate in
  the join condition so the filter runs before any ranking state builds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ralf_spark.functions.arrays import cosine_similarity
from ralf_spark.functions.text import tokens
from ralf_spark.operators.util import ensure_parallelism
from ralf_spark.table import FeatureTable

#: Okapi BM25 constants (standard defaults)
BM25_K1 = 1.2
BM25_B = 0.75


def _tf(tok: Column, term: str) -> Column:
    """Term frequency inside a token array — native filter+size, no UDF."""
    return F.size(F.filter(tok, lambda t: t == F.lit(term)))


def bm25_scores(
    docs: FeatureTable,
    terms: list[str],
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Okapi BM25 score of every document against a fixed term set.

    Returns (doc_id, bm25) for documents matching >= 1 term. idf uses the
    standard ``ln(1 + (N - df + 0.5)/(df + 0.5))`` form (always >= 0).

    Plan: scan-side tf/dl columns -> single-row stats aggregate ->
    broadcast cross join -> arithmetic. The corpus is scanned once and
    never shuffled.
    """
    key = docs.key
    tok = tokens(F.col(text_col))
    proj = docs.df.select(
        F.col(key),
        F.size(tok).alias("dl"),
        *[_tf(tok, t).alias(f"tf{i}") for i, t in enumerate(terms)],
    )
    stats = proj.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    scored = proj.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    for i in range(len(terms)):
        tf, df = F.col(f"tf{i}"), F.col(f"df{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - df + F.lit(0.5)) / (df + F.lit(0.5))
        )
        norm = tf + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
        )
        score = score + F.when(
            tf > 0, idf * tf * F.lit(k1 + 1.0) / norm
        ).otherwise(F.lit(0.0))
    matched = F.lit(False)
    for i in range(len(terms)):
        matched = matched | (F.col(f"tf{i}") > 0)
    return scored.where(matched).select(
        F.col(key), score.alias("bm25")
    )


def bm25_oracle_sql(
    terms: list[str],
    key: str = "doc_id",
    table: str = "documents",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> str:
    """DuckDB spelling of :func:`bm25_scores` — identical arithmetic
    structure so doubles match bit-for-bit before the final round."""
    tf_cols = ",\n             ".join(
        f"len(list_filter(w, t -> t = '{t}')) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(terms))
    )
    score_terms = " + ".join(
        f"""CASE WHEN tf{i} > 0 THEN
              ln(1.0 + (n_docs - df{i} + 0.5) / (df{i} + 0.5))
              * tf{i} * {k1 + 1.0} / (tf{i} + {k1} * ({1.0 - b} + {b} * dl / avgdl))
            ELSE 0.0 END"""
        for i in range(len(terms))
    )
    matched = " OR ".join(f"tf{i} > 0" for i in range(len(terms)))
    from ralf_spark.functions.text import tokens_sql

    return f"""
    WITH toks AS (
      SELECT {key}, {tokens_sql('text')} AS w
      FROM {table}
    ),
    d AS (
      SELECT {key}, len(w) AS dl,
             {tf_cols}
      FROM toks
    ),
    s AS (
      SELECT count(*) AS n_docs, avg(dl) AS avgdl, {df_cols} FROM d
    )
    SELECT {key}, round(0.0 + {score_terms}, 4) AS bm25
    FROM d, s
    WHERE {matched}
    ORDER BY {key}
    """


def unigram_nll(
    docs: FeatureTable, text_col: str = "text"
) -> DataFrame:
    """Per-document mean negative log-likelihood under the corpus's own
    unigram distribution (Laplace +1 smoothing) — the classic cheap
    "perplexity-ish" quality signal when no external LM is available
    (rare-token-heavy or boilerplate docs score high / low vs the corpus
    norm).

    Returns (doc_id, n_toks, avg_nll). p(t) = (count(t)+1) / (total+V).
    """
    key = docs.key
    tok = docs.df.select(
        F.col(key), F.explode(tokens(F.col(text_col))).alias("t")
    )
    cnt = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(
        F.sum("c").alias("total"), F.count(F.lit(1)).alias("vocab")
    )
    nll = -F.log(
        (F.col("c") + F.lit(1.0)) / (F.col("total") + F.col("vocab"))
    )
    return (
        tok.join(cnt, "t")
        .crossJoin(F.broadcast(tot))
        .groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.avg(nll).alias("avg_nll"),
        )
    )


def unigram_nll_oracle_sql(
    key: str = "doc_id", table: str = "documents"
) -> str:
    from ralf_spark.functions.text import tokens_sql

    return f"""
    WITH toks AS (
      SELECT {key}, {tokens_sql('text')} AS w
      FROM {table}
    ),
    tok AS (SELECT {key}, unnest(w) AS t FROM toks),
    cnt AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
    tot AS (SELECT sum(c) AS total, count(*) AS vocab FROM cnt)
    SELECT {key}, CAST(count(*) AS BIGINT) AS n_toks,
           round(avg(-ln((c + 1.0) / (total + vocab))), 4) AS avg_nll
    FROM tok JOIN cnt USING (t), tot
    GROUP BY {key}
    ORDER BY {key}
    """


def hard_negatives(
    corpus: FeatureTable,
    anchors: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    label_col: str = "label",
    anchor_id: str = "anchor_id",
    anchor_vec: str = "anchor_vec",
    anchor_label: str = "anchor_label",
) -> DataFrame:
    """Hard-negative mining for contrastive / embedding-model training:
    for each anchor, the top-k most-cosine-similar corpus vectors whose
    label DIFFERS from the anchor's (the "confusable" negatives worth
    training against).

    Same broadcast-anchors × corpus-scan shape as ``cosine_topk``; the
    label-mismatch predicate sits in the join condition so mismatched rows
    never reach the ranking window.
    """
    idc = corpus.key
    emb = ensure_parallelism(
        corpus.df.select(
            F.col(idc).alias("neighbor_id"),
            F.col(label_col).alias("_nl"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
    )
    a = anchors.select(
        F.col(anchor_id),
        F.col(anchor_label).alias("_al"),
        F.col(anchor_vec).cast("array<double>").alias("_av"),
    )
    scored = emb.join(
        F.broadcast(a), F.col("_nl") != F.col("_al")
    ).select(
        anchor_id,
        "neighbor_id",
        cosine_similarity(F.col("_av"), F.col("_v")).alias("cos_sim"),
    )
    w = Window.partitionBy(anchor_id).orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def bigram_nll(
    docs: FeatureTable, text_col: str = "text"
) -> DataFrame:
    """Per-document mean conditional NLL under the corpus's own bigram LM
    with add-1 smoothing: p(cur | prev) = (c(prev,cur)+1) / (c(prev)+V).
    The order-sensitive upgrade of :func:`unigram_nll` — boilerplate with
    common words in unusual orders scores high where the unigram model
    can't see it. Documents with < 2 tokens have no bigrams and are absent.

    Plan: bigram instances are built scan-side (native shingle transform);
    c(prev,cur) and c(prev) are Zipf-bounded aggregates; V is a one-row
    aggregate over the vocabulary (never over the corpus). Instance→count
    joins are key-partitioned equi-joins on token strings — at 100 TB these
    shuffle the exploded token stream once each, the corpus rows never.
    """
    from ralf_spark.functions.text import word_shingles

    key = docs.key
    tok = tokens(F.col(text_col))
    inst = docs.df.select(
        F.col(key), F.explode(word_shingles(tok, 2)).alias("bg")
    ).withColumn("prev", F.split(F.col("bg"), " ")[0])
    c2 = inst.groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))
    c1 = inst.groupBy("prev").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (
        docs.df.select(F.explode(tok).alias("t"))
        .agg(F.count_distinct("t").alias("vocab"))
    )
    nll = -F.log(
        (F.col("c2") + F.lit(1.0)) / (F.col("c1") + F.col("vocab"))
    )
    return (
        inst.join(c2, "bg")
        .join(c1, "prev")
        .crossJoin(F.broadcast(vocab))
        .groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.avg(nll).alias("avg_nll"),
        )
    )


def bigram_nll_oracle_sql(
    key: str = "doc_id", table: str = "documents"
) -> str:
    from ralf_spark.functions.text import tokens_sql, word_shingles_sql

    return f"""
    WITH toks AS (
      SELECT {key}, {tokens_sql('text')} AS w FROM {table}
    ),
    inst AS (
      SELECT {key}, bg, string_split(bg, ' ')[1] AS prev
      FROM (SELECT {key}, unnest({word_shingles_sql('w', 2)}) AS bg FROM toks)
    ),
    c2 AS (SELECT bg, count(*) AS c2 FROM inst GROUP BY bg),
    c1 AS (SELECT prev, count(*) AS c1 FROM inst GROUP BY prev),
    v AS (
      SELECT count(DISTINCT t) AS vocab
      FROM (SELECT unnest(w) AS t FROM toks)
    )
    SELECT {key}, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(-ln((c2 + 1.0) / (c1 + vocab))), 4) AS avg_nll
    FROM inst JOIN c2 USING (bg) JOIN c1 USING (prev), v
    GROUP BY {key}
    ORDER BY {key}
    """


#: DSIR hashed-feature bucket count (power of two, matches the paper's
#: hashed n-gram feature space; 1024 keeps the oracle CTEs readable)
DSIR_BUCKETS = 1024


def dsir_log_weights(
    docs: FeatureTable,
    target_pred: Column,
    text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """DSIR (Xie et al. 2023, arXiv:2302.03169) importance weights for
    data selection: score every document by how target-like its hashed
    unigram distribution is,

        log w(doc) = Σ_tokens [ ln p_target(bucket(t)) − ln p_raw(bucket(t)) ]

    with add-1 smoothed bucket probabilities estimated from the corpus
    itself (``target_pred`` rows vs the rest). Resampling raw data by
    exp(log_w) shifts it toward the target distribution.

    Plan: token instances are hashed scan-side into a fixed bucket space;
    both distributions are ``buckets``-sized aggregates (broadcastable by
    construction — the feature space is fixed, not corpus-sized); the
    per-token lookup is a broadcast join, the per-doc sum a single
    partial-agg shuffle. Nothing scales with corpus size except the one
    token-stream scan.
    """
    from ralf_spark.functions.hashing import stable_hash64

    key = docs.key
    inst = docs.df.select(
        F.col(key),
        target_pred.alias("is_t"),
        F.explode(tokens(F.col(text_col))).alias("t"),
    ).withColumn("b", stable_hash64(F.col("t")) % buckets)
    bc = inst.groupBy("b").agg(
        F.sum(F.col("is_t").cast("long")).alias("ct"),
        F.sum((~F.col("is_t")).cast("long")).alias("cr"),
    )
    tot = bc.agg(
        F.sum("ct").alias("tt"), F.sum("cr").alias("tr")
    )
    lw = F.log((F.col("ct") + F.lit(1.0)) / (F.col("tt") + F.lit(buckets))) - F.log(
        (F.col("cr") + F.lit(1.0)) / (F.col("tr") + F.lit(buckets))
    )
    return (
        inst.join(F.broadcast(bc), "b")
        .crossJoin(F.broadcast(tot))
        .groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.sum(lw).alias("log_weight"),
        )
    )


def dsir_log_weights_oracle_sql(
    target_where: str,
    key: str = "doc_id",
    table: str = "documents",
    buckets: int = DSIR_BUCKETS,
) -> str:
    from ralf_spark.functions.hashing import stable_hash64_sql
    from ralf_spark.functions.text import tokens_sql

    return f"""
    WITH inst AS (
      SELECT {key}, ({target_where}) AS is_t,
             {stable_hash64_sql('t')} % {buckets} AS b
      FROM (
        SELECT {key}, source, unnest({tokens_sql('text')}) AS t FROM {table}
      )
    ),
    bc AS (
      SELECT b,
             sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
             sum(CASE WHEN is_t THEN 0 ELSE 1 END) AS cr
      FROM inst GROUP BY b
    ),
    tot AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM bc)
    SELECT {key}, CAST(count(*) AS BIGINT) AS n_toks,
           round(sum(ln((ct + 1.0) / (tt + {buckets}))
                     - ln((cr + 1.0) / (tr + {buckets}))), 4) AS log_weight
    FROM inst JOIN bc USING (b), tot
    GROUP BY {key}
    ORDER BY {key}
    """


def mixture_weights(
    docs: FeatureTable,
    alpha: float = 0.5,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled data-mixture sampling weights per source:
    p_sample(s) ∝ tokens(s)^alpha (alpha=1 → proportional, alpha→0 →
    uniform) — the standard multilingual/multi-domain mixing rule
    (e.g. mBERT/XLM-R exponential smoothing). Returns one row per source:
    (source, n_docs, n_tokens, p_raw, p_sample).

    Plan: one corpus scan → per-source partial-agg (the only shuffle,
    keyed on the handful of sources) → broadcast one-row normalizer.
    Output is dimension-sized, never corpus-sized.
    """
    per = docs.df.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens(F.col(text_col)))).alias("n_tokens"),
    )
    tot = per.agg(
        F.sum("n_tokens").alias("_tot"),
        F.sum(F.pow(F.col("n_tokens").cast("double"), F.lit(alpha))).alias(
            "_tot_a"
        ),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        F.col(source_col),
        "n_docs",
        "n_tokens",
        (F.col("n_tokens") / F.col("_tot")).alias("p_raw"),
        (
            F.pow(F.col("n_tokens").cast("double"), F.lit(alpha))
            / F.col("_tot_a")
        ).alias("p_sample"),
    )


def mixture_weights_oracle_sql(
    alpha: float = 0.5,
    source_col: str = "source",
    table: str = "documents",
) -> str:
    from ralf_spark.functions.text import tokens_sql

    return f"""
    WITH per AS (
      SELECT {source_col}, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len({tokens_sql('text')})) AS BIGINT) AS n_tokens
      FROM {table} GROUP BY {source_col}
    ),
    tot AS (
      SELECT sum(n_tokens) AS t, sum(pow(n_tokens, {alpha})) AS ta FROM per
    )
    SELECT {source_col}, n_docs, n_tokens,
           round(n_tokens / CAST(t AS DOUBLE), 6) AS p_raw,
           round(pow(n_tokens, {alpha}) / ta, 6) AS p_sample
    FROM per, tot
    ORDER BY {source_col}
    """


def pack_sequences(
    docs: FeatureTable,
    seq_len: int = 2048,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic training-sequence PACKING map: concatenate each
    source's documents (doc-id order) into one token stream and cut it
    into fixed ``seq_len`` bins; every document is assigned the bin where
    it starts plus its offset inside that bin. The complement of
    chunking — chunking splits long docs, packing locates short docs so
    downstream writers can fill sequences without padding waste.

    Returns (doc_id, source, n_toks, start_offset, bin_id, bin_offset).

    Plan: token counts are scan-side; the running offset is one window
    cumsum partitioned by source — the only shuffle, keyed on the handful
    of sources. At 100 TB the per-source window is the bound: shard the
    stream key to (source, day) or similar so no single partition holds a
    whole source (same contract as any ordered assignment).
    """
    from pyspark.sql import Window

    key = docs.key
    sized = docs.df.select(
        F.col(key),
        F.col(source_col),
        F.size(tokens(F.col(text_col))).alias("n_toks"),
    )
    w = (
        Window.partitionBy(source_col)
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        sized.withColumn(
            "start_offset", F.sum("n_toks").over(w) - F.col("n_toks")
        )
        .withColumn(
            "bin_id", F.floor(F.col("start_offset") / F.lit(seq_len))
        )
        .withColumn("bin_offset", F.col("start_offset") % F.lit(seq_len))
    )


def pack_sequences_oracle_sql(
    seq_len: int = 2048,
    key: str = "doc_id",
    source_col: str = "source",
    table: str = "documents",
) -> str:
    from ralf_spark.functions.text import tokens_sql

    return f"""
    WITH sized AS (
      SELECT {key}, {source_col},
             CAST(len({tokens_sql('text')}) AS INTEGER) AS n_toks
      FROM {table}
    ),
    run AS (
      SELECT {key}, {source_col}, n_toks,
             CAST(sum(n_toks) OVER (
               PARTITION BY {source_col} ORDER BY {key}
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - n_toks AS BIGINT) AS start_offset
      FROM sized
    )
    SELECT {key}, {source_col}, n_toks, start_offset,
           CAST(floor(start_offset / {seq_len}.0) AS BIGINT) AS bin_id,
           CAST(start_offset % {seq_len} AS BIGINT) AS bin_offset
    FROM run ORDER BY {key}
    """
