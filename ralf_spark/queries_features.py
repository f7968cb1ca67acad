"""Registry entries for feature-engineering transforms.

The reference's feature tables carry user-computed scalar features
(``ralf/operator.py`` transform surface); these queries cover the
standard feature-preparation operators a training pipeline applies on
top: per-group normalization, equal-frequency binning, and corpus
scrubbing."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ralf_spark.functions.text import tokens_sql
from ralf_spark.queries import _docs_par, _t, query

#: blocklist for the redaction query (inlined into both engines)
_SCRUB_PATTERN = r"\b(customer|spark)\b"


@query(
    "zscore_per_event_type",
    """
    WITH stats AS (
      SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           round((e.value - s.mu) / s.sigma, 4) AS z
    FROM events e JOIN stats s ON s.event_type = e.event_type
    ORDER BY e.event_id
    """,
)
def zscore_per_event_type_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score normalization — computed as a tiny aggregate
    joined back (broadcast: one row per event type), NOT as a window over
    the group: a window partitioned by a low-cardinality key funnels each
    whole group through one task at scale, while agg + broadcast join
    keeps the normalization embarrassingly parallel."""
    ev = _t(spark, sf_dir, "events").df
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sigma"),
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 4).alias(
                "z"
            ),
        )
        .orderBy("event_id")
    )


@query(
    "value_deciles",
    """
    SELECT event_id, event_type,
           ntile(10) OVER (PARTITION BY event_type
                           ORDER BY value, event_id) AS decile
    FROM events ORDER BY event_id
    """,
)
def value_deciles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency binning (deciles) per event type — the quantile
    bucketing feature transform, deterministic via the event_id
    tie-break. One sort-shuffle on the group key; at scale with few
    groups, pre-aggregate approximate quantile cuts instead (documented
    trade-off — this query is the exact form)."""
    ev = _t(spark, sf_dir, "events").df
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        "event_id", "event_type", F.ntile(10).over(w).alias("decile")
    ).orderBy("event_id")


@query(
    "redact_blocklist",
    f"""
    SELECT doc_id,
           md5(regexp_replace(text, '{_SCRUB_PATTERN}', '<redacted>', 'g'))
             AS clean_md5,
           CAST(len(regexp_extract_all(text, '{_SCRUB_PATTERN}'))
                AS INTEGER) AS n_redacted
    FROM documents ORDER BY doc_id
    """,
)
def redact_blocklist_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus scrubbing: replace blocklisted terms with a redaction
    token and count the hits — the PII/contamination-removal shape of a
    pretraining cleaning pipeline (the digest of the cleaned text is
    compared, keeping the oracle payload small). Scan-side regex only.
    Note DuckDB needs the 'g' flag for replace-all; Spark's
    regexp_replace is replace-all by default."""
    docs = _docs_par(spark, sf_dir)
    return docs.df.select(
        "doc_id",
        F.md5(
            F.regexp_replace(F.col("text"), _SCRUB_PATTERN, "<redacted>")
        ).alias("clean_md5"),
        F.regexp_count(F.col("text"), F.lit(_SCRUB_PATTERN)).alias(
            "n_redacted"
        ),
    ).orderBy("doc_id")


@query(
    "token_entropy",
    f"""
    WITH toks AS (
      SELECT doc_id, {tokens_sql('text')} AS w FROM documents
    )
    SELECT doc_id,
           len(w) AS n_tokens,
           round(-list_sum(list_transform(list_distinct(w),
                 t -> (CAST(len(list_filter(w, x -> x = t)) AS DOUBLE)
                       / len(w))
                      * log2(CAST(len(list_filter(w, x -> x = t)) AS DOUBLE)
                             / len(w)))), 4) AS entropy
    FROM toks ORDER BY doc_id
    """,
)
def token_entropy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram (Shannon) entropy of each document's token distribution —
    the repetitiveness/quality signal (boilerplate and keyword-stuffed
    documents score low; a compression-ratio proxy computable natively).
    Higher-order array expressions only, scan-side; O(distinct·n) per
    document, bounded by document length."""
    from ralf_spark.functions.text import tokens

    docs = _docs_par(spark, sf_dir)
    w = tokens(F.col("text"))
    docs_df = docs.df.withColumn("w", w)
    n = F.size("w")
    p = lambda t: (
        F.size(F.filter(F.col("w"), lambda x: x == t)).cast("double") / n
    )
    ent = -F.aggregate(
        F.transform(F.array_distinct("w"), lambda t: p(t) * F.log2(p(t))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return docs_df.select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(ent, 4).alias("entropy"),
    ).orderBy("doc_id")
