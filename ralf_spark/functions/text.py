"""Text column functions: tokenization and shingling, JVM-side.

The reference has no text operators (its payloads are scalar features);
these back the north-star LLM-pipeline surface (SURVEY.md §2.10 E1/E2/E4)
required by BASELINE.json. Everything is a native higher-order expression —
no Python UDF — so tokenize/shingle runs inside whole-stage codegen and
scales linearly over a 100 TB corpus.

Each Spark expression has a matching ``*_sql`` DuckDB spelling used by the
oracle queries; the pair MUST stay in lockstep (the correctness gate hashes
both outputs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: Column) -> Column:
    """Whitespace tokens, empty strings dropped."""
    return F.filter(F.split(col, " "), lambda t: t != "")


def tokens_sql(expr: str) -> str:
    return f"list_filter(string_split({expr}, ' '), t -> t <> '')"


def word_shingles(tok: Column, n: int = 3) -> Column:
    """Overlapping n-word shingles of a token array (empty if < n tokens)."""
    joined = F.transform(
        F.sequence(F.lit(1), F.size(tok) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(tok, i + j) for j in range(n)]
        ),
    )
    return F.when(F.size(tok) >= n, joined).otherwise(
        F.array().cast("array<string>")
    )


def word_shingles_sql(w: str = "w", n: int = 3) -> str:
    """DuckDB spelling over an *already-bound* token-list column ``w``
    (use inside a CTE: ``WITH toks AS (SELECT ..., <tokens_sql> AS w ...)``)."""
    parts = " || ' ' || ".join(f"{w}[i+{j}]" for j in range(n))
    return (
        f"list_transform(generate_series(1, greatest(len({w})-{n - 1}, 0)),"
        f" i -> {parts})"
    )


def distinct_shingles(col: Column, n: int = 3) -> Column:
    """The shingle *set* (order-insensitive identity of a document) used by
    MinHash/Jaccard near-dedup."""
    return F.array_distinct(word_shingles(tokens(col), n))


def hashed_shingles(col: Column, n: int = 3) -> Column:
    """Production fast path: the distinct shingle set as BIGINTs — each
    n-gram hashed directly via multi-arg ``xxhash64`` over its tokens,
    never materialized as a concatenated string.

    Everything downstream (MinHash perms, Jaccard intersect/union) becomes
    fixed-width integer work. Hash collisions merge shingles at ~n²/2⁶⁴
    probability — immaterial for dedup. No DuckDB twin on purpose: this
    mode trades cross-engine replayability for speed (``hash_fn="md5"``
    keeps the oracle-checked string pipeline).
    """
    tok = tokens(col)
    joined = F.transform(
        F.sequence(F.lit(1), F.size(tok) - (n - 1)),
        lambda i: F.xxhash64(*[F.element_at(tok, i + j) for j in range(n)]),
    )
    return F.when(F.size(tok) >= n, F.array_distinct(joined)).otherwise(
        F.array().cast("array<bigint>")
    )


def distinct_shingles_sql(w: str = "w", n: int = 3) -> str:
    return f"list_distinct({word_shingles_sql(w, n)})"
