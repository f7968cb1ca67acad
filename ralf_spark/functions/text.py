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


# ASCII whitespace run: space, tab, LF, CR, VT, FF.  An explicit class —
# not ``\s`` — because Java regex (Spark) includes \x0B in ``\s`` while RE2
# (DuckDB) does not; the explicit class keeps the two engines byte-identical
# on every input.  Unicode spaces (NBSP etc.) are intentionally NOT
# boundaries: they are content characters in both engines.
WHITESPACE_RE = r"[ \t\n\r\x0B\f]+"

#: version tag of the tokenization contract, pinned into every persisted
#: text-derived index's meta sidecar (GramIndex/MinHashIndex): gram and
#: shingle digests change whenever token BOUNDARIES change, so a store
#: built under an older tokenizer silently reports zero duplicates for
#: multi-line text — the pin turns that into a loud rebuild error.
#: Pre-r12 stores (no field in meta) are the single-space tokenizer,
#: recorded as "space-r1".
TOKENIZER_VERSION = "ws-class-r12"


def tokens(col: Column) -> Column:
    """Whitespace tokens, empty strings dropped.

    Splits on RUNS of ASCII whitespace (space/tab/newline/CR/VT/FF), so
    ``"foo\\nbar"`` and ``"foo  bar"`` both yield two tokens — matching
    standard tokenization on real corpora where documents are multi-line.
    The leading/trailing-run empties are dropped by the filter.
    """
    return F.filter(F.split(col, WHITESPACE_RE), lambda t: t != "")


def tokens_sql(expr: str) -> str:
    """DuckDB twin of :func:`tokens` — same explicit whitespace class."""
    return (
        f"list_filter(regexp_split_to_array({expr},"
        f" '[ \\t\\n\\r\\x0B\\f]+'), t -> t <> '')"
    )


def _let_bound(value: Column, body) -> Column:
    """Let-bind ``value`` so ``body`` receives it as a lambda VARIABLE —
    evaluated exactly once per row — instead of an expression tree.

    Higher-order lambdas are interpreted, and every reference to a column
    EXPRESSION inside one re-evaluates that expression per element; a
    per-gram lambda doing n ``element_at(tokens(text), ...)`` lookups
    re-runs the whole split+filter pipeline n × grams times per document
    (measured 25s → 1s on the 8-gram decontamination scan at sf0.1).
    Materializing in a separate projection does NOT protect against this:
    CollapseProject inlines single-reference projections and Generate
    (explode) inputs ignore the multi-reference guard (BENCH_NOTES r3).
    Wrapping the value in a one-element array and transforming over it
    makes the binding part of the expression itself — robust under any
    plan rewrite."""
    return F.element_at(F.transform(F.array(value), body), 1)


def word_shingles(tok: Column, n: int = 3) -> Column:
    """Overlapping n-word shingles of a token array (empty if < n tokens).
    The input array is let-bound (see :func:`_let_bound`) so an arbitrary
    token-pipeline expression is computed once per row, not once per
    ``element_at``."""

    def shingles_of(t: Column) -> Column:
        joined = F.transform(
            F.sequence(F.lit(1), F.size(t) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, i + j) for j in range(n)]
            ),
        )
        return F.when(F.size(t) >= n, joined).otherwise(
            F.array().cast("array<string>")
        )

    return _let_bound(tok, shingles_of)


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
    def hashed_of(t: Column) -> Column:
        joined = F.transform(
            F.sequence(F.lit(1), F.size(t) - (n - 1)),
            lambda i: F.xxhash64(
                *[F.element_at(t, i + j) for j in range(n)]
            ),
        )
        return F.when(F.size(t) >= n, F.array_distinct(joined)).otherwise(
            F.array().cast("array<bigint>")
        )

    return _let_bound(tokens(col), hashed_of)


def distinct_shingles_sql(w: str = "w", n: int = 3) -> str:
    return f"list_distinct({word_shingles_sql(w, n)})"
