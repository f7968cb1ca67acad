"""Empirical scale probe for the quadratic-risk paths (VERDICT r7 ask #1).

SCALE.md argues every candidate-generation path is Σ bucket² / Σ cluster²
— never n² — and the plan tests pin the shuffle/broadcast STRUCTURE, but
structure alone doesn't prove the constant stays bounded as data grows.
This script converts the design claims into measurements: it generates
deterministic fixtures at 1x/4x/16x/48x the bench scale (sf0.1 row
counts), runs the riskiest operators at each point, records wall time +
shuffle read/write bytes (Spark REST API) + output rows, and fits the
observed scaling exponent  alpha = d log(time) / d log(n)  against the
predicted one.

Probed paths and predictions (SCALE.md):

- ``lsh_near_dup``       near_dup_pairs banded-LSH join   -> ~1 (Σ bucket²
  with bucket sizes bounded by dup-cluster size; vocabulary grows with
  the corpus, as in any real crawl)
- ``simhash_pairs``      Hamming-band bucket join         -> ~1
- ``decontaminate``      8-gram join vs FIXED eval set    -> ~1 (eval side
  constant, broadcast)
- ``sliding_explode``    sliding window explode strategy  -> ~1 (each row
  fans out to ceil(window/slide) emitting windows, a constant)
- ``semdedup_k_lin``     SemDeDup with seeds k ∝ n        -> ~1 for the
  pair join (cluster sizes bounded) BUT the brute nearest-seed assignment
  is n·k = O(n²) — the probe exposes whichever dominates
- ``semdedup_k_sqrt``    SemDeDup with seeds k ∝ sqrt(n)  -> ~1.5
  (cluster size grows as sqrt(n), Σ cluster² = n^1.5) — the REGIME the
  SemDeDup paper's small-k configs imply; measured to document why the
  k ∝ n contract in semdedup_prune's docstring is the one that scales

Fixtures mirror the driver fixtures' shape (documents ~55 tokens with a
10% near-dup rate in small clusters, events with per-key history held
constant by scaling users ∝ n, embeddings as a Gaussian mixture whose
true-center count scales with n). Seeded; regenerating is idempotent.

Usage:  python scripts_scaleprobe.py [--mults 1,4,16,48] [--ops a,b,...]
Writes  SCALEPROBE.json (raw) and refreshes the table in SCALEPROBE.md.
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time
import urllib.request

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DATA_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".scaleprobe")
UI_PORT = 4057

# sf0.1 row counts (TESTDATA.md) — multipliers scale from here
BASE_DOCS = 5_000
BASE_EVENTS = 100_000
BASE_USERS = 1_500
BASE_VECS = 2_000
DIM = 16
VOCAB = 50_000  # grows-with-corpus premise: large & fixed ≫ any probe size


# ---------------------------------------------------------------- fixtures
def _docs_path(m: int) -> str:
    return os.path.join(DATA_ROOT, f"x{m}", "documents.parquet")


def gen_documents(m: int) -> str:
    """n = 5000·m docs, ~40-70 tokens from a 50k-word vocab; 10% of docs
    are near-copies (10% token mutation) of an earlier doc, in clusters
    of bounded size — duplicate COUNT scales with the corpus, duplicate
    CLUSTER SIZE does not (the real-crawl premise behind Σ bucket²)."""
    path = _docs_path(m)
    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.RandomState(4242 + m)
    n = BASE_DOCS * m
    texts: list[str] = []
    for i in range(n):
        if i > 0 and rng.rand() < 0.10:
            # near-dup of a recent doc (recent => bounded cluster sizes)
            base = texts[rng.randint(max(0, i - 200), i)].split(" ")
            k = max(1, len(base) // 10)
            idx = rng.choice(len(base), size=k, replace=False)
            for j in idx:
                base[j] = f"w{rng.randint(VOCAB)}"
            texts.append(" ".join(base))
        else:
            ln = rng.randint(40, 71)
            texts.append(" ".join(
                f"w{w}" for w in rng.randint(0, VOCAB, size=ln)
            ))
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(
            [("en", "zh", "fr", "de")[i % 4] for i in range(n)], pa.string()
        ),
        "source": pa.array([f"src{i % 7}" for i in range(n)], pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, path)
    return path


def gen_documents_adversarial(m: int) -> str:
    """Adversarial corpus (r9, VERDICT r8 #1): 5000·m background docs PLUS
    one giant duplicate cluster of 100·m near-copies of a single base doc
    (5% token mutation each). Candidate pairs inside the cluster grow
    ~c²/2 — the shape that breaks every Σ bucket² bound and, pre-r9, drove
    the forced candidate broadcast toward Spark's 8 GB hard cap."""
    path = os.path.join(DATA_ROOT, f"adv{m}", "documents.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.RandomState(1337 + m)
    n_bg = BASE_DOCS * m
    texts: list[str] = []
    for _ in range(n_bg):
        ln = rng.randint(40, 71)
        texts.append(" ".join(
            f"w{w}" for w in rng.randint(0, VOCAB, size=ln)
        ))
    base = [f"w{w}" for w in rng.randint(0, VOCAB, size=60)]
    for _ in range(100 * m):
        doc = list(base)
        for j in rng.choice(60, size=3, replace=False):
            doc[j] = f"w{rng.randint(VOCAB)}"
        texts.append(" ".join(doc))
    n = len(texts)
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    pq.write_table(tbl, path)
    return path


def gen_events(m: int) -> str:
    """n = 100k·m events over 1500·m users — per-key history CONSTANT
    (~67 events/user), the documented scaling direction for the window
    operators (key cardinality grows, per-key depth doesn't)."""
    path = os.path.join(DATA_ROOT, f"x{m}", "events.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.RandomState(777 + m)
    n = BASE_EVENTS * m
    users = BASE_USERS * m
    ts0 = np.datetime64("2024-01-01T00:00:00", "us")
    tbl = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(
            ts0 + np.sort(rng.randint(0, 30 * 86_400_000_000, size=n)
                          ).astype("timedelta64[us]"),
            pa.timestamp("us"),
        ),
        "user_id": pa.array(rng.randint(0, users, size=n), pa.int64()),
        "event_type": pa.array(
            np.array(["click", "view", "purchase", "scroll", "hover"])[
                rng.randint(0, 5, size=n)
            ], pa.string()
        ),
        "value": pa.array(rng.rand(n) * 100.0, pa.float64()),
    })
    pq.write_table(tbl, path)
    return path


def gen_embeddings(m: int) -> str:
    """n = 2000·m vectors, dim 16, Gaussian mixture whose true-center
    count scales with n (cluster STRUCTURE density is scale-invariant,
    like a growing corpus of topics)."""
    path = os.path.join(DATA_ROOT, f"x{m}", "embeddings.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.RandomState(909 + m)
    n = BASE_VECS * m
    k_true = max(8, n // 250)
    centers = rng.randn(k_true, DIM)
    asg = rng.randint(0, k_true, size=n)
    X = centers[asg] + 0.25 * rng.randn(n, DIM)
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([row.tolist() for row in X.round(4)],
                              pa.list_(pa.float32())),
        "label": pa.array(asg.astype("int32"), pa.int32()),
    })
    pq.write_table(tbl, path)
    return path


# ------------------------------------------------------------ measurement
def _rest_shuffle_totals() -> tuple[int, int]:
    """Sum (shuffle_read_bytes, shuffle_write_bytes) over all completed
    stages via the UI REST API — local-mode-friendly executor metrics."""
    try:
        base = f"http://localhost:{UI_PORT}/api/v1/applications"
        apps = json.load(urllib.request.urlopen(base, timeout=10))
        app_id = apps[0]["id"]
        stages = json.load(urllib.request.urlopen(
            f"{base}/{app_id}/stages?status=complete", timeout=10))
        rd = sum(s.get("shuffleReadBytes", 0) for s in stages)
        wr = sum(s.get("shuffleWriteBytes", 0) for s in stages)
        return rd, wr
    except Exception:
        return 0, 0


def _session():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[32]")
        .appName("scaleprobe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "100g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def _drain(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _measure(build, spark) -> dict:
    """warm-up pass (plan compile + JIT), then the timed pass with
    shuffle-byte attribution from the REST stage totals."""
    from ralf_spark.operators.util import unpersist_cached

    df = build(spark)
    _drain(df)
    unpersist_cached(df)
    spark.catalog.clearCache()
    rd0, wr0 = _rest_shuffle_totals()
    t0 = time.perf_counter()
    df = build(spark)
    _drain(df)
    sec = time.perf_counter() - t0
    rows = df.count()  # cheap re-run; excluded from the timing
    unpersist_cached(df)
    spark.catalog.clearCache()
    rd1, wr1 = _rest_shuffle_totals()
    return {
        "sec": round(sec, 3),
        "shuffle_read_mb": round((rd1 - rd0) / 1e6, 2),
        "shuffle_write_mb": round((wr1 - wr0) / 1e6, 2),
        "rows": rows,
    }


# --------------------------------------------------------------- the ops
def op_lsh_near_dup(spark, m: int):
    from ralf_spark.operators.dedup import near_dup_pairs
    from ralf_spark.table import FeatureTable

    docs = spark.read.parquet(_docs_path(m))
    return near_dup_pairs(
        FeatureTable(docs, key="doc_id"), hash_fn="xxhash64"
    )


def op_simhash_pairs(spark, m: int):
    from ralf_spark.operators.dedup import simhash_near_dup_pairs
    from ralf_spark.table import FeatureTable

    docs = spark.read.parquet(_docs_path(m))
    return simhash_near_dup_pairs(
        FeatureTable(docs, key="doc_id"), hash_fn="xxhash64"
    )


def op_simhash_blocks6(spark, m: int):
    """Manku block-combination tables (r8): C(6,3)=20 tables on 24-bit
    keys — the config that removes the n²/2^12 candidate floor the
    default 4x12-bit banding carries."""
    from ralf_spark.operators.dedup import simhash_near_dup_pairs
    from ralf_spark.table import FeatureTable

    docs = spark.read.parquet(_docs_path(m))
    return simhash_near_dup_pairs(
        FeatureTable(docs, key="doc_id"), hash_fn="xxhash64", blocks=6
    )


def op_decontaminate(spark, m: int):
    # the registry query itself (fixed-percent eval split, broadcast
    # gram set) pointed at the probe directory
    from ralf_spark.queries import QUERIES

    return QUERIES["decontaminate_against_eval"].fn(
        spark, os.path.join(DATA_ROOT, f"x{m}")
    )


def op_sliding_explode(spark, m: int):
    from ralf_spark.operators.windows import sliding_count_window
    from ralf_spark.table import FeatureTable

    ev = spark.read.parquet(
        os.path.join(DATA_ROOT, f"x{m}", "events.parquet")
    )
    return sliding_count_window(
        FeatureTable(ev, key="user_id", ts="ts", seq="event_id"),
        window_size=20,
        slide_size=5,
        payload_cols=["value"],
        payload_strategy="explode",
    ).df


def _semdedup(spark, m: int, k: int, **kw):
    from ralf_spark.operators.similarity import semdedup_prune
    from ralf_spark.table import FeatureTable

    emb = spark.read.parquet(
        os.path.join(DATA_ROOT, f"x{m}", "embeddings.parquet")
    )
    # deterministic seeds: the first k corpus vectors (id order)
    seeds = (
        emb.orderBy("vec_id").limit(k)
        .selectExpr("vec_id AS seed_id", "embedding AS seed_vec")
    )
    return semdedup_prune(
        FeatureTable(emb, key="vec_id"), seeds, threshold=0.9, **kw
    )


def op_semdedup_k_lin(spark, m: int):
    return _semdedup(spark, m, k=max(8, BASE_VECS * m // 250))


def op_semdedup_k_sqrt(spark, m: int):
    return _semdedup(spark, m, k=max(8, int(math.sqrt(BASE_VECS * m))))


def op_semdedup_two_level(spark, m: int):
    """k ∝ n with the coarse-probed assignment (r8 fix): ~2n√k cosines
    instead of the brute n·k scan."""
    return _semdedup(
        spark, m, k=max(8, BASE_VECS * m // 250), two_level=True
    )


def op_minhash_index_add(spark, m: int):
    """Incremental dedup: add a FIXED 5k-doc batch to a MinHash index
    whose store grew with m — the per-crawl-batch cost claim. Expected:
    shuffle ∝ batch + slim store buckets (16B rows); the fat signature
    snapshot only ever SCANS (chained-broadcast scoring, r8). The add is
    replayed under a fixed batch_tag, so re-running replaces itself
    (idempotent — the same property the exactly-once tests pin)."""
    from pyspark.sql import functions as F

    from ralf_spark.operators.dedup import MinHashIndex
    from ralf_spark.table import FeatureTable

    idx_path = os.path.join(DATA_ROOT, f"x{m}", "mhidx")
    idx = MinHashIndex(idx_path, hash_fn="xxhash64")
    if not os.path.exists(os.path.join(idx_path, "_meta")):
        store = FeatureTable(
            spark.read.parquet(_docs_path(m)), key="doc_id"
        )
        idx.build(store)
    batch = FeatureTable(
        spark.read.parquet(_docs_path(1))
        .where(F.col("doc_id") < 5000)
        .withColumn("doc_id", F.col("doc_id") + 10_000_000),
        key="doc_id",
    )
    return idx.add(batch, batch_tag="probe")


def _ivf_index_for(spark, m: int):
    """Build-once helper: the persistent IVF index for probe scale m
    (cells ∝ n keeps ~250 vectors/cell) plus its 16-query batch."""
    from pyspark.sql import functions as F

    from ralf_spark.operators.similarity import IvfIndex, kmeans_fit
    from ralf_spark.table import FeatureTable

    idx_path = os.path.join(DATA_ROOT, f"x{m}", "ivfidx")
    idx = IvfIndex(idx_path)
    emb = spark.read.parquet(
        os.path.join(DATA_ROOT, f"x{m}", "embeddings.parquet")
    )
    ft = FeatureTable(emb, key="vec_id")
    if not os.path.exists(os.path.join(idx_path, "centroids")):
        k = max(8, BASE_VECS * m // 250)
        seeds = (
            emb.orderBy("vec_id").limit(k)
            .selectExpr("vec_id AS centroid_id",
                        "embedding AS centroid_vec")
        )
        cen = kmeans_fit(ft, seeds, max_iter=4)
        idx.build(ft, cen)
    q = (
        emb.orderBy("vec_id").limit(16)
        .select(F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec"))
    )
    return idx, q


def op_ivf_index_query(spark, m: int):
    """Serving read at scale: top-k query against a persistent IVF index
    whose corpus AND cell count grow with m. Expected ~flat: the
    probed-cell partition filter prunes the scan to nprobe cells
    regardless of corpus size."""
    idx, q = _ivf_index_for(spark, m)
    return idx.query(q, k=10, nprobe=2)


_TL_IDX_CACHE: dict = {}


def op_ivf_index_query_twolevel(spark, m: int):
    """r9 (VERDICT r8 #2): same serving read as op_ivf_index_query but
    with the TWO-LEVEL driver-side cell selection (coarse_probe=2) — the
    O(q·√k) scale path for the residual O(q·k) coarse scan finding 7
    documented. The IvfIndex instance is cached per scale so the
    TwoLevelCells grouping builds once per index open, as a long-lived
    serving process would hold it."""
    if m not in _TL_IDX_CACHE:
        _TL_IDX_CACHE[m] = _ivf_index_for(spark, m)
    idx, q = _TL_IDX_CACHE[m]
    return idx.query(q, k=10, nprobe=2, coarse_probe=2)


OPS = {
    "lsh_near_dup": (op_lsh_near_dup, "documents", 1.0),
    "simhash_pairs": (op_simhash_pairs, "documents", 2.0),
    "simhash_blocks6": (op_simhash_blocks6, "documents", 1.0),
    "decontaminate": (op_decontaminate, "documents", 1.0),
    "sliding_explode": (op_sliding_explode, "events", 1.0),
    "semdedup_k_lin": (op_semdedup_k_lin, "embeddings", 1.0),
    "semdedup_k_sqrt": (op_semdedup_k_sqrt, "embeddings", 1.5),
    "semdedup_two_level": (op_semdedup_two_level, "embeddings", 1.0),
    "minhash_index_add": (op_minhash_index_add, "documents", 0.0),
    "ivf_index_query": (op_ivf_index_query, "embeddings", 0.0),
    "ivf_index_query_twolevel": (
        op_ivf_index_query_twolevel, "embeddings", 0.0
    ),
}


def _fit_exponent(mults: list[int], vals: list[float]) -> float | None:
    """least-squares slope of log(val) vs log(mult), skipping the 1x
    point (fresh-session constants dominate it)."""
    pts = [(math.log(m), math.log(v))
           for m, v in zip(mults, vals) if m > 1 and v and v > 0]
    if len(pts) < 2:
        return None
    xs, ys = zip(*pts)
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    denom = sum((x - mx) ** 2 for x in xs)
    return round(sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom, 2)


def candidate_volumes(mults: list[int]) -> dict:
    """Σ_buckets C(size, 2) for both SimHash banding configs — the raw
    quantity the collision floor inflates, measured without running the
    join (one groupBy per config)."""
    import itertools

    from pyspark.sql import functions as F

    from ralf_spark.operators.text_analysis import simhash_fingerprints_agg

    spark = _session()
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict[str, int]] = {}
    try:
        for m in mults:
            docs = spark.read.parquet(_docs_path(m))
            ids = docs.select(
                F.col("doc_id").alias("_id"), F.col("text").alias("_text")
            )
            fp = (
                simhash_fingerprints_agg(
                    ids, id_col="_id", text_col="_text",
                    bits=48, shingle_n=3, hash_fn="xxhash64",
                )
                .select("_id", F.col("fp").alias("_fp"))
                .where(F.col("_fp") != 0)
                .persist()
            )
            for blocks in (4, 6):
                base, rem = divmod(48, blocks)
                widths = [base + (1 if i < rem else 0) for i in range(blocks)]
                offsets = [sum(widths[:i]) for i in range(blocks)]
                combos = list(itertools.combinations(range(blocks), blocks - 3))
                entries = []
                for t, c in enumerate(combos):
                    key = F.lit(0).cast("long")
                    shift = 0
                    for i in c:
                        key = key.bitwiseOR(F.shiftleft(
                            F.shiftright("_fp", offsets[i]).bitwiseAND(
                                F.lit((1 << widths[i]) - 1)
                            ), shift))
                        shift += widths[i]
                    entries.append(
                        F.struct(F.lit(t).alias("band"), key.alias("key"))
                    )
                b = fp.select(
                    "_id", F.explode(F.array(*entries)).alias("_b")
                ).select("_id", "_b.band", "_b.key")
                n = b.groupBy("band", "key").agg(
                    F.count("*").alias("sz")
                ).agg(F.sum(F.expr("sz*(sz-1)/2"))).first()[0]
                out.setdefault(f"simhash_blocks{blocks}", {})[str(m)] = int(n)
                print(f"# candidates x{m} blocks={blocks}: {int(n)}",
                      flush=True)
            fp.unpersist()
    finally:
        spark.stop()
    return out


def adversarial_probe(mults: list[int]) -> dict:
    """r9 (VERDICT r8 #1): one giant duplicate cluster — the corpus every
    Σ bucket² argument disclaims — against near_dup_pairs' AUTO spelling.
    The probe tightens BROADCAST_CANDIDATE_LIMIT to 200k pairs so the
    auto→shuffle transition happens inside a tractable fixture (the
    mechanism is identical at the real 5M default; only the fixture size
    needed to cross it changes). Per point it records the bucket-stats
    pair bound, the spelling auto chose, wall + shuffle, and — while the
    bound stays under FORCED_CAP — a forced-broadcast twin run proving
    the two spellings emit the same rows."""
    import ralf_spark.operators.dedup as dd
    from ralf_spark.table import FeatureTable

    PROBE_LIMIT = 200_000
    FORCED_CAP = 2_000_000  # don't force multi-GB broadcasts locally

    spark = _session()
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    orig_limit = dd.BROADCAST_CANDIDATE_LIMIT
    orig_choose = dd._choose_broadcast
    rec: dict = {}

    def spy(choice, bound_fn):
        if choice is not None:
            return bool(choice)
        bound = bound_fn()
        rec["bound"] = bound
        rec["broadcast"] = bound <= dd.BROADCAST_CANDIDATE_LIMIT
        return rec["broadcast"]

    dd.BROADCAST_CANDIDATE_LIMIT = PROBE_LIMIT
    dd._choose_broadcast = spy
    try:
        for m in mults:
            path = gen_documents_adversarial(m)
            print(f"# adversarial fixture adv{m} ready "
                  f"(cluster {100 * m} dups)", flush=True)

            def build_auto(s, _p=path):
                docs = s.read.parquet(_p)
                return dd.near_dup_pairs(
                    FeatureTable(docs, key="doc_id"), hash_fn="xxhash64"
                )

            r = _measure(build_auto, spark)
            r["cluster"] = 100 * m
            r["pair_bound"] = rec.get("bound")
            r["chose_broadcast"] = rec.get("broadcast")
            print(f"# adversarial x{m}: bound {r['pair_bound']} -> "
                  f"{'broadcast' if r['chose_broadcast'] else 'SHUFFLE'}, "
                  f"{r['sec']}s shuffleW {r['shuffle_write_mb']}MB "
                  f"rows {r['rows']}", flush=True)

            if r["pair_bound"] is not None and r["pair_bound"] <= FORCED_CAP:
                def build_forced(s, _p=path):
                    docs = s.read.parquet(_p)
                    return dd.near_dup_pairs(
                        FeatureTable(docs, key="doc_id"),
                        hash_fn="xxhash64", broadcast_candidates=True,
                    )

                rf = _measure(build_forced, spark)
                r["forced"] = {k: rf[k] for k in
                               ("sec", "shuffle_write_mb", "rows")}
                r["rows_match_forced"] = rf["rows"] == r["rows"]
                print(f"#   forced-broadcast twin: {rf['sec']}s "
                      f"shuffleW {rf['shuffle_write_mb']}MB rows "
                      f"{rf['rows']} match={r['rows_match_forced']}",
                      flush=True)
            out[str(m)] = r
    finally:
        dd.BROADCAST_CANDIDATE_LIMIT = orig_limit
        dd._choose_broadcast = orig_choose
        spark.stop()
    return {"probe_limit": PROBE_LIMIT, "runs": out}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", default="1,4,16,48")
    ap.add_argument("--ops", default=",".join(OPS))
    ap.add_argument("--candidates", action="store_true",
                    help="measure SimHash candidate volumes instead")
    ap.add_argument("--adversarial", action="store_true",
                    help="giant-dup-cluster probe of the auto verification "
                         "spelling (near_dup_pairs)")
    args = ap.parse_args()
    mults = [int(x) for x in args.mults.split(",")]
    ops = [o.strip() for o in args.ops.split(",") if o.strip()]
    unknown = [o for o in ops if o not in OPS]
    if unknown:
        raise SystemExit(f"unknown ops {unknown}")

    if args.adversarial:
        adv = adversarial_probe(mults)
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "SCALEPROBE.json")
        data = json.load(open(path)) if os.path.exists(path) else {}
        data["adversarial_lsh"] = adv
        with open(path, "w") as f:
            json.dump(data, f, indent=1)
        print(json.dumps(adv, indent=1))
        return

    for m in mults:
        gen_documents(m)
        gen_events(m)
        gen_embeddings(m)
        print(f"# fixtures x{m} ready", flush=True)

    if args.candidates:
        vols = candidate_volumes(mults)
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "SCALEPROBE.json")
        data = json.load(open(path)) if os.path.exists(path) else {}
        data["simhash_candidate_volumes"] = vols
        with open(path, "w") as f:
            json.dump(data, f, indent=1)
        print(json.dumps(vols, indent=1))
        return

    out: dict[str, dict] = {}
    spark = _session()
    spark.sparkContext.setLogLevel("ERROR")
    try:
        for name in ops:
            fn, _tbl, predicted = OPS[name]
            runs = {}
            for m in mults:
                r = _measure(lambda s, _m=m: fn(s, _m), spark)
                runs[str(m)] = r
                print(f"# {name} x{m}: {r['sec']}s "
                      f"shuffleW {r['shuffle_write_mb']}MB "
                      f"rows {r['rows']}", flush=True)
            secs = [runs[str(m)]["sec"] for m in mults]
            wmbs = [runs[str(m)]["shuffle_write_mb"] for m in mults]
            out[name] = {
                "runs": runs,
                "predicted_exponent": predicted,
                "time_exponent": _fit_exponent(mults, secs),
                "shuffle_exponent": _fit_exponent(mults, wmbs),
            }
    finally:
        spark.stop()

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "SCALEPROBE.json")
    merged = {"mults": mults, "base_rows": {
        "documents": BASE_DOCS, "events": BASE_EVENTS,
        "embeddings": BASE_VECS}, "ops": {}}
    if os.path.exists(path):  # partial runs update, not clobber
        try:
            with open(path) as f:
                merged["ops"] = json.load(f).get("ops", {})
        except Exception:
            pass
    merged["ops"].update(out)
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps({k: {"time_exp": v["time_exponent"],
                          "shuffle_exp": v["shuffle_exponent"],
                          "predicted": v["predicted_exponent"]}
                      for k, v in out.items()}, indent=1))


if __name__ == "__main__":
    main()
