#!/usr/bin/env python
"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": ...}

Each query is fully executed via a noop-format write: the complete plan —
including final sorts, limits and window payloads that a ``count()`` would
let Catalyst prune — runs on the executors, and nothing is collected to
the driver.

r13 (VERDICT r12 #4, drift-proofing): the headline run now makes N
INTERLEAVED passes over the query set (pass 1 of all queries, then pass 2,
...) and reports the per-query MEDIAN, with every raw sample kept in the
JSON (``samples``). This sandbox swings >2x between identical back-to-back
runs (measured by builder and judge independently in r12); interleaved
medians make a round-over-round comparison reflect the plans, not the
minute the machine was sampled. ``SPARK_GRAFT_BENCH_PASSES`` overrides N
(default 5 for the headline set; 1 for BENCH_ALL/named subsets, whose cost
is already dominated by breadth).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ralf_spark.operators.util import unpersist_cached  # noqa: E402
from ralf_spark.queries import QUERIES, headline_queries  # noqa: E402
from ralf_spark.session import get_spark  # noqa: E402


#: the dedup/fingerprint family whose operators resolve
#: SPARK_GRAFT_HASH_FN — the set the r6 two-mode profile measured
HASH_FAMILY = [
    "near_dup_minhash", "dedup_clusters", "dedup_keep_best",
    "incremental_minhash_index", "simhash_near_dup_pairs",
    "duplicate_ngram_spans", "containment_pairs",
    "near_dup_jaccard_index", "decontaminate_against_eval",
    # r11b: the exact-substring family hashes gram digests per mode too
    "exact_substring_spans", "incremental_gram_index",
    # r12: span-level decontamination + CDC chunk-hash dedup
    "decontaminate_spans_eval", "cdc_chunk_dedup",
]


def _hash_modes_profile(spark, sf_dir: str, sf) -> None:
    """SPARK_GRAFT_BENCH_HASH_MODES=1: run the dedup family in BOTH hash
    modes (md5 oracle default / xxhash64 production) in one invocation —
    n=3 per-query medians, cache cleared between runs — and emit ONE
    JSON line holding both mode tables, so a published number can never
    silently be one-mode (VERDICT r6 #8)."""
    import statistics

    def drain(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    prev = os.environ.get("SPARK_GRAFT_HASH_FN")
    modes: dict[str, dict[str, float]] = {}
    try:
        for mode in ("md5", "xxhash64"):
            os.environ["SPARK_GRAFT_HASH_FN"] = mode
            times: dict[str, float] = {}
            for name in HASH_FAMILY:
                q = QUERIES[name]
                runs = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    drain(q.fn(spark, sf_dir))
                    runs.append(time.perf_counter() - t0)
                    spark.catalog.clearCache()
                times[name] = round(statistics.median(runs), 4)
            modes[mode] = times
    finally:
        if prev is None:
            os.environ.pop("SPARK_GRAFT_HASH_FN", None)
        else:
            os.environ["SPARK_GRAFT_HASH_FN"] = prev
    print(
        json.dumps(
            {
                "metric": "dedup_family_hash_modes_median3",
                "unit": "sec",
                "modes": modes,
                "totals": {
                    m: round(sum(t.values()), 4) for m, t in modes.items()
                },
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    bench_all = os.environ.get("SPARK_GRAFT_BENCH_ALL") == "1"
    spark = get_spark(app_name="ralf_spark_bench",
                      extra_confs={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    if os.environ.get("SPARK_GRAFT_BENCH_HASH_MODES") == "1":
        _hash_modes_profile(spark, sf_dir, sf)
        spark.stop()
        return

    def drain(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # SPARK_GRAFT_BENCH_QUERIES=a,b,c runs a named subset (family
    # profiles, e.g. the dedup family in both hash modes); BENCH_ALL=1
    # runs everything; default: the frozen headline set.
    named = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    if named:
        names = [n.strip() for n in named.split(",") if n.strip()]
        unknown = [n for n in names if n not in QUERIES]
        if unknown:
            raise SystemExit(
                f"SPARK_GRAFT_BENCH_QUERIES: unknown queries {unknown}"
            )
        targets = {n: QUERIES[n] for n in names}
    else:
        targets = QUERIES if bench_all else headline_queries()
    # Warm the JVM/readers once so per-query times measure the queries.
    drain(next(iter(targets.values())).fn(spark, sf_dir))
    if bench_all or named:
        # the warm-up may have persist()ed intermediates whose logical
        # plan matches the first TIMED run of the same query — drop them
        # so its recorded time includes its dominant stages
        spark.catalog.clearCache()

    env_passes = os.environ.get("SPARK_GRAFT_BENCH_PASSES")
    if env_passes:
        passes = max(1, int(env_passes))
    else:
        passes = 1 if (bench_all or named) else 5

    import statistics

    samples: dict[str, list[float]] = {name: [] for name in targets}
    for _ in range(passes):
        for name, q in targets.items():
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            drain(df)
            samples[name].append(round(time.perf_counter() - t0, 4))
            # some queries persist() intermediates (winnow pairs, LSH
            # dedup, curation/semdedup/textrank via attach_cached);
            # release after EVERY drain — including the headline path —
            # so storage blocks don't accumulate across the run and skew
            # later timings (mirrors scripts_sweep.py; ADVICE r7)
            unpersist_cached(df)
            if bench_all or named:
                # ...and in multi-query runs additionally clear the whole
                # cache so a sibling query can't reuse a matching
                # persisted subtree (which would misattribute time)
                spark.catalog.clearCache()
    times = {
        name: round(statistics.median(runs), 4)
        for name, runs in samples.items()
    }
    total = round(sum(times.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": times,
                "passes": passes,
                "samples": samples,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
