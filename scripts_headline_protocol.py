#!/usr/bin/env python
"""Round-opening headline re-anchor: n=8 INTERLEAVED full passes over the
frozen headline set at sf0.1 (uncontended local[32]), per-query
median/min/max + cold (first-pass) column.

VERDICT r6 #3: two consecutive rounds of single-cold-pass noise (r5 5.62s
vs r6 7.19s on provably unchanged plans) means the trend line is
re-anchored with this protocol at ROUND START, before any perf claims.

Interleaved = pass 0 runs q1..qN in order, pass 1 runs them again, etc.,
so slow machine-minutes spread across all queries instead of biasing one.
Cache is cleared between passes (not between queries inside a pass — the
headline queries share no persisted subtrees; asserted by the r5 audit).

Prints a markdown table (for BENCH_NOTES.md) and one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ralf_spark.queries import headline_queries  # noqa: E402
from ralf_spark.session import get_spark  # noqa: E402

N_PASSES = int(os.environ.get("SPARK_GRAFT_PROTOCOL_PASSES", "8"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ralf_spark_headline_protocol",
                      extra_confs={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    def drain(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    targets = headline_queries()
    samples: dict[str, list[float]] = {n: [] for n in targets}
    for p in range(N_PASSES):
        for name, q in targets.items():
            t0 = time.perf_counter()
            drain(q.fn(spark, sf_dir))
            samples[name].append(round(time.perf_counter() - t0, 4))
        spark.catalog.clearCache()
        print(f"# pass {p}: "
              + " ".join(f"{n}={samples[n][-1]:.2f}" for n in targets),
              file=sys.stderr)

    rows = []
    for name, ts in samples.items():
        warm = ts[1:] if len(ts) > 1 else ts
        rows.append({
            "query": name,
            "cold": ts[0],
            "median": round(statistics.median(warm), 4),
            "min": min(warm),
            "max": max(warm),
        })
    print("| query | cold (pass 0) | warm median | min | max |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['query']} | {r['cold']:.2f} | {r['median']:.2f} "
              f"| {r['min']:.2f} | {r['max']:.2f} |")
    cold_sum = round(sum(r["cold"] for r in rows), 3)
    median_sum = round(sum(r["median"] for r in rows), 3)
    print(f"\ncold-sum {cold_sum}s, warm-median-sum {median_sum}s, "
          f"n={N_PASSES} interleaved passes")
    print(json.dumps({"cold_sum": cold_sum, "median_sum": median_sum,
                      "n_passes": N_PASSES, "rows": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
