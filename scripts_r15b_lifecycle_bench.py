"""r15 session-2: lifecycle-family timer with Spark job counts.

Times named registry queries (SPARK_GRAFT_LIFE_QUERIES, comma list) over
N interleaved passes (SPARK_GRAFT_LIFE_PASSES, default 3) and reports per
query the median wall and the number of Spark jobs the pass launched
(statusTracker job-id delta) — the lifecycle queries are DRIVER-side
job-count bound, so jobs-per-run is the stable metric the wall swing
cannot fake.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ralf_spark.operators.util import unpersist_cached  # noqa: E402
from ralf_spark.queries import QUERIES  # noqa: E402
from ralf_spark.session import get_spark  # noqa: E402


def drain(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    passes = int(os.environ.get("SPARK_GRAFT_LIFE_PASSES", "3"))
    names = [
        n.strip()
        for n in os.environ["SPARK_GRAFT_LIFE_QUERIES"].split(",")
        if n.strip()
    ]
    spark = get_spark(
        app_name="ralf_spark_r15_lifecycle",
        extra_confs={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker

    # warm the session on the first target so pass 1 is not the Python
    # worker + codegen cold start
    q0 = QUERIES[names[0]]
    df = q0.fn(spark, sf_dir)
    drain(df)
    unpersist_cached(df)
    spark.catalog.clearCache()

    walls: dict[str, list[float]] = {n: [] for n in names}
    jobs: dict[str, list[int]] = {n: [] for n in names}
    for p in range(passes):
        for n in names:
            spark.sparkContext.setJobDescription(f"{n}#p{p}")
            j0 = len(tracker().getJobIdsForGroup(None))
            t0 = time.perf_counter()
            df = QUERIES[n].fn(spark, sf_dir)
            drain(df)
            walls[n].append(time.perf_counter() - t0)
            jobs[n].append(len(tracker().getJobIdsForGroup(None)) - j0)
            unpersist_cached(df)
            spark.catalog.clearCache()
    out = {
        n: {
            "median_s": round(statistics.median(walls[n]), 3),
            "walls": [round(w, 2) for w in walls[n]],
            "jobs": jobs[n],
        }
        for n in names
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
