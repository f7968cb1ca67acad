"""r16: per-job profile of a registry query.

Runs SPARK_GRAFT_JOBDUMP_QUERY once (after a warmup query to absorb the
session cold start) and dumps every Spark job the run launched — job id,
duration, stage count/task count, and the job's description/callsite —
from the driver's AppStatusStore. The retro/lifecycle gates are
job-count-bound, so this is the histogram that tells which jobs to
consolidate (guide §1: measure first).
"""

from __future__ import annotations

import json
import os
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
    name = os.environ["SPARK_GRAFT_JOBDUMP_QUERY"]
    warm = os.environ.get("SPARK_GRAFT_JOBDUMP_WARM", name)
    spark = get_spark(
        app_name="ralf_spark_r16_jobdump",
        extra_confs={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    df = QUERIES[warm].fn(spark, sf_dir)
    drain(df)
    unpersist_cached(df)
    spark.catalog.clearCache()

    store = spark.sparkContext._jsc.sc().statusStore()
    j0 = [j.jobId() for j in _jobs(store)]
    j0max = max(j0) if j0 else -1

    t0 = time.perf_counter()
    df = QUERIES[name].fn(spark, sf_dir)
    drain(df)
    wall = time.perf_counter() - t0
    unpersist_cached(df)
    spark.catalog.clearCache()

    rows = []
    for j in _jobs(store):
        if j.jobId() <= j0max:
            continue
        sub = j.submissionTime()
        comp = j.completionTime()
        dur = None
        if sub.isDefined() and comp.isDefined():
            dur = (comp.get().getTime() - sub.get().getTime()) / 1000.0
        desc = j.description()
        rows.append(
            {
                "job": j.jobId(),
                "sec": dur,
                "stages": j.stageIds().size(),
                "tasks": j.numTasks(),
                "name": j.name()[:100],
                "desc": (desc.get() if desc.isDefined() else "")[:160],
            }
        )
    rows.sort(key=lambda r: r["job"])
    print(json.dumps({"query": name, "wall_s": round(wall, 2),
                      "n_jobs": len(rows)}))
    for r in rows:
        print(json.dumps(r))


def _jobs(store):
    it = store.jobsList(None).iterator()
    out = []
    while it.hasNext():
        out.append(it.next())
    return out


if __name__ == "__main__":
    main()
