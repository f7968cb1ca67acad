"""r16: attribute driver-side eager actions (count/first/collect) of one
registry query to their Python call sites — the retro/lifecycle gates are
job-count-bound and the job names (py4j callsites) are useless for
attribution. Monkeypatches the DataFrame actions to record a stack
fingerprint per call; prints call counts and wall per site."""

from __future__ import annotations

import json
import os
import sys
import time
import traceback
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

try:  # Spark 4: concrete class, not the abstract pyspark.sql.DataFrame
    from pyspark.sql.classic.dataframe import DataFrame  # noqa: E402
except ImportError:  # pragma: no cover - Spark 3.x
    from pyspark.sql import DataFrame  # noqa: E402

from ralf_spark.operators.util import unpersist_cached  # noqa: E402
from ralf_spark.queries import QUERIES  # noqa: E402
from ralf_spark.session import get_spark  # noqa: E402

CALLS: Counter = Counter()
SECS: Counter = Counter()


def _wrap(name):
    orig = getattr(DataFrame, name)

    def wrapper(self, *a, **kw):
        frames = [
            f"{os.path.basename(f.filename)}:{f.lineno}"
            for f in traceback.extract_stack()[:-1]
            if "/ralf_spark/" in f.filename or f.filename.endswith(
                ("queries_curation.py", "queries.py")
            )
        ]
        key = name + " <- " + " <- ".join(frames[-3:])
        t0 = time.perf_counter()
        out = orig(self, *a, **kw)
        CALLS[key] += 1
        SECS[key] += time.perf_counter() - t0
        return out

    setattr(DataFrame, name, wrapper)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    name = os.environ["SPARK_GRAFT_JOBDUMP_QUERY"]
    spark = get_spark(
        app_name="ralf_spark_r16_countdump",
        extra_confs={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    df = QUERIES[name].fn(spark, sf_dir)  # warm
    df.write.format("noop").mode("overwrite").save()
    unpersist_cached(df)
    spark.catalog.clearCache()

    for action in ("count", "first", "collect"):
        _wrap(action)
    t0 = time.perf_counter()
    df = QUERIES[name].fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    unpersist_cached(df)

    print(json.dumps({"query": name, "wall_s": round(wall, 2),
                      "n_eager_actions": sum(CALLS.values())}))
    for key, n in CALLS.most_common():
        print(json.dumps({"site": key, "calls": n,
                          "sec": round(SECS[key], 2)}))


if __name__ == "__main__":
    main()
