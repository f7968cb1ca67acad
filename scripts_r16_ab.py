"""r16: interleaved in-session A/B of named registry queries under an
env toggle (this box swings >2x between identical cold runs — r12-r15
adjudications — so medians of INTERLEAVED passes in one session are the
only trustworthy wall signal).

SPARK_GRAFT_AB_QUERIES: comma list of registry names.
SPARK_GRAFT_AB_ENV:     env var to toggle (set to "0" for arm A=off,
                        unset for arm B=on), e.g. SPARK_GRAFT_SMALL_CORPUS.
SPARK_GRAFT_AB_PASSES:  passes per arm (default 5).
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
    passes = int(os.environ.get("SPARK_GRAFT_AB_PASSES", "5"))
    env = os.environ["SPARK_GRAFT_AB_ENV"]
    names = [
        n.strip()
        for n in os.environ["SPARK_GRAFT_AB_QUERIES"].split(",")
        if n.strip()
    ]
    spark = get_spark(
        app_name="ralf_spark_r16_ab",
        extra_confs={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: one pass of every target in arm-on mode
    for n in names:
        df = QUERIES[n].fn(spark, sf_dir)
        drain(df)
        unpersist_cached(df)
    spark.catalog.clearCache()

    walls: dict[tuple[str, str], list[float]] = {}
    for p in range(passes):
        for arm in ("off", "on"):
            if arm == "off":
                os.environ[env] = "0"
            else:
                os.environ.pop(env, None)
            for n in names:
                spark.sparkContext.setJobDescription(f"{n}#{arm}#p{p}")
                t0 = time.perf_counter()
                df = QUERIES[n].fn(spark, sf_dir)
                drain(df)
                walls.setdefault((n, arm), []).append(
                    time.perf_counter() - t0
                )
                unpersist_cached(df)
                spark.catalog.clearCache()
    out = {}
    for n in names:
        a = walls[(n, "off")]
        b = walls[(n, "on")]
        out[n] = {
            "off_median_s": round(statistics.median(a), 3),
            "on_median_s": round(statistics.median(b), 3),
            "off": [round(x, 2) for x in a],
            "on": [round(x, 2) for x in b],
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
