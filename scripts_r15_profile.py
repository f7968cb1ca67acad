"""r15 optimization-round profiler.

Per headline query (or a named list via SPARK_GRAFT_PROFILE_QUERIES):

- splits wall time into CONSTRUCT (fn() → DataFrame: py4j plan building +
  analysis) and EXECUTE (noop sink drain) phases, N interleaved passes,
  medians reported — same drift discipline as bench.py;
- optionally captures .explain("formatted") to plans/r15/<q>_<tag>.txt
  (SPARK_GRAFT_PROFILE_PLANS=<tag>).

Also runs two floor probes when SPARK_GRAFT_PROFILE_FLOOR=1:
- `noop_1row`: smallest possible job (spark.range(1) → noop) — the fixed
  per-job cost of scheduling + AQE;
- `lineitem_decode`: full single-task decode of the lineitem fixture (all
  columns, no compute) — the serial-scan floor every lineitem query pays.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ralf_spark.operators.util import unpersist_cached  # noqa: E402
from ralf_spark.queries import QUERIES, headline_queries  # noqa: E402
from ralf_spark.session import get_spark  # noqa: E402


def drain(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    passes = int(os.environ.get("SPARK_GRAFT_PROFILE_PASSES", "7"))
    plan_tag = os.environ.get("SPARK_GRAFT_PROFILE_PLANS")
    spark = get_spark(app_name="ralf_spark_r15_profile",
                      extra_confs={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    named = os.environ.get("SPARK_GRAFT_PROFILE_QUERIES")
    if named:
        targets = {n.strip(): QUERIES[n.strip()]
                   for n in named.split(",") if n.strip()}
    else:
        targets = headline_queries()

    # warm-up
    drain(next(iter(targets.values())).fn(spark, sf_dir))
    spark.catalog.clearCache()

    if plan_tag:
        os.makedirs("plans/r15", exist_ok=True)
        for name, q in targets.items():
            try:
                df = q.fn(spark, sf_dir)
                txt = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
            except Exception as e:  # streaming replays execute in fn()
                txt = f"(unavailable: {e})"
            with open(f"plans/r15/{name}_{plan_tag}.txt", "w") as f:
                f.write(txt)
            unpersist_cached(df)
            spark.catalog.clearCache()

    construct: dict[str, list[float]] = {n: [] for n in targets}
    execute: dict[str, list[float]] = {n: [] for n in targets}
    for _ in range(passes):
        for name, q in targets.items():
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            t1 = time.perf_counter()
            drain(df)
            t2 = time.perf_counter()
            construct[name].append(round(t1 - t0, 4))
            execute[name].append(round(t2 - t1, 4))
            unpersist_cached(df)
            spark.catalog.clearCache()

    floor = {}
    if os.environ.get("SPARK_GRAFT_PROFILE_FLOOR") == "1":
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        probes = {
            "noop_1row": lambda: spark.range(1),
            "lineitem_decode": lambda: li,
            "lineitem_6col": lambda: li.select(
                "l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount", "l_tax"),
        }
        for pname, mk in probes.items():
            runs = []
            for _ in range(passes):
                t0 = time.perf_counter()
                drain(mk())
                runs.append(round(time.perf_counter() - t0, 4))
            floor[pname] = {"median": round(statistics.median(runs), 4),
                            "samples": runs}

    out = {
        "queries": {
            n: {
                "construct_med": round(statistics.median(construct[n]), 4),
                "execute_med": round(statistics.median(execute[n]), 4),
                "construct": construct[n],
                "execute": execute[n],
            }
            for n in targets
        },
        "floor": floor,
        "passes": passes,
        "sf_dir": sf_dir,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
