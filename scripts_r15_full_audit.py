"""r15: full-registry plan audit (one-off analysis artifact).

Same metrics as scripts_plan_audit.py but over EVERY registered query,
not just the driver-checked prefix — hunts for anti-patterns (sort-merge
joins, stray Python eval nodes, unexpected exchange counts) outside the
prefix, where PLANS.md has never looked. Writes /tmp/r15_full_audit.json.
Streaming replays (fn() executes a bounded streaming query) are skipped,
as in the committed audit.
"""

from __future__ import annotations

import json
import sys
import time

from ralf_spark.session import get_spark
from scripts_plan_audit import SKIP, audit


def main() -> None:
    sf_dir = "/root/testdata/sf0.01"
    spark = get_spark(app_name="r15_full_audit",
                      extra_confs={"spark.ui.enabled": "false",
                                   "spark.sql.adaptive.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    from ralf_spark.operators.util import unpersist_cached
    from ralf_spark.queries import QUERIES

    out: dict[str, dict] = {}
    for name, q in QUERIES.items():
        if name in SKIP:
            out[name] = {"skipped": "streaming replay"}
            continue
        t0 = time.perf_counter()
        try:
            df = q.fn(spark, sf_dir)
            ex = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore
                df._jdf.queryExecution(), "formatted"
            )
            m = audit(ex)
            m["fn_sec"] = round(time.perf_counter() - t0, 3)
            out[name] = m
            unpersist_cached(df)
        except Exception as e:
            out[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
        spark.catalog.clearCache()
    with open("/tmp/r15_full_audit.json", "w") as f:
        json.dump(out, f, indent=1)
    bad = {
        n: m for n, m in out.items()
        if m.get("smj", 0) > 0 or m.get("python", 0) > 0
        or m.get("error")
    }
    print(json.dumps(bad, indent=1))
    print("audited", len(out), "queries;", len(bad), "flagged")
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
