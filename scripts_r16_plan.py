"""r16: dump the formatted physical plan of named registry queries to
plans/r16/<name>_<suffix>.txt (SPARK_GRAFT_PLAN_QUERIES comma list,
SPARK_GRAFT_PLAN_SUFFIX before|after). Analysis only — fn() may still
run its construction-time jobs (stats bounds, index builds)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ralf_spark.operators.util import unpersist_cached  # noqa: E402
from ralf_spark.queries import QUERIES  # noqa: E402
from ralf_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    suffix = os.environ.get("SPARK_GRAFT_PLAN_SUFFIX", "before")
    names = [
        n.strip()
        for n in os.environ["SPARK_GRAFT_PLAN_QUERIES"].split(",")
        if n.strip()
    ]
    spark = get_spark(
        app_name="ralf_spark_r16_plan",
        extra_confs={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs("plans/r16", exist_ok=True)
    for n in names:
        df = QUERIES[n].fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
        path = f"plans/r16/{n}_{suffix}.txt"
        with open(path, "w") as fh:
            fh.write(txt)
        unpersist_cached(df)
        spark.catalog.clearCache()
        print(f"wrote {path} ({len(txt.splitlines())} lines)")


if __name__ == "__main__":
    main()
