"""One-off driver replica: vanilla session, sf0.01, all queries vs oracles.

The per-query ``sec`` fields are measured on a machine that swings >2x
between identical back-to-back runs (r12 adjudication) and each query runs
ONCE — they exist only to spot hangs, and the output stamps
``wall_clocks: untrusted`` so nobody cites them as a perf record (VERDICT
r12 #4). Perf claims live in bench.py's interleaved-pass medians.
"""
import json, time, traceback
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "100g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e
from ralf_spark.oracle import compare_query, duckdb_connection

SF = "/root/testdata/sf0.01"
qs, osql = e.queries(), e.oracle_sql()
con = duckdb_connection(SF)
out = {}
for name, fn in qs.items():
    t0 = time.time()
    try:
        if name in osql:
            r = compare_query(spark, name, fn, osql[name], SF, con)
            out[name] = {"ok": r.ok, "rows": r.spark_rows, "oracle_rows": r.oracle_rows,
                         "cols": r.cols_match, "hash": r.hash_match, "sec": round(time.time()-t0,2)}
        else:
            df = fn(spark, SF)
            n = df.count()
            from ralf_spark.operators.util import unpersist_cached
            unpersist_cached(df)
            out[name] = {"ok": n >= 0, "rows": n, "rows_only": True, "sec": round(time.time()-t0,2)}
    except Exception as ex:
        out[name] = {"ok": False, "error": repr(ex)[:300], "sec": round(time.time()-t0,2)}
        traceback.print_exc()
    print(("PASS " if out[name]["ok"] else "FAIL ") + name, out[name].get("sec"), flush=True)
out["_meta"] = {
    "wall_clocks": "untrusted",
    "note": "sec fields are single-sample on a >2x-drifting box; "
            "hang detection only — perf record is BENCH (medians)",
}
json.dump(out, open("/root/repo/sweep_r16.json","w"), indent=1)
bad = [k for k, v in out.items() if k != "_meta" and not v["ok"]]
print("TOTAL", len(out) - 1, "FAIL", len(bad), bad)
