"""r16 (VERDICT r15 #7): multi-row-group core-scaling probe.

Every committed sf fixture is a single parquet row group, so every scan
is ONE task locally and the driver's 8-vs-32-core scaling block cannot
distinguish parallel from serial plans. This probe rewrites the sf0.1
fixtures as multi-file tables (16 files for the fact/corpus tables — the
multi-split layout a 100 TB deployment actually has), runs bench.py at 8
and 32 cores against the rewrite, and records per-query core ratios.

Usage: python scripts_r16_mrg_probe.py  (writes SCALEPROBE_r16_mrg.json)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

MRG_DIR = "/tmp/sf01_mrg"
SRC_DIR = "/root/testdata/sf0.1"
SPLITS = {  # big tables get real parallelism; dims stay single-file
    "lineitem": 16, "orders": 16, "events": 16,
    "documents": 16, "embeddings": 16,
    "customer": 4, "part": 4, "supplier": 1,
    "nation": 1, "region": 1,
}


def generate() -> None:
    from ralf_spark.session import get_spark

    spark = get_spark(
        app_name="ralf_spark_r16_mrg_gen",
        extra_confs={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    os.makedirs(MRG_DIR, exist_ok=True)
    for name, n in SPLITS.items():
        df = spark.read.parquet(f"{SRC_DIR}/{name}.parquet")
        (
            df.repartition(n)
            .write.mode("overwrite")
            .parquet(f"{MRG_DIR}/{name}.parquet")
        )
        print(f"wrote {name} x{n}", flush=True)
    spark.stop()


def bench(cpus: int, sf_dir: str = MRG_DIR) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    out = subprocess.run(
        [sys.executable, "bench.py"], env=env, capture_output=True,
        text=True, timeout=900,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


BIG_DIR = "/tmp/sf01_big"
BIG_FACTOR = 16


def generate_big() -> None:
    """Positive control: the mrg rewrite alone leaves every query
    task-overhead-bound at sf0.1 volume (ratios < 1), so ALSO replicate
    the TPC-H fact tables BIG_FACTOR x (timing-only — replicated keys
    are fine for walls, not for oracles) to give scan-bound queries real
    per-core work."""
    import shutil

    from pyspark.sql import functions as F

    from ralf_spark.session import get_spark

    spark = get_spark(
        app_name="ralf_spark_r16_big_gen",
        extra_confs={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    os.makedirs(BIG_DIR, exist_ok=True)
    for name in SPLITS:
        src = f"{SRC_DIR}/{name}.parquet"
        dst = f"{BIG_DIR}/{name}.parquet"
        if name in ("lineitem", "orders"):
            df = spark.read.parquet(src)
            (
                df.withColumn(
                    "_rep",
                    F.explode(
                        F.array(*[F.lit(i) for i in range(BIG_FACTOR)])
                    ),
                )
                .drop("_rep")
                .repartition(16)
                .write.mode("overwrite")
                .parquet(dst)
            )
            print(f"wrote {name} x{BIG_FACTOR} replicated", flush=True)
        else:
            shutil.rmtree(dst, ignore_errors=True)
            if os.path.isdir(f"{MRG_DIR}/{name}.parquet"):
                shutil.copytree(f"{MRG_DIR}/{name}.parquet", dst)
            else:
                shutil.copy(src, dst)
    spark.stop()


def main() -> None:
    if not os.path.exists(f"{MRG_DIR}/lineitem.parquet"):
        generate()
    r32 = bench(32)
    r8 = bench(8)
    ratios = {
        q: round(r8["queries"][q] / r32["queries"][q], 2)
        for q in r32["queries"]
    }
    rec = {
        "what": (
            "8-vs-32-core bench walls on a multi-file rewrite of sf0.1 "
            "(16 files per fact/corpus table); ratio >1 = the query "
            "gains from cores once the input actually splits"
        ),
        "c32": r32["queries"],
        "c8": r8["queries"],
        "ratio_c8_over_c32": ratios,
        "total_c32": r32["value"],
        "total_c8": r8["value"],
    }
    if not os.path.exists(f"{BIG_DIR}/lineitem.parquet"):
        generate_big()
    b32 = bench(32, BIG_DIR)
    b8 = bench(8, BIG_DIR)
    rec["big"] = {
        "what": (
            f"same probe with lineitem/orders replicated {BIG_FACTOR}x "
            "(timing-only): the volume at which scan-bound queries "
            "should show core scaling"
        ),
        "c32": b32["queries"],
        "c8": b8["queries"],
        "ratio_c8_over_c32": {
            q: round(b8["queries"][q] / b32["queries"][q], 2)
            for q in b32["queries"]
        },
    }
    with open("SCALEPROBE_r16_mrg.json", "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
