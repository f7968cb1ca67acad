"""Driver-session drift guard.

The external correctness driver builds its OWN SparkSession — it never calls
``ralf_spark.session.get_spark`` — so any query that only works because of a
conf set in ``session.py`` DEFAULT_CONFS is broken for the driver even while
the whole in-repo suite is green (this exact drift cost round 2 twenty
queries: events.parquet is TIMESTAMP(NANOS), readable only with
``spark.sql.legacy.parquet.nanosAsLong``, which had been moved out of
``load_fixture`` into session defaults).

This test reproduces the driver's setup in a subprocess: a vanilla
``SparkSession.builder`` session (no ``get_spark``), run an events query and a
window query from ``__spark_entry__.queries()``, and oracle-compare via
``ralf_spark.oracle.compare_query``. It fails on the round-2 loader and must
stay green forever.
"""

from __future__ import annotations

import pytest

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = r"""
import json, sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

# Vanilla session, exactly like the external driver: NOT get_spark().
spark = (
    SparkSession.builder.master("local[2]")
    .appName("vanilla_driver_repro")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)

import __spark_entry__ as entry
from ralf_spark.oracle import compare_query

qs = entry.queries()
oracles = entry.oracle_sql()
sf_dir = {sf_dir!r}
out = {{}}
# trailing_10min_count + tumbling_window_payload: the round-3 driver
# failures (NTZ epoch extraction; array cells in the hash compare) —
# both only reproduce on a session/fixture combination the conftest
# session doesn't build, which is exactly what this subprocess is for.
for name in [
    "per_key_avg",
    "tumbling_count_window",
    "trailing_10min_count",
    "tumbling_window_payload",
]:
    res = compare_query(spark, name, qs[name], oracles[name], sf_dir)
    out[name] = dict(
        ok=res.ok,
        spark_rows=res.spark_rows,
        oracle_rows=res.oracle_rows,
        cols_match=res.cols_match,
        hash_match=res.hash_match,
        scalar_ok=res.scalar_ok,
    )
spark.stop()
print("RESULT:" + json.dumps(out))
"""


@pytest.mark.slow
def test_events_queries_pass_on_vanilla_session():
    sf_dir = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    script = SCRIPT.format(repo=REPO, sf_dir=sf_dir)
    env = dict(os.environ)
    # Make sure nothing leaks repo session defaults into the subprocess.
    env.pop("SPARK_CONF_DIR", None)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"vanilla-session run failed\nstdout:\n{proc.stdout[-4000:]}\n"
        f"stderr:\n{proc.stderr[-4000:]}"
    )
    line = next(
        l for l in proc.stdout.splitlines() if l.startswith("RESULT:")
    )
    import json

    results = json.loads(line[len("RESULT:"):])
    for name, r in results.items():
        assert r["ok"], f"{name} failed under vanilla session: {r}"
