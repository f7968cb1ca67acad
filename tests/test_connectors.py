"""State-connector CRUD contract, mirroring the reference's connector tests
(``ralf/tests/test_state.py:35-73``: update -> point -> bulk -> overwrite ->
delete -> count), parametrized over all connectors, plus the scale property
that makes ParquetStateConnector the at-scale choice: partition-pruned
point reads."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ralf_spark.connectors import (
    InMemoryKVClient,
    KVStateConnector,
    MemoryConnector,
    ParquetStateConnector,
    RedisKVClient,
    SqliteStateConnector,
)
from ralf_spark.plans.explain import explain_str
from ralf_spark.table import FeatureTable


class _FakeRedisServer:
    """Server double with the redis-py hash API surface RedisKVClient
    drives (redis-typed returns: bytes values, int counts) — validates the
    adapter's call mapping without a server. Swapped for ``fakeredis``
    when that package is installed."""

    def __init__(self):
        self._h: dict[str, dict[str, bytes]] = {}

    def hset(self, name, key, value):
        self._h.setdefault(name, {})[key] = bytes(value)
        return 1

    def hget(self, name, key):
        return self._h.get(name, {}).get(key)

    def hdel(self, name, *keys):
        t = self._h.get(name, {})
        return sum(t.pop(k, None) is not None for k in keys)

    def hvals(self, name):
        return list(self._h.get(name, {}).values())

    def hlen(self, name):
        return len(self._h.get(name, {}))

    def delete(self, *names):
        return sum(self._h.pop(n, None) is not None for n in names)


def _redis_server():
    try:
        import fakeredis

        return fakeredis.FakeRedis()
    except ImportError:
        return _FakeRedisServer()


def _events(spark, rows):
    return FeatureTable(
        spark.createDataFrame(rows, "user_id long, ts long, seq long, value double"),
        key="user_id", ts="ts", seq="seq",
    )


def _make(kind, tmp_path):
    if kind == "memory":
        return MemoryConnector(f"state_{tmp_path.name}", key="user_id")
    if kind == "parquet":
        return ParquetStateConnector(
            str(tmp_path / "state"), key="user_id", num_buckets=8
        )
    if kind == "kv":
        return KVStateConnector(InMemoryKVClient(), "state", key="user_id")
    if kind == "kv-redis":
        return KVStateConnector(
            RedisKVClient(client=_redis_server()), "state", key="user_id"
        )
    return SqliteStateConnector(
        str(tmp_path / "state.db"), "state", key="user_id"
    )


@pytest.mark.slow
@pytest.mark.parametrize("kind", ["memory", "parquet", "sqlite", "kv", "kv-redis"])
def test_connector_crud_contract(spark, tmp_path, kind):
    con = _make(kind, tmp_path)
    t = _events(
        spark,
        [(1, 10, 1, 1.0), (1, 20, 2, 2.0), (2, 10, 3, 7.0), (3, 5, 4, 9.0)],
    )
    # update: saves latest-per-key state
    con.save(t)
    assert con.count(spark) == 3

    # point query
    [row] = con.point_query(spark, 1)
    assert (row.ts, row.value) == (20, 2.0)
    assert con.point_query(spark, 999) == []

    # bulk query
    bulk = {r.user_id: r.value for r in con.bulk_query(spark)}
    assert bulk == {1: 2.0, 2: 7.0, 3: 9.0}

    # overwrite with newer state
    con.save(_events(spark, [(1, 30, 5, 5.0), (2, 30, 6, 6.0), (3, 30, 7, 8.0)]))
    [row] = con.point_query(spark, 1)
    assert (row.ts, row.value) == (30, 5.0)

    # delete
    con.delete(spark, [1, 3])
    assert con.count(spark) == 1
    assert con.point_query(spark, 1) == []
    [row2] = con.point_query(spark, 2)
    assert row2.value == 6.0


def test_parquet_point_query_prunes_partitions(spark, tmp_path):
    con = ParquetStateConnector(
        str(tmp_path / "state"), key="user_id", num_buckets=8
    )
    con.save(
        _events(spark, [(i, 1, i, float(i)) for i in range(100)])
    )
    plan = explain_str(con.pruned_point_plan(spark, 42))
    assert "PartitionFilters: [isnotnull(bucket" in plan.replace("#", " #") or (
        "PartitionFilters" in plan and "bucket" in plan
    )
    # and the read itself is correct
    [row] = con.point_query(spark, 42)
    assert row.value == 42.0


def test_bulk_query_returns_dataframe_by_default(spark):
    t = _events(spark, [(1, 10, 1, 1.0), (1, 20, 2, 2.0)])
    df = t.bulk_query()
    assert hasattr(df, "collect")  # a DataFrame, not a list
    assert t.bulk_query(collect=True)[0].value == 2.0


def test_sqlite_rejects_unsupported_types(spark, tmp_path):
    con = SqliteStateConnector(str(tmp_path / "x.db"), "state", key="k")
    t = FeatureTable(
        spark.createDataFrame([(1, [1.0])], "k long, arr array<double>"),
        key="k",
    )
    with pytest.raises(TypeError):
        con.save(t)


@pytest.mark.slow
def test_sqlite_roundtrips_timestamp_state(spark, tmp_path):
    """The engine's canonical event state carries a TimestampType ts column;
    sqlite stores it as epoch micros and restores the type on load."""
    import datetime as dt

    con = SqliteStateConnector(str(tmp_path / "ts.db"), "state", key="k")
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 5, 1, 12, 0, 0, 123456), 1.0)],
        "k long, ts timestamp, v double",
    )
    con.save(FeatureTable(df, key="k"))
    t = con.load(spark)
    assert dict(t.df.dtypes)["ts"] == "timestamp"
    [row] = t.df.collect()
    assert row.ts == dt.datetime(2024, 5, 1, 12, 0, 0, 123456)


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Co-located join: two tables bucketed on the same key join with no
    Exchange in the plan — the pay-the-shuffle-once storage layout."""
    import pyspark.sql.functions as F

    from ralf_spark.plans.explain import explain_str

    left = FeatureTable(
        spark.range(0, 1000).select(
            F.col("id").alias("user_id"), (F.col("id") * 2.0).alias("a")
        ),
        key="user_id",
    )
    right = FeatureTable(
        spark.range(0, 1000).select(
            F.col("id").alias("user_id"), (F.col("id") * 3.0).alias("b")
        ),
        key="user_id",
    )
    lb = left.materialize_bucketed("bk_left_t", num_buckets=8)
    rb = right.materialize_bucketed("bk_right_t", num_buckets=8)
    try:
        joined = lb.df.hint("merge").join(rb.df, "user_id")
        plan = explain_str(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == 1000
        # contrast: the un-bucketed join of the same data does shuffle
        plain = left.df.hint("merge").join(right.df, "user_id")
        assert "Exchange" in explain_str(plain)
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_left_t")
        spark.sql("DROP TABLE IF EXISTS bk_right_t")


@pytest.mark.slow
def test_kv_roundtrips_timestamp_state(spark):
    import datetime as dt

    con = KVStateConnector(InMemoryKVClient(), "ts_state", key="k")
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 5, 1, 12, 0, 0, 123456), 1.0)],
        "k long, ts timestamp, v double",
    )
    con.save(FeatureTable(df, key="k"))
    t = con.load(spark)
    assert dict(t.df.dtypes)["ts"] == "timestamp"
    [row] = t.df.collect()
    assert row.ts == dt.datetime(2024, 5, 1, 12, 0, 0, 123456)
    [prow] = con.point_query(spark, 1)
    assert prow.ts == dt.datetime(2024, 5, 1, 12, 0, 0, 123456)


def test_kv_upsert_keeps_absent_keys_serving(spark):
    """upsert (the streaming edge) must NOT evict keys missing from the
    batch — unlike save, which is a full refresh."""
    con = KVStateConnector(InMemoryKVClient(), "state", key="user_id")
    con.save(_events(spark, [(1, 10, 1, 1.0), (2, 10, 2, 2.0)]))
    con.upsert(_events(spark, [(1, 20, 3, 9.0)]))
    assert con.count(spark) == 2
    assert con.point_query(spark, 1)[0].value == 9.0
    assert con.point_query(spark, 2)[0].value == 2.0
    con.save(_events(spark, [(1, 30, 4, 5.0)]))  # full refresh evicts 2
    assert con.count(spark) == 1


def test_upsert_into_cleans_staging_dir(spark, tmp_path):
    """ADVICE r2: the .__staging__ directory must not leak disk on every
    upsert, and repeated upserts must merge with existing state."""
    import os

    from ralf_spark.connectors import upsert_into

    path = str(tmp_path / "state")
    upsert_into(path, _events(spark, [(1, 10, 1, 1.0)]))
    upsert_into(path, _events(spark, [(2, 10, 2, 2.0)]))
    assert not os.path.exists(path + ".__staging__")
    got = {r.user_id: r.value for r in spark.read.parquet(path).collect()}
    assert got == {1: 1.0, 2: 2.0}


def test_parquet_delete_cleans_staging_dir(spark, tmp_path):
    import os

    con = ParquetStateConnector(str(tmp_path / "st"), key="user_id", num_buckets=4)
    con.save(_events(spark, [(1, 10, 1, 1.0), (2, 10, 2, 2.0)]))
    con.delete(spark, [1])
    assert not os.path.exists(str(tmp_path / "st") + ".__staging__")
    assert con.count(spark) == 1


# ------------------------------------------------------------ snapshot diff
def test_snapshot_diff_classifies_all_four_statuses(spark):
    from ralf_spark.connectors import snapshot_diff
    import pyspark.sql.functions as F

    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double"
    )
    new = spark.createDataFrame(
        [(2, 20.0), (3, 99.0), (4, 40.0)], "k long, v double"
    )
    rows = {r.k: r for r in snapshot_diff(old, new, "k", ["v"]).collect()}
    assert rows[1].status == "removed" and rows[1].new_v is None
    assert rows[2].status == "unchanged"
    assert rows[3].status == "changed" and (rows[3].old_v, rows[3].new_v) == (30.0, 99.0)
    assert rows[4].status == "added" and rows[4].old_v is None


def test_snapshot_diff_null_value_still_counts_as_present(spark):
    from ralf_spark.connectors import snapshot_diff

    old = spark.createDataFrame([(1, None)], "k long, v double")
    new = spark.createDataFrame([(1, None), (2, None)], "k long, v double")
    rows = {r.k: r.status for r in snapshot_diff(old, new, "k", ["v"]).collect()}
    # key 1 exists in both with NULL value -> unchanged (null-safe compare);
    # key 2's NULL value must not mask its 'added' status
    assert rows == {1: "unchanged", 2: "added"}


def test_redis_client_requires_redis_package_or_injected_client():
    """Without redis-py installed, constructing from host/port must fail
    loudly with the dependency named; an injected client needs nothing."""
    try:
        import redis  # noqa: F401

        has_redis = True
    except ImportError:
        has_redis = False
    if not has_redis:
        with pytest.raises(RuntimeError, match="redis"):
            RedisKVClient(host="localhost")
    c = RedisKVClient(client=_FakeRedisServer())
    c.hset("t", "k", b"v")
    assert c.hget("t", "k") == b"v" and c.hget("t", "missing") is None
    assert c.hvals("t") == [b"v"] and c.hlen("t") == 1
    c.hdel("t", "k")
    assert c.hlen("t") == 0
    c.hset("t", "k2", b"v2")
    c.delete("t")
    assert c.hlen("t") == 0


@pytest.mark.slow
def test_parquet_sidecar_roundtrip_and_tristate(spark, tmp_path):
    """r15 driver-side sidecar IO: the helpers that replaced the
    per-open Spark jobs on config pins / quantizer sidecars must (a)
    round-trip rows bit-exactly, (b) keep the tri-state read semantics
    (missing -> None, empty dir -> [], committed garbage -> raise), and
    (c) stay byte-compatible with Spark's parquet reader/writer in BOTH
    directions — old stores keep opening, new stores stay readable by
    spark.read.parquet."""
    from ralf_spark.connectors import (
        read_parquet_sidecar,
        write_parquet_sidecar,
    )

    p = str(tmp_path / "side")
    # missing path
    assert read_parquet_sidecar(spark, p) is None
    # crashed writer: directory exists, no committed part file
    (tmp_path / "side").mkdir()
    assert read_parquet_sidecar(spark, p) == []
    # round-trip, overwriting the empty dir
    rows = [("md5", 8, None, True, 0.5, [1.0, 2.0])]
    ddl = ("a string, b int, c bigint, d boolean, e double, "
           "f array<double>")
    write_parquet_sidecar(spark, p, rows, ddl)
    got = read_parquet_sidecar(spark, p)
    assert got == [
        {"a": "md5", "b": 8, "c": None, "d": True, "e": 0.5,
         "f": [1.0, 2.0]}
    ]
    # Spark can read what the driver-side writer committed
    svals = spark.read.parquet(p).collect()[0]
    assert (svals.a, svals.b, svals.c, svals.d, svals.e, list(svals.f)) \
        == ("md5", 8, None, True, 0.5, [1.0, 2.0])
    # and the driver-side reader can read what Spark committed
    sp = str(tmp_path / "sparkside")
    spark.createDataFrame([(1, "x")], "k int, v string").coalesce(
        1
    ).write.parquet(sp)
    assert read_parquet_sidecar(spark, sp) == [{"k": 1, "v": "x"}]
    # committed-but-unparseable raises (corruption stays loud)
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "part-00000-garbage.parquet").write_bytes(b"not parquet")
    with pytest.raises(Exception):
        read_parquet_sidecar(spark, str(bad))


def test_store_epoch_roundtrip_and_fence(spark, tmp_path):
    """r16 (ADVICE r15 low): the store-generation fence — exclusive ops
    bump, concurrent adds compare at publish. A bump between the two
    aborts even when every lease involved has expired/been released."""
    from ralf_spark.connectors import (
        ConcurrentWriterError,
        bump_store_epoch,
        check_store_epoch,
        read_store_epoch,
    )

    p = str(tmp_path / "store")
    assert read_store_epoch(spark, p) == 0
    check_store_epoch(spark, p, 0)       # unchanged: publish proceeds
    check_store_epoch(spark, p, None)    # single-writer mode: skipped
    assert bump_store_epoch(spark, p) == 1
    assert read_store_epoch(spark, p) == 1
    with pytest.raises(ConcurrentWriterError):
        check_store_epoch(spark, p, 0)   # rewrite happened: abort
    check_store_epoch(spark, p, 1)
    assert bump_store_epoch(spark, p) == 2


@pytest.mark.slow
def test_exclusive_ops_bump_store_epoch(spark, tmp_path):
    """Rebuilds advance the generation the publish fence compares."""
    from pyspark.sql import functions as F

    from ralf_spark.connectors import read_store_epoch
    from ralf_spark.operators.dedup import GramIndex
    from ralf_spark.table import FeatureTable

    docs = FeatureTable(
        spark.createDataFrame(
            [(i, "alpha beta gamma delta epsilon zeta eta theta iota")
             for i in range(4)],
            "doc_id bigint, text string",
        ),
        key="doc_id",
    )
    p = str(tmp_path / "gi")
    idx = GramIndex(p, min_tokens=8)
    assert read_store_epoch(spark, p) == 0
    idx.build(docs)
    assert read_store_epoch(spark, p) == 1
    idx.build(docs)  # re-build bumps again
    assert read_store_epoch(spark, p) == 2


def test_footer_rows_via_file_scheme_hadoop_path(spark, tmp_path):
    """r16 (VERDICT r15 #5): the parquet footer row count must be
    readable through the Hadoop FS API under an explicit scheme (the
    remote-filesystem code path), not only from a bare local path, and
    both paths must agree."""
    from ralf_spark.operators.dedup import GramIndex

    p = str(tmp_path / "t.parquet")
    spark.range(0, 1234).coalesce(1).write.parquet(p)
    files = [
        f for f in __import__("os").listdir(p) if f.endswith(".parquet")
    ]
    local = f"{p}/{files[0]}"
    # bare local path (fast path)
    assert GramIndex._footer_rows([local], spark) == 1234
    # file:// scheme without spark -> local fast path still works
    assert GramIndex._footer_rows([f"file://{local}"], spark) == 1234
    # force the remote (seek-to-tail Hadoop stream) path directly
    from ralf_spark.operators.dedup import _footer_meta_remote

    assert _footer_meta_remote(spark, f"file://{local}").num_rows == 1234
