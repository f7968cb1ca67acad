"""FeatureStore: session-scoped entry point (ralf's ``Ralf()`` /
``RalfApplication``, ``ralf/core.py:13-104``, ``ralf/v2/api.py:141-184``).

Where the reference registers actor-pool tables and deploys a DAG, here the
store just constructs keyed FeatureTables from sources; the "DAG" is the
DataFrames' logical plan and "deploy" is any action. Tables registered via
``register`` become queryable by name (ralf's ``.as_queryable(name)``,
``ralf/table.py:153-157``).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, Row, SparkSession

from ralf_spark.connectors import StateConnector
from ralf_spark.table import FeatureTable


class FeatureStore:
    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self._tables: dict[str, FeatureTable] = {}
        self._connectors: dict[str, StateConnector] = {}

    # ------------------------------------------------------------- sources
    def read_parquet(
        self,
        path: str,
        key: str | None = None,
        ts: str | None = None,
        seq: str | None = None,
    ) -> FeatureTable:
        return FeatureTable(self.spark.read.parquet(path), key=key, ts=ts, seq=seq)

    def read_csv(
        self,
        path: str,
        key: str | None = None,
        ts: str | None = None,
        seq: str | None = None,
        **options: Any,
    ) -> FeatureTable:
        options.setdefault("header", True)
        options.setdefault("inferSchema", True)
        df = self.spark.read.options(**options).csv(path)
        return FeatureTable(df, key=key, ts=ts, seq=seq)

    def read_jsonl(
        self,
        path: str,
        schema: str | None = None,
        key: str | None = None,
        ts: str | None = None,
        seq: str | None = None,
        **options: Any,
    ) -> FeatureTable:
        """JSON-lines source (one JSON object per line — the other
        ubiquitous raw-event interchange format besides CSV).

        Pass ``schema`` (DDL string) in production: schema inference
        costs a full extra pass over the data, and a 100 TB scan should
        never pay it. Corrupt lines land in ``_corrupt_record`` under the
        default PERMISSIVE mode instead of failing the job."""
        reader = self.spark.read.options(**options)
        if schema is not None:
            reader = reader.schema(schema)
        return FeatureTable(reader.json(path), key=key, ts=ts, seq=seq)

    def from_dataframe(
        self,
        df: DataFrame,
        key: str | None = None,
        ts: str | None = None,
        seq: str | None = None,
    ) -> FeatureTable:
        return FeatureTable(df, key=key, ts=ts, seq=seq)

    def sql(self, query: str, **meta: str) -> FeatureTable:
        return FeatureTable(self.spark.sql(query), **meta)

    # ------------------------------------------------------------ registry
    def register(self, name: str, table: FeatureTable) -> FeatureTable:
        """Make ``table`` queryable by name (ralf ``.as_queryable``)."""
        self._tables[name] = table
        table.df.createOrReplaceTempView(name)
        return table

    def table(self, name: str) -> FeatureTable:
        return self._tables[name]

    def point_query(self, name: str, key_value: Any) -> list[Row]:
        """Engine equivalent of ``RalfClient.point_query`` (``ralf/client.py:
        8-11``): latest state for one key of a registered table."""
        return self._tables[name].point_query(key_value)

    def bulk_query(
        self, name: str, collect: bool = False
    ) -> DataFrame | list[Row]:
        """Full state view of a registered table; ``collect=True`` for the
        driver-side row list (RalfClient.bulk_query shape)."""
        return self._tables[name].bulk_query(collect=collect)

    # ------------------------------------------------------- deploy / run
    def deploy(
        self,
        name: str,
        table: FeatureTable,
        connector: StateConnector | None = None,
    ) -> FeatureTable:
        """Register ``table`` and (optionally) attach the state connector
        its latest-per-key state materializes into — the reference's
        ``Ralf.deploy(table, name)`` (``ralf/core.py:94-96``) plus the
        per-table connector its operators carry
        (``ralf/v2/api.py:100-135``)."""
        self.register(name, table)
        if connector is not None:
            self._connectors[name] = connector
        return table

    def materialize(self, name: str) -> None:
        """Persist one deployed table's state through its connector."""
        self._connectors[name].save(self._tables[name])

    def run(self) -> None:
        """Materialize every deployed table with a connector — the batch
        analog of the reference's graph deploy + source pump
        (``ralf/core.py:85-92``: v1 ``run`` broadcasts ``_next`` to
        sources; ``ralf/v2/api.py:177-180``: v2 walks the frame graph and
        deploys it). In Spark the DAG is each DataFrame's lineage, so
        "running the graph" is just an action per deployed sink; order
        between tables is irrelevant for correctness — each save computes
        its own full lineage, and shared upstream scans are amortized by
        persisting the shared frame (caller's choice, same trade-off the
        dedup operators document)."""
        for name in self._connectors:
            self.materialize(name)

    def load_state(self, name: str) -> FeatureTable:
        """Read a deployed table's materialized state back from its
        connector (the serving-side view, without recomputing lineage)."""
        return self._connectors[name].load(self.spark)
