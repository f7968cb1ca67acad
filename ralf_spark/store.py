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

from ralf_spark.table import FeatureTable


class FeatureStore:
    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self._tables: dict[str, FeatureTable] = {}

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
