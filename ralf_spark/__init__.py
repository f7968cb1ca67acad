"""ralf_spark — a PySpark-native feature computation engine.

A brand-new engine with the query and data-processing capabilities of
``feature-store/ralf`` (a Ray-actor streaming feature store), re-expressed
idiomatically on Spark DataFrames / Spark SQL / Catalyst / Structured
Streaming. Batch-first: feature tables are DataFrames with a declared key
(and optional event-time / sequence columns); operators compile to native
Spark expressions so Catalyst handles pushdown, pruning, join strategy and
AQE. See SURVEY.md at the repo root for the capability mapping.

Reference parity citations use ``ralf/<path>:<line>`` relative to the
read-only checkout of the reference repo.
"""

from ralf_spark.session import get_spark, stop_spark
from ralf_spark.table import FeatureTable, Schema
from ralf_spark.store import FeatureStore

__all__ = [
    "FeatureStore",
    "FeatureTable",
    "Schema",
    "get_spark",
    "stop_spark",
]

__version__ = "0.1.0"
