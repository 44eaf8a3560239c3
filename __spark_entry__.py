"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query — multi-level Louvain community
  detection over the co-occurrence link graph derived from sf0.001
  testdata (the Vite headline capability re-expressed Spark-first).
- ``queries()``: every implemented operator from SURVEY.md §2 +
  training-data-pipeline ops, as (spark, sf_dir) → DataFrame callables.
- ``oracle_sql()``: DuckDB-equivalent ANSI SQL for each SQL-expressible
  query (generated from the same constants as the Spark side; see
  vite_spark/queries.py). Iterative driver-loop algorithms
  (Louvain, LPA, LSH-ANN, Arrow-UDF multimodal) are intentionally omitted
  → rows-only driver check; their exact-parity gate is
  tests/test_louvain_spark.py and tests/test_algos.py against NumPy
  oracles that mirror /root/reference semantics line-by-line.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from vite_spark.queries import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: Louvain community assignment on the sf0.001 link graph."""
    from vite_spark.queries import q_louvain_assignment

    return q_louvain_assignment(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_fn, sql) in registry().items() if sql is not None
    }
