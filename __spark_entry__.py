"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query — multi-level Louvain community
  detection over the co-occurrence link graph derived from sf0.001
  testdata (the Vite headline capability re-expressed Spark-first).
- ``queries()``: every implemented operator from SURVEY.md §2 +
  training-data-pipeline ops, as (spark, sf_dir) → DataFrame callables.
- ``oracle_sql()``: DuckDB-equivalent ANSI SQL for every query except the
  two full-convergence Louvain entries (generated from the same constants
  as the Spark side; see vite_spark/queries.py). LPA and fixed-sweep
  Louvain get unrolled-CTE oracles; LSH-ANN and the multimodal stubs get
  exact SQL mirrors. Only ``louvain_assignment``/``louvain_summary``
  (driver-side convergence protocol) stay rows-only; their exact-parity
  gate is tests/test_louvain_spark.py against the NumPy oracle that
  mirrors /root/reference semantics line-by-line, and their per-sweep
  algebra is driver-oracled via ``louvain_sweep2``/``louvain_sweep2_q``.
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
