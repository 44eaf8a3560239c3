"""vite_spark — a PySpark-native link-graph analytics engine.

A from-scratch re-expression of the capabilities of ECP-ExaGraph/vite
(distributed Louvain community detection plus supporting graph kernels) on
the Spark DataFrame/Catalyst substrate, extended with PageRank, connected
components, label propagation, triangle counting, and the text/dedup/ANN
operators a large-scale training-data pipeline needs.

Design: the engine is a driver-orchestrated iterative program over
DataFrames — every Vite MPI superstep maps to a join + aggregation whose
physical plan Catalyst/AQE picks (broadcast vs shuffle, skew splitting).
No per-row Python anywhere; the only Python UDFs are Arrow-vectorized
(`mapInPandas`/`applyInPandas`) CSR kernels on the fast path.
"""

__version__ = "0.1.0"

from vite_spark.config import EngineConfig  # noqa: F401
