"""Single-process NumPy oracles reproducing the reference semantics exactly.

These are the correctness authority for the Spark engine: pytest asserts
the distributed DataFrame implementation produces identical labels and
modularity (1e-6) to these on every fixture.
"""

from vite_spark.oracle.louvain_ref import (  # noqa: F401
    LouvainOracleResult,
    louvain_oracle_full,
    louvain_oracle_phase,
    modularity_oracle,
)
