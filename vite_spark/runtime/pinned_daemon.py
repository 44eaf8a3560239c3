"""Python-worker CPU pinning for honest local-mode scaling measurement.

Problem (BENCH.md, r2 8→32 caveat): `taskset` around the whole driver
process pins the JVM *and* the Arrow python workers to the measured core
set, so at whole-machine widths the driver's scheduler/collect threads
compete inside the cores being measured — unlike a real cluster, where
the driver sits outside the executors. This module restores that split
in local mode: point `spark.python.daemon.module` here and set
`VITE_WORKER_CORES` (e.g. "0-27"), and every forked python worker is
confined to those cores while the JVM stays unpinned (its residual
driver threads then run on the reserved cores, which the workers never
touch).

The daemon process sets its own affinity before `pyspark.daemon.manager`
starts forking; forked workers inherit it (sched_setaffinity semantics).
"""

from __future__ import annotations

import os


def parse_cores(spec: str) -> set[int]:
    """'0-27' / '0,2,4' / '0-3,8-11' → set of cpu indices."""
    out: set[int] = set()
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if "-" in part:
            a, b = part.split("-")
            out.update(range(int(a), int(b) + 1))
        else:
            out.add(int(part))
    return out


def _pin_from_env() -> None:
    spec = os.environ.get("VITE_WORKER_CORES")
    if spec:
        os.sched_setaffinity(0, parse_cores(spec))


_pin_from_env()


if __name__ == "__main__":
    from pyspark.daemon import manager

    manager()
