"""Per-superstep convergence metrics (north_star requirement).

Each Louvain superstep appends one row: (level, iter, q, delta_q, moved,
active, edges_processed, wall_s, edges_per_sec). Rows live on the driver
and are flushed to a parquet "metrics table" when a checkpoint dir is set —
the Iceberg-style append of the reference design (SURVEY.md §2.1 S18,
reference main.cpp:468-473 per-phase prints).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field


@dataclass
class MetricsCollector:
    rows: list = field(default_factory=list)
    out_dir: str | None = None

    def record(self, **kw) -> dict:
        kw.setdefault("ts", time.time())
        self.rows.append(kw)
        if self.out_dir:
            os.makedirs(self.out_dir, exist_ok=True)
            with open(os.path.join(self.out_dir, "metrics.jsonl"), "a") as f:
                f.write(json.dumps(kw) + "\n")
        return kw

    def totals(self) -> dict:
        sup = [r for r in self.rows if r.get("kind") == "superstep"]
        edges = sum(r.get("edges_processed", 0) for r in sup)
        wall = sum(r.get("wall_s", 0.0) for r in sup)
        return {
            "supersteps": len(sup),
            "edges_processed": edges,
            "wall_s": wall,
            "edges_per_sec": edges / wall if wall > 0 else 0.0,
        }
