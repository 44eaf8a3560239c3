"""Vite binary CSR format — the reference's native interchange (F3).

Layout (written /root/reference/convert.cpp:252-271, read
distgraph.cpp:149-253, all little-endian):

    [nv: int64][ne: int64][offsets: (nv+1) × int64]
    [edges: ne × {tail: int64, weight: float64}]

ne counts directed (doubled) rows. Two readers:
- ``read_vite_binary``        driver-side numpy (small graphs/fixtures)
- ``read_vite_binary_dist``   distributed: vertex ranges assigned to
  partitions, each task seeks to its offset slice and reads its edge slice
  — the Spark analog of the reference's per-rank MPI-IO collective read
  (vertex-balanced loadDistGraphMPIIO, or edge-balanced bins computed from
  the offset prefix like loadDistGraphMPIIOBalanced/balanceEdges,
  distgraph.cpp:72-116, 256-387).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

EDGE_SCHEMA = StructType(
    [
        StructField("src", LongType(), False),
        StructField("dst", LongType(), False),
        StructField("weight", DoubleType(), False),
    ]
)

_EDGE_DTYPE = np.dtype([("tail", "<i8"), ("weight", "<f8")])


def write_vite_binary(path: str, src, dst, w, nv: int) -> None:
    """COO (symmetrized) → binary CSR file, byte-identical to the
    reference writer: edges sorted by (src, dst) within each CSR row
    (processGraphData, utils.cpp:101-152 sorts by src then dst)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    w = np.asarray(w, dtype=np.float64)
    order = np.lexsort((dst, src))
    src, dst, w = src[order], dst[order], w[order]
    counts = np.bincount(src, minlength=nv)
    offsets = np.zeros(nv + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    ne = len(src)
    with open(path, "wb") as f:
        np.array([nv, ne], dtype="<i8").tofile(f)
        offsets.astype("<i8").tofile(f)
        rec = np.empty(ne, dtype=_EDGE_DTYPE)
        rec["tail"] = dst
        rec["weight"] = w
        rec.tofile(f)


def read_vite_binary_np(path: str):
    """→ (src, dst, w, nv) numpy COO."""
    with open(path, "rb") as f:
        hdr = np.fromfile(f, dtype="<i8", count=2)
        nv, ne = int(hdr[0]), int(hdr[1])
        offsets = np.fromfile(f, dtype="<i8", count=nv + 1)
        rec = np.fromfile(f, dtype=_EDGE_DTYPE, count=ne)
    src = np.repeat(np.arange(nv, dtype=np.int64), np.diff(offsets))
    return src, rec["tail"].astype(np.int64), rec["weight"].astype(np.float64), nv


def read_vite_binary(spark: SparkSession, path: str) -> DataFrame:
    """Driver-side read → edge DataFrame (fixture-scale)."""
    import pandas as pd

    s, d, w, nv = read_vite_binary_np(path)
    return spark.createDataFrame(
        pd.DataFrame({"src": s, "dst": d, "weight": w}), schema=EDGE_SCHEMA
    )


def read_vite_binary_dist(
    spark: SparkSession, path: str, num_parts: int | None = None,
    edge_balanced: bool = False,
) -> DataFrame:
    """Distributed chunked read: partition i owns a contiguous vertex range
    and reads exactly its offsets+edges byte ranges (two seeks per task).

    edge_balanced=True reproduces the reference -b flag (distgraph.cpp:
    72-116): ranges are cut so each holds ≈ ne/p edges, fixing degree skew
    at load time; bins are computed from the (nv+1)-long offset prefix on
    the driver — one sequential scan, same as the reference's root rank.
    """
    with open(path, "rb") as f:
        hdr = np.fromfile(f, dtype="<i8", count=2)
        nv, ne = int(hdr[0]), int(hdr[1])
        if edge_balanced:
            offsets = np.fromfile(f, dtype="<i8", count=nv + 1)

    if num_parts is None:
        num_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    num_parts = max(1, min(num_parts, nv))

    if edge_balanced:
        target = ne / num_parts
        cuts = [0]
        for p in range(1, num_parts):
            cuts.append(int(np.searchsorted(offsets, target * p, side="left")))
        cuts.append(nv)
        ranges = [(cuts[i], cuts[i + 1]) for i in range(num_parts)]
    else:
        ranges = [
            (nv * i // num_parts, nv * (i + 1) // num_parts)
            for i in range(num_parts)
        ]

    rdf = spark.createDataFrame(
        [(i, lo, hi) for i, (lo, hi) in enumerate(ranges)],
        "pid int, lo long, hi long",
    ).repartition(num_parts, "pid")

    def read_range(pdf_iter):
        import pandas as pd

        for pdf in pdf_iter:
            for _, row in pdf.iterrows():
                lo, hi = int(row["lo"]), int(row["hi"])
                if hi <= lo:
                    continue
                with open(path, "rb") as f:
                    f.seek(16 + 8 * lo)
                    offs = np.fromfile(f, dtype="<i8", count=hi - lo + 1)
                    e0, e1 = int(offs[0]), int(offs[-1])
                    f.seek(16 + 8 * (nv + 1) + 16 * e0)
                    rec = np.fromfile(f, dtype=_EDGE_DTYPE, count=e1 - e0)
                src = np.repeat(
                    np.arange(lo, hi, dtype=np.int64), np.diff(offs)
                )
                yield pd.DataFrame(
                    {
                        "src": src,
                        "dst": rec["tail"].astype(np.int64),
                        "weight": rec["weight"].astype(np.float64),
                    }
                )

    return rdf.mapInPandas(read_range, schema=EDGE_SCHEMA)
