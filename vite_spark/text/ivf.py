"""IVF (inverted-file) approximate nearest neighbor — the second ANN scale
path next to LSH (text/ann.py).

Coarse quantizer = spherical k-means over the embedding column, trained
with plain DataFrame ops (no per-row Python): assignment is an argmax over
a broadcast centroid list built as ONE array-of-structs expression
(JVM-side, whole-stage codegen), the update step is a positional explode +
per-dimension average. Everything is DETERMINISTIC and engine-portable —
init = the k lowest vec_ids, cosines and centroids rounded to 6dp, ties
broken by cell id — so the whole pipeline (train → assign → probe → top-k)
is value-checked against a DuckDB oracle by the driver.

Scale shape: centroids are k rows (collected + broadcast — k is user-chosen
and small relative to n, the standard IVF contract); vectors shuffle once
per Lloyd iteration for the update aggregation and once for the cell
assignment; search probes nprobe cells per query so the candidate join is
O(n · nprobe / k) per query instead of O(n²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from vite_spark.text.ann import _as_double, _dot, _norm

IVF_ROUND = 6


def _cos(v, nv, cent: list, cnorm: float):
    if cnorm == 0.0:
        # zero-norm centroid (degenerate cell whose members average to the
        # zero vector): keep the cell with a DEFINED cosine of 0 — the SQL
        # oracle mirrors the same CASE, so both engines quantize over the
        # identical cell set (r2 ADVICE; dropping the cell Spark-side only
        # changed membership and probe sets vs the oracle)
        return F.lit(0.0)
    c = F.array(*[F.lit(float(x)) for x in cent])
    return F.round(_dot(v, c) / (nv * F.lit(cnorm)), IVF_ROUND)


def _best_cells(v, nv, centroids: list, n: int = 1):
    """array of the n best (cos desc, cell asc) cell ids for vector col v —
    one JVM expression: array of structs → sort → slice."""
    entries = F.array(*[
        F.struct(
            _cos(v, nv, cent, cn).alias("cos"),
            F.lit(int(cell)).alias("cell"),
        )
        for cell, cent, cn in centroids
    ])
    # descending cos, ascending cell: sort by struct(-cos, cell)
    ordered = F.array_sort(
        F.transform(
            entries,
            lambda s: F.struct((-s["cos"]).alias("k1"), s["cell"].alias("cell")),
        )
    )
    return F.slice(F.transform(ordered, lambda s: s["cell"]), 1, n)


def _collect_centroids(cdf: DataFrame) -> list:
    import math

    rows = cdf.collect()
    out = []
    for r in sorted(rows, key=lambda r: r["cell"]):
        cent = list(r["centroid"])
        cn = math.sqrt(sum(x * x for x in cent))
        # zero-norm cells are KEPT (cosine defined as 0 in _cos) so the
        # engine and the DuckDB oracle share one cell universe
        out.append((int(r["cell"]), cent, cn))
    return out


def ivf_train(
    emb: DataFrame, n_cells: int = 16, iters: int = 2, vec_col: str = "embedding"
) -> DataFrame:
    """(cell, centroid) after ``iters`` Lloyd iterations from the
    deterministic init (the n_cells lowest vec_ids). Centroid components
    are rounded to 6dp each iteration so cross-engine float-sum order
    cannot drift the quantizer."""
    e = emb.select("vec_id", _as_double(F.col(vec_col)).alias("v")).persist()
    nv = _norm(F.col("v"))
    # init = the n_cells lowest vec_ids via orderBy().limit() — a
    # distributed TakeOrdered, NOT a global window; k rows land on the
    # driver, which is the IVF contract (centroids are broadcast anyway)
    init_rows = e.orderBy("vec_id").limit(n_cells).collect()
    cdf = emb.sparkSession.createDataFrame(
        [
            (i, [round(float(x), IVF_ROUND) for x in r["v"]])
            for i, r in enumerate(init_rows)
        ],
        "cell long, centroid array<double>",
    )
    for _ in range(iters):
        cents = _collect_centroids(cdf)
        assigned = e.select(
            "v", _best_cells(F.col("v"), nv, cents, 1)[0].alias("cell")
        )
        cdf = (
            assigned.select("cell", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.round(F.avg("x"), IVF_ROUND).alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "cell", F.transform("pm", lambda s: s["m"]).alias("centroid")
            )
        )
    e.unpersist()
    return cdf


def ivf_assign(emb: DataFrame, centroids: list, vec_col: str = "embedding") -> DataFrame:
    """(vec_id, v, nrm, cell) — each vector in its single nearest cell."""
    e = emb.select("vec_id", _as_double(F.col(vec_col)).alias("v"))
    nv = _norm(F.col("v"))
    return e.select(
        "vec_id", "v", nv.alias("nrm"),
        _best_cells(F.col("v"), nv, centroids, 1)[0].alias("cell"),
    )


def ivf_topk(
    emb: DataFrame, k: int = 5, n_cells: int = 16, nprobe: int = 2,
    iters: int = 2, vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine within the query's nprobe nearest
    cells only. Same output contract as ann.cosine_topk / ann.lsh_topk."""
    cents = _collect_centroids(ivf_train(emb, n_cells, iters, vec_col))
    base = ivf_assign(emb, cents, vec_col).persist()
    nvq = F.col("na")
    a = base.select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    ).select(
        "query_id", "va", "na",
        F.explode(_best_cells(F.col("va"), nvq, cents, nprobe)).alias("cell"),
    )
    b = base.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("vb"),
        F.col("nrm").alias("nb"), "cell",
    )
    pairs = a.join(b, "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id", "neighbor_id", "cell",
        F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
                IVF_ROUND).alias("cos_sim"),
    )
    # per-(query, probed-cell) prune before the global per-query window —
    # same bounded-shuffle discipline as lsh_topk
    wc = Window.partitionBy("query_id", "cell").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    # (no dedup needed: each neighbor lives in exactly one cell, so a
    # (query, neighbor) pair appears via at most one probed cell)
    pruned = (
        pairs.withColumn("rc", F.row_number().over(wc))
        .filter(F.col("rc") <= k)
        .drop("rc", "cell")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    out = (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"),
                "cos_sim")
    )
    return out


def kmeans_clusters(
    emb: DataFrame, n_cells: int = 16, iters: int = 2, vec_col: str = "embedding"
) -> DataFrame:
    """(vec_id, cell, cos_sim, cell_size) — the coarse quantizer exposed as
    a clustering operator in its own right (embedding-space corpus
    clustering: topic buckets, stratified sampling, per-cluster quotas).

    cos_sim = cosine of the vector to its assigned centroid (rounded 6dp,
    the same deterministic quantizer contract as ivf_topk, so the whole
    train→assign pipeline is driver-oracle-checked). Scale shape: the k
    centroids are broadcast; assignment is one codegen'd argmax expression
    per vector; cell sizes are one k-row aggregate."""
    cents = _collect_centroids(ivf_train(emb, n_cells, iters, vec_col))
    base = ivf_assign(emb, cents, vec_col)
    cos_expr = F.lit(None).cast("double")
    for cell, cent, cn in cents:
        cos_expr = F.when(
            F.col("cell") == int(cell), _cos(F.col("v"), F.col("nrm"), cent, cn)
        ).otherwise(cos_expr)
    sizes = base.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("cell_size")
    )
    return (
        base.select("vec_id", "cell", cos_expr.alias("cos_sim"))
        .join(sizes, "cell")
        .select(
            "vec_id", F.col("cell").cast("long").alias("cell"),
            "cos_sim", "cell_size",
        )
    )
