"""SCAN structural graph clustering (Xu et al., KDD 2007) over the
co-occurrence link graph.

Structural similarity of an EDGE (u,v) with closed neighborhoods
Γ(x) = N(x) ∪ {x}:

    σ(u,v) = |Γ(u) ∩ Γ(v)| / sqrt(|Γ(u)|·|Γ(v)|)
           = (cn(u,v) + 2) / sqrt((deg(u)+1)·(deg(v)+1))

where cn is the OPEN common-neighbor count — exactly the triangle count
through the edge (u and v themselves add the +2). σ is bit-deterministic
across engines: integer inputs, one exact product, IEEE-correctly-rounded
sqrt and division — no rounding needed anywhere downstream.

Clustering (all thresholds part of the definition, shared with the
oracle):

- v is a CORE iff ≥ ``mu`` of its neighbors w have σ(v,w) ≥ ``eps``
  (self excluded — μ counts ε-similar NEIGHBORS).
- clusters = connected components of the core–core ε-edges (isolated
  cores are singleton clusters); the cluster id is the minimum core id —
  :func:`vite_spark.algos.components.connected_components` semantics, so
  the packed-CSR CC kernel does the propagation.
- a non-core BORDER vertex attaches to the minimum cluster id among its
  ε-similar core neighbors; everything else (outliers/hubs) gets -1.

Scale shape: cn is a wedge join ANCHORED AT THE LOWER-(deg,id) ENDPOINT
of each edge, so the intermediate is Σ_edges min-side degree — the
degree-oriented discipline of algos/triangles.py, not Σ deg². Everything
else is groupBys, one CC run on a strictly smaller graph, and dimension
joins. No driver collect anywhere.

Reference scope: the C++ reference (ECP-ExaGraph/vite) ships no SCAN;
this extends the §2.8 analytics family reusing the CC kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vite_spark.config import EngineConfig
from vite_spark.runtime.metrics import MetricsCollector


def _simple_und(edges: DataFrame) -> DataFrame:
    return (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def scan_similarity(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """(u, v, sigma) per undirected edge, u < v."""
    und = _simple_und(edges).persist()
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("d"))
    # anchor each edge at its lower-(deg, id) endpoint: the wedge probe
    # fans out by the SMALLER degree
    du = deg.select(F.col("id").alias("src"), F.col("d").alias("ds"))
    dv = deg.select(F.col("id").alias("dst"), F.col("d").alias("dd"))
    ranked = und.join(du, "src").join(dv, "dst")
    anchored = ranked.filter(
        (F.col("ds") < F.col("dd"))
        | ((F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst")))
    ).select(F.col("src").alias("u"), F.col("dst").alias("v"),
             F.col("ds").alias("du"), F.col("dd").alias("dv"))
    # cn(u,v) = # w adjacent to both = triangles through the edge
    au = und.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    av = und.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    cn = (
        anchored.select("u", "v")
        .join(au, "u").join(av, ["v", "w"])
        .groupBy("u", "v").agg(F.count(F.lit(1)).alias("cn"))
    )
    sig = (
        anchored.join(cn, ["u", "v"], "left")
        .select(
            "u", "v",
            ((F.coalesce(F.col("cn"), F.lit(0)) + F.lit(2))
             / F.sqrt((F.col("du") + F.lit(1)) * (F.col("dv") + F.lit(1)))
             ).alias("sigma"),
        )
    )
    return sig.select(
        F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"),
        "sigma")


def scan_clusters(
    spark: SparkSession,
    edges: DataFrame,
    eps: float = 0.5,
    mu: int = 3,
    cfg: EngineConfig | None = None,
    metrics: MetricsCollector | None = None,
) -> DataFrame:
    """(id, cluster) for EVERY vertex; cluster = min core id of the
    component (cores and borders) or -1 (outliers/hubs)."""
    from vite_spark.algos.components import connected_components

    sig = scan_similarity(spark, edges).persist()
    sym = sig.select("u", "v", "sigma").union(
        sig.select(F.col("v").alias("u"), F.col("u").alias("v"), "sigma"))
    epsn = sym.filter(F.col("sigma") >= eps).select("u", "v").persist()
    cores = (
        epsn.groupBy(F.col("u").alias("id"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= mu)
        .select("id")
        .persist()
    )
    # core-core ε-edges + core self-rows (isolated cores = singletons);
    # the union is vertex-closed by construction → packed CC kernel runs
    cu = cores.select(F.col("id").alias("u"))
    cv = cores.select(F.col("id").alias("v"))
    cedges = (
        epsn.join(cu, "u").join(cv, "v")
        .select(F.col("u").alias("src"), F.col("v").alias("dst"),
                F.lit(1.0).alias("weight"))
        .union(cores.select(F.col("id").alias("src"),
                            F.col("id").alias("dst"),
                            F.lit(1.0).alias("weight")))
    )
    ccl = connected_components(spark, cedges, cfg=cfg, metrics=metrics)
    ccl = ccl.select("id", F.col("component").alias("cluster"))
    border = (
        epsn.join(ccl.select(F.col("id").alias("v"), "cluster"), "v")
        .join(cores.select(F.col("id").alias("u")), "u", "left_anti")
        .groupBy(F.col("u").alias("id"))
        .agg(F.min("cluster").alias("bcluster"))
    )
    verts = edges.select(F.col("src").alias("id")).union(
        edges.select(F.col("dst").alias("id"))).distinct()
    out = (
        verts.join(ccl, "id", "left")
        .join(border, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("cluster"), F.col("bcluster"),
                       F.lit(-1).cast("long")).alias("cluster"),
        )
    )
    return out
