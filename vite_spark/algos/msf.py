"""Minimum spanning forest — distributed Borůvka.

The classic O(log n)-round distributed MSF (Borůvka 1926; the GraphX /
Pregel standard): every round each component picks its minimum outgoing
edge under the TOTAL order (weight, src, dst) — the tie-break makes all
edge weights effectively distinct, so the forest is UNIQUE and any
algorithm honoring the order (the DuckDB oracle replays the same rounds)
produces the identical edge set — then the picked edges contract via
connected components over the component graph (two-phase
large-star/small-star: the picked pseudo-forest can be a long chain, so
min-label propagation's O(diameter) is the wrong shape; the two-phase
algorithm closes it in O(log²) rounds).

Scale shape per round: one edges⋈labels join on each endpoint (the edge
table never moves — only the O(|V|)-row label side shuffles), one
per-component min (window partitioned by component — rows per partition =
the component's incident candidate edges, map-side prunable), and a CC
run on a graph with ONE edge per active component (≤ |V| rows, halving
every round). Active components at least halve per round, so ≤ ⌈log₂ V⌉
rounds touch the full edge set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from vite_spark.runtime.metrics import MetricsCollector


def minimum_spanning_forest(
    spark: SparkSession,
    edges: DataFrame,
    max_rounds: int = 40,
    metrics: MetricsCollector | None = None,
) -> DataFrame:
    """(src, dst, weight) — the unique minimum spanning forest of the
    undirected graph under the (weight, src, dst) total order; src < dst
    canonical, one row per forest edge (|V| − #components rows)."""
    from vite_spark.algos.components import connected_components_twophase

    metrics = metrics or MetricsCollector()
    ue = (
        edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            F.col("weight").cast("double").alias("weight"),
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("weight").alias("weight"))
        .persist()
    )
    comp = (
        edges.select(F.col("src").alias("v"))
        .union(edges.select(F.col("dst").alias("v")))
        .distinct()
        .select("v", F.col("v").alias("c"))
        .persist()
    )
    forest: DataFrame | None = None

    for rnd in range(1, max_rounds + 1):
        ca = comp.select(F.col("v").alias("src"), F.col("c").alias("ca"))
        cb = comp.select(F.col("v").alias("dst"), F.col("c").alias("cb"))
        cand = (
            ue.join(ca, "src").join(cb, "dst")
            .filter(F.col("ca") != F.col("cb"))
            .persist()
        )
        n_cand = cand.count()
        if n_cand == 0:
            cand.unpersist()
            break
        both = cand.select(
            F.col("ca").alias("c"), "src", "dst", "weight", "ca", "cb"
        ).unionAll(
            cand.select(
                F.col("cb").alias("c"), "src", "dst", "weight", "ca", "cb")
        )
        w = Window.partitionBy("c").orderBy("weight", "src", "dst")
        picked = (
            both.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("src", "dst", "weight", "ca", "cb")
            .distinct()
            .localCheckpoint(eager=True)  # cut lineage across rounds
        )
        pe = picked.select("src", "dst", "weight")
        forest = pe if forest is None else forest.unionAll(pe)

        # contract: CC over the component graph (one picked edge per
        # active component — ≤ |components| rows)
        pg = picked.select(
            F.col("ca").alias("src"), F.col("cb").alias("dst")
        )
        labels = connected_components_twophase(spark, pg)
        new_comp = (
            comp.join(
                labels.select(F.col("id").alias("c"),
                              F.col("component").alias("nc")),
                "c", "left",
            )
            .select("v", F.coalesce("nc", "c").alias("c"))
            .localCheckpoint(eager=True)
        )
        comp.unpersist()
        comp = new_comp
        cand.unpersist()
        metrics.record(kind="msf_round", iter=rnd, candidates=int(n_cand),
                       mode="boruvka")
    else:
        raise RuntimeError(f"Borůvka did not converge in {max_rounds} rounds")

    ue.unpersist()
    comp.unpersist()
    if forest is None:
        return spark.createDataFrame(
            [], "src long, dst long, weight double")
    # an edge is picked at most once (its endpoints merge the round it is
    # picked), so this distinct is a safety net, not a dedup requirement
    return forest.distinct()
