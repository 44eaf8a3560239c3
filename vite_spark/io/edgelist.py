"""Text graph-format converters — the Spark re-expression of Vite's
``fileConvert`` (/root/reference/convert.cpp dispatch :102-281). Each
loader returns the canonical symmetrized edge DataFrame; weight modes
reproduce utils.hpp:107-113 (ONE / ORG / ABS / RND — RND is uniform
[0.01, 1.0) like genRandom utils.cpp:93-99, but SEEDED, fixing the
reference's nondeterministic seeding).

Everything is spark.read.text/csv + built-in functions: converter
throughput == Spark CSV scan throughput (the sharded formats S12/S13 are
free via glob paths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from vite_spark.graph import symmetrize, canonical_edges
from vite_spark.kernels.ids import dense_ids

ONE_WEIGHT = "one"
ORG_WEIGHT = "org"
ABS_WEIGHT = "abs"
RND_WEIGHT = "rnd"


def _apply_weight(df: DataFrame, mode: str, seed: int = 42) -> DataFrame:
    if mode == ONE_WEIGHT:
        return df.withColumn("weight", F.lit(1.0))
    if mode == ABS_WEIGHT:  # reference default: absolute value
        return df.withColumn("weight", F.abs(F.col("weight")))
    if mode == RND_WEIGHT:  # uniform 0.01..1.0, seeded (reference quirk fixed)
        return df.withColumn("weight", F.rand(seed) * 0.99 + 0.01)
    return df  # ORG


def _split_lines(spark: SparkSession, path: str, comment_prefixes=("#", "%")) -> DataFrame:
    lines = spark.read.text(path).select(F.trim("value").alias("line"))
    cond = F.length("line") > 0
    for p in comment_prefixes:
        cond = cond & ~F.col("line").startswith(p)
    return lines.filter(cond).select(F.split("line", r"\s+").alias("f"))


def load_simple(
    spark: SparkSession,
    path: str,
    one_based: bool = False,
    weight_mode: str = ONE_WEIGHT,
    seed: int = 42,
) -> DataFrame:
    """S4: directed `u v [w]` lines → symmetrized (simple.cpp:61-169)."""
    f = _split_lines(spark, path)
    off = 1 if one_based else 0
    df = f.select(
        (F.col("f").getItem(0).cast("long") - off).alias("src"),
        (F.col("f").getItem(1).cast("long") - off).alias("dst"),
        F.coalesce(F.col("f").getItem(2).cast("double"), F.lit(1.0)).alias("weight"),
    )
    return symmetrize(_apply_weight(df, weight_mode, seed))


def load_simple_undirected(
    spark: SparkSession, path: str, weight_mode: str = ONE_WEIGHT, seed: int = 42
) -> DataFrame:
    """S5: file already lists both directions — no doubling (simple2.cpp)."""
    f = _split_lines(spark, path)
    df = f.select(
        F.col("f").getItem(0).cast("long").alias("src"),
        F.col("f").getItem(1).cast("long").alias("dst"),
        F.coalesce(F.col("f").getItem(2).cast("double"), F.lit(1.0)).alias("weight"),
    )
    return canonical_edges(_apply_weight(df, weight_mode, seed))


def load_simple_strings(
    spark: SparkSession, path: str, threshold: float = 1.0e-2
) -> tuple[DataFrame, DataFrame]:
    """S6 'bio' format: string-keyed `a b w` rows kept when w <= threshold
    (e-value cutoff, simple3.cpp:64-148, convert.cpp:92); string keys
    dictionary-encoded to dense ids. Returns (edges, mapping(name, id))."""
    f = _split_lines(spark, path)
    df = f.select(
        F.col("f").getItem(0).alias("a"),
        F.col("f").getItem(1).alias("b"),
        F.col("f").getItem(2).cast("double").alias("weight"),
    ).filter(F.col("weight") <= threshold)
    names = df.select(F.col("a").alias("name")).union(
        df.select(F.col("b").alias("name"))
    )
    mapping = dense_ids(names, "name", out_col="id")
    e = (
        df.join(mapping.withColumnRenamed("name", "a"), "a")
        .withColumnRenamed("id", "src")
        .join(mapping.select(F.col("name").alias("b"), F.col("id").alias("dst")), "b")
        .select("src", "dst", "weight")
    )
    return symmetrize(e), mapping


def load_snap(
    spark: SparkSession, path: str, weight_mode: str = ONE_WEIGHT, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """S7: SNAP `u v` lines with # comments; arbitrary ids renumbered
    contiguously (snap.cpp:66-197; deterministic order: sorted by id).
    Returns (edges, mapping(orig_id, id))."""
    from vite_spark.graph import renumber_contiguous

    f = _split_lines(spark, path)
    df = f.select(
        F.col("f").getItem(0).cast("long").alias("src"),
        F.col("f").getItem(1).cast("long").alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    e, mapping = renumber_contiguous(df)
    return symmetrize(_apply_weight(e, weight_mode, seed)), mapping


def load_matrix_market(
    spark: SparkSession, path: str, weight_mode: str = ORG_WEIGHT, seed: int = 42
) -> DataFrame:
    """S8: MatrixMarket coordinate format (matrix-market.cpp:65-241).

    Header `%%MatrixMarket matrix coordinate <field> <symmetry>`; first
    non-comment line is `rows cols nnz`; 1-based indices; `symmetric` →
    symmetrize, `general` → treat as directed and symmetrize (the
    reference inserts both directions for general too via reverse map).
    """
    first = spark.read.text(path).limit(1).collect()[0][0]
    sym = "symmetric" in first.lower()
    f = _split_lines(spark, path)
    # drop the dims line: it is the only line with nnz as 3rd field and no
    # weight semantics; identify it as the first remaining row
    from pyspark.sql import Window

    f = f.withColumn("rn", F.monotonically_increasing_id())
    dims_rn = f.agg(F.min("rn")).collect()[0][0]
    data = f.filter(F.col("rn") != dims_rn)
    df = data.select(
        (F.col("f").getItem(0).cast("long") - 1).alias("src"),
        (F.col("f").getItem(1).cast("long") - 1).alias("dst"),
        F.coalesce(F.col("f").getItem(2).cast("double"), F.lit(1.0)).alias("weight"),
    )
    df = _apply_weight(df, weight_mode, seed)
    return symmetrize(df)


def load_metis(
    spark: SparkSession, path: str, weight_mode: str = ONE_WEIGHT, seed: int = 42
) -> DataFrame:
    """S9: METIS adjacency format (metis.cpp:58-169): line i (1-based,
    after the `nv ne [fmt]` header) lists the neighbors of vertex i.
    The file lists each undirected edge twice already."""
    from pyspark.sql.window import Window

    lines = (
        spark.read.text(path)
        .select(F.trim("value").alias("line"))
        .withColumn("rn", F.row_number().over(Window.orderBy(F.monotonically_increasing_id())))
    )
    body = lines.filter((F.col("rn") > 1) & ~F.col("line").startswith("%"))
    df = body.select(
        (F.col("rn") - 2).alias("src"),
        F.explode(
            F.filter(F.split("line", r"\s+"), lambda x: F.length(x) > 0)
        ).alias("tok"),
    ).select(
        "src", (F.col("tok").cast("long") - 1).alias("dst"), F.lit(1.0).alias("weight")
    )
    return canonical_edges(_apply_weight(df, weight_mode, seed))


def load_pajek(
    spark: SparkSession, path: str, weight_mode: str = ONE_WEIGHT, seed: int = 42
) -> DataFrame:
    """S10: Pajek *Vertices/*Edges sections, 1-based (pajek.cpp:66-193)."""
    from pyspark.sql.window import Window

    lines = (
        spark.read.text(path)
        .select(F.trim("value").alias("line"))
        .withColumn("rn", F.row_number().over(Window.orderBy(F.monotonically_increasing_id())))
    )
    edges_start = (
        lines.filter(F.lower("line").startswith("*edges")).agg(F.min("rn")).collect()[0][0]
    )
    body = lines.filter((F.col("rn") > edges_start) & (F.length("line") > 0))
    f = body.select(F.split("line", r"\s+").alias("f"))
    df = f.select(
        (F.col("f").getItem(0).cast("long") - 1).alias("src"),
        (F.col("f").getItem(1).cast("long") - 1).alias("dst"),
        F.coalesce(F.col("f").getItem(2).cast("double"), F.lit(1.0)).alias("weight"),
    )
    return symmetrize(_apply_weight(df, weight_mode, seed))


def load_dimacs(
    spark: SparkSession, path: str, directed: bool = True,
    weight_mode: str = ORG_WEIGHT, seed: int = 42,
) -> DataFrame:
    """S11: DIMACS `a u v w` arc lines, 1-based (dimacs.cpp:63-234)."""
    lines = spark.read.text(path).select(F.trim("value").alias("line"))
    arcs = lines.filter(F.col("line").startswith("a ")).select(
        F.split("line", r"\s+").alias("f")
    )
    df = arcs.select(
        (F.col("f").getItem(1).cast("long") - 1).alias("src"),
        (F.col("f").getItem(2).cast("long") - 1).alias("dst"),
        F.coalesce(F.col("f").getItem(3).cast("double"), F.lit(1.0)).alias("weight"),
    )
    df = _apply_weight(df, weight_mode, seed)
    return symmetrize(df) if directed else canonical_edges(df)


def load_shards(
    spark: SparkSession, glob_path: str, one_based: bool = True,
    weight_mode: str = ONE_WEIGHT, seed: int = 42,
) -> DataFrame:
    """S12/S13: sharded edge-list chunks — a glob path makes the serial
    (shards.cpp) and MPI (parallel-shards.cpp) variants one Spark scan."""
    return load_simple(spark, glob_path, one_based=one_based,
                       weight_mode=weight_mode, seed=seed)
