"""Canonical edge table: the engine's native graph representation.

Schema: ``edges(src: long, dst: long, weight: double)`` — symmetrized
undirected (every undirected edge {u,v} appears as both u→v and v→u;
self-loops appear once), matching the reference CSR convention
(/root/reference/converters/simple.cpp:152-155, README:177-191).
Consequently ``sum(weighted degree) == 2m`` and the modularity constant is
``1/(2m)`` (/root/reference/louvain.cpp:2188-2218).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

EDGE_SCHEMA = StructType(
    [
        StructField("src", LongType(), False),
        StructField("dst", LongType(), False),
        StructField("weight", DoubleType(), False),
    ]
)


def canonical_edges(df: DataFrame) -> DataFrame:
    """Cast/select an arbitrary (src, dst, weight?) DataFrame to EDGE_SCHEMA."""
    cols = [
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    ]
    if "weight" in df.columns:
        cols.append(F.col("weight").cast("double").alias("weight"))
    else:
        cols.append(F.lit(1.0).alias("weight"))
    return df.select(*cols)


def symmetrize(directed: DataFrame, combine_duplicates: bool = True) -> DataFrame:
    """Directed edge list → canonical symmetrized table.

    Emits both directions for every u≠v edge (reference
    converters/simple.cpp:152-155); self-loops are kept single. Duplicate
    (src, dst) pairs have their weights summed so the canonical table has
    at most one row per ordered pair (F2 invariant).
    """
    e = canonical_edges(directed)
    both = e.unionByName(
        e.filter(F.col("src") != F.col("dst")).select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
    )
    if combine_duplicates:
        both = both.groupBy("src", "dst").agg(F.sum("weight").alias("weight"))
    return both


def weighted_degrees(edges: DataFrame) -> DataFrame:
    """Per-vertex weighted degree: ``vDegree[i] = Σ w(e), e ∈ adj(i)``.

    Self-loop weight counted once, exactly as the reference sums the CSR
    row (/root/reference/louvain.cpp:2161-2186). Returns (id, vdeg).
    """
    return edges.groupBy(F.col("src").alias("id")).agg(F.sum("weight").alias("vdeg"))


def self_loop_weights(edges: DataFrame) -> DataFrame:
    """Per-vertex self-loop weight (louvain.cpp:2438-2439). (id, self_w)."""
    return (
        edges.filter(F.col("src") == F.col("dst"))
        .groupBy(F.col("src").alias("id"))
        .agg(F.sum("weight").alias("self_w"))
    )


def graph_stats(edges: DataFrame) -> dict:
    """nv (vertices appearing in edges), ne (directed rows), total weight 2m."""
    row = edges.agg(
        F.countDistinct("src").alias("nv"),
        F.count(F.lit(1)).alias("ne"),
        F.sum("weight").alias("two_m"),
        F.max("src").alias("max_id"),
    ).collect()[0]
    return {
        "nv": row["nv"],
        "ne": row["ne"],
        "two_m": float(row["two_m"]) if row["two_m"] is not None else 0.0,
        "max_id": row["max_id"],
    }


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity coefficient (Newman, PRL 89 208701, 2002) of
    the simple undirected graph: the Pearson correlation of the degree
    pairs (d(src), d(dst)) over the directed non-loop edge rows. Returns
    a single-row DataFrame (assortativity double, rounded 6dp).

    Degrees are distinct-neighbor counts (weights ignored), so every
    accumulated term is a small int64 — the five sufficient statistics
    (M, Σjk, Σj, Σk, Σj², Σk²) are EXACT in any accumulation order, and
    the final double formula is evaluated once on identical integers in
    every engine. One distinct + two broadcast-ready joins + one agg: a
    map-side-combinable shuffle per step, nothing O(nv) on the driver."""
    und = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("d"))
    jk = (
        und.join(deg.select(F.col("id").alias("src"),
                            F.col("d").alias("dj")), "src")
        .join(deg.select(F.col("id").alias("dst"),
                         F.col("d").alias("dk")), "dst")
    )
    s = jk.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum(F.col("dj") * F.col("dk")).alias("sjk"),
        F.sum("dj").alias("sj"),
        F.sum("dk").alias("sk"),
        F.sum(F.col("dj") * F.col("dj")).alias("sjj"),
        F.sum(F.col("dk") * F.col("dk")).alias("skk"),
    )
    # formula in DOUBLE on the exact integer statistics: products of the
    # int64 sums would overflow long on big graphs, and both engines
    # evaluate the identical IEEE expression on identical inputs
    md, jkd = F.col("m").cast("double"), F.col("sjk").cast("double")
    jd, kd = F.col("sj").cast("double"), F.col("sk").cast("double")
    jjd, kkd = F.col("sjj").cast("double"), F.col("skk").cast("double")
    num = md * jkd - jd * kd
    den = F.sqrt((md * jjd - jd * jd) * (md * kkd - kd * kd))
    return s.select(F.round(num / den, 6).alias("assortativity"))


def check_symmetry(edges: DataFrame) -> int:
    """Count of (src,dst,weight) rows without a matching mirror. 0 == valid."""
    e = edges.select("src", "dst", "weight")
    m = e.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("weight").alias("w2")
    )
    return (
        e.join(m, ["src", "dst"], "left")
        .filter(F.col("w2").isNull() | (F.abs(F.col("weight") - F.col("w2")) > 1e-12))
        .count()
    )


def renumber_contiguous(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Map arbitrary vertex ids to dense 0-based ids (SNAP-converter
    semantics, /root/reference/converters/snap.cpp:66-197, but with a
    deterministic order: ids sorted ascending).

    Returns (edges', mapping(orig_id, id)).
    """
    ids = (
        edges.select(F.col("src").alias("orig_id"))
        .union(edges.select(F.col("dst").alias("orig_id")))
        .distinct()
    )
    from vite_spark.kernels.ids import dense_ids

    # dense rank by id via the range-partitioned kernel (no global
    # single-partition window — scales to 10^12 distinct ids)
    mapping = dense_ids(ids, "orig_id", "id")
    e = (
        edges.join(mapping.withColumnRenamed("orig_id", "src"), "src")
        .drop("src")
        .withColumnRenamed("id", "src")
        .join(
            mapping.select(F.col("orig_id").alias("dst"), F.col("id").alias("new_dst")),
            "dst",
        )
        .drop("dst")
        .withColumnRenamed("new_dst", "dst")
        .select("src", "dst", "weight")
    )
    return e, mapping


@dataclass
class GraphFrame:
    """A loaded graph: persisted canonical edges + cached scalars."""

    edges: DataFrame
    nv: int            # total vertices (>= max id + 1; includes isolated)
    two_m: float       # total weighted degree = 2m
    ne: int            # directed edge rows

    @classmethod
    def from_edges(cls, edges: DataFrame, nv: int | None = None) -> "GraphFrame":
        e = canonical_edges(edges)
        s = graph_stats(e)
        n = nv if nv is not None else (int(s["max_id"]) + 1 if s["max_id"] is not None else 0)
        return cls(edges=e, nv=n, two_m=s["two_m"], ne=s["ne"])

    @property
    def constant(self) -> float:
        """1/(2m) — reference distCalcConstantForSecondTerm (louvain.cpp:2188)."""
        return 1.0 / self.two_m


def edges_from_pairs(
    spark: SparkSession, pairs: list[tuple], symmetrized: bool = False
) -> DataFrame:
    """Build a canonical edge table from python tuples (u, v[, w]).

    ``symmetrized=False`` means pairs list each undirected edge once.
    """
    rows = [(int(p[0]), int(p[1]), float(p[2]) if len(p) > 2 else 1.0) for p in pairs]
    df = spark.createDataFrame(rows, schema=EDGE_SCHEMA)
    return df if symmetrized else symmetrize(df)


def degree_histogram(edges: DataFrame) -> DataFrame:
    """(deg, n_vertices) — distribution of neighbor counts over the
    symmetrized edge table: two cascaded map-side-combinable groupBys
    (rows out bounded by max degree, never |V|)."""
    return (
        edges.filter(F.col("src") != F.col("dst"))
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .groupBy("deg")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vertices"))
    )


def powerlaw_alpha(edges: DataFrame, dmin: int = 2) -> DataFrame:
    """(dmin, n_tail, alpha) — the continuous maximum-likelihood power-law
    exponent of the degree tail (Clauset–Shalizi–Newman 2009, eq. 3.1):

        α = 1 + n · ( Σ_{dᵢ ≥ dmin} ln(dᵢ / (dmin − ½)) )⁻¹

    Engine-portable determinism: each ln term is rounded to 12dp and
    summed in DECIMAL(38,12) (exact in any accumulation order — the
    HyperANF discipline), then one division; α rounded 6."""
    deg = (
        edges.filter(F.col("src") != F.col("dst"))
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .filter(F.col("deg") >= dmin)
    )
    term = F.round(F.log(F.col("deg") / (dmin - 0.5)), 12)
    return deg.agg(
        F.lit(dmin).cast("long").alias("dmin"),
        F.count(F.lit(1)).cast("long").alias("n_tail"),
        F.round(
            1.0
            + F.count(F.lit(1))
            / F.sum(term.cast("decimal(38,12)")).cast("double"),
            6,
        ).alias("alpha"),
    )


def reciprocity(edges: DataFrame) -> DataFrame:
    """(n_directed, n_reciprocal, reciprocity) of a DIRECTED edge table:
    the share of non-loop directed edges (u,v) whose reverse (v,u) is
    also present (Garlaschelli–Loffredo r = L↔/L — the standard directed
    link-graph symmetry readout; on the precedence derivation it reads
    "how often does B also immediately precede A somewhere").

    Exact int64 counts — one distinct, one self-join on the reversed
    pair (equi-join, shuffle on (src,dst) both sides, map-side
    combinable counts), one final double division rounded 6. Nothing
    O(nv) on the driver."""
    d = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    rev = d.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = d.join(rev, ["src", "dst"], "left_semi")
    return d.agg(F.count(F.lit(1)).cast("long").alias("n_directed")).crossJoin(
        recip.agg(F.count(F.lit(1)).cast("long").alias("n_reciprocal"))
    ).select(
        "n_directed",
        "n_reciprocal",
        F.round(F.col("n_reciprocal") / F.col("n_directed"), 6).alias(
            "reciprocity"
        ),
    )


def avg_neighbor_degree(edges: DataFrame) -> DataFrame:
    """(deg, n_vertices, knn) — average nearest-neighbor degree by degree
    class (Pastor-Satorras/Vázquez/Vespignani k_nn(k): the standard
    degree-correlation profile; a falling k_nn(k) is the disassortative
    hub structure typical of link graphs, the curve behind the single
    scalar `assortativity`).

    Degrees are distinct-neighbor counts. Within a degree class every
    vertex contributes its neighbor-degree SUM (int64-exact), and since
    d(v) = deg is constant in the class,
        k_nn(deg) = Σ_v snd(v) / (deg · n_deg)
    — one exact integer numerator per class and ONE final double
    division rounded 6, so the result is engine-portable with no
    float-accumulation-order dependence. Plan: distinct, per-vertex agg,
    one degree join on dst (shuffle by key), two cascaded
    map-side-combinable groupBys; rows out ≤ max degree."""
    und = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("d"))
    snd = (
        und.join(deg.select(F.col("id").alias("dst"),
                            F.col("d").alias("dn")), "dst")
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"), F.sum("dn").alias("snd"))
    )
    return (
        snd.groupBy(F.col("deg").cast("long").alias("deg"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_vertices"),
             F.sum("snd").alias("num"))
        .select(
            "deg", "n_vertices",
            F.round(F.col("num") / (F.col("deg") * F.col("n_vertices")), 6)
            .alias("knn"),
        )
    )


RICH_CLUB_KS = [1, 2, 4, 8, 16, 32, 64, 128]


def rich_club(edges: DataFrame, ks: list[int] | None = None) -> DataFrame:
    """(k, n_nodes, n_edges, phi) — rich-club coefficient ladder (Zhou &
    Mondragón 2004): among the n_k vertices of degree > k, the density
    φ(k) = 2·e_k / (n_k·(n_k−1)) of the e_k undirected edges joining
    them. A φ(k) rising toward 1 at high k is the "rich club" — hubs
    densely wired to each other — a first-class structural readout for
    link graphs (and a skew warning for join planning).

    Exact path: degree histogram + edge min-endpoint-degree histogram
    (both bounded by max degree, map-side combinable), then one
    broadcast non-equi join of the tiny k-ladder against each histogram
    — never an O(|E|·|ks|) blow-up. φ computed once in double on exact
    int64 counts, rounded 6; classes with n_k < 2 report φ = NULL."""
    ks = RICH_CLUB_KS if ks is None else ks
    spark = edges.sparkSession
    und = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("d"))
    degh = deg.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("nd"))
    pairs = und.filter(F.col("src") < F.col("dst"))
    mind = (
        pairs.join(deg.select(F.col("id").alias("src"),
                              F.col("d").alias("ds")), "src")
        .join(deg.select(F.col("id").alias("dst"),
                         F.col("d").alias("dt")), "dst")
        .select(F.least("ds", "dt").alias("m"))
        .groupBy("m")
        .agg(F.count(F.lit(1)).cast("long").alias("ne"))
    )
    kdf = spark.createDataFrame([(int(k),) for k in ks], "k long")
    nk = (
        kdf.join(degh, degh["d"] > kdf["k"], "left")
        .groupBy("k")
        .agg(F.coalesce(F.sum("nd"), F.lit(0)).cast("long").alias("n_nodes"))
    )
    ek = (
        kdf.join(mind, mind["m"] > kdf["k"], "left")
        .groupBy("k")
        .agg(F.coalesce(F.sum("ne"), F.lit(0)).cast("long").alias("n_edges"))
    )
    return (
        nk.join(ek, "k")
        .select(
            "k", "n_nodes", "n_edges",
            F.when(
                F.col("n_nodes") >= 2,
                F.round(
                    2.0 * F.col("n_edges")
                    / (F.col("n_nodes") * (F.col("n_nodes") - F.lit(1))),
                    6,
                ),
            ).alias("phi"),
        )
    )


def edge_table_sanity(edges: DataFrame) -> DataFrame:
    """One-row data-quality gate for a canonical symmetrized edge table:
    (n_rows, n_self_loops, n_dup_rows, n_asym_rows, n_nonpos_weight,
    is_canonical). `n_asym_rows` counts directed rows whose exact
    (dst, src, weight) mirror is absent — 0 on any properly symmetrized
    table; `is_canonical` folds all five checks into the boolean a
    pipeline asserts before running the algorithms (the edge-table
    analog of the repos derivation's sha256 row gate).

    Shape: two map-side-combinable aggregations plus one equi-join on
    the reversed key for the asymmetry probe — |E| rows shuffled once,
    nothing on the driver."""
    dup = (
        edges.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.coalesce(F.sum(F.col("c") - 1), F.lit(0))
             .cast("long").alias("n_dup_rows"))
    )
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"),
        F.col("weight").alias("weight"),
    )
    asym = (
        edges.join(rev, ["src", "dst", "weight"], "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("n_asym_rows"))
    )
    base = edges.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.coalesce(F.sum((F.col("src") == F.col("dst")).cast("long")),
                   F.lit(0)).cast("long").alias("n_self_loops"),
        F.coalesce(F.sum((F.col("weight") <= 0).cast("long")),
                   F.lit(0)).cast("long").alias("n_nonpos_weight"),
    )
    return base.crossJoin(dup).crossJoin(asym).select(
        "n_rows", "n_self_loops", "n_dup_rows", "n_asym_rows",
        "n_nonpos_weight",
        (
            (F.col("n_self_loops") == 0) & (F.col("n_dup_rows") == 0)
            & (F.col("n_asym_rows") == 0) & (F.col("n_nonpos_weight") == 0)
        ).alias("is_canonical"),
    )


def snapshot_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """One-row edge-set delta between two graph snapshots (the daily
    re-derivation readout of an incremental pipeline): n_added /
    n_removed / n_kept undirected edges, the weight-changed subset of
    the kept ones, and the Jaccard overlap of the two edge sets —
    exact int64 counts, one rounded double.

    Shape: canonicalize each side to its undirected support (src<dst
    distinct with the pairwise max weight — symmetrized inputs carry
    each edge twice), then ONE full outer join on the pair key;
    everything after is a map-side-combinable single aggregation. At
    100 TB both sides bucket/shuffle on the same (src, dst) key, so the
    join co-locates."""
    def canon(e):
        return (
            e.filter(F.col("src") != F.col("dst"))
            .select(
                F.least("src", "dst").alias("a"),
                F.greatest("src", "dst").alias("b"),
                F.col("weight").cast("double").alias("w"),
            )
            .groupBy("a", "b")
            .agg(F.max("w").alias("w"))
        )
    o = canon(old).select("a", "b", F.col("w").alias("w_old"))
    n = canon(new).select("a", "b", F.col("w").alias("w_new"))
    j = o.join(n, ["a", "b"], "full_outer")
    return j.agg(
        F.coalesce(F.sum((F.col("w_old").isNull()).cast("long")), F.lit(0))
        .cast("long").alias("n_added"),
        F.coalesce(F.sum((F.col("w_new").isNull()).cast("long")), F.lit(0))
        .cast("long").alias("n_removed"),
        F.coalesce(
            F.sum((F.col("w_old").isNotNull()
                   & F.col("w_new").isNotNull()).cast("long")), F.lit(0))
        .cast("long").alias("n_kept"),
        F.coalesce(
            F.sum((F.col("w_old").isNotNull() & F.col("w_new").isNotNull()
                   & (F.col("w_old") != F.col("w_new"))).cast("long")),
            F.lit(0)).cast("long").alias("n_weight_changed"),
    ).select(
        "n_added", "n_removed", "n_kept", "n_weight_changed",
        F.round(
            F.col("n_kept")
            / (F.col("n_added") + F.col("n_removed") + F.col("n_kept")),
            6,
        ).alias("jaccard"),
    )
