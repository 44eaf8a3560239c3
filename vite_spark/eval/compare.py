"""Community comparison vs ground truth — the reference's verification
machinery (/root/reference/compare.cpp:58-336) re-expressed as DataFrame
aggregations.

Pair-counting: over all vertex pairs,
  TP = same community in both truth and output
  FN = same in truth, different in output
  FP = different in truth, same in output
precision = TP/(TP+FP), recall = TP/(TP+FN), F1 = 2PR/(P+R)
(compare.cpp:267-272). Computed from the contingency table
groupBy(truth, out).count() via n·(n−1)/2 sums — no all-pairs join.

Gini coefficient of community sizes (compare.cpp:310-336):
  G = 2·Σ_i (i+1)·s_i / (n·Σ s_i) − (n+1)/n   over sizes sorted ascending.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pair_counting_scores(truth: DataFrame, output: DataFrame) -> dict:
    """truth(id, comm), output(id, comm) → precision/recall/F1/counts."""
    j = truth.select("id", F.col("comm").alias("t")).join(
        output.select("id", F.col("comm").alias("o")), "id"
    )
    cont = j.groupBy("t", "o").agg(F.count(F.lit(1)).alias("n")).persist()

    def pairs(col):
        return F.sum(F.col(col) * (F.col(col) - 1) / 2)

    both = cont.agg(pairs("n")).collect()[0][0] or 0.0          # Σ nij C2
    t_sizes = cont.groupBy("t").agg(F.sum("n").alias("n"))
    o_sizes = cont.groupBy("o").agg(F.sum("n").alias("n"))
    same_t = t_sizes.agg(pairs("n")).collect()[0][0] or 0.0     # Σ ai C2
    same_o = o_sizes.agg(pairs("n")).collect()[0][0] or 0.0     # Σ bj C2
    cont.unpersist()

    tp = float(both)
    fn = float(same_t) - tp
    fp = float(same_o) - tp
    precision = tp / (tp + fp) if tp + fp > 0 else 0.0
    recall = tp / (tp + fn) if tp + fn > 0 else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall > 0 else 0.0)
    return {
        "tp": tp, "fp": fp, "fn": fn,
        "precision": precision, "recall": recall, "f1": f1,
    }


def gini_coefficient(assignment: DataFrame, num_parts: int | None = None) -> float:
    """Gini of the community-size distribution (compare.cpp:310-336).

    Fully distributed ranking — no global single-partition window (a 100×
    co-occurrence graph can have 10⁸ communities): the rank-weighted sum
    Σ i·s_i over sizes sorted by (s, comm) collapses to per-distinct-size
    BLOCKS, because equal sizes occupy a contiguous rank run and their
    rank-sum is an arithmetic series independent of the comm tie-order.
    Block offsets come from a range partition on s + one tiny per-partition
    count collect (the kernels/ids.py dense-rank pattern); every term is an
    exact integer, so the value is bit-identical to the windowed form."""
    spark = assignment.sparkSession
    if num_parts is None:
        num_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    sizes = assignment.groupBy("comm").agg(F.count(F.lit(1)).alias("s"))
    blocks = (
        sizes.groupBy("s")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .repartitionByRange(num_parts, F.col("s"))
        .persist()
    )
    try:
        counts = (
            blocks.select(F.spark_partition_id().alias("pid"), "cnt")
            .groupBy("pid")
            .agg(F.sum("cnt").alias("c"))
            .collect()
        )
        by_pid = {r["pid"]: int(r["c"]) for r in counts}
        offsets, acc = {}, 0
        for pid in sorted(by_pid):
            offsets[pid] = acc
            acc += by_pid[pid]
        b_offsets = spark.sparkContext.broadcast(offsets)

        def block_contrib(pdf_iter):
            import numpy as np
            import pandas as pd
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            parts = [p for p in pdf_iter if len(p)]
            if not parts:
                return
            pdf = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
            pdf = pdf.sort_values("s", ignore_index=True)
            s = pdf["s"].to_numpy(np.int64)
            cnt = pdf["cnt"].to_numpy(np.int64)
            before = b_offsets.value.get(pid, 0) + np.concatenate(
                ([0], np.cumsum(cnt)[:-1])
            )
            # ranks of a block of `cnt` equal sizes after `before` rows:
            # before+1 .. before+cnt → rank-sum = cnt·before + cnt(cnt+1)/2
            contrib = s * (cnt * before + cnt * (cnt + 1) // 2)
            yield pd.DataFrame({"contrib": contrib})

        row = (
            blocks.mapInPandas(block_contrib, schema="contrib long")
            .agg(F.sum("contrib").alias("num"))
            .collect()[0]
        )
        tot_row = blocks.agg(
            F.sum(F.col("s") * F.col("cnt")).alias("tot"),
            F.sum("cnt").alias("n"),
        ).collect()[0]
    finally:
        blocks.unpersist()
    n = int(tot_row["n"] or 0)
    tot = float(tot_row["tot"] or 0.0)
    if n == 0 or tot == 0:
        return 0.0
    return 2.0 * float(row["num"]) / (n * tot) - (n + 1.0) / n


def load_ground_truth(spark, path: str, one_based: bool = False) -> DataFrame:
    """S17: LFR `vertex community` lines (louvain.cpp:3405-3436)."""
    df = (
        spark.read.text(path)
        .select(F.split(F.trim("value"), r"\s+").alias("f"))
        .filter(F.size("f") >= 2)
        .select(
            F.col("f").getItem(0).cast("long").alias("id"),
            F.col("f").getItem(1).cast("long").alias("comm"),
        )
    )
    if one_based:
        df = df.select((F.col("id") - 1).alias("id"), (F.col("comm") - 1).alias("comm"))
    return df


def write_communities(assignment: DataFrame, path: str) -> None:
    """S16: one community id per line, line number = vertex id
    (main.cpp:543-572 — the reference also gathers to rank 0 and writes
    one file; this is the verification-scale mirror of that root writer).
    For cluster-scale outputs use write_communities_sharded."""
    rows = assignment.orderBy("id").collect()
    with open(path, "w") as f:
        for r in rows:
            f.write(f"{r['comm']}\n")


def write_communities_sharded(
    assignment: DataFrame, path: str, num_files: int | None = None
) -> None:
    """S16 at scale: the same line-per-vertex text format with NO driver
    collect — range-partitioned on vertex id and sorted within
    partitions, so Spark's lexicographically-named part files
    concatenate (``cat part-*``) to byte-exactly the root writer's
    single file. Each executor streams its own id range straight to its
    shard; the driver never holds a row."""
    df = assignment.select(F.col("id").cast("long").alias("id"),
                           F.col("comm").cast("long").alias("comm"))
    n = num_files or max(1, df.rdd.getNumPartitions())
    (
        df.repartitionByRange(n, "id")
        .sortWithinPartitions("id")
        .select(F.col("comm").cast("string").alias("value"))
        .write.mode("overwrite")
        .text(path)
    )


def community_conductance(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Per-community conductance φ(S) = cut(S) / min(vol(S), 2m − vol(S))
    over a community assignment ``labels(id, label)`` of the symmetric
    directed edge table — the standard internal quality score the
    reference's ground-truth machinery (compare.cpp:58-336) cannot give
    when no ground truth exists.

    vol(S) = Σ weight of directed rows with src ∈ S (so internal edges
    count twice, the cut once — the usual volume convention); cut(S) = Σ
    weight of rows leaving S; self-loops land in vol, never in cut. The
    whole-graph community has min(vol, 2m−vol) = 0 → φ ≡ 0.0 by
    convention. One edges→labels join per endpoint + one groupBy; 2m is
    a 1-row aggregate broadcast by crossJoin — no driver collect. With
    integer-valued weights vol/cut are exact in float64; φ is one
    division + LEAST, rounded to 6.

    Returns (label, vol, cut, conductance).
    """
    la = labels.select(F.col("id").alias("src"), F.col("label").alias("lu"))
    lb = labels.select(F.col("id").alias("dst"), F.col("label").alias("lv"))
    two_m = edges.agg(F.sum("weight").alias("m2"))
    per = (
        edges.join(la, "src").join(lb, "dst")
        .groupBy(F.col("lu").alias("label"))
        .agg(
            F.sum("weight").alias("vol"),
            F.sum(
                F.when(F.col("lu") != F.col("lv"), F.col("weight"))
                .otherwise(F.lit(0.0))
            ).alias("cut"),
        )
    )
    den = F.least(F.col("vol"), F.col("m2") - F.col("vol"))
    return per.crossJoin(F.broadcast(two_m)).select(
        "label", "vol", "cut",
        F.round(
            F.when(den > 0, F.col("cut") / den).otherwise(F.lit(0.0)), 6
        ).alias("conductance"),
    )
