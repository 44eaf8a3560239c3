"""Deduplication operators (training-data pipeline, first-class per brief):

- exact duplicates         — sha256 groupBy
- n-gram Jaccard near-dup  — shingle self-join (exact, quadratic in
                             candidate pairs, for small/verification use)
- MinHash + LSH near-dup   — shingle → minhash → band buckets → candidate
                             join → exact-Jaccard verify (the scale path:
                             candidate generation is linear in corpus size
                             per band bucket, never all-pairs)
- SimHash fingerprints     — 32-bit sign-of-projection over token ids;
                             near-dups = fingerprints within Hamming ≤ k
                             via bucket join on band slices

All integer hashing uses the shared constants in text/common.py so the
DuckDB oracle computes bit-identical values. No Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from vite_spark.kernels.ids import dense_ids
from vite_spark.text.common import (
    BANDS,
    MINHASH_A,
    MINHASH_B,
    MINHASH_PRIME,
    NUM_PERM,
    ROWS_PER_BAND,
    SHINGLE_K,
    SIMHASH_BITS,
    SIMHASH_C,
    SIMHASH_D,
)


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(content_sha256, dup_count, min_doc_id) for texts appearing >1 time."""
    return (
        docs.groupBy(F.sha2(F.col(text_col), 256).alias("content_sha256"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("dup_count"),
            F.min("doc_id").cast("long").alias("min_doc_id"),
        )
        .filter(F.col("dup_count") > 1)
    )


def shingles(docs: DataFrame, text_col: str = "text", k: int = SHINGLE_K) -> DataFrame:
    """(doc_id, shingle) — DISTINCT token k-grams per document."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.concat_ws("_", F.slice(toks, i + 1, k)),
    )
    # docs shorter than k tokens contribute their whole text as one shingle
    grams = F.when(n >= k, grams).otherwise(F.array(F.concat_ws("_", toks)))
    return docs.select("doc_id", F.explode(grams).alias("shingle")).distinct()


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.8, text_col: str = "text"
) -> DataFrame:
    """(doc_a, doc_b, jaccard) for pairs sharing ≥1 shingle with
    Jaccard ≥ threshold; doc_a < doc_b; jaccard rounded to 6dp."""
    sh = shingles(docs, text_col).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sa")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter") / (F.col("sa") + F.col("sb") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out


def minhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, i, mh) — NUM_PERM minhash values per doc.

    mh_i(doc) = min over doc's shingles of (a_i*sid + b_i) mod PRIME, with
    sid = dense rank of the shingle string over the corpus (deterministic).
    """
    sh = shingles(docs, text_col)
    ids = dense_ids(sh.select("shingle"), "shingle", out_col="sid")
    sid = sh.join(ids, "shingle").select("doc_id", "sid")
    params = sid.sparkSession.createDataFrame(
        [(i, MINHASH_A[i], MINHASH_B[i]) for i in range(NUM_PERM)], "i int, a long, b long"
    )
    return (
        sid.crossJoin(F.broadcast(params))
        .groupBy("doc_id", "i")
        .agg(F.min((F.col("a") * F.col("sid") + F.col("b")) % MINHASH_PRIME).alias("mh"))
    )


def minhash_lsh_pairs(
    docs: DataFrame, threshold: float = 0.5, text_col: str = "text"
) -> DataFrame:
    """(doc_a, doc_b, jaccard) — LSH candidates verified by exact Jaccard.

    Banding: NUM_PERM signatures split into BANDS bands of ROWS_PER_BAND;
    docs sharing any full band signature become candidates (standard
    Broder/LSH; candidate volume is Σ_bucket |bucket|², never corpus²).
    """
    # ONE shingle pass shared by the signature and verification stages
    # (the two stages formerly each recomputed the tokenize+shingle
    # scan), and ONE grouped aggregation computing all NUM_PERM mins as
    # separate aggregate expressions — the former (doc, sid) × NUM_PERM
    # cross-join row blowup and its groupBy(doc_id, i) shuffle never
    # materialize. Band signatures concatenate the per-band min columns
    # in i order — byte-identical strings to the former
    # array_sort(collect_list) form. Exact same candidates and scores;
    # pytest + oracle checked.
    sh = shingles(docs, text_col).persist()
    ids = dense_ids(sh.select("shingle"), "shingle", out_col="sid")
    sid = sh.join(ids, "shingle").select("doc_id", "sid")
    mins = sid.groupBy("doc_id").agg(*[
        F.min(
            (F.lit(MINHASH_A[i]) * F.col("sid") + F.lit(MINHASH_B[i]))
            % MINHASH_PRIME
        ).alias(f"m{i}")
        for i in range(NUM_PERM)
    ])
    n_bands = NUM_PERM // ROWS_PER_BAND
    banded = mins.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws("-", *[
                    F.col(f"m{i}").cast("string")
                    for i in range(b * ROWS_PER_BAND,
                                   (b + 1) * ROWS_PER_BAND)
                ]).alias("sig"),
            )
            for b in range(n_bands)
        ])).alias("bs"),
    ).select("doc_id", "bs.band", "bs.sig")
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "sig"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # exact-Jaccard verification of candidates only (shared shingle pass)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), F.col("shingle").alias("s2")), "doc_b")
        .filter(F.col("shingle") == F.col("s2"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sa")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter") / (F.col("sa") + F.col("sb") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def near_dup_clusters(
    docs: DataFrame, threshold: float = 0.5, text_col: str = "text"
) -> DataFrame:
    """(doc_id, cluster_id, cluster_size, is_canonical) — the dedup step a
    training pipeline actually runs: transitive closure of the MinHash-LSH
    near-duplicate pairs into clusters, with one canonical survivor each.

    cluster_id = min doc_id reachable through near-dup pairs (the doc the
    pipeline KEEPS; everything else in the cluster is dropped), computed by
    the engine's distributed connected-components operator over the pair
    graph — so the whole chain shingle → minhash → LSH bands → verified
    pairs → clusters runs at corpus scale with no all-pairs stage and no
    driver-side union-find. Docs with no near-duplicate are not emitted
    (their "cluster" is themselves).
    """
    from vite_spark.algos.components import connected_components

    # materialize the (small) verified pair set once: the CC operator's
    # count probe, pack/packless job and label join would otherwise each
    # recompute the whole shingle→minhash→verify pipeline above it
    pairs = minhash_lsh_pairs(docs, threshold, text_col).localCheckpoint(
        eager=True
    )
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionAll(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    ).withColumn("weight", F.lit(1.0))
    comp = connected_components(docs.sparkSession, edges)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return comp.join(sizes, "component").select(
        F.col("id").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("cluster_id"),
        "cluster_size",
        (F.col("id") == F.col("component")).alias("is_canonical"),
    )


def simhash_fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash) — 32-bit SimHash over token ids (multiplicity
    counted). Bit b = 1 iff Σ_tokens (2·h_b(tok) − 1) > 0 where
    h_b(t) = ((c_b·tid + d_b) mod PRIME) mod 2."""
    from vite_spark.text.analysis import tokens

    # NOTE (r6 optimization round): a single-groupBy variant computing
    # all 32 signed bit sums as separate aggregate expressions was
    # implemented and REVERTED — interleaved A/B measured it 0.2-0.3 s
    # SLOWER at sf0.1 (1.43-1.59 vs 1.21-1.54 s over 5 pairs): the
    # cross-join's map-side partial aggregation already collapses the
    # (doc, b) groups before the shuffle, so the ×32 row expansion never
    # reaches the exchange, while the 32-expression aggregate serializes
    # its evaluation in fewer operators. Keeping the proven shape.
    tk = tokens(docs, text_col)
    vocab = dense_ids(tk.select("tok"), "tok", out_col="tid")
    tid = tk.join(vocab, "tok").select("doc_id", "tid")
    params = tid.sparkSession.createDataFrame(
        [(b, SIMHASH_C[b], SIMHASH_D[b]) for b in range(SIMHASH_BITS)],
        "b int, c long, d long",
    )
    bit_sum = (
        tid.crossJoin(F.broadcast(params))
        .groupBy("doc_id", "b")
        .agg(
            F.sum(
                2 * (((F.col("c") * F.col("tid") + F.col("d")) % MINHASH_PRIME) % 2) - 1
            ).alias("s")
        )
    )
    return (
        bit_sum.groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), b)"))
                .otherwise(F.lit(0).cast("long"))
            ).alias("simhash")
        )
    )


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3,
                       text_col: str = "text") -> DataFrame:
    """(doc_a, doc_b, hamming) — pairs within Hamming distance k, found by
    the 4-slice pigeonhole bucket join (any pair within k≤3 shares at least
    one exact 8-bit slice)."""
    fp = simhash_fingerprints(docs, text_col).persist()
    slices = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(s).alias("slice_no"),
                    F.shiftrightunsigned(F.col("simhash"), 8 * s)
                    .bitwiseAND(F.lit(255))
                    .alias("slice_val"),
                )
                for s in range(4)
            ])
        ).alias("sl"),
    ).select("doc_id", "simhash", "sl.slice_no", "sl.slice_val")
    cand = (
        slices.alias("x")
        .join(slices.alias("y"), ["slice_no", "slice_val"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return cand.filter(F.col("hamming") <= max_hamming)
